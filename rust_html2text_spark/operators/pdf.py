"""PDF text-extraction operator, Spark-first.

Third member of the extraction-tier operator family (render_pages,
extract_pages): same plan shape — pruned scan → salted url-hash
repartition → Arrow-batched mapInPandas — and the same robustness
contract (a hostile or truncated PDF becomes an error row, never a task
failure).  The kernel is engine/pdftext.extract_pdf_ex (document
structure + content-stream interpretation + layout assembly); page count
and PDF version ride along as lineage.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

PDF_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("text", StringType()),
        StructField("error", StringType()),
        StructField("pdf_bytes", LongType()),
        StructField("text_bytes", LongType()),
        StructField("n_pages", LongType()),
        StructField("pdf_version", StringType()),
    ]
)


def _pdf_batch_fn(page_sep: str):
    def pdf_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os
        import sys

        _repo = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        if _repo not in sys.path:
            sys.path.insert(0, _repo)

        from rust_html2text_spark.engine.pdftext import PdfError, extract_pdf_ex

        for batch in batches:
            out = {
                "url": batch["url"],
                "text": [],
                "error": [],
                "pdf_bytes": [],
                "text_bytes": [],
                "n_pages": [],
                "pdf_version": [],
            }
            for pdf in batch["pdf"]:
                if pdf is None:
                    out["text"].append(None)
                    out["error"].append("NullInput")
                    out["pdf_bytes"].append(0)
                    out["text_bytes"].append(0)
                    out["n_pages"].append(0)
                    out["pdf_version"].append(None)
                    continue
                pdf = bytes(pdf)
                out["pdf_bytes"].append(len(pdf))
                try:
                    r = extract_pdf_ex(pdf, page_sep)
                    out["text"].append(r["text"])
                    out["error"].append(None)
                    out["text_bytes"].append(len(r["text"].encode("utf-8")))
                    out["n_pages"].append(r["n_pages"])
                    out["pdf_version"].append(r["pdf_version"])
                except PdfError as e:
                    out["text"].append(None)
                    out["error"].append(f"PdfError:{e}"[:200])
                    out["text_bytes"].append(0)
                    out["n_pages"].append(0)
                    out["pdf_version"].append(None)
                except Exception as e:  # never kill the task
                    out["text"].append(None)
                    out["error"].append(f"Fail:{type(e).__name__}")
                    out["text_bytes"].append(0)
                    out["n_pages"].append(0)
                    out["pdf_version"].append(None)
            yield pd.DataFrame(out)

    return pdf_batches


def is_pdf_payload(col):
    """Codegen-only PDF sniff on a binary payload column: the %PDF- magic
    within the first 1024 bytes (the same window engine/pdfparse.parse_pdf
    accepts — crawled PDFs sometimes carry server preambles).  NULL-safe
    (NULL payload → false → routed to the HTML lane's NullInput row)."""
    prefix = F.decode(F.substring(col, 1, 1024), "ISO-8859-1")
    return F.coalesce(F.instr(prefix, "%PDF-") > 0, F.lit(False))


def extract_mixed_pages(
    df: DataFrame,
    width: int = 80,
    config_kwargs: dict | None = None,
    num_partitions: int | None = None,
    salt: int = 0,
    payload_col: str = "html",
) -> DataFrame:
    """Mixed-payload extraction: a crawl's pages table carries ONE binary
    payload column, and real Common Crawl responses are ~98% HTML with a
    PDF tail.  Routes each row by magic-byte sniff — PDF payloads through
    extract_pdf_pages, everything else through the full HTML render —
    and unions to a common schema (url, kind, text, error, input_bytes,
    text_bytes).

    Scale shape: the router predicate is a codegen filter evaluated at
    the scan (both lanes prune to url+payload), each lane keeps its own
    salted repartition + outlier handling, and the union is a no-shuffle
    concatenation of the two lanes' outputs."""
    from rust_html2text_spark.operators.render import render_pages

    pages = df.select("url", F.col(payload_col).alias("html"))
    pdf_rows = pages.filter(is_pdf_payload(F.col("html"))).withColumnRenamed(
        "html", "pdf"
    )
    html_rows = pages.filter(~is_pdf_payload(F.col("html")))

    rendered = render_pages(
        html_rows,
        width=width,
        config_kwargs=config_kwargs,
        num_partitions=num_partitions,
        salt=salt,
    ).select(
        "url",
        F.lit("html").alias("kind"),
        "text",
        "error",
        F.col("html_bytes").alias("input_bytes"),
        "text_bytes",
    )
    pdfed = extract_pdf_pages(
        pdf_rows, num_partitions=num_partitions, salt=salt
    ).select(
        "url",
        F.lit("pdf").alias("kind"),
        "text",
        "error",
        F.col("pdf_bytes").alias("input_bytes"),
        "text_bytes",
    )
    return rendered.unionByName(pdfed)


def extract_pdf_pages(
    df: DataFrame,
    page_sep: str = "\f",
    num_partitions: int | None = None,
    salt: int = 0,
    outlier_bytes: int | None = 8 << 20,
    repartition: str = "salted",
) -> DataFrame:
    """Extract text from a PDF pages DataFrame (url, pdf, ...) →
    (url, text, error, pdf_bytes, text_bytes, n_pages, pdf_version).
    Partitioning contract matches render_pages: salted url-hash shuffle
    by default, `repartition="none"` for pre-shuffled input, and an
    oversized-outlier lane (default 8 MiB — PDFs run larger than HTML)
    so one giant scan never stalls a task's worth of siblings."""
    if repartition not in ("salted", "none"):
        raise ValueError(f"repartition must be 'salted' or 'none', got {repartition!r}")
    pages = df.select("url", "pdf")
    if outlier_bytes is not None:
        pages = pages.withColumn(
            "_oversized",
            F.coalesce(F.length("pdf") > outlier_bytes, F.lit(False)),
        )
        normal = pages.filter(~F.col("_oversized")).drop("_oversized")
        oversized = pages.filter(F.col("_oversized")).drop("_oversized")
    else:
        normal = pages
        oversized = None

    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    n = int(n)
    key = F.xxhash64(F.col("url"), F.lit(salt))
    if repartition == "salted":
        normal = normal.repartition(n, key)

    fn = _pdf_batch_fn(page_sep)
    out = normal.mapInPandas(fn, PDF_SCHEMA)
    if oversized is not None:
        oversized = oversized.repartition(n, key)
        out = out.unionByName(oversized.mapInPandas(fn, PDF_SCHEMA))
    return out
