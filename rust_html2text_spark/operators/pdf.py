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
