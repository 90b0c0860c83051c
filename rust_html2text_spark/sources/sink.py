"""Idempotent, resumable output sink (north-rule requirement).

Iceberg gives atomic snapshot commits natively; on plain Parquet we get the
same property with bucket-grained idempotent writes:

- the url space is split into `num_buckets` stable buckets
  (`pmod(xxhash64(url), num_buckets)`);
- each bucket is rendered and written to `out/bucket=<i>/` followed by an
  atomic manifest append (`_manifest/<i>.json`) recording lineage
  (row/byte/error counts, input path, config);
- `run_with_resume` skips buckets already in the manifest, so a re-run
  after a crash reprocesses only missing buckets and never duplicates
  output.

At 10^12 docs each bucket is still thousands of tasks; the bucket is a
commit/checkpoint unit, not a parallelism unit.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F


def _manifest_dir(out_path: str) -> str:
    return os.path.join(out_path, "_manifest")


def completed_buckets(out_path: str) -> set[int]:
    mdir = _manifest_dir(out_path)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            done.add(int(name[:-5]))
    return done


def run_with_resume(
    pages: DataFrame,
    out_path: str,
    width: int = 80,
    num_buckets: int = 16,
    config_kwargs: dict | None = None,
) -> dict:
    """Render all pending buckets; returns summary lineage."""
    from rust_html2text_spark.operators.render import render_pages

    os.makedirs(_manifest_dir(out_path), exist_ok=True)
    done = completed_buckets(out_path)
    summary = {"buckets_total": num_buckets, "buckets_skipped": len(done), "rows": 0}

    bucketed = pages.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(num_buckets))
    )
    for b in range(num_buckets):
        if b in done:
            continue
        part = bucketed.filter(F.col("bucket") == b).drop("bucket")
        rendered = render_pages(part, width=width, config_kwargs=config_kwargs)
        bucket_path = os.path.join(out_path, f"bucket={b}")
        rendered.write.mode("overwrite").parquet(bucket_path)

        out_df = rendered.sparkSession.read.parquet(bucket_path)
        stats = out_df.agg(
            F.count("*").alias("rows"),
            F.sum(F.when(F.col("error").isNull(), 0).otherwise(1)).alias("errors"),
            F.sum("html_bytes").alias("html_bytes"),
            F.sum("text_bytes").alias("text_bytes"),
        ).collect()[0]
        manifest = {
            "bucket": b,
            "rows": stats["rows"],
            "errors": int(stats["errors"] or 0),
            "html_bytes": int(stats["html_bytes"] or 0),
            "text_bytes": int(stats["text_bytes"] or 0),
            "width": width,
            "committed_at": time.time(),
        }
        tmp = os.path.join(_manifest_dir(out_path), f".{b}.json.tmp")
        final = os.path.join(_manifest_dir(out_path), f"{b}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, final)  # atomic commit
        summary["rows"] += stats["rows"]
    return summary
