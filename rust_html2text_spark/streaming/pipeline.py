"""Structured Streaming variant of the extraction pipeline.

The reference is a pure batch scalar function (SURVEY.md §2.5 — no
streaming operators), but a crawl-ingest deployment renders pages as WARC
batches land.  `readStream` file source → the same Arrow-batched render
stage → parquet sink with checkpointing gives exactly-once output and
automatic resume; the render UDF is shared with the batch path so
semantics cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rust_html2text_spark.operators.render import RENDER_SCHEMA, _render_batch_fn


def stream_pages(
    spark: SparkSession,
    input_path: str,
    schema=None,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """File-source stream of pages parquet dropped into `input_path`."""
    reader = (
        spark.readStream.format("parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        static = spark.read.parquet(input_path)
        reader = reader.schema(static.schema)
    return reader.load(input_path)


def render_stream(pages: DataFrame, width: int = 80, config_kwargs: dict | None = None) -> DataFrame:
    """Streaming render: same mapInPandas stage as the batch operator."""
    fn = _render_batch_fn(width, config_kwargs or {})
    return pages.select("url", "html").mapInPandas(fn, RENDER_SCHEMA)


def start_render_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    width: int = 80,
):
    """Start the streaming query (exactly-once parquet sink + checkpoint)."""
    pages = stream_pages(spark, input_path)
    rendered = render_stream(pages, width=width)
    return (
        rendered.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )
