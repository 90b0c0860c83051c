"""Custom stateful streaming operator: cross-batch first-seen dedup.

A crawl ingest stream re-delivers the same document under many urls and
re-crawls; this operator keeps per-content-hash state across micro-batches
(`applyInPandasWithState`) and emits each distinct document exactly once —
the streaming counterpart of `render_pages_deduped`.

State = one row per content hash (first url + count); the state store is
bounded by distinct-content cardinality and can be TTL'd via
GroupStateTimeout in a production deployment.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("content_hash", StringType()),
        StructField("url", StringType()),  # first url seen for this content
        StructField("n_duplicates", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("first_url", StringType()),
        StructField("count", LongType()),
    ]
)


def _dedup_fn(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    n_new = len(rows)
    if state.exists:
        (first_url, count) = state.get
        state.update((first_url, count + n_new))
        return iter(())  # already emitted: suppress duplicates
    first_url = sorted(rows["url"])[0]
    state.update((first_url, n_new))
    return iter(
        [
            pd.DataFrame(
                {
                    "content_hash": [key[0]],
                    "url": [first_url],
                    "n_duplicates": [n_new],
                }
            )
        ]
    )


def first_seen(stream: DataFrame, key_col) -> DataFrame:
    """Generic cross-batch first-seen dedup: one output row per distinct
    `key_col` value, emitted when first sighted; later arrivals only bump
    the per-key state counter.  `key_col` may be a column name or
    expression (e.g. a content hash, a text fingerprint)."""
    hashed = stream.select(
        (F.col(key_col) if isinstance(key_col, str) else key_col).alias(
            "content_hash"
        ),
        "url",
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def first_seen_documents(pages_stream: DataFrame) -> DataFrame:
    """Streaming pages → one output row per *distinct* document content,
    emitted on first sight (streaming counterpart of render_pages_deduped)."""
    return first_seen(pages_stream, F.md5(F.col("html")))
