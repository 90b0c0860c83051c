"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages.  The actual codec step is STUBBED (no image/audio
libraries in this container): `decode_stub=True` produces a deterministic
fake decode so the Spark-side plumbing — schema, partitioning, UDF
signature, batch shape — is real and tested; wiring a real codec only
replaces `_decode_payload`.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("feature_dim", IntegerType()),
        StructField("error", StringType()),
    ]
)


def _decode_payload(payload: bytes, kind: str, decode_stub: bool):
    if decode_stub:
        # deterministic fake decode: digest-derived "features"
        return hashlib.sha256(payload).hexdigest()
    raise NotImplementedError(
        "real media decode requires PIL/ffmpeg, not present in this container"
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents (payload = UTF-8 text bytes);
    deterministic, for exercising the plumbing."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract as an Arrow-batched mapInPandas stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            digests = []
            errors = []
            for payload, kind in zip(batch["payload"], batch["kind"]):
                try:
                    digests.append(_decode_payload(bytes(payload), kind, decode_stub))
                    errors.append(None)
                except NotImplementedError as e:
                    digests.append(None)
                    errors.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "kind": batch["kind"],
                    "n_bytes": batch["payload"].map(len),
                    "digest": digests,
                    "feature_dim": 256,
                    "error": errors,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, FEATURE_SCHEMA
    )
