"""Similarity search over embedding columns.

- `knn_bruteforce`: exact cosine top-k via a broadcast join of the (small)
  query set against the corpus — the baseline.  At 100 TB the corpus side
  stays partitioned; only queries broadcast, so no shuffle of the big side.
- `knn_lsh`: random-hyperplane LSH bucketing (deterministic hyperplanes) —
  the scale path: corpus hashed once (narrow projection), candidates only
  within matching buckets.

Dot products use `F.aggregate`/`F.zip_with` (JVM-side, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm_a = F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    norm_b = F.sqrt(
        F.aggregate(
            b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    return dot / (norm_a * norm_b)


def knn_bruteforce(
    embeddings: DataFrame, k: int = 5, num_queries: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbours for the first `num_queries` vectors."""
    from pyspark.sql.window import Window

    queries = embeddings.filter(F.col("vec_id") < num_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = corpus.join(F.broadcast(queries)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = scored.select(
        "query_id",
        "neighbor_id",
        F.round(_cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hyperplane_sign_bits(emb_col, num_planes: int = 8, dim: int = 16):
    """Deterministic pseudo-random hyperplanes: component j of plane p is
    ±1 by the parity of a hash of (p, j).  Sign bit = dot(emb, plane) >= 0."""
    bits = []
    for p in range(num_planes):
        signs = [
            1.0 if (p * 1315423911 + j * 2654435761) % 7 < 4 else -1.0
            for j in range(dim)
        ]
        signs_arr = F.array(*[F.lit(s) for s in signs])
        dot = F.aggregate(
            F.zip_with(emb_col, signs_arr, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)) * (1 << p))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket


def knn_lsh(
    embeddings: DataFrame,
    k: int = 5,
    num_queries: int = 10,
    num_planes: int = 6,
    dim: int = 16,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    from pyspark.sql.window import Window

    hashed = embeddings.withColumn(
        "bucket", hyperplane_sign_bits(F.col("embedding"), num_planes, dim)
    )
    queries = hashed.filter(F.col("vec_id") < num_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    corpus = hashed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
    )
    scored = (
        corpus.join(F.broadcast(queries), F.col("c_bucket") == F.col("q_bucket"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_cosine_dups(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold (exact,
    pairwise within LSH buckets at scale; exact here)."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(_cosine(F.col("emb_a"), F.col("emb_b")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") > threshold)
    )
