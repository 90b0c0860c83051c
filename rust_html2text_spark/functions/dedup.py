"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design:
- exact dedup = hash-groupBy on an md5 fingerprint (one shuffle, map-side
  partial aggregation for the counts).
- MinHash uses md5 hex-string minima (lexicographic min over shingle
  hashes), computed entirely with JVM higher-order functions — no UDF, no
  shuffle until the band-bucket groupBy.
- LSH banding turns the O(n^2) pair search into a shuffle on (band, key)
  buckets; candidate pairs come from within-bucket self-joins, which AQE
  skew-handles if a bucket is hot.
- SimHash is a vectorized (Arrow/numpy) pandas UDF — the bit-twiddling is
  not expressible with built-ins, but stays batch-vectorized.
"""

from __future__ import annotations

import hashlib
import math
import warnings

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType



def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical (normalized) documents."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return (
        docs.select(F.md5(normalized).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


def word_shingles(n: int = 3, text_col: str = "text"):
    """Distinct word n-gram shingles as an array column."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # shingle i = tokens[i..i+n) joined by space, for i in 0..len-n
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 8, shingle_size: int = 3
) -> DataFrame:
    """MinHash signature per doc: for seed i, min over shingles of
    md5(shingle || '#i') (hex strings compare consistently everywhere).

    Shingles are built with posexplode + window `lead` (fully whole-stage
    codegen; Spark higher-order-function lambdas are interpreted and ~2-3x
    slower).  Costs one shuffle of the token stream; map-side partial min
    keeps the aggregation shuffle at one row per doc.  Where an extra
    full-input shuffle is unacceptable, `minhash_signatures_hof` computes
    the same signatures shuffle-free at higher CPU cost.
    """
    from pyspark.sql.window import Window

    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tokdf = docs.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", k).over(w).alias(f"l{k}") for k in range(1, shingle_size)]
    sh = tokdf.select("doc_id", "tok", *leads)
    last_lead = f"l{shingle_size - 1}"
    long_sh = sh.filter(F.col(last_lead).isNotNull()).select(
        "doc_id",
        F.concat_ws(
            " ", "tok", *[f"l{k}" for k in range(1, shingle_size)]
        ).alias("sh"),
    )
    # docs shorter than the shingle size contribute one whole-text shingle
    # (matches word_shingles' sequence(1, greatest(n-2, 1)) formulation)
    short_sh = docs.select(
        "doc_id", F.array_join(toks, " ").alias("sh")
    ).filter(F.size(toks) < shingle_size)
    all_sh = long_sh.unionByName(short_sh)
    aggs = [
        F.min(F.md5(F.concat(F.col("sh"), F.lit(f"#{i}")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    sigs = all_sh.groupBy("doc_id").agg(*aggs)
    # posexplode drops NULL-text docs; preserve them with NULL signatures
    # (matches a SQL oracle, which keeps the row with NULL columns)
    return docs.select("doc_id").join(sigs, "doc_id", "left")


def minhash_signatures_hof(
    docs: DataFrame, num_hashes: int = 8, shingle_size: int = 3
) -> DataFrame:
    """Shuffle-free MinHash variant (higher-order functions, interpreted):
    same signatures as `minhash_signatures`."""
    sh = docs.select(
        "doc_id", F.explode(word_shingles(shingle_size)).alias("sh")
    )
    aggs = [
        F.min(F.md5(F.concat(F.col("sh"), F.lit(f"#{i}")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_size: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding of the MinHash
    signature (band matches ⇒ candidate).

    max_bucket caps the per-(band, key) population: a bucket of B docs
    yields B² candidate pairs, so one boilerplate-heavy template group can
    dominate the join output at crawl scale.  Buckets larger than the cap
    are dropped from THAT band only — a pair sharing a cooler band is
    still found, and byte-identical groups should be removed by
    exact_dup_groups first anyway.  None (default) disables the cap.
    """
    if num_hashes % band_size != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a multiple of band_size "
            f"({band_size}); a partial band would reference missing columns"
        )
    sigs = minhash_signatures(docs, num_hashes, shingle_size)
    # one pass: explode all bands from a single signature computation (a
    # union of per-band selects would re-run the shingle+md5 work per band)
    band_structs = []
    for b in range(0, num_hashes, band_size):
        key = F.md5(
            F.concat_ws("|", *[F.col(f"mh{i}") for i in range(b, b + band_size)])
        )
        band_structs.append(
            F.struct(
                F.lit(b // band_size).alias("band"), key.alias("band_key")
            )
        )
    # NULL-text docs carry NULL signatures — concat_ws would fold them all
    # into one md5('') bucket, so exclude them from banding entirely
    all_bands = sigs.filter(F.col("mh0").isNotNull()).select(
        "doc_id", F.explode(F.array(*band_structs)).alias("b")
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.band_key").alias("band_key"))
    if max_bucket is not None:
        # window count over the join key itself: one extra shuffle on the
        # SAME key the self-join needs, and — unlike a count-join — the
        # signature pipeline is not recomputed for a second branch
        from pyspark.sql.window import Window

        wb = Window.partitionBy("band", "band_key")
        all_bands = (
            all_bands.withColumn("_n", F.count("*").over(wb))
            .filter(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    left = all_bands.alias("l")
    right = all_bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return pairs


def ngram_jaccard(
    docs: DataFrame, pairs: DataFrame | None = None, shingle_size: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    With pairs=None, candidates come from MinHash-LSH banding (never an
    all-pairs join — O(n^2) is not a plan that survives scale); pass an
    explicit `pairs` frame to score a different candidate set.
    """
    sh = docs.select("doc_id", word_shingles(shingle_size).alias("shingles"))
    if pairs is None:
        pairs = lsh_candidate_pairs(docs, shingle_size=shingle_size)
    joined = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("shingles", "sh_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("shingles", "sh_b")
        .select(
            F.col("doc_a").alias("a_id"),
            F.col("doc_b").alias("b_id"),
            F.col("sh_a"),
            F.col("sh_b"),
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return joined.select(
        F.col("a_id").alias("doc_a"),
        F.col("b_id").alias("doc_b"),
        (inter / union).alias("jaccard"),
    )


def simhash_py(text: str, bits: int = 64) -> int:
    """Reference SimHash for one document (used by the UDF and tests)."""
    acc = [0] * bits
    for tok in text.lower().split():
        h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
        for b in range(bits):
            acc[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(bits):
        if acc[b] >= 0:
            out |= 1 << b
    # two's-complement into signed int64 (so XOR/hamming relationships hold)
    return out - (1 << 64) if out >= (1 << 63) else out


@pandas_udf(LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    """Vectorized SimHash: one hashlib.md5 per *unique* token in the batch,
    then the 64-bit expansion, per-row accumulation and bit packing run as
    numpy matrix ops (same signatures as `simhash_py`, tested against it)."""
    import numpy as np

    n = len(texts)
    vocab: dict[str, int] = {}
    flat_idx: list[int] = []  # vocab index per token occurrence, row-major
    row_ends = np.zeros(n, dtype=np.int64)
    null_rows = np.zeros(n, dtype=bool)
    count = 0
    for rowno, t in enumerate(texts):
        if t is None:
            null_rows[rowno] = True
        else:
            for tok in t.lower().split():
                flat_idx.append(vocab.setdefault(tok, len(vocab)))
                count += 1
        row_ends[rowno] = count

    if vocab:
        h = np.frombuffer(
            b"".join(
                hashlib.md5(tok.encode("utf-8")).digest()[:8] for tok in vocab
            ),
            dtype=">u8",
        ).astype(np.uint64)
        # (n_unique, 64) in {-1, +1}: contribution of each token to each bit
        contrib = (
            ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
            .astype(np.int32) * 2 - 1
        )
    else:
        contrib = np.zeros((0, 64), dtype=np.int32)

    occ = contrib[np.asarray(flat_idx, dtype=np.int64)] if flat_idx else contrib
    csum = np.vstack([np.zeros((1, 64), dtype=np.int64), occ.cumsum(axis=0)])
    acc = csum[row_ends] - csum[np.concatenate(([0], row_ends[:-1]))]
    bits = (acc >= 0).astype(np.uint64)
    packed = np.bitwise_or.reduce(
        bits << np.arange(64, dtype=np.uint64), axis=1
    ).view(np.int64)
    out = pd.Series(packed, dtype="Int64")
    out[null_rows] = None
    return out


def simhash(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", simhash_udf(F.col("text")).alias("simhash"))


def simhash_band_widths(max_hamming: int) -> list[int]:
    """Band widths for a guaranteed-recall SimHash banding: splitting 64
    bits into B = max_hamming + 1 bands means any pair within hamming <=
    max_hamming agrees exactly on at least one band (pigeonhole)."""
    num_bands = max_hamming + 1
    if num_bands > 64:
        raise ValueError(f"max_hamming must be < 64, got {max_hamming}")
    base, rem = divmod(64, num_bands)
    return [base + 1] * rem + [base] * (num_bands - rem)


def simhash_near_dups(
    docs: DataFrame,
    max_hamming: int = 8,
    max_bucket: int | None = None,
    persist_signatures: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance, with *guaranteed*
    recall: the 64 bits split into max_hamming + 1 bands, so every pair
    within the threshold shares at least one exact band (pigeonhole) and
    the banded candidate set provably contains the full answer.  Tighter
    thresholds mean fewer, wider bands — i.e. smaller buckets — so the
    parameter that improves precision also improves scale: max_hamming=3
    gives 4 bands of 16 bits (65k buckets per band, ~n/65k expected
    members), while max_hamming=8 gives 9 bands of ~7 bits (128 buckets,
    ~n/128 members — fine at sf-scale, hostile at 10^9 docs).  At crawl
    scale either lower the threshold or set `max_bucket` to drop
    over-populated band buckets; the cap BREAKS the recall guarantee for
    pairs whose every shared band is hot, in exchange for bounded work
    (the capped buckets are dominated by templated near-identical content
    that exact dedup should have removed first).

    The self-join evaluates the simhash UDF once per side (2× total);
    `persist_signatures=True` caches the signature frame so it runs once,
    at the cost of writing/reading the cache.  Measured at 125k short
    docs the two break even (the banded join dominates); the flag pays
    off when documents are long enough that hashing outweighs the join.
    With the flag set the result is eagerly materialized (localCheckpoint)
    so the signature cache can be released before returning — no cache
    entry leaks to the caller.

    Scale guard: when the banding yields bands narrower than 16 bits
    (max_hamming > 3 ⇒ < 65k buckets per band) and no `max_bucket` cap is
    set, a RuntimeWarning fires — at crawl scale such buckets hold ~n/2^w
    docs each and the banded self-join degenerates toward quadratic."""
    # Drop NULL-text docs BEFORE the UDF (the predicate reaches the parquet
    # scan), and wrap the UDF in coalesce(..., 0) — a no-op on non-null text
    # — so the simhash column is provably non-nullable.  Any nullable UDF
    # output here makes Catalyst infer isnotnull() from the join/hamming
    # predicates and push it below the projection, splitting the plan into
    # TWO ArrowEvalPython nodes per side (the UDF runs twice per row).
    s = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.coalesce(simhash_udf(F.col("text")), F.lit(0)).alias("simhash"),
    )
    if persist_signatures:
        s = s.persist()
    widths = simhash_band_widths(max_hamming)
    if min(widths) < 16 and max_bucket is None:
        warnings.warn(
            f"simhash_near_dups: max_hamming={max_hamming} gives bands of "
            f"{min(widths)} bits (only {1 << min(widths)} buckets per band) "
            f"— expected bucket size is n/2^{min(widths)}, hostile at crawl "
            f"scale. Set max_bucket to bound the banded join, or lower "
            f"max_hamming to ≤3 (16-bit bands).",
            RuntimeWarning,
            stacklevel=2,
        )
    # One-pass banding: explode an array of (band, band_key) structs so the
    # simhash UDF is evaluated once per join side instead of once per band
    # per side (the union-per-band form put 2*B ArrowEvalPython nodes in the
    # physical plan — an ~18x compute bill on the UDF stage at B=9).
    band_structs = []
    offset = 0
    for b, w in enumerate(widths):
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), offset)
                .bitwiseAND(F.lit((1 << w) - 1))
                .alias("band_key"),
            )
        )
        offset += w
    all_bands = s.select(
        "doc_id", "simhash", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "simhash", "bk.band", "bk.band_key")
    if max_bucket is not None:
        from pyspark.sql.window import Window

        wb = Window.partitionBy("band", "band_key")
        all_bands = (
            all_bands.withColumn("_n", F.count("*").over(wb))
            .filter(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    l = all_bands.alias("l")
    r = all_bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    result = cand.filter(F.col("hamming") <= max_hamming)
    if persist_signatures:
        # eager materialization lets us release the signature cache here
        # instead of leaking the entry for the caller to hunt down
        result = result.localCheckpoint()
        s.unpersist()
    return result


# -- incremental cross-snapshot dedup (Bloom pre-filter + exact confirm) ------


def _bloom_positions(value: str, num_bits: int, num_hashes: int) -> list[int]:
    """k deterministic bit positions per value (md5 over value|seed)."""
    return [
        int.from_bytes(
            hashlib.md5(f"{value}|{seed}".encode("utf-8")).digest()[:8], "big"
        )
        % num_bits
        for seed in range(num_hashes)
    ]


def _reduced_bitmap_frame(
    df: DataFrame, key_col: str, nb: int, k: int
) -> DataFrame:
    """Per-partition Bloom bitmaps, tree-reduced so the driver collects
    O(√P) rows instead of P.  Level 1: mapInPandas builds one bitmap per
    input partition.  Level 2 (only when P > 4): repartition the bitmap
    rows to ⌈√P⌉ and OR within each partition — executors absorb the P-way
    fan-in, the driver sees at most ⌈√P⌉ bitmaps.  At 100k input files and
    a 1 MiB filter that is ~316 MB of driver traffic instead of ~12 GB."""

    def or_partition(batches, column):
        import numpy as np
        import pandas as pd

        acc = np.zeros(nb // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            for b in pdf[column]:
                if b is None:
                    continue
                acc |= np.frombuffer(bytes(b), dtype=np.uint8)
                seen = True
        if seen:
            yield pd.DataFrame({"bitmap": [acc.tobytes()]})

    def build(batches):
        import numpy as np
        import pandas as pd

        bitmap = np.zeros(nb // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            for v in pdf[key_col].dropna():
                seen = True
                for pos in _bloom_positions(str(v), nb, k):
                    bitmap[pos >> 3] |= 1 << (pos & 7)
        if seen:
            yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    bitmaps = df.select(key_col).mapInPandas(build, "bitmap binary")
    p = df.rdd.getNumPartitions()
    if p > 4:
        fanin = max(1, math.isqrt(p))
        bitmaps = bitmaps.repartition(fanin).mapInPandas(
            lambda it: or_partition(it, "bitmap"), "bitmap binary"
        )
    return bitmaps


def bloom_build(
    df: DataFrame, key_col: str = "url", num_bits: int = 1 << 20, num_hashes: int = 4
) -> bytes:
    """Distributed Bloom-filter build: each partition builds a local numpy
    bitmap (mapInPandas); bitmaps are OR-reduced in a two-level tree so the
    driver receives O(√P) of them, then ORs that handful.

    Size num_bits for the snapshot's cardinality (~10 bits/key for ~1% FP;
    false positives only cost extra rows in the exact confirm join, never
    correctness)."""
    nb, k = int(num_bits), int(num_hashes)
    if nb % 8:
        raise ValueError("num_bits must be a multiple of 8")
    rows = _reduced_bitmap_frame(df, key_col, nb, k).collect()
    import numpy as np

    out = np.zeros(nb // 8, dtype=np.uint8)
    for r in rows:
        out |= np.frombuffer(bytes(r["bitmap"]), dtype=np.uint8)
    return out.tobytes()


def bloom_probe_udf(bloom: bytes, num_hashes: int = 4):
    """Vectorized membership probe against a broadcast bitmap: True =
    maybe-seen (needs exact confirmation), False = definitely new."""
    nb = len(bloom) * 8
    k = int(num_hashes)

    @pandas_udf("boolean")
    def probe(vals: pd.Series) -> pd.Series:
        import numpy as np

        bitmap = np.frombuffer(bloom, dtype=np.uint8)
        out = []
        for v in vals:
            if v is None:
                out.append(None)
                continue
            hit = True
            for pos in _bloom_positions(str(v), nb, k):
                if not (bitmap[pos >> 3] >> (pos & 7)) & 1:
                    hit = False
                    break
            out.append(hit)
        return pd.Series(out, dtype="boolean")

    return probe


def new_keys_vs_snapshot(
    corpus: DataFrame,
    snapshot: DataFrame,
    key_col: str = "url",
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> DataFrame:
    """Rows of `corpus` whose key does not appear in `snapshot` — the
    incremental-crawl dedup ("which of today's 10^10 urls are new vs the
    last snapshot's 10^12").

    EXACT semantics at Bloom cost: a Bloom of the snapshot keys routes
    each corpus row either to "definitely new" (bloom miss — no false
    negatives, rows skip the shuffle entirely) or to an exact left-anti
    confirm join (bloom hit — true dups plus the ~FP-rate of new rows).
    The anti-join therefore shuffles only |dups| + FP·|new| rows instead
    of the whole corpus; the result is provably identical to the plain
    anti-join at any FP rate."""
    bloom = bloom_build(snapshot, key_col, num_bits, num_hashes)
    probe = bloom_probe_udf(bloom, num_hashes)
    probed = corpus.withColumn("_maybe_seen", probe(F.col(key_col)))
    # NULL-key rows route to definitely-new: the probe returns NULL for
    # them, and a plain anti-join keeps NULL keys (NULL never equals a
    # join key) — the Bloom path must match that semantics exactly
    definitely_new = probed.filter(
        F.col("_maybe_seen").isNull() | ~F.col("_maybe_seen")
    ).drop("_maybe_seen")
    candidates = probed.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    confirmed_new = candidates.join(
        snapshot.select(key_col).distinct(), key_col, "left_anti"
    ).select(*candidates.columns)
    return definitely_new.unionByName(confirmed_new)


# -- duplicate-cluster resolution (connected components) ----------------------


def dup_components(
    pairs: DataFrame, max_iterations: int = 25, stats: dict | None = None
) -> DataFrame:
    """Connected components over near-duplicate candidate pairs: each doc
    gets `component_id` = the minimum doc_id reachable through the pair
    graph — the cluster key for keep-one-per-cluster dedup (the step after
    exact/LSH/SimHash pair finding).

    Iterative min-label propagation with pointer jumping: each round (a)
    takes the min label over every node's neighbourhood and (b) applies
    the pointer jump label := label's label — each jump halves the
    remaining distance to the component minimum, so convergence is
    O(log diameter) rounds (the same doubling idea as the published
    large-star/small-star method).  From round 3 on the jump is applied
    TWICE per round (r07): shallow graphs (the common near-dup case —
    star-shaped clusters, diameter ≤ 4) converge inside two single-jump
    rounds and never pay the extra join, while deep graphs trade one
    extra small-table join per round for half the number of rounds —
    and round count (fixed job latency) is what dominates the wall
    clock of the loop on a deep graph.  Lineage is cut per round with
    localCheckpoint so the plan does not grow with iterations.  The previous label rides along as a `_moved` flag, so
    the per-round convergence check is a narrow filter-count over the
    just-checkpointed partitions — no join, no shuffle (r07; it used to
    re-join each round's labels against the previous round's).  The
    driver holds only the convergence counter, never the labels.

    Pass a dict as `stats` to receive {"rounds": n, "converged": bool}
    (the O(log diameter) convergence evidence).

    Small-graph codegen bypass (r07 continuation): a driver thread dump
    of the loop showed the busy executor thread inside Janino
    whole-stage-codegen COMPILATION, not data work — every round plans
    fresh generated classes, so on a small graph the loop is
    compile-bound (guide §7.3 "driver/executor doing something
    single-threaded").  When the edge table is small (< ~5M rows, where
    interpreted execution costs less than one compile per round) the
    loop runs with `spark.sql.codegen.wholeStage=false` and restores
    the caller's setting after; large graphs keep codegen, where it
    pays.  Measured paired: 4096-chain 5.3-6.6 s → 5.0-5.4 s, shallow
    e2e graph 3.7-4.1 s → 3.1-3.7 s."""
    spark = pairs.sparkSession
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        # hash-partition on dst before the checkpoint: localCheckpoint
        # preserves outputPartitioning, so the per-round neighbour join
        # never re-shuffles the edge table — only the (smaller) label
        # table moves each round
        .repartition("dst")
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    changed = 0
    rounds = 0
    # small-graph codegen bypass: one compile per round costs more than
    # interpreting a small graph's rows (see docstring).  The count is a
    # cheap job over the just-checkpointed edge partitions.
    n_edges = edges.count()
    cg_bypass = n_edges < 5_000_000
    cg_prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    if cg_bypass:
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try:
        for _round in range(max_iterations):
            rounds += 1
            neighbor_min = (
                edges.join(labels, edges.dst == labels.doc_id)
                .groupBy("src")
                .agg(F.min("label").alias("nlabel"))
            )
            cur = labels.join(
                neighbor_min, labels.doc_id == neighbor_min.src, "left"
            ).select(
                "doc_id",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            for _jump in range(1 if rounds <= 2 else 2):
                # pointer jumping: label := label's label (distance-halving)
                parent = cur.select(
                    F.col("doc_id").alias("p_id"), F.col("label").alias("p_label")
                )
                cur = cur.join(parent, cur.label == parent.p_id, "left").select(
                    "doc_id",
                    "_old",
                    F.least(
                        F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))
                    ).alias("label"),
                )
            # LAZY checkpoint (r07 second pass): the convergence count below
            # is the materializing action, so checkpoint + count run as ONE
            # job per round instead of two (measured −0.4s on the 4096-chain,
            # paired; a 3-round shallow graph saves ~3 job round-trips too)
            new_labels = cur.localCheckpoint(eager=False)
            changed = new_labels.filter(F.col("label") != F.col("_old")).count()
            labels = new_labels.select("doc_id", "label")
            if changed == 0:
                break
    finally:
        if cg_bypass:
            spark.conf.set("spark.sql.codegen.wholeStage", cg_prev)
    if changed > 0:
        warnings.warn(
            f"dup_components: label propagation still changing after "
            f"{max_iterations} rounds ({changed} labels moved last round) — "
            f"returned components are UNDER-MERGED; raise max_iterations "
            f"(rounds needed ≈ log2(graph diameter))",
            RuntimeWarning,
            stacklevel=2,
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = changed == 0
    return labels.select("doc_id", F.col("label").alias("component_id"))


# -- exact duplicated-substring coverage (Lee et al. 2022 style) --------------


def duplicated_span_fraction(
    docs: DataFrame, k: int = 8, text_col: str = "text"
) -> DataFrame:
    """Per-document fraction of tokens covered by an exact k-token
    substring that occurs more than once in the corpus (the signal behind
    "Deduplicating Training Data Makes Language Models Better": docs heavy
    in duplicated substrings are boilerplate/templated).

    Positions of duplicated k-shingles are merged into covering intervals
    with a gaps-and-islands window (consecutive hits ≤ k apart fuse), so
    overlapping repeats are not double-counted.  Shuffles: the shingle
    stream once for the global duplicate-hash aggregation, the hit
    positions once for the per-doc windows — both scale-linear, no joins
    against the corpus text itself.

    Returns (doc_id, n_tokens, dup_tokens, dup_fraction).
    """
    from pyspark.sql.window import Window

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = docs.filter(F.col(text_col).isNotNull()).select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("n_tokens")
    )
    tok_stream = base.select(
        "doc_id", "n_tokens", F.posexplode("toks").alias("pos", "tok")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", j).over(w_doc).alias(f"l{j}") for j in range(1, k)]
    sh = tok_stream.select("doc_id", "n_tokens", "pos", "tok", *leads).filter(
        F.col(f"l{k - 1}").isNotNull()
    )
    sh = sh.select(
        "doc_id",
        "n_tokens",
        "pos",
        F.md5(
            F.concat_ws(" ", "tok", *[f"l{j}" for j in range(1, k)])
        ).alias("h"),
    )
    # window count over the shingle hash instead of groupBy + self-join:
    # one shuffle on h and ONE computation of the shingle stream (a join
    # back to sh would re-run the posexplode + k-lead pipeline per side)
    w_h = Window.partitionBy("h")
    hits = (
        sh.withColumn("_c", F.count("*").over(w_h))
        .filter(F.col("_c") > 1)
        .select("doc_id", "n_tokens", "pos")
    )
    # gaps-and-islands: a hit starts a new covered interval iff it is more
    # than k tokens after the previous hit (else the k-spans overlap/abut)
    prev = F.lag("pos").over(w_doc)
    islands = hits.withColumn(
        "new_island",
        F.when(prev.isNull() | (F.col("pos") - prev > k), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    covered = (
        islands.groupBy("doc_id", "n_tokens", "island")
        .agg((F.max("pos") - F.min("pos") + k).alias("span"))
        .groupBy("doc_id", "n_tokens")
        .agg(F.sum("span").cast("long").alias("dup_tokens"))
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(covered.drop("n_tokens"), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("n_tokens"), 6
            ).alias("dup_fraction"),
        )
    )


def dedup_by_components(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Materialize the deduplicated corpus: resolve candidate pairs into
    connected components and keep exactly one document per cluster (the
    minimum doc_id — deterministic at any parallelism).  The anti-join
    removes only non-minimal cluster members, so rows untouched by any
    pair pass through unshuffled except for the (small) losers side."""
    comp = dup_components(pairs)
    losers = comp.filter(F.col("component_id") != F.col("doc_id")).select(
        "doc_id"
    )
    return docs.join(losers, "doc_id", "left_anti")
