"""Web-corpus curation operators: the post-extraction cleanup stage of a
large-scale training-data pipeline (C4 / Gopher-style rules), Spark-first.

All three operators are whole-stage-codegen expressions or standard
shuffle shapes — no Python in any hot path — and each has an exact DuckDB
oracle in __spark_entry__:

- `remove_repeated_lines`: C4-style boilerplate-line removal over the
  *extracted* text.  The frequent-line set is computed with a map-side-
  combined groupBy, filtered to lines at/above the threshold (a small
  frame), and removed with a left_anti join — never a window over the
  raw line stream, which would concentrate hot lines (blank lines,
  boilerplate headers) into single partitions at crawl scale.
- `gopher_quality`: per-document repetition/shape signals (word counts,
  mean word length, symbol ratio, duplicate-bigram fraction) with a
  composite pass flag, thresholds adapted from the Gopher quality rules.
- `pii_scrub`: email/phone redaction via regexp_replace, patterns
  restricted to syntax with identical semantics in Java regex (Spark) and
  RE2 (DuckDB) so the oracle can mirror them literally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Conservative patterns valid (and identical) in Java regex and RE2:
# no lookaround, no backrefs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"


def remove_repeated_lines(
    rendered: DataFrame,
    min_count: int = 2,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Remove every line that occurs `min_count`+ times across the corpus
    (boilerplate: navigation, headers, footers).  Empty lines are kept —
    they carry block structure, not content.  Returns one row per input
    row: (key, clean_text, n_lines_kept)."""
    lines = rendered.select(
        key_col, F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line")
    )
    bad = (
        lines.filter(F.col("line") != "")
        .groupBy("line")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("line")
    )
    kept = lines.join(bad, "line", "left_anti")
    reassembled = kept.groupBy(key_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.line,
            ),
            "\n",
        ).alias("clean_text"),
        F.count("*").alias("n_lines_kept"),
    )
    return (
        rendered.select(key_col)
        .join(reassembled, key_col, "left")
        .select(
            key_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
        )
    )


def canonicalize_url(url_col):
    """Canonical form for crawl dedup: drop fragment and query string,
    lowercase the scheme://host prefix, strip trailing slashes.  Built
    only from operations with identical semantics in Spark and DuckDB
    (no replacement backreferences — the dialects disagree on $1 vs \\1)."""
    no_frag = F.regexp_replace(url_col, r"#.*$", "")
    no_query = F.regexp_replace(no_frag, r"\?.*$", "")
    head = F.regexp_extract(no_query, r"^([A-Za-z]+://[^/]+)", 1)
    tail = F.regexp_replace(no_query, r"^[A-Za-z]+://[^/]+", "")
    return F.concat(F.lower(head), F.regexp_replace(tail, r"/+$", ""))


def url_dup_groups(pages: DataFrame) -> DataFrame:
    """Groups of urls that canonicalize to the same address (http/https
    twins, tracking params, fragments, trailing slashes)."""
    return (
        pages.select(canonicalize_url(F.col("url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count("*").alias("n_urls"))
        .filter(F.col("n_urls") > 1)
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling: a row is kept iff the first 8
    hex chars of md5(key) fall below fraction * 2^32.  Hash-thresholding
    (not rand()) makes the sample reproducible across runs, engines and
    partitionings — the property an eval-set split needs.  Strata not in
    `fractions` are dropped."""
    bucket = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    cond = None
    for stratum, frac in sorted(fractions.items()):
        this = (F.col(strata_col) == stratum) & (bucket < int(frac * (1 << 32)))
        cond = this if cond is None else (cond | this)
    return docs.filter(cond)


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    shingle_size: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing at least
    `min_overlap` distinct word n-grams with any benchmark text.

    Scale shape: the benchmark shingle set is tiny relative to the corpus,
    so it BROADCASTS; the corpus side explodes its shingles map-side and
    the overlap count is one hash aggregation per doc — the corpus is
    never shuffled whole.  Returns every doc with its overlap count and a
    `contaminated` flag.
    """
    from rust_html2text_spark.functions.dedup import word_shingles

    bench_sh = (
        benchmark.select(F.explode(word_shingles(shingle_size)).alias("sh"))
        .distinct()
    )
    doc_sh = docs.select(
        "doc_id", F.explode(word_shingles(shingle_size)).alias("sh")
    )
    overlaps = (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("n_overlapping_shingles"))
    )
    return (
        docs.select("doc_id")
        .join(overlaps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlapping_shingles", F.lit(0)).alias(
                "n_overlapping_shingles"
            ),
            (
                F.coalesce("n_overlapping_shingles", F.lit(0)) >= min_overlap
            ).alias("contaminated"),
        )
    )


def gopher_quality(docs: DataFrame) -> DataFrame:
    """Gopher-style per-document quality signals + composite pass flag."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_words = F.size(toks)
    nonspace = F.length(F.regexp_replace("text", r"\s", ""))
    mean_word_len = nonspace / n_words
    symbol_ratio = (
        F.length(F.regexp_replace("text", r"[^#*…]", "")) / F.length("text")
    )
    idx = F.sequence(F.lit(1), F.greatest(n_words - F.lit(1), F.lit(1)))
    bigrams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, 2), " "))
    dup_bigram_frac = F.when(
        n_words >= 2,
        1.0 - F.size(F.array_distinct(bigrams)) / (n_words - F.lit(1)),
    ).otherwise(F.lit(0.0))
    passes = (
        (n_words >= 50)
        & (mean_word_len >= 3)
        & (mean_word_len <= 10)
        & (symbol_ratio < 0.1)
        & (dup_bigram_frac < 0.2)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(dup_bigram_frac, 6).alias("dup_bigram_frac"),
        passes.alias("passes_gopher"),
    )


def doc_repetition(
    rendered: DataFrame, key_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition signals (Gopher-style) over extracted
    text: fraction of non-empty lines that are duplicates, and the share
    of all word bigrams taken by the single most frequent bigram.  Two
    hash aggregations keyed by document — no cross-document shuffle of
    text."""
    lines = rendered.select(
        key_col, F.explode(F.split(F.col(text_col), "\n")).alias("line")
    ).filter(F.col("line") != "")
    line_stats = lines.groupBy(key_col).agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("line").alias("n_distinct_lines"),
    )
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n_words = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n_words - F.lit(1), F.lit(1)))
    bigrams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, 2), " "))
    bg = rendered.select(key_col, F.explode(bigrams).alias("bg"))
    bg_counts = bg.groupBy(key_col, "bg").agg(F.count("*").alias("c"))
    bg_stats = bg_counts.groupBy(key_col).agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bigram_count")
    )
    return line_stats.join(bg_stats, key_col).select(
        key_col,
        "n_lines",
        F.round(1.0 - F.col("n_distinct_lines") / F.col("n_lines"), 6).alias(
            "dup_line_frac"
        ),
        F.round(F.col("top_bigram_count") / F.col("n_bigrams"), 6).alias(
            "top_bigram_frac"
        ),
    )


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails then phone numbers; returns counts and the scrubbed
    text (hash the text for cheap cross-engine comparison)."""
    emails = F.regexp_count(F.col(text_col), F.lit(EMAIL_RE))
    after_email = F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>")
    phones = F.regexp_count(after_email, F.lit(PHONE_RE))
    clean = F.regexp_replace(after_email, PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        emails.alias("n_emails"),
        phones.alias("n_phones"),
        clean.alias("clean_text"),
    )


def curation_verdict(
    docs: DataFrame,
    min_words: int = 50,
    langs: tuple[str, ...] = ("en",),
    robots_col: str | None = None,
) -> DataFrame:
    """FineWeb-style composite curation verdict: one keep/drop decision per
    document with the ordered list of failed rules ("too_short,lang"), so
    a pipeline can both filter and report WHY mass was dropped.

    Rules (fixed order): robots policy (when `robots_col` names a column
    holding the page's normalized robots token list — a noindex directive
    is the publisher opting out of indexing/training corpora, dropped
    with reason `robots_noindex`), then Gopher length/word-shape/symbol/
    repetition thresholds, then stopword-vote language.  All whole-stage-
    codegen expressions over the text column — a pure map, no shuffle;
    reasons are a comma-joined string (concat_ws skips the NULLs of
    passed rules), which also keeps the oracle engine-portable where
    list types are not.
    """
    from rust_html2text_spark.functions.textstats import pred_lang_col

    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_words = F.size(toks)
    nonspace = F.length(F.regexp_replace("text", r"\s", ""))
    mean_word_len = nonspace / n_words
    symbol_ratio = (
        F.length(F.regexp_replace("text", r"[^#*…]", "")) / F.length("text")
    )
    idx = F.sequence(F.lit(1), F.greatest(n_words - F.lit(1), F.lit(1)))
    bigrams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, 2), " "))
    dup_bigram_frac = F.when(
        n_words >= 2,
        1.0 - F.size(F.array_distinct(bigrams)) / (n_words - F.lit(1)),
    ).otherwise(F.lit(0.0))
    checks = [
        (n_words < min_words, "too_short"),
        ((mean_word_len < 3) | (mean_word_len > 10), "word_len"),
        (symbol_ratio >= 0.1, "symbol_ratio"),
        (dup_bigram_frac >= 0.2, "repetitive"),
        (~pred_lang_col("text").isin(list(langs)), "lang"),
    ]
    if robots_col is not None:
        # token-exact match against the normalized comma-joined list
        # (page_metadata's robots output); NULL robots = no directive
        noindex = F.coalesce(
            F.array_contains(F.split(F.col(robots_col), ","), "noindex"),
            F.lit(False),
        )
        checks.insert(0, (noindex, "robots_noindex"))
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for cond, name in checks]
    )
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
        n_words.alias("n_words"),
    )
