"""Headline benchmark: HTML→text extraction throughput.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "docs_per_sec": ...,
   "mb_per_sec": ...}

The pages input table is materialized to parquet first (scan → render is
what we measure, mirroring the Iceberg-scan production path, not corpus
synthesis).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from rust_html2text_spark.operators.render import render_pages
    from rust_html2text_spark.plans.session import get_spark
    from rust_html2text_spark.sources.corpus import load_pages

    from rust_html2text_spark.sources.corpus import expand_pages

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # steady-state corpus: documents × BENCH_MULT (distinct url+bytes per
    # copy) so render throughput reflects per-core compute, not the few
    # seconds of fixed job-scheduling overhead a 5k-doc corpus is dominated
    # by (the 100 TB-relevant number is the steady-state one)
    mult = int(os.environ.get("SPARK_GRAFT_BENCH_MULT", "50"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="bench_pages_")
    pages_path = os.path.join(tmp, "pages.parquet")
    timings: dict[str, float] = {}
    try:
        # materialize the input pages table (not part of the timed path)
        expand_pages(
            load_pages(spark, sf_dir, skew_fraction=0.05, oversize_every=101),
            mult,
        ).repartition(64).write.mode("overwrite").parquet(pages_path)
        pages = spark.read.parquet(pages_path)
        n_docs = pages.count()
        total_html_mb = (
            pages.agg(F.sum(F.length("html")).alias("b")).collect()[0]["b"] / 1e6
        )

        # warmup: spin up python workers / JIT / codegen before timing —
        # the 100 TB-relevant number is steady-state throughput
        render_pages(pages.limit(128), width=80).count()

        # headline: full render (docs/sec, MB/sec) — best of 2 passes, the
        # shared VM host has noisy neighbours (±20% run-to-run)
        render_sec = None
        for _pass in range(2):
            t0 = time.monotonic()
            rendered = render_pages(pages, width=80)
            stats = rendered.agg(
                F.count("*").alias("n"),
                F.sum("text_bytes").alias("tb"),
                F.sum(F.when(F.col("error").isNull(), 0).otherwise(1)).alias("err"),
            ).collect()[0]
            sec = time.monotonic() - t0
            render_sec = sec if render_sec is None else min(render_sec, sec)
            assert stats["n"] == n_docs, (stats["n"], n_docs)
        timings["render_flagship"] = round(render_sec, 3)

        # dedup-aware render (render distinct docs once, join back)
        from rust_html2text_spark.operators.render import render_pages_deduped

        t0 = time.monotonic()
        dd = render_pages_deduped(pages, width=80).agg(
            F.count("*").alias("n")
        ).collect()[0]
        timings["render_dedup"] = round(time.monotonic() - t0, 3)
        assert dd["n"] == n_docs

        # duplicated-corpus lane: groups of 10 copies share bytes (the
        # web-crawl mirror regime render_pages_deduped exists for) — dedup
        # renders each distinct payload once and must beat the flat render
        # on the same input; both best-of-2
        dup_path = os.path.join(tmp, "pages_dup10.parquet")
        expand_pages(
            load_pages(spark, sf_dir, skew_fraction=0.05, oversize_every=101),
            mult,
            dup_factor=10,
        ).repartition(64).write.mode("overwrite").parquet(dup_path)
        pages_dup = spark.read.parquet(dup_path)
        for key, op in (
            ("render_flat_dup10", render_pages),
            ("render_dedup_dup10", render_pages_deduped),
        ):
            best = None
            for _pass in range(2):
                t0 = time.monotonic()
                nd = op(pages_dup, width=80).agg(F.count("*").alias("n")).collect()[0]
                sec = time.monotonic() - t0
                best = sec if best is None else min(best, sec)
                assert nd["n"] == n_docs
            timings[key] = round(best, 3)

        # extraction-tier lanes: main-content extraction (boilerplate
        # strip + DOM scoring + render) and PDF/layout parse — both at
        # half-mult (each kernel runs ~60% of the plain render's rate,
        # the lanes should not dominate the bench wall)
        from rust_html2text_spark.operators.extract import extract_pages
        from rust_html2text_spark.operators.pdf import (
            extract_mixed_pages,
            extract_pdf_pages,
        )
        from rust_html2text_spark.sources.corpus import (
            chrome_pages_from_documents,
            load_documents,
        )
        from rust_html2text_spark.sources.pdfcorpus import (
            mixed_pages_from_documents,
            pdf_pages_from_documents,
        )

        ex_mult = int(os.environ.get("SPARK_GRAFT_EXTRACT_MULT", str(max(1, mult // 2))))
        docs_df = load_documents(spark, sf_dir)
        lane_specs = (
            ("extract_main", chrome_pages_from_documents(docs_df), extract_pages, {"width": 80}),
            ("pdf_extract", pdf_pages_from_documents(docs_df).withColumnRenamed("pdf", "html"), None, {}),
            # half HTML render + half PDF parse through the single-scan
            # router — should track the mean of the two pure lanes
            ("mixed_extract", mixed_pages_from_documents(docs_df), extract_mixed_pages, {"width": 80}),
        )
        extract_rates: dict[str, float] = {}
        for lane, src_df, op, kw in lane_specs:
            lane_path = os.path.join(tmp, f"{lane}.parquet")
            expand_pages(src_df, ex_mult).repartition(64).write.mode(
                "overwrite"
            ).parquet(lane_path)
            lane_pages = spark.read.parquet(lane_path)
            if lane == "pdf_extract":
                lane_pages = lane_pages.withColumnRenamed("html", "pdf")
                op = extract_pdf_pages
                kw = {}
            n_lane = lane_pages.count()
            op(lane_pages.limit(64), **kw).count()  # warmup
            best = None
            for _pass in range(2):
                t0 = time.monotonic()
                st = op(lane_pages, **kw).agg(
                    F.count("*").alias("n"),
                    F.sum(
                        F.when(F.col("error").isNull(), 0).otherwise(1)
                    ).alias("err"),
                ).collect()[0]
                sec = time.monotonic() - t0
                best = sec if best is None else min(best, sec)
                assert st["n"] == n_lane and st["err"] == 0, (lane, st)
            timings[lane] = round(best, 3)
            extract_rates[lane] = round(n_lane / best, 1)

        # secondary headline queries (JVM-side pipeline ops), best of 2.
        # round-6 adds the crawl-loop lanes: frontier_schedule measures
        # the WHOLE loop (link extraction → robots gate → politeness
        # waves), sitemap_urls the XML parse path, cdx_fetch_plan the
        # pure-codegen index selection.
        for name in (
            "token_count",
            "quality_score",
            "doc_fingerprint",
            "minhash_signatures",
            "lsh_candidate_pairs",
            "knn_bruteforce",
            "pricing_summary",
            "frontier_schedule",
            "sitemap_urls",
            "cdx_fetch_plan",
        ):
            fn = {**entrymod.queries(), **entrymod.extra_queries()}[name]
            best = None
            for _pass in range(2):
                t0 = time.monotonic()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                sec = time.monotonic() - t0
                best = sec if best is None else min(best, sec)
            timings[name] = round(best, 3)

        # end-to-end dedup graph: LSH candidate pairs → connected
        # components → materialized deduped corpus (the full near-dup
        # pipeline, previously oracled only at 50 pairs)
        from rust_html2text_spark.functions.dedup import (
            dup_components,
            lsh_candidate_pairs,
        )

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        graph_stats: dict = {}
        best = None
        for _pass in range(2):
            t0 = time.monotonic()
            prs = lsh_candidate_pairs(docs)
            comp = dup_components(prs, stats=graph_stats)
            losers = comp.filter(F.col("component_id") != F.col("doc_id")).select(
                "doc_id"
            )
            kept = docs.join(losers, "doc_id", "left_anti").count()
            sec = time.monotonic() - t0
            best = sec if best is None else min(best, sec)
            assert 0 < kept <= docs.count()
        timings["dedup_graph_e2e"] = round(best, 3)
        assert graph_stats.get("converged"), graph_stats

        # chain-topology convergence evidence: a path graph is the
        # worst-case diameter per edge; pointer jumping must finish in
        # O(log n) rounds, not O(n)
        chain_n = 4096
        chain = spark.range(chain_n - 1).select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
        )
        chain_stats: dict = {}
        t0 = time.monotonic()
        chain_comp = dup_components(chain, max_iterations=30, stats=chain_stats)
        n_comp = chain_comp.select("component_id").distinct().count()
        timings["dedup_components_chain4096"] = round(time.monotonic() - t0, 3)
        assert n_comp == 1 and chain_stats["converged"], (n_comp, chain_stats)

        total = round(sum(timings.values()), 3)
        print(
            json.dumps(
                {
                    "metric": "html_to_text_throughput",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                    "corpus_mult": mult,
                    "n_docs": n_docs,
                    "html_mb": round(total_html_mb, 2),
                    "docs_per_sec": round(n_docs / render_sec, 1),
                    "mb_per_sec": round(total_html_mb / render_sec, 2),
                    "extract_docs_per_sec": extract_rates.get("extract_main"),
                    "pdf_docs_per_sec": extract_rates.get("pdf_extract"),
                    "render_errors": int(stats["err"]),
                    "dedup_graph_rounds": graph_stats.get("rounds"),
                    "chain4096_rounds": chain_stats.get("rounds"),
                    "cpus": int(cpus),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
