"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": ...}

Each query executes to completion through the noop sink (full pipeline,
no driver-side collect cost). One warmup run amortizes JVM/codegen
startup out of the numbers, mirroring how a long-lived cluster session
behaves; the timed figure is the best of two passes, because this host
shows sporadic multi-second stalls unrelated to the plans (verified:
identical queries swing 2s -> 40s with near-zero GC time and no code
change — see SCALE.md). Best-of-N measures the engine, not the noisy
neighbor.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_kakfa_spark.registry import all_queries
from flink_kakfa_spark.session import get_spark

HEADLINE = [
    "wordcount",                # flagship: tokenize+explode+agg
    "agg_pricing_summary",      # TPC-H Q1 shape: scan-heavy agg
    "q5_regional_revenue",      # star join + broadcast dims
    "q3_shipping_priority",     # 3-way join + top-k
    "join_range_event_pairs",   # range join
    "window_topk_orders",       # analytic window
    # NOTE: unguarded dedup_ngram_jaccard is deliberately NOT here — it
    # is quadratic per duplicate group (28x wall-time on a dup-heavy 10x
    # corpus, SCALE.md) and stays registered as a correctness diagnostic
    # only; the production near-dup paths below are the guarded shingle
    # join, exact-collapse-first, and MinHash banding variants.
    "sim_cosine_topk",          # vector similarity
    "text_quality_score",       # HOF text analysis
    "scalar_json_extract",      # JSON extraction
    "text_tfidf_top20",         # multi-agg text stats + broadcast join
    "asof_last_purchase",       # as-of join (union + window)
    "dedup_near_unique",        # exact-collapse + shingle near-dup
    "dedup_ngram_jaccard_guarded",  # shingle join, stop-shingle guard ON
    "dedup_minhash_portable",   # MinHash-LSH banding (the 100 TB near-dup path)
    "sql_cte_top_nations",      # SQL surface: CTE + join + agg + rank
    "mm_decode_frames",         # multimodal mapInPandas (Arrow batch path)
    "decontam_eval_overlap",    # benchmark decontamination (broadcast shingle join)
    "text_repetition_ngrams",   # repetition stats: shuffle-free HOF narrow map
    "quality_gopher_filter",    # Gopher rules: shuffle-free HOF narrow map
    "agg_hll_mergeable_rollup", # mergeable HLL sketches (re-aggregatable distinct)
    "funnel_signup_click_purchase",  # ordered funnel: one user_id exchange
    "cep_error_then_purchase",  # CEP pattern: one lead-window exchange
    "tpch_q10_returned_revenue",  # star-join top-k with broadcast dims
    # round-5 additions: the round-4 modules' heavy hitters, tracked
    # round-over-round like the rest (VERDICT r4 item 7)
    "quality_containment_score",  # inverted-index containment join
    "emb_centroid_purity",      # embedding diagnostics: decimal-sum agg
    "dedup_clusters",           # iterative label propagation (slowest query)
    "corpus_temperature_sample",  # temperature-weighted corpus sampling
    # round-5 analytics module
    "rag_bm25_topk",            # BM25 retrieval: 1 doc_id shuffle + stats broadcast
    "cohort_weekly_retention",  # cohort matrix: 1 user_id shuffle
    "join_salted_skew_revenue", # skew-salted fact-to-dim join
    # round-5 in-round additions
    "sim_pq_adc_topk",          # PQ codes + ADC lookup: narrow pass + TakeOrdered
    "text_winnow_fingerprints", # MOSS winnowing: in-array selection + fp join
    "text_bigram_perplexity",   # corpus bigram LM scoring: 2 agg + broadcast vocab
    # round-5 graph/substring additions (the heavy representatives; the
    # full graph family is tracked in SCALE.md)
    "graph_pagerank_top20",     # iterative integer PageRank: k single-shuffle rounds
    "dedup_substring_runs",     # duplicated-window runs: digest shuffles + islands window
    # round-5 second-session additions
    "dedup_jaccard_prefix_filter",  # exact PPJoin: collapse-first + prefix + size filter
    "rag_hybrid_rrf_topk",      # BM25 + dense RRF fusion (composes two rankers)
    "drift_psi_report",         # PSI drift monitor: one binning pass + cell math
    "reconcile_table_checksum", # order-independent manifest: one narrow pass
    # round-6 additions: the new families' heavy representatives
    "sketch_kmv_set_overlap",   # KMV set algebra: salted k-min + sketch-side pair math
    "text_ngram_coverage",      # inter-doc shingle duplication: one vocab shuffle
    "lake_compaction_plan",     # metadata-only merge planning over the manifest
    "emb_hard_negatives",       # broadcast-anchor contrastive mining (hoisted norms)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    queries = all_queries()

    def run(name: str) -> float:
        t0 = time.time()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # one warmup pass per query: amortizes JVM startup, codegen compile,
    # and file-index listing — the timed passes measure execution.
    # Convention (pinned in BASELINE.md): best of SPARK_GRAFT_BENCH_PASSES
    # timed passes, default 2 — filters this host's sporadic multi-second
    # stalls; set to 1 for the first-run convention. Passes iterate the
    # WHOLE suite, not per-query back-to-back: observed stalls last
    # ~10 s, long enough to poison two consecutive runs of one query,
    # so the suite loop puts the full suite's runtime between a query's
    # samples and decorrelates them from any single stall window.
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))
    for name in HEADLINE:
        run(name)
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(passes):
        for name in HEADLINE:
            samples[name].append(run(name))
    timings = {name: round(min(ts), 3) for name, ts in samples.items()}
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
