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
import math
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


# Stall-proofing (round 7, VERDICT r6 item 2): the round-6 driver run
# recorded 39.7 s for a query that measures 6.4 s on a quiet host — a
# sustained host stall poisoned both timed passes. Two defenses:
#  1. quiet-host records: the per-query minimum across all committed
#     BENCH_r*.json files (min across rounds filters any past stall).
#     A row whose best-of-N exceeds RETRY_THRESHOLD× its record gets up
#     to MAX_RETRIES extra runs; the JSON carries a `retried` map so a
#     persisting outlier is visibly annotated, never silent.
#  2. drift_factor: geomean of (this run / record) over the trivial
#     rows — plans untouched for rounds, so any drift is host load.
#     A loaded-host run is thereby self-labeling in the artifact.
RETRY_THRESHOLD = 3.0
# Sub-2s rows suffer host contention SUPER-linearly relative to their
# record (fixed scheduling/stall overheads dominate tiny runtimes), so
# the r9 run left sketch_kmv_set_overlap at 2.70x its 1.75 s record
# with zero retries — under the 3x gate yet clearly poisoned (VERDICT
# r9 task 1). Rows whose quiet-host record is < SMALL_ROW_CUTOFF
# seconds retry at the tighter 2x threshold instead.
SMALL_ROW_CUTOFF = 2.0
SMALL_ROW_RETRY_THRESHOLD = 2.0
MAX_RETRIES = 3
DRIFT_SENTINELS = ["wordcount", "scalar_json_extract", "text_quality_score"]
# Shuffle-heavy rows suffer burst contention SUPER-linearly relative
# to the trivial sentinels above (r9: every heavy row read 1.5-1.9x
# normalized while trivial sentinels said 1.8x raw), so a loaded run
# can't be normalized for them with one factor. A second geomean over
# heavy rows whose plans have been stable for rounds gives readers
# the heavy-class correction; the original drift_factor keeps its
# cross-round meaning unchanged.
DRIFT_SENTINELS_HEAVY = ["join_salted_skew_revenue", "graph_pagerank_top20"]


def quiet_host_records(repo_dir: str, sf: str) -> dict[str, float]:
    """Per-query minimum across committed BENCH_r*.json (same sf)."""
    records: dict[str, float] = {}
    try:
        names = sorted(os.listdir(repo_dir))
    except OSError:
        return records
    for fname in names:
        if not (fname.startswith("BENCH_r") and fname.endswith(".json")):
            continue
        try:
            with open(os.path.join(repo_dir, fname)) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        # the driver wraps bench stdout under a "parsed" key
        if isinstance(data.get("parsed"), dict):
            data = {**data, **data["parsed"]}
        if str(data.get("sf")) != str(sf):
            continue
        for q, t in (data.get("queries") or {}).items():
            if isinstance(t, (int, float)) and t > 0:
                records[q] = min(records.get(q, float("inf")), float(t))
    return records


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
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

    records = quiet_host_records(os.path.dirname(os.path.abspath(__file__)), sf)
    retried: dict[str, int] = {}
    for name in HEADLINE:
        rec = records.get(name)
        if not rec:
            continue
        tries = 0
        threshold = (
            SMALL_ROW_RETRY_THRESHOLD if rec < SMALL_ROW_CUTOFF else RETRY_THRESHOLD
        )
        while timings[name] > threshold * rec and tries < MAX_RETRIES:
            tries += 1
            # brief pause lets a transient host stall pass before re-sampling
            time.sleep(2.0 * tries)
            timings[name] = round(min(timings[name], run(name)), 3)
        if tries:
            retried[name] = tries

    def geomean_vs_records(sentinels: list[str]) -> float | None:
        ratios = [
            timings[q] / records[q]
            for q in sentinels
            if q in timings and records.get(q)
        ]
        if not ratios:
            return None
        return round(math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 3)

    drift_factor = geomean_vs_records(DRIFT_SENTINELS)
    drift_factor_heavy = geomean_vs_records(DRIFT_SENTINELS_HEAVY)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # host-load self-labels: ~1.0 on a quiet host; >1.3 means every
        # number in this run is inflated by external load, not plans.
        # drift_factor = trivial narrow rows; drift_factor_heavy =
        # shuffle-heavy stable rows, which bursts inflate more — use it
        # to normalize the expensive rows.
        "drift_factor": drift_factor,
        "drift_factor_heavy": drift_factor_heavy,
    }
    if retried:
        # rows that exceeded their retry threshold (3x their quiet-host
        # record, or 2x for sub-2s rows) and were re-run
        out["retried"] = retried
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
