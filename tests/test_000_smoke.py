"""Import smoke gate — collected FIRST (filename sorts before every
other test module).

Round 3 shipped a snapshot commit whose last-minute refactor left a
syntax error in one operator module; because the registry imports every
module, that single error emptied CORRECTNESS_r03.json, crashed
bench.py, and cascaded 27 test failures. This module makes that
structurally impossible to miss: it parses every source file and loads
the full registry without needing a SparkSession, so it runs in
milliseconds and fails loudly on any import-time breakage.

It also pins the driver-verification window: the external correctness
harness checks only the FIRST 50 registered query names, so
registration order is load-bearing (registry.py module list). The
explicit list below turns that invariant from a comment into a failing
test — adding a query to an early module now trips the assertion
instead of silently evicting a later query from verification.
"""

from __future__ import annotations

import ast
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent
PKG = REPO / "flink_kakfa_spark"

# The curated driver-verification window (first 50 registered names).
# Rounds 1-2 spent the window on the relational block (all green);
# round 4 on the LLM-pipeline block; round 5 on the scalar tail +
# round-4/5 modules (50/50 green). Round 6 takes the first 50 of the
# 85-query zero-driver-evidence backlog (full TPC-H tail, lakehouse/
# CDC, analytics, media/text-advanced/vector); the remaining 35 are
# pinned as registry._NEXT_WINDOW_PLAN for round 7. Rotate
# DELIBERATELY (update this list + registry._WINDOW_FRONT together);
# never by accident.
DRIVER_WINDOW = [
    "text_char_entropy",
    "text_bpe_merge_pairs",
    "agg_corr_covar",
    "corpus_dataset_card",
    "sketch_cms_heavy_hitters",
    "streak_longest_purchase_days",
    "pipeline_curriculum_order",
    "pipeline_shuffle_shards",
    "pipeline_train_split",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity",
    "merge_scd2_orders",
    "cdc_apply_changelog",
    "profile_orders_columns",
    "constraint_check_summary",
    "join_bloom_filtered_revenue",
    "cohort_weekly_retention",
    "growth_mom_revenue",
    "markov_event_transitions",
    "rag_bm25_topk",
    "join_salted_skew_revenue",
    "window_first_last_nth",
    "ts_ewma_event_value",
    "attribution_last_touch",
    "rolling_wau_7d",
    "rolling_wau_hll",
    "sample_weighted_topk",
    "lake_zorder_layout",
    "trend_slope_per_type",
    "profile_join_key_skew",
    "profile_equidepth_price",
    "setop_all_variants",
    "join_null_safe_props",
    "sql_explode_outer_keep_empty",
    "mm_image_ahash_groups",
    "mm_audio_vad_features",
    "text_bigram_perplexity",
    "text_winnow_fingerprints",
    "sim_pq_adc_topk",
    "dedup_semdedup",
    "feature_target_encode",
    "privacy_k_anonymity",
    "text_hashing_trick",
]


def test_every_source_file_parses():
    """ast.parse every .py in the package + entry points: a syntax
    error anywhere fails here in <1s, before any Spark test runs."""
    failures = []
    files = sorted(PKG.rglob("*.py")) + [
        REPO / "__spark_entry__.py",
        REPO / "bench.py",
        REPO / "tools" / "diffcheck.py",
        REPO / "tools" / "plan_audit.py",
    ]
    for path in files:
        try:
            ast.parse(path.read_text(), filename=str(path))
        except SyntaxError as exc:  # pragma: no cover - failure path
            failures.append(f"{path}: {exc}")
    assert not failures, "syntax errors:\n" + "\n".join(failures)


def test_registry_loads_all_queries():
    """registry.load_all() must import every operator module and
    register the full query set (no Spark session required)."""
    from flink_kakfa_spark import registry

    registry.load_all()
    assert len(registry.QUERIES) >= 100
    missing_oracles = set(registry.QUERIES) - set(registry.ORACLES)
    # only genuinely non-SQL-expressible ops may omit an oracle:
    # dedup_minhash_lsh hashes with Spark's xxhash64 (not in DuckDB);
    # sim_ivf_kmeans_topk's centroids depend on Spark's sampling;
    # text_bpe_train_merges is an iterative trainer (python-oracle
    # verified in tests/test_bpe.py);
    # quality_compression_ratio needs zlib (python-oracle verified in
    # tests/test_curation.py)
    assert missing_oracles <= {
        "dedup_minhash_lsh",
        "sim_ivf_kmeans_topk",
        "text_bpe_train_merges",
        "text_bpe_tokenize",
        "quality_compression_ratio",
    }, f"queries without oracle SQL: {sorted(missing_oracles)}"


def test_driver_window_is_pinned():
    """The first 50 registered names ARE the driver-verified window."""
    from flink_kakfa_spark import registry

    registry.load_all()
    first50 = list(registry.QUERIES)[:50]
    assert first50 == DRIVER_WINDOW, (
        "driver-verification window drifted; if intentional, update "
        "DRIVER_WINDOW in tests/test_000_smoke.py in the same commit.\n"
        f"got:      {first50}\n"
        f"expected: {DRIVER_WINDOW}"
    )


def test_next_window_plan_names_exist():
    """Every name in next round's rotation plan must be a registered
    query, and disjoint from the current window — a typo or rename in
    the plan fails CI this round, not when the rotation executes."""
    from flink_kakfa_spark import registry

    registry.load_all()
    unknown = set(registry._NEXT_WINDOW_PLAN) - set(registry.QUERIES)
    assert not unknown, f"_NEXT_WINDOW_PLAN names not registered: {sorted(unknown)}"
    dupes = set(registry._NEXT_WINDOW_PLAN) & set(DRIVER_WINDOW)
    assert not dupes, f"plan overlaps current window: {sorted(dupes)}"
    assert len(set(registry._NEXT_WINDOW_PLAN)) == len(registry._NEXT_WINDOW_PLAN)


def test_entry_module_exposes_driver_contract():
    """__spark_entry__.py must expose entry/queries/oracle_sql."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__smoke", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.entry)
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 100
    assert set(oracles) <= set(qs)
