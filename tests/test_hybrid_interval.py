"""Hybrid RRF fusion and binned interval-lookup join semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from flink_kakfa_spark.registry import all_queries


def test_rrf_fusion_matches_component_rankers(spark, sf_dir):
    """The fused list must be exactly what RRF over the two
    registered rankers' outputs gives (model computed in Python)."""
    qs = all_queries()
    lex = qs["rag_bm25_topk"](spark, sf_dir).collect()
    dense = qs["sim_cosine_topk"](spark, sf_dir).collect()
    rl = {r["doc_id"]: i + 1 for i, r in enumerate(lex)}
    rd = {r["vec_id"]: i + 1 for i, r in enumerate(dense)}
    expected = {}
    for d in set(rl) | set(rd):
        s = 0.0
        if d in rl:
            s += 1.0 / (60 + rl[d])
        if d in rd:
            s += 1.0 / (60 + rd[d])
        expected[d] = round(s, 6)
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["doc_id"], r["rrf"], r["lex_rank"], r["dense_rank"])
        for r in qs["rag_hybrid_rrf_topk"](spark, sf_dir).collect()
    ]
    assert [(d, s) for d, s, _, _ in got] == top
    for d, _, lr, dr in got:
        assert lr == rl.get(d) and dr == rd.get(d)


def test_interval_join_covers_all_events_and_half_open_bounds(
    spark, sf_dir, tmp_path
):
    qs = all_queries()
    rows = qs["join_interval_lookup_binned"](spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # tiers cover [0, 500) and every fixture value falls inside
    assert sum(r["n_events"] for r in rows) == total
    # half-open bounds: value exactly at a tier edge lands in the
    # UPPER tier ([lo, hi)), and bin-edge values (25.0 -> bin 1,
    # still 'mid') survive the equi-join rewrite
    t0 = dt.datetime(2024, 1, 1)
    evs = [
        Row(event_id=i, ts=t0, user_id=1, event_type="x", value=v, props="")
        for i, v in enumerate([20.0, 19.999, 25.0, 74.999, 75.0])
    ]
    spark.createDataFrame(evs).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["tier"]: r["n_events"]
        for r in qs["join_interval_lookup_binned"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {"small": 1, "mid": 3, "large": 1}


def test_interval_join_plans_hash_join_not_bnlj(spark, sf_dir):
    df = all_queries()["join_interval_lookup_binned"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
