"""TPC-H-shaped extras: plan posture + spot semantics."""

from __future__ import annotations

from flink_kakfa_spark.registry import all_queries


def test_q2_keeps_only_min_price_suppliers(spark, sf_dir):
    """Every surviving (part, supplier) row carries its part's minimum."""
    out = all_queries()["tpch_q2_min_unit_price"](spark, sf_dir)
    rows = out.collect()
    best_by_part = {}
    for r in rows:
        best_by_part.setdefault(r["p_partkey"], set()).add(r["best_unit_price"])
    # one distinct best price per part, even when several suppliers tie
    assert all(len(v) == 1 for v in best_by_part.values())


def test_q10_is_sorted_and_bounded(spark, sf_dir):
    rows = all_queries()["tpch_q10_returned_revenue"](spark, sf_dir).collect()
    assert len(rows) == 20
    revs = [r["lost_revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_tpch_extra_dims_are_broadcast(spark, sf_dir):
    """Dimension sides join as BroadcastHashJoin; the fact table never
    builds a broadcast."""
    for name in ["tpch_q8_market_share", "tpch_q10_returned_revenue"]:
        df = all_queries()[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast:\n{plan}"
