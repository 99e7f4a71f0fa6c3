"""Per-operator edge cases: empty inputs, all-null keys, duplicate keys,
one-row tables (SURVEY.md §5.2 item 2), plus plan-shape assertions for
the scale posture (pushdown, broadcast, TakeOrdered).
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_kakfa_spark.functions.numeric import dsum
from flink_kakfa_spark.registry import all_queries


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_groupby_all_null_keys(spark):
    df = spark.createDataFrame(
        [Row(k=None, v=1), Row(k=None, v=2)], "k string, v int"
    )
    rows = df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    assert len(rows) == 1
    assert rows[0]["k"] is None and rows[0]["s"] == 3


def test_dsum_exact_under_repartition(spark):
    # decimal-routed sum must not depend on partitioning
    vals = [Row(x=0.1)] * 1000
    df = spark.createDataFrame(vals)
    a = df.coalesce(1).agg(dsum(F.col("x")).alias("s")).collect()[0]["s"]
    b = df.repartition(16).agg(dsum(F.col("x")).alias("s")).collect()[0]["s"]
    assert a == b == 100.0


def test_join_empty_side(spark):
    left = spark.createDataFrame([Row(k=1, v="a")])
    right = spark.createDataFrame([], "k int, w string")
    assert left.join(right, "k", "inner").count() == 0
    out = left.join(right, "k", "left").collect()
    assert len(out) == 1 and out[0]["w"] is None


def test_join_duplicate_keys_multiply(spark):
    left = spark.createDataFrame([Row(k=1), Row(k=1)])
    right = spark.createDataFrame([Row(k=1), Row(k=1), Row(k=1)])
    assert left.join(right, "k").count() == 6


def test_one_row_table_aggregate(spark):
    df = spark.createDataFrame([Row(x=5.0)])
    row = df.agg(
        dsum(F.col("x")).alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert row["s"] == 5.0 and row["n"] == 1


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """Predicates must appear as PushedFilters in the Parquet scan."""
    df = all_queries()["filter_returned_items"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "l_returnflag" in plan.split("PushedFilters")[1][:400]


def test_column_pruning_reaches_scan(spark, sf_dir):
    """A 2-column projection must not read all 11 lineitem columns."""
    df = all_queries()["filter_returned_items"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema")[1][:500]
    assert "l_comment" not in read_schema
    assert "l_tax" not in read_schema  # not selected, not filtered


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = all_queries()["q5_regional_revenue"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan


def test_topk_plans_take_ordered(spark, sf_dir):
    df = all_queries()["orderby_limit"](spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(df)


def test_wholestage_codegen_covers_agg(spark, sf_dir):
    df = all_queries()["agg_pricing_summary"](spark, sf_dir)
    df.collect()  # finalize the adaptive plan
    plan = _plan(df)
    # codegen stages print as "*(n) Operator" in the executed plan
    assert "*(1)" in plan and "*(2)" in plan


def test_rollup_produces_grand_total(spark, sf_dir):
    rows = all_queries()["agg_rollup"](spark, sf_dir).collect()
    grand = [r for r in rows if r["l_returnflag"] is None and r["l_linestatus"] is None]
    assert len(grand) == 1
    assert grand[0]["n"] == sum(
        r["n"] for r in rows if r["l_returnflag"] is not None and r["l_linestatus"] is not None
    )


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    from flink_kakfa_spark.sources.tables import load_table

    rows = all_queries()["agg_approx_count_distinct"](spark, sf_dir).collect()
    # The query self-reports the tolerance check; every group must pass.
    assert rows and all(r["within_tol"] for r in rows)
    # Independently recompute the exact counts and the HLL estimate to
    # confirm the query's exact_n_part column is the real distinct count
    # and the sketch is inside its error budget.
    li = load_table(spark, "lineitem", sf_dir)
    indep = {
        r["l_returnflag"]: (r["exact"], r["approx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        )
        .collect()
    }
    for r in rows:
        exact, approx = indep[r["l_returnflag"]]
        assert r["exact_n_part"] == exact
        assert abs(approx - exact) <= 0.1 * exact


def test_setop_all_preserves_multiplicity(spark, tmp_path):
    """EXCEPT ALL subtracts multiplicities; INTERSECT ALL takes the min."""
    from pyspark.sql import Row

    spark.createDataFrame(
        [
            Row(
                o_orderkey=i,
                o_custkey=c,
                o_orderstatus="O",
                o_totalprice=p,
                o_orderdate=None,
                o_orderpriority=pr,
            )
            for i, (c, p, pr) in enumerate(
                # cust 1: three big orders, one of them urgent
                [(1, 200000.0, "1-URGENT"), (1, 200000.0, "3-MEDIUM"),
                 (1, 200000.0, "3-MEDIUM"),
                 # cust 2: one big non-urgent, two urgent smalls
                 (2, 160000.0, "3-MEDIUM"), (2, 100.0, "1-URGENT"),
                 (2, 100.0, "1-URGENT")]
            )
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    from flink_kakfa_spark.registry import all_queries

    rows = {
        (r["op"], r["o_custkey"]): r["n"]
        for r in all_queries()["setop_all_variants"](spark, str(tmp_path)).collect()
    }
    # cust 1: hi = {1,1,1}, urgent = {1} -> except_all 2 rows, intersect_all 1
    assert rows[("except_all", 1)] == 2
    assert rows[("intersect_all", 1)] == 1
    # cust 2: hi = {2}, urgent = {2,2} -> except_all absent, intersect_all 1
    assert ("except_all", 2) not in rows
    assert rows[("intersect_all", 2)] == 1


def test_null_safe_join_keeps_null_keys(spark, sf_dir):
    """Every fact row survives the dimension join — including the NULL
    tag — and the plain equi-join would have dropped the NULLs."""
    from flink_kakfa_spark.registry import all_queries
    from flink_kakfa_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    rows = all_queries()["join_null_safe_props"](spark, sf_dir).collect()
    total = sum(r["n"] for r in rows)
    n_events = load_table(spark, "events", sf_dir).count()
    assert total == n_events
    null_rows = [r for r in rows if r["tag"] is None]
    assert len(null_rows) == 1 and null_rows[0]["label"] == "untagged"
    assert null_rows[0]["n"] > 0


def test_explode_outer_keeps_empty_arrays(spark, sf_dir):
    """Docs with doc_id % 7 == 0 surface as a NULL-token row; plain
    explode would drop them entirely."""
    from flink_kakfa_spark.registry import all_queries

    rows = all_queries()["sql_explode_outer_keep_empty"](spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["tok"])
    for doc_id, toks in by_doc.items():
        if doc_id % 7 == 0:
            assert toks == [None], (doc_id, toks)
        else:
            assert len(toks) == 3 and None not in toks


def test_mode_priority_tie_breaks_lexicographically(spark, tmp_path):
    """Two priorities tied at 2 orders each: the lexicographically
    smaller one must win deterministically."""
    from pyspark.sql import Row

    spark.createDataFrame(
        [Row(n_nationkey=1, n_name="aa", n_regionkey=1)]
    ).write.parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [Row(c_custkey=1, c_name="c", c_nationkey=1, c_acctbal=0.0)]
    ).write.parquet(str(tmp_path / "customer.parquet"))
    orders = [
        Row(o_orderkey=i, o_custkey=1, o_orderstatus="F",
            o_totalprice=1.0, o_orderdate=None, o_orderpriority=p)
        for i, p in enumerate(["2-HIGH", "2-HIGH", "1-URGENT", "1-URGENT", "3-LOW"])
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    from flink_kakfa_spark.registry import all_queries

    [r] = all_queries()["agg_mode_priority_by_nation"](
        spark, str(tmp_path)
    ).collect()
    assert r["mode_priority"] == "1-URGENT"  # tie with 2-HIGH -> lexicographic
    assert r["mode_count"] == 2 and r["n_orders"] == 5
    assert r["mode_share"] == 0.4
