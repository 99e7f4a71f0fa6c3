"""As-of join semantics on hand-computed micro-fixtures."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_kakfa_spark.operators.asof import asof_join


def _ts(s):
    return f"2024-01-01 00:00:{s:02d}"


def test_asof_picks_most_recent_at_or_before(spark):
    left = spark.createDataFrame(
        [Row(k="u", ts=_ts(5), ev="a"), Row(k="u", ts=_ts(10), ev="b"),
         Row(k="u", ts=_ts(2), ev="c")],
        "k string, ts string, ev string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [Row(k="u", ts=_ts(3), px=30.0), Row(k="u", ts=_ts(7), px=70.0)],
        "k string, ts string, px double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["ev"]: r["px_asof"] for r in asof_join(left, right, "k", "ts", ["px"]).collect()}
    assert out == {"c": None, "a": 30.0, "b": 70.0}


def test_asof_equal_timestamp_is_inclusive(spark):
    left = spark.createDataFrame(
        [Row(k="u", ts=_ts(3), ev="same")], "k string, ts string, ev string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [Row(k="u", ts=_ts(3), px=1.0)], "k string, ts string, px double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join(left, right, "k", "ts", ["px"]).collect()
    assert out[0]["px_asof"] == 1.0  # at-or-before, not strictly-before


def test_asof_respects_key_partitions(spark):
    left = spark.createDataFrame(
        [Row(k="a", ts=_ts(9), ev="x"), Row(k="b", ts=_ts(9), ev="y")],
        "k string, ts string, ev string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [Row(k="a", ts=_ts(1), px=10.0)], "k string, ts string, px double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["ev"]: r["px_asof"] for r in asof_join(left, right, "k", "ts", ["px"]).collect()}
    assert out == {"x": 10.0, "y": None}  # no cross-key leakage


def test_asof_tied_right_rows_resolve_deterministically(spark):
    """Two right rows at the same (key, ts): the greatest value tuple
    wins, independent of partitioning/sort nondeterminism."""
    left = spark.createDataFrame(
        [Row(k="u", ts=_ts(5), ev="e")], "k string, ts string, ev string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [Row(k="u", ts=_ts(2), px=10.0), Row(k="u", ts=_ts(2), px=99.0)],
        "k string, ts string, px double",
    ).withColumn("ts", F.to_timestamp("ts"))
    for _ in range(3):
        out = asof_join(left, right, "k", "ts", ["px"]).collect()
        assert out[0]["px_asof"] == 99.0


def test_asof_tied_rows_attach_wholesale(spark):
    """Tie-heavy fixture, multiple value columns: the winning right row
    attaches as a unit. (10.0, qty=5) vs (99.0, qty=1) at the same
    (key, ts) — the greatest struct is (99.0, 1), so qty_asof must be 1,
    never a per-column blend like (99.0, 5). A third NULL-px row at the
    same instant must not poison the carry either (struct-carry, not
    per-column last(ignorenulls))."""
    left = spark.createDataFrame(
        [Row(k="u", ts=_ts(5), ev="e"), Row(k="v", ts=_ts(5), ev="f")],
        "k string, ts string, ev string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            Row(k="u", ts=_ts(2), px=10.0, qty=5),
            Row(k="u", ts=_ts(2), px=99.0, qty=1),
            # NULL px sorts before non-NULL in ascending struct order,
            # so it never wins a tie — but its qty must not leak
            Row(k="u", ts=_ts(2), px=None, qty=777),
            # key v: only a NULL-px row; it still attaches wholesale
            Row(k="v", ts=_ts(2), px=None, qty=42),
        ],
        "k string, ts string, px double, qty int",
    ).withColumn("ts", F.to_timestamp("ts"))
    for _ in range(3):
        out = {
            r["ev"]: (r["px_asof"], r["qty_asof"])
            for r in asof_join(left, right, "k", "ts", ["px", "qty"]).collect()
        }
        assert out == {"e": (99.0, 1), "f": (None, 42)}


def test_asof_plan_has_exactly_one_exchange(spark, sf_dir):
    """Scale posture: the union+window as-of join shuffles ONCE (on the
    key) — no range-join blowup, no second exchange for tie handling."""
    from flink_kakfa_spark.registry import all_queries

    df = all_queries()["asof_last_purchase"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = plan.count("Exchange ") + plan.count("Exchange(")
    reuses = plan.count("ReusedExchange")
    assert exchanges - reuses == 1, f"expected 1 shuffle, plan:\n{plan}"
