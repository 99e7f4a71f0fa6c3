"""MERGE operator semantics on micro-fixtures."""

from __future__ import annotations

from pyspark.sql import Row

from flink_kakfa_spark.operators.merge import merge_scd1, merge_scd2


def test_scd1_upsert_semantics(spark):
    target = spark.createDataFrame(
        [Row(k=1, v="old1"), Row(k=2, v="old2")]
    )
    source = spark.createDataFrame(
        [Row(k=2, v="new2"), Row(k=3, v="new3")]
    )
    out = {r["k"]: r["v"] for r in merge_scd1(target, source, "k").collect()}
    assert out == {1: "old1", 2: "new2", 3: "new3"}


def test_scd2_keeps_history(spark):
    target = spark.createDataFrame(
        [
            Row(k=1, v="a", version=1, is_current=1),
            Row(k=2, v="b", version=1, is_current=1),
        ]
    )
    source = spark.createDataFrame([Row(k=2, v="b2"), Row(k=3, v="c")])
    rows = merge_scd2(target, source, "k").collect()
    by = {(r["k"], r["version"]): (r["v"], r["is_current"]) for r in rows}
    assert by[(1, 1)] == ("a", 1)      # untouched stays current
    assert by[(2, 1)] == ("b", 0)      # superseded version closed
    assert by[(2, 2)] == ("b2", 1)     # new current version
    assert by[(3, 1)] == ("c", 1)      # brand-new key starts at v1
    assert len(rows) == 4


def test_scd2_idempotent_reapply_grows_version(spark):
    target = spark.createDataFrame([Row(k=1, v="a", version=1, is_current=1)])
    source = spark.createDataFrame([Row(k=1, v="a2")])
    once = merge_scd2(target, source, "k")
    twice = merge_scd2(once, spark.createDataFrame([Row(k=1, v="a3")]), "k")
    current = [r for r in twice.collect() if r["is_current"] == 1]
    assert len(current) == 1
    assert current[0]["v"] == "a3" and current[0]["version"] == 3


def test_scd1_source_null_overwrites(spark):
    """A matched source row SETs columns to NULL — the match is decided
    by key presence, never per-column COALESCE fallback."""
    target = spark.createDataFrame([Row(k=1, v="old")])
    source = spark.createDataFrame([Row(k=1, v=None)], "k bigint, v string")
    out = merge_scd1(target, source, "k").collect()
    assert len(out) == 1 and out[0]["v"] is None
