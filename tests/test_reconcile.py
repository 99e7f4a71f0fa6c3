"""Reconciliation operators: order-independence, change detection,
and diff classification invariants."""

from __future__ import annotations

from pyspark.sql import Row

from flink_kakfa_spark.registry import all_queries


def _manifest(spark, sf_dir):
    return {
        r["shard"]: (r["n_rows"], r["sum_hash"], r["xor_hash"])
        for r in all_queries()["reconcile_table_checksum"](
            spark, sf_dir
        ).collect()
    }


def test_checksum_is_partitioning_independent(spark, sf_dir, tmp_path):
    """The same rows written in a different order / split must produce
    an identical manifest (the commutative-accumulator claim)."""
    base = _manifest(spark, sf_dir)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        o.orderBy("o_totalprice")
        .repartition(7)
        .write.parquet(str(tmp_path / "orders.parquet"))
    )
    assert _manifest(spark, str(tmp_path)) == base


def test_checksum_localizes_a_single_row_change(spark, sf_dir, tmp_path):
    """Flipping one row's price must change EXACTLY the shard that row
    hashes to, and leave every other shard's triple untouched."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    victim = o.orderBy("o_orderkey").first()
    from pyspark.sql import functions as F

    mutated = o.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") == victim["o_orderkey"],
            F.col("o_totalprice") + 1.0,
        ).otherwise(F.col("o_totalprice")),
    )
    mutated.write.parquet(str(tmp_path / "orders.parquet"))
    base = _manifest(spark, sf_dir)
    got = _manifest(spark, str(tmp_path))
    diff_shards = [s for s in base if base[s] != got[s]]
    assert diff_shards == [victim["o_orderkey"] % 16]
    # row count in the touched shard is unchanged — only hashes moved
    s = diff_shards[0]
    assert base[s][0] == got[s][0]


def test_snapshot_diff_classes_match_construction(spark, sf_dir):
    rows = {
        r["change_type"]: r
        for r in all_queries()["reconcile_snapshot_diff"](
            spark, sf_dir
        ).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys = [r["o_orderkey"] for r in o.select("o_orderkey").collect()]
    v1 = {k for k in keys if k % 3 == 0}
    assert rows["removed"]["n_rows"] == len([k for k in v1 if k % 15 == 0])
    assert rows["added"]["n_rows"] == len(
        [k for k in keys if k % 3 == 1 and k % 5 == 0]
    )
    assert rows["changed"]["n_rows"] == len(
        [k for k in v1 if k % 6 == 0 and k % 15 != 0]
    )
    total = sum(r["n_rows"] for r in rows.values())
    assert total == len(v1) + rows["added"]["n_rows"]
    # updates add exactly +100 per changed row; adds/removes contribute
    # their full prices, unchanged contributes zero drift
    assert float(rows["changed"]["sum_price_delta"]) == 100.0 * rows[
        "changed"
    ]["n_rows"]
    assert float(rows["unchanged"]["sum_price_delta"]) == 0.0


def test_path_sequences_on_hand_fixture(spark, tmp_path):
    """Two users share a path, one diverges, one has < 5 events —
    paths and counts must match the hand model."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    evs = []

    def add(uid, types):
        for i, et in enumerate(types):
            evs.append(
                Row(
                    event_id=len(evs),
                    ts=t0 + dt.timedelta(minutes=i),
                    user_id=uid,
                    event_type=et,
                    value=0.0,
                    props="{}",
                )
            )

    add(1, ["signup", "click", "purchase", "click", "logout", "extra"])
    add(2, ["signup", "click", "purchase", "click", "logout"])
    add(3, ["signup", "error"])
    spark.createDataFrame(evs).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["path"]: r["n_users"]
        for r in all_queries()["path_top_sequences"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        "signup>click>purchase>click>logout": 2,  # 6th event truncated
        "signup>error": 1,
    }


def test_checksum_null_fields_do_not_field_shift(spark):
    """Regression: CONCAT_WS silently skips NULL arguments, so without
    an explicit '<NULL>' sentinel two distinct rows whose non-null
    fields line up after the null drops out render identically —
    e.g. (status=NULL, priority='X') vs (status='X', priority=NULL).
    Their row hashes (and thus single-row manifests) must differ."""
    import datetime as dt

    from flink_kakfa_spark.operators.reconcile import manifest_partial

    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_orderpriority string, o_totalprice double, o_orderdate date"
    )

    def one_row_manifest(status, priority):
        df = spark.createDataFrame(
            [(1, 2, status, priority, 10.0, dt.date(2024, 1, 1))], schema
        )
        r = manifest_partial(df).collect()[0]
        return (r["n_rows"], r["sum_hash"], r["xor_hash"])

    a = one_row_manifest(None, "X")
    b = one_row_manifest("X", None)
    assert a != b
    # and NULLs are deterministic, not poisonous: same input, same hash
    assert one_row_manifest(None, "X") == a
