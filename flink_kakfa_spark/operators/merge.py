"""MERGE / upsert operators (engine completeness: OSS Spark has no
MERGE INTO without a table format like Delta/Iceberg, so the engine
provides the relational formulation).

- SCD1 (overwrite): full outer join on the key, source wins.
- SCD2 (history): close the previous version, append the new one.

Both are pure DataFrame transforms — at 100 TB they pair with
partition-overwrite writes (``sources/io.py``): compute the merged
partitions, overwrite only those (foreachBatch does the same for
streaming upserts, tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table


def merge_scd1(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Upsert: source rows replace target rows on key; inserts kept.

    Column set is taken from the target; the source must contain the
    same columns. Matched rows take EVERY source column — including
    NULLs (a source row may legitimately SET a column to NULL), so the
    match test is on the join key, never per-column COALESCE.
    """
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    matched = F.col(f"s.{key}").isNotNull()
    return joined.select(
        *[
            F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in target.columns
        ]
    )


def merge_scd2(
    target: DataFrame,
    source: DataFrame,
    key: str,
    version_col: str = "version",
    current_col: str = "is_current",
) -> DataFrame:
    """History-preserving merge: updated keys get a new current version;
    superseded versions stay with ``is_current = 0``."""
    updated_keys = source.select(key).distinct()
    closed = (
        target.join(updated_keys, key, "left_semi")
        .withColumn(current_col, F.lit(0))
    )
    untouched = target.join(updated_keys, key, "left_anti")
    max_ver = (
        target.groupBy(key).agg(F.max(version_col).alias("_prev_ver"))
    )
    fresh = (
        source.join(max_ver, key, "left")
        .withColumn(version_col, F.coalesce(F.col("_prev_ver") + 1, F.lit(1)))
        .drop("_prev_ver")
        .withColumn(current_col, F.lit(1))
    )
    return untouched.unionByName(closed).unionByName(
        fresh.select(*untouched.columns)
    )


@query(
    "merge_scd1_orders",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey % 3 = 0
    ),
    source AS (
      SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
      FROM orders WHERE o_orderkey % 6 = 0
    )
    SELECT
      CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderkey ELSE t.o_orderkey END AS o_orderkey,
      CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
      CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice
    FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
    """,
)
def q_merge_scd1_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 upsert: a batch of order amendments merged over a target.

    Source = every 6th order re-priced (+1000, status X); target =
    every 3rd order. Updates overwrite, unmatched targets survive —
    the oracle is the FULL OUTER JOIN definition of MERGE.
    """
    o = load_table(spark, "orders", sf_dir)
    target = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    source = o.filter(F.col("o_orderkey") % 6 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
    )
    return merge_scd1(target, source, "o_orderkey")


def merge_scd3(
    target: DataFrame,
    source: DataFrame,
    key: str,
    col: str,
    prev_col: str,
) -> DataFrame:
    """SCD type 3 merge: limited history IN the row. The target carries
    (key, col, prev_col); an update whose value actually changes moves
    the old value into ``prev_col`` and overwrites ``col``; a no-op
    update (same value) leaves ``prev_col`` alone; an insert lands with
    NULL ``prev_col``; unmatched target rows pass through. One
    key-partitioned full-outer join — the same MERGE skeleton as SCD1,
    plus the shift rule.
    """
    t = target.select(
        F.col(key).alias("_tk"),
        F.col(col).alias("_tv"),
        F.col(prev_col).alias("_tp"),
    )
    s = source.select(F.col(key).alias("_sk"), F.col(col).alias("_sv"))
    j = t.join(s, F.col("_tk") == F.col("_sk"), "full_outer")
    changed = (
        F.col("_sk").isNotNull()
        & F.col("_tk").isNotNull()
        & ~F.col("_sv").eqNullSafe(F.col("_tv"))
    )
    return j.select(
        F.coalesce(F.col("_sk"), F.col("_tk")).alias(key),
        F.coalesce(F.col("_sv"), F.col("_tv")).alias(col),
        F.when(changed, F.col("_tv")).otherwise(F.col("_tp")).alias(prev_col),
    )


@query(
    "merge_scd3_orders",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, CAST(NULL AS VARCHAR) AS prev_status
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    source AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 4 = 0 THEN o_orderstatus ELSE 'X' END
               AS o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT
      CAST(COALESCE(s.o_orderkey, t.o_orderkey) AS BIGINT) AS o_orderkey,
      COALESCE(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
      CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NOT NULL
                AND s.o_orderstatus IS DISTINCT FROM t.o_orderstatus
           THEN t.o_orderstatus ELSE t.prev_status END AS prev_status
    FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
    """,
)
def q_merge_scd3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD3 merge over orders: target = every 3rd order (no history
    yet); source = every 2nd order re-statused to 'X', EXCEPT every 4th
    which resubmits its current status (the no-op-update case). The
    expected states all occur: changed updates (prev = old status),
    no-op updates (prev stays NULL), inserts (keys %2 but not %3, prev
    NULL), and pass-through targets (%3 but not %2).

    Scale: one full-outer hash join on the key — at 100 TB this is the
    MERGE both sides bucket on; SCD3 specifically avoids SCD2's row
    explosion when only one generation of history is required.
    """
    o = load_table(spark, "orders", sf_dir)
    target = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.lit(None).cast("string").alias("prev_status"),
    )
    source = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 4 == 0, F.col("o_orderstatus"))
        .otherwise(F.lit("X"))
        .alias("o_orderstatus"),
    )
    return merge_scd3(
        target, source, "o_orderkey", "o_orderstatus", "prev_status"
    ).select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        "o_orderstatus",
        "prev_status",
    )
