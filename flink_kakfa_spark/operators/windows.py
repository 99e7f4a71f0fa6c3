"""Analytic window functions (SURVEY.md §2.5, W1–W5). All Tier C.

Scale notes (100 TB): every window here partitions by a key
(customer/user) before ordering, so the physical plan is
hash-shuffle-on-key + in-partition sort — never a single-node global
sort. Frames that sum doubles route through DECIMAL so running totals
are bit-deterministic vs the oracle (segment-tree vs sequential
accumulation would otherwise diverge in float).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table


@query(
    "window_topk_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT
        o_custkey AS c_custkey,
        o_orderkey,
        o_totalprice,
        ROW_NUMBER() OVER (
          PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC
        ) AS rk
      FROM orders
    )
    WHERE rk <= 3
    """,
)
def q_window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W5: top-3 orders per customer via row_number."""
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@query(
    "window_rank_dense_rank",
    oracle="""
    SELECT
      c_custkey,
      c_acctbal,
      RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_rank,
      DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_dense_rank,
      c_mktsegment
    FROM customer
    """,
)
def q_window_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: rank / dense_rank over account balance per segment."""
    c = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        "c_mktsegment",
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT
      event_id,
      user_id,
      value,
      LAG(value, 1)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: lag/lead over each user's event timeline."""
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
    )


@query(
    "window_running_total",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: running per-customer spend (rows frame), decimal-exact."""
    o = load_table(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "window_ntile_percentiles",
    oracle="""
    SELECT
      c_custkey,
      NTILE(4) OVER w AS quartile,
      CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
      CAST(CUME_DIST() OVER w AS DOUBLE) AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def q_window_ntile_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: ntile / percent_rank / cume_dist over the balance ordering.

    Unpartitioned window — acceptable here because customer is the
    bounded table; at scale you'd partition or pre-bucket first.
    """
    c = load_table(spark, "customer", sf_dir)
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cume"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT
      o_orderkey,
      o_totalprice,
      COUNT(*) OVER (
        PARTITION BY o_custkey
        ORDER BY o_totalprice
        RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING
      ) AS n_similar_price
    FROM orders
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: RANGE frame — peers within ±1000 of each order's price."""
    o = load_table(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-1000, 1000)
    )
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_similar_price"),
    )
