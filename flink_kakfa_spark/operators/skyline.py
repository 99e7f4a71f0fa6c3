"""Skyline (Pareto-frontier) queries (Tier C extension; round 6).

The reference computes nothing downstream of its topic (the consumer
stops at a log line, ``go/consumer/consumer.go:79-81``); a skyline is
the classic "multi-criteria shortlist" report a catalog team runs over
exactly this kind of product table: the parts for which no other part
is at least as cheap AND at least as large, with one strict — the
non-dominated set of (minimize price, maximize size).

Scale posture (the part table at 100 TB):

- The naive definition is a quadratic self-join (the oracle keeps that
  form as the spec). The engine plan is the standard two-phase
  distributed skyline: REDUCE FIRST — collapse to one row per distinct
  price with ``MAX(p_size)`` (a single map-side-combinable groupBy;
  output is at most |distinct prices| rows, KB-sized at any corpus
  size because dominated sizes die inside every partition), THEN a
  single ordered sweep over that tiny aggregate (one window whose
  input is the aggregate, never the facts), THEN a broadcast semi-join
  back to the facts to recover every tied row. The fact table is
  scanned once and shuffled once (on price, pre-combined).
- The sweep-over-aggregate trick is exact, not approximate: a part is
  non-dominated iff its size equals the max size at its price AND no
  strictly-cheaper price reaches that size — both are properties of
  the (price, max_size) aggregate alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table


@query(
    "pareto_frontier_parts",
    oracle="""
    SELECT
      CAST(p.p_partkey AS BIGINT) AS p_partkey,
      p.p_name,
      p.p_retailprice,
      CAST(p.p_size AS INT) AS p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    ORDER BY p.p_retailprice, p.p_partkey
    """,
)
def q_pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts: minimize ``p_retailprice``, maximize
    ``p_size``; ties (identical price+size) all survive, as neither
    strictly dominates the other.

    Engine plan (vs the oracle's quadratic NOT EXISTS spec): collapse
    to (price, max_size) — at most |distinct prices| rows — sweep that
    aggregate once with a running strict-predecessor max (LAG of the
    cumulative max, so equal prices share one aggregate row and the
    strictness of "cheaper" is exact), keep prices whose max size
    strictly exceeds every cheaper price's, then broadcast the
    surviving (price, size) pairs back onto the fact table to recover
    all tied part rows. One fact shuffle, one KB-sized window, one
    broadcast join — survives any scale at which |distinct prices|
    stays driver-broadcastable (and degrades to a two-level recursive
    collapse if not).
    """
    parts = load_table(spark, "part", sf_dir)
    by_price = parts.groupBy("p_retailprice").agg(
        F.max("p_size").alias("best_size")
    )
    w = Window.orderBy("p_retailprice")
    cum = F.max("best_size").over(
        w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    frontier = (
        by_price.withColumn("cum_best", cum)
        # strict predecessor max: the cumulative max of the PREVIOUS
        # price row (prices are distinct after the groupBy, so LAG(1)
        # is exactly "over all strictly cheaper prices").
        .withColumn("prev_best", F.lag("cum_best", 1).over(w))
        .filter(
            F.col("prev_best").isNull()
            | (F.col("best_size") > F.col("prev_best"))
        )
        .select(
            F.col("p_retailprice").alias("f_price"),
            F.col("best_size").alias("f_size"),
        )
    )
    return (
        parts.join(
            F.broadcast(frontier),
            (F.col("p_retailprice") == F.col("f_price"))
            & (F.col("p_size") == F.col("f_size")),
        )
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )
