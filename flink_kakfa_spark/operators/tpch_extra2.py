"""TPC-H completion block: the nine query shapes not yet covered.

With this module every TPC-H query shape (q1-q22) has a fixture-schema
equivalent: q1/q3/q5 live in ``relational.py``/``joins.py``, q2/q4/q7/
q8/q10/q12/q14/q16/q18/q19 in ``tpch_extra.py``, and q6/q9/q11/q13/
q15/q17/q20/q21/q22 here. Adaptations forced by the fixture schema
(TESTDATA.md; no partsupp, no l_commitdate/l_receiptdate, no c_phone):

- q9:  supply cost stands in as ``0.6 * p_retailprice * l_quantity``
- q20: "available quantity" becomes a shipped-quantity threshold
- q21: "received after commit date" becomes shipped >60 days after the
  order date
- q22: country code is ``c_nationkey`` instead of a phone prefix

Determinism rules (driver value-hash must agree with DuckDB bit-wise):
every SUM over doubles is cast to DECIMAL(18,6) per-term on BOTH
sides; every average that feeds a *comparison* is computed as
``CAST(exact-decimal-sum AS DOUBLE) / COUNT(*)`` so both engines
divide the identical dividend by the identical divisor (a plain
AVG(double) is summation-order-dependent and could flip a filter);
output doubles are ROUNDed; counts CAST to BIGINT (DuckDB HUGEINT
trap, tools/oracle_lint.py).

Scale notes are per-query docstrings; the common posture: dims
broadcast, the fact table shuffles once per aggregate grain, and every
correlated subquery is decorrelated into one extra aggregate + join
rather than a per-row execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table


def _rev():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT
      ROUND(CAST(SUM(CAST(l.l_extendedprice * l.l_discount
                 AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_discount BETWEEN 0.05 AND 0.07
      AND l.l_quantity < 24
    """,
)
def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q6: discount-forecast revenue — pure scan + filter + global agg.

    The simplest TPC-H query and the purest scan-efficiency probe: all
    three predicates push to the Parquet scan (`PushedFilters`), only
    three columns are read, and the single global aggregate has a
    map-side partial — at 100 TB this is I/O-bound by construction,
    which is exactly what q6 is for.
    """
    li = load_table(spark, "lineitem", sf_dir)
    disc_rev = (F.col("l_extendedprice") * F.col("l_discount")).cast(
        "decimal(18,6)"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01 00:00:00")
            & (F.col("l_shipdate") < "1996-01-01 00:00:00")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(disc_rev).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT
      n.n_name AS nation,
      CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS o_year,
      ROUND(CAST(SUM(
        CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
        - CAST(0.6 * p.p_retailprice * l.l_quantity AS DECIMAL(18,6))
      ) AS DOUBLE), 2) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%e%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9: profit by supplier nation and year.

    Supply cost stands in as ``0.6 * p_retailprice * l_quantity`` (the
    fixture has no partsupp; the multiply order is pinned identically
    on both sides so the IEEE product is bit-equal before the decimal
    cast). part/supplier/nation all broadcast; the p_name LIKE filter
    prunes the part build side before broadcast; one fact shuffle at
    the (nation, year) grain.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    cost = (F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")).cast(
        "decimal(18,6)"
    )
    return (
        li.join(
            F.broadcast(p.filter(F.col("p_name").like("%e%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.round(F.sum(_rev() - cost).cast("double"), 2).alias("profit"))
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS part_value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey,
           ROUND(CAST(part_value AS DOUBLE), 2) AS part_value
    FROM val
    WHERE CAST(part_value AS DOUBLE)
          > (SELECT CAST(SUM(part_value) AS DOUBLE) * 0.001 FROM val)
    """,
)
def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11: parts whose one-nation value clears a global-fraction bar.

    The scalar subquery (0.1% of total value) is a 1-row aggregate
    attached by broadcast cross join — computed once, not per row. The
    threshold comparison happens in DOUBLE derived from the exact
    decimal sums so both engines compare identical IEEE values. The
    ``val`` CTE is computed once and reused for both the rows and the
    total (Spark sees it as one shuffle + a ReusedExchange).
    """
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    nat = n.filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    val = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("pv"))
    )
    total = val.agg((F.sum("pv").cast("double") * F.lit(0.001)).alias("bar"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("pv").cast("double") > F.col("bar"))
        .select(
            "l_partkey",
            F.round(F.col("pv").cast("double"), 2).alias("part_value"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
)
def q_tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13: histogram of per-customer order counts, zeros included.

    The left outer join keeps order-less customers (COUNT of a NULL
    column is 0 — the whole point of q13); the priority exclusion
    rides the join condition, NOT the WHERE clause, so it cannot turn
    the outer join inner. Two aggregates: the first at customer grain
    (the only fact shuffle), the second over one row per customer —
    negligible. At 100 TB the orders side shuffles on o_custkey; AQE
    handles the mega-customer skew tail.
    """
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l.l_suppkey,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(18,6))) AS total_rev
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1995-04-01 00:00:00'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           ROUND(CAST(r.total_rev AS DOUBLE), 2) AS total_rev
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15: the supplier(s) with maximum quarterly revenue.

    The view + scalar-MAX formulation decorrelates to: one supplier-
    grain aggregate (exact decimal, so the equality join on the max is
    safe — doubles would make ties nondeterministic), a 1-row MAX
    attached by broadcast cross join, and a broadcast supplier lookup.
    Ties are kept, as the spec requires.
    """
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01 00:00:00")
            & (F.col("l_shipdate") < "1995-04-01 00:00:00")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("tr"))
    )
    best = rev.agg(F.max("tr").alias("best"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("tr") == F.col("best"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("tr").cast("double"), 2).alias("total_rev"),
        )
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT
      ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6)))
            AS DOUBLE) / 7.0, 2) AS avg_yearly,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < 0.2 * pa.avg_qty
    """,
)
def q_tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17: revenue from below-average-quantity lines of one brand.

    The correlated per-part AVG decorrelates to one part-grain
    aggregate joined back to the fact. The average is deliberately
    ``exact-decimal-sum cast to double / count`` — NOT ``AVG(double)``,
    whose summation order differs between engines and would flip rows
    sitting exactly at the 0.2x boundary. At 100 TB: the part filter
    broadcasts; the per-part aggregate is the one extra fact pass, and
    it shuffles only (l_partkey, sum, count).
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li.join(
            F.broadcast(p.filter(F.col("p_brand") == "Brand#1")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(pa, F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.lit(7.0),
                2,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q20_potential_promotion",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
      )
      GROUP BY l.l_suppkey
      HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,6))) > 2000
    )
    ORDER BY s.s_suppkey
    """,
)
def q_tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20: suppliers who shipped a meaningful volume of promo parts.

    Nested IN-subqueries compile to two semi joins: the part-name
    filter broadcasts into a left-semi against the fact, the grouped
    HAVING set semi-joins into supplier. Quantity accumulates in exact
    decimal so the >100 bar cannot flip on summation order. No
    partsupp in the fixture, so "available quantity" is re-read as
    shipped quantity — same plan shape as the original.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    promo_parts = p.filter(F.col("p_name").like("red%")).select("p_partkey")
    heavy = (
        li.join(
            F.broadcast(promo_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("tq"))
        .filter(F.col("tq") > 2000)
        .select("l_suppkey")
    )
    return (
        s.join(
            F.broadcast(heavy),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 20
    """,
)
def q_tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21: suppliers who were the sole late shipper on shared orders.

    The EXISTS / NOT-EXISTS pair re-expresses as ONE order-grain
    aggregate: per order, the distinct supplier count and the distinct
    LATE supplier count. A late line qualifies iff its order has >=2
    suppliers and exactly 1 late supplier (itself — it is late by the
    outer predicate). That turns two correlated subqueries into a
    single extra shuffle at order grain, joined back broadcast-free on
    the already-partitioned order key. Lateness ("shipped >60 days
    after ordering") stands in for the missing commit/receipt dates.
    (s_name, numwait) is a total order (names unique), so LIMIT 20 is
    deterministic.
    """
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    lo = (
        li.join(
            o.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn("is_late", late)
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("nsupp"),
        F.count_distinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "nlate"
        ),
    )
    return (
        lo.filter(F.col("is_late"))
        .join(per_order, F.col("l_orderkey") == F.col("g_orderkey"))
        .filter((F.col("nsupp") >= 2) & (F.col("nlate") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    SELECT
      CAST(c.c_nationkey AS INTEGER) AS cntrycode,
      CAST(COUNT(*) AS BIGINT) AS numcust,
      ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6)))
            AS DOUBLE), 2) AS totacctbal
    FROM customer c
    WHERE c.c_nationkey IN (0, 1, 2, 3, 4)
      AND c.c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*)
        FROM customer c2
        WHERE c2.c_acctbal > 0 AND c2.c_nationkey IN (0, 1, 2, 3, 4)
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY 1
    """,
)
def q_tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22: rich urgent-order-less customers by country code.

    ``c_nationkey`` stands in for the phone-prefix country code. Three
    classic decorrelations in one query: the scalar AVG becomes a
    1-row broadcast cross join (exact-sum/count, same IEEE division on
    both engines); NOT EXISTS (no urgent order — every fixture customer has
    SOME order) becomes a filtered left-anti join on orders; the
    IN-list pushes to the customer scan. The anti join's orders side
    only needs o_custkey — column pruning leaves a single-column
    shuffle at 100 TB.
    """
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    sel = c.filter(F.col("c_nationkey").isin(0, 1, 2, 3, 4))
    bar = sel.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("bar")
    )
    return (
        sel.crossJoin(F.broadcast(bar))
        .filter(F.col("c_acctbal") > F.col("bar"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double"),
                2,
            ).alias("totacctbal"),
        )
    )
