"""Additional TPC-H-shaped analytics (Tier C relational breadth).

Eight classic query shapes beyond the q1/q3/q5 equivalents already in
``joins.py``/``relational.py``, adapted to the fixture star schema
(no partsupp table — unit price stands in for supply cost):

- q2-shape:  correlated MIN subquery (Catalyst decorrelates to a
  per-group min + self-join; the oracle states the correlated form)
- q4-shape:  EXISTS with a cross-table predicate → left-semi join
- q8-shape:  market share — conditional aggregation over a star join
- q10-shape: top returned-revenue customers
- q12-shape: priority-class conditional counts per line status
- q14-shape: promo revenue share (global decimal-conditional agg)
- q18-shape: large-quantity orders via a grouped HAVING semi-join
- q19-shape: OR-of-ANDs predicates spanning both join sides

Scale notes: every dim side is broadcast; the fact table shuffles at
most once per aggregate grain; the q2 decorrelation turns a
per-row subquery into one extra aggregate + broadcast join rather
than N subquery executions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table


@query(
    "tpch_q2_min_unit_price",
    oracle="""
    WITH up AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(l.l_extendedprice / l.l_quantity) AS unit_price
      FROM lineitem l
      GROUP BY l.l_partkey, l.l_suppkey
    )
    SELECT p.p_type, p.p_partkey, s.s_name,
           u.unit_price AS best_unit_price
    FROM up u
    JOIN part p ON u.l_partkey = p.p_partkey
    JOIN supplier s ON u.l_suppkey = s.s_suppkey
    WHERE u.unit_price = (
      SELECT MIN(u2.unit_price) FROM up u2 WHERE u2.l_partkey = u.l_partkey
    )
    """,
)
def q_tpch_q2_min_unit_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 shape: per part, the supplier(s) with the lowest unit price.

    The oracle keeps TPC-H q2's correlated-subquery formulation; the
    Spark side is the decorrelated plan you actually want — compute
    the per-part minimum once and broadcast-join it back.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    up = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    best = up.groupBy("l_partkey").agg(F.min("unit_price").alias("best"))
    return (
        up.join(F.broadcast(best), "l_partkey")
        .filter(F.col("unit_price") == F.col("best"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_type",
            "p_partkey",
            "s_name",
            # raw double, deliberately un-rounded: both engines derive it
            # from the same IEEE division + MIN, so values are
            # bit-identical, while ROUND at a .xxxx5 boundary is not
            F.col("unit_price").alias("best_unit_price"),
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT
      CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
      ROUND(
        CAST(SUM(CASE WHEN n.n_name = 'NATION_0' THEN
              CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
              ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(18,6))) AS DOUBLE), 4) AS mkt_share
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8 shape: one nation's share of yearly revenue (conditional agg).

    Decimal-exact revenue sums (like ``agg_pricing_summary``) so the
    share is deterministic; the final division is rounded.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("n_name") == "NATION_0", rev).otherwise(
                        F.lit(0).cast("decimal(18,6)")
                    )
                ).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q10_returned_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(18,6))) AS DOUBLE), 2) AS lost_revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q_tpch_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10 shape: top-20 customers by revenue on returned items."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "tpch_q18_big_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE l.l_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150
    )
    GROUP BY c.c_custkey, o.o_orderkey
    """,
)
def q_tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18 shape: orders whose total quantity clears a threshold.

    The IN-subquery becomes a left-semi join against the grouped
    HAVING aggregate — one extra aggregate over the fact, no
    correlated execution.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
    )


@query(
    "tpch_q4_late_shipments",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q4_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4 shape: priority census of orders with a late-shipping item.

    EXISTS compiles to a left-semi join on the order key; the
    ship-after-order predicate rides the join condition, so the fact
    table is filtered in one pass — no distinct, no subquery loop.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        o.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "tpch_q12_priority_by_linestatus",
    oracle="""
    SELECT
      l.l_linestatus,
      CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_linestatus
    """,
)
def q_tpch_q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12 shape: priority-class line counts per line status."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_share",
    oracle="""
    SELECT
      ROUND(
        CAST(100.0 * SUM(CASE WHEN p.p_type = 'PROMO' THEN
              CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
              ELSE CAST(0 AS DECIMAL(18,6)) END)
        / SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
        AS DOUBLE), 4) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def q_tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14 shape: promo parts' percentage of total revenue (global agg).

    Decimal-exact conditional sums; the part side is broadcast.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                (
                    F.lit(100.0)
                    * F.sum(
                        F.when(F.col("p_type") == "PROMO", rev).otherwise(
                            F.lit(0).cast("decimal(18,6)")
                        )
                    )
                    / F.sum(rev)
                ).cast("double"),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q19_disjunctive_predicates",
    oracle="""
    SELECT
      ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE
      (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
        AND l.l_quantity BETWEEN 1 AND 20)
      OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 10 AND 30
        AND l.l_quantity BETWEEN 10 AND 35)
      OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 20 AND 50
        AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q_tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q19 shape: OR-of-ANDs across both join sides.

    Catalyst extracts the common join key and pushes the per-side
    conjuncts below the join where possible; the disjunction rides the
    join filter. One broadcast join, one global agg.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q7_nation_volume",
    oracle="""
    SELECT
      n1.n_name AS supp_nation,
      n2.n_name AS cust_nation,
      CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
      ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                           AND TIMESTAMP '1996-12-31 23:59:59'
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q7 shape: shipping volume between two nations, by direction and
    year.

    Two independent nation joins (supplier side / customer side) with
    a disjunctive cross-side pair predicate. All three dims broadcast;
    the fact table shuffles once for the 3-key aggregate. At 100 TB
    the pair predicate prunes at the join (both nation sides filter to
    the two named nations before the fact join, so only matching
    supplier/customer keys reach the probe side).
    """
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    pair = ("NATION_3", "NATION_8")
    n1 = n.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.filter(
            F.col("l_shipdate").between("1995-01-01 00:00:00", "1996-12-31 23:59:59")
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
    )


@query(
    "tpch_q16_supplier_relationship",
    oracle="""
    SELECT
      p.p_brand,
      p.p_type,
      CASE WHEN p.p_size < 10 THEN 'small'
           WHEN p.p_size < 25 THEN 'medium'
           ELSE 'large' END AS size_class,
      CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type <> 'ECONOMY'
      AND l.l_suppkey NOT IN (
        SELECT s.s_suppkey FROM supplier s WHERE s.s_acctbal < 1000
      )
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 shape: distinct suppliers per (brand, type, size class),
    excluding a NOT-IN supplier set.

    The fixture schema has no partsupp, so lineitem stands in as the
    part-supplier relationship (same join/agg/anti-join shape). The
    NOT IN subquery becomes a broadcast left-anti join (the excluded
    set is tiny by construction); COUNT(DISTINCT) shuffles the fact
    side once on the group keys with the distinct folded into the
    aggregate. p_type filter pushes to the part scan.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    excluded = s.filter(F.col("s_acctbal") < 1000).select("s_suppkey")
    size_class = (
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 25, "medium")
        .otherwise("large")
    )
    return (
        li.join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(
            F.broadcast(p.filter(F.col("p_type") != "ECONOMY")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", size_class.alias("size_class"))
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )
