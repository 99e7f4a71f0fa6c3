"""Join operators (SURVEY.md §2.3, J1–J8). All Tier C.

The reference contains no joins (only ``strings.Join`` string concat at
``go/producer/producer.go:137``); these are anchored on the driver's
star schema: lineitem⋈orders⋈customer⋈nation⋈region, lineitem⋈part,
lineitem⋈supplier.

Scale notes (100 TB):
- Dimension tables (region 5, nation 25, supplier bounded) get explicit
  ``broadcast()`` hints — no shuffle of the fact table for those edges;
  AQE would also pick this up dynamically, the hint makes it a
  guarantee.
- Fact⋈fact (lineitem⋈orders) is a shuffle hash / sort-merge join on
  the key both sides; AQE handles skew splitting
  (``spark.sql.adaptive.skewJoin``).
- The range join (J7) is an equi-join on user_id with a residual time
  predicate — Catalyst keeps the equi-key in the shuffle and applies
  the range as a post-join filter, so it never degenerates to a
  cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from flink_kakfa_spark.functions.numeric import dsum, sql_dsum
from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table, parallelize


@query(
    "join_inner_revenue",
    oracle=f"""
    SELECT
      o.o_orderstatus,
      {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
      COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def q_join_inner_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: fact⋈fact inner equi-join, then aggregate."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderstatus")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_left_order_counts",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def q_join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left outer join — customers with zero orders kept (count 0)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer_nations",
    oracle="""
    SELECT
      COALESCE(cn.c_nationkey, sn.s_nationkey) AS nationkey,
      COALESCE(cn.n_cust, 0) AS n_cust,
      COALESCE(sn.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) cn
    FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) sn
      ON cn.c_nationkey = sn.s_nationkey
    """,
)
def q_join_full_outer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: full outer join of per-nation customer and supplier counts."""
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    cn = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_cust"))
    sn = s.groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_supp"))
    return cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full").select(
        F.coalesce(F.col("c_nationkey"), F.col("s_nationkey")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi_active_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    )
    GROUP BY c_mktsegment
    """,
)
def q_join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left-semi join = EXISTS; right side never duplicates rows."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "P")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_anti_inactive_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    )
    """,
)
def q_join_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left-anti join = NOT EXISTS (customers without pending orders)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross_region_nation",
    oracle="""
    SELECT r.r_name, n.n_name,
           CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS is_home
    FROM region r CROSS JOIN nation n
    """,
)
def q_join_cross_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: explicit cross join — tiny×tiny only (5×25 rows)."""
    r = load_table(spark, "region", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    return r.crossJoin(n).select(
        "r_name",
        "n_name",
        F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1).otherwise(0).alias("is_home"),
    )


@query(
    "q5_regional_revenue",
    oracle=f"""
    SELECT
      n.n_name,
      {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8+J6: flagship star join (TPC-H Q5 shape) with broadcast dims.

    Physical plan at scale: region/nation/customer broadcast (customer
    is bounded relative to the facts; at true TPC-H scale customer
    would shuffle — AQE decides), one shuffle join lineitem⋈orders on
    orderkey, date filter pushed into the orders Parquet scan.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT
      l.l_orderkey,
      {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8+O2: TPC-H Q3 shape — 3-way join, group, top-10 by revenue."""
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderdate") < "1998-03-15")
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") > "1998-03-15")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "join_range_event_pairs",
    oracle="""
    SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_pairs
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 60 SECOND
    GROUP BY a.event_type, b.event_type
    """,
)
def q_join_range_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: range join — event pairs from the same user within 60 s.

    Equi-key (user_id) keeps this a shuffle join; the time range is a
    residual predicate, never a cartesian explosion.
    """
    e = parallelize(load_table(spark, "events", sf_dir), spark)
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 60 SECONDS")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_part_supplier_value",
    oracle=f"""
    SELECT
      p.p_brand,
      s.s_name,
      {sql_dsum('l.l_extendedprice')} AS value,
      COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_size >= 30
    GROUP BY p.p_brand, s.s_name
    """,
)
def q_join_part_supplier_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: two broadcast dimension joins off the fact table."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_size") >= 30)
    s = load_table(spark, "supplier", sf_dir)
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(
            dsum(F.col("l_extendedprice")).alias("value"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# Interval-lookup tiers: [lo, hi) over events.value, integer bounds.
# A literal dim (the IP-geo / price-band shape) shared verbatim with
# the oracle.
_TIERS = [
    ("micro", 0, 1),
    ("tiny", 1, 5),
    ("small", 5, 20),
    ("mid", 20, 75),
    ("large", 75, 150),
    ("xl", 150, 300),
    ("jumbo", 300, 500),
]
_TIER_BIN = 25  # bin width for the equi-join rewrite


def _tier_values_sql() -> str:
    return ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in _TIERS)


@query(
    "join_interval_lookup_binned",
    oracle=f"""
    WITH tiers(tier, lo, hi) AS (VALUES {_tier_values_sql()})
    SELECT
      t.tier,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DECIMAL(18,4))
           AS DOUBLE) AS sum_value
    FROM events e JOIN tiers t
      ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier
    ORDER BY t.tier
    """,
)
def q_join_interval_lookup_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment lookup (the IP-geolocation / price-band
    join) compiled to a broadcast EQUI-join via bin expansion.

    The naive formulation — ``fact JOIN dim ON v BETWEEN lo AND hi``
    — has no equi-key, so Spark plans BroadcastNestedLoopJoin: every
    row probes every interval, O(n·m) compare work and no codegen
    hash path.  The rewrite expands each interval into the fixed-width
    bins it covers (``lo DIV {_TIER_BIN} .. (hi-1) DIV {_TIER_BIN}``,
    a few rows per tier), broadcasts that, equi-joins the fact on
    ``floor(value / {_TIER_BIN})``, and re-checks the exact bounds
    after the hash match.  Same result, but the probe is one hash
    lookup per row — the standard trick that keeps interval lookups
    linear at 100 TB (and the bin width is the knob trading dim
    expansion against false-positive filter work).

    The value sum routes through DECIMAL(18,4) on both engines so the
    per-tier totals are bit-identical under any partitioning.
    """
    e = load_table(spark, "events", sf_dir)
    tiers = spark.createDataFrame(_TIERS, "tier string, lo long, hi long")
    bins = tiers.select(
        "tier",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.expr(f"lo DIV {_TIER_BIN}"),
                F.expr(f"(hi - 1) DIV {_TIER_BIN}"),
            )
        ).alias("bin"),
    )
    matched = e.join(
        broadcast(bins),
        (F.floor(F.col("value") / _TIER_BIN).cast("long") == F.col("bin"))
        & (F.col("value") >= F.col("lo"))
        & (F.col("value") < F.col("hi")),
    )
    return (
        matched.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("tier")
    )
