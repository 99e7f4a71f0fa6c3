"""Projection/filter/distinct + aggregation + sort/limit/set ops.

SURVEY.md §2.2 (P3, P5), §2.4 (A1–A8), §2.6 (O1–O4). The reference has
no relational surface (its only row op is the consumer's byte→string
decode, ``go/consumer/consumer.go:80``); these are the Tier C
extensions anchored on the driver's star schema.

Scale notes (100 TB):
- Filters are expressed as Catalyst predicates → pushed to the Parquet
  scan (verified in tests via ``PushedFilters`` in the formatted plan).
- Aggregations are hash aggregates with map-side partial aggregation;
  the shuffle carries partial states keyed by low-cardinality group
  keys, never raw rows.
- Top-k uses ``orderBy().limit(k)`` which Spark plans as
  TakeOrderedAndProject — per-partition heaps + driver merge of k rows,
  NOT a global sort.
- No final ``orderBy`` on large outputs: the driver's value-hash is
  order-insensitive, and a global sort is a range-repartition we'd
  never pay at scale just to please a comparator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_kakfa_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table, parallelize


# --------------------------------------------------------------------------
# P3 filter / P5 distinct
# --------------------------------------------------------------------------

@query(
    "filter_returned_items",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_returnflag = 'R'
      AND l_quantity > 45
      AND l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1998-12-31'
    """,
)
def q_filter_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: conjunctive predicates (equality, comparison, between) on lineitem."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_quantity") > 45)
        & F.col("l_shipdate").between("1997-01-01", "1998-12-31")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")


@query(
    "filter_in_like_null",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_orderpriority LIKE '%URGENT%'
      AND o_totalprice IS NOT NULL
      AND NOT (o_totalprice < 1000.0)
    """,
)
def q_filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: isin / LIKE / null-check / boolean combinators."""
    o = load_table(spark, "orders", sf_dir)
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_orderpriority").like("%URGENT%")
        & F.col("o_totalprice").isNotNull()
        & ~(F.col("o_totalprice") < 1000.0)
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@query(
    "distinct_segments",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
)
def q_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: multi-column distinct (hash-aggregate dedup)."""
    c = load_table(spark, "customer", sf_dir)
    return c.select("c_mktsegment", "c_nationkey").distinct()


# --------------------------------------------------------------------------
# A2/A6/A8 aggregates — TPC-H Q1-style pricing summary
# --------------------------------------------------------------------------

@query(
    "agg_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_dsum('l_quantity')} AS sum_qty,
      {sql_dsum('l_extendedprice')} AS sum_base_price,
      {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
      {sql_davg('l_quantity')} AS avg_qty,
      {sql_davg('l_discount')} AS avg_disc,
      MIN(l_extendedprice) AS min_price,
      MAX(l_extendedprice) AS max_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A6: sum/avg/min/max/count with a pushed-down date predicate.

    The shape of TPC-H Q1 — the canonical scan-heavy aggregation. At
    scale this is one Parquet scan (5 columns pruned from 11) + one
    partial/final hash agg over a 6-ish-row group space.
    """
    li = load_table(spark, "lineitem", sf_dir)
    return (
        # filter in the scan (pushdown), then fan out for the 7-function agg
        parallelize(li.filter(F.col("l_shipdate") <= "2000-09-02"), spark)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT
      l_returnflag,
      COUNT(DISTINCT l_suppkey) AS n_supp,
      COUNT(DISTINCT l_partkey) AS n_part,
      COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: exact count-distinct (Catalyst plans expand + two-phase agg)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT
      l_returnflag,
      CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_n_part,
      TRUE AS within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: HyperLogLog++ approximate distinct — the 100 TB answer to A3.

    The HLL estimate itself is engine-specific, so the oracle is a
    tolerance contract, but one that binds real values: both engines
    emit the EXACT distinct count per group (hash-compared), and the
    query additionally emits whether |approx - exact| / exact <=
    3 * rsd (rsd=0.02). DuckDB asserts within_tol TRUE for the same
    groups — so a query bug that always returns TRUE still fails on
    the exact_n_part column.
    """
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_n_part"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", rsd=0.02)
                - F.countDistinct("l_partkey")
            )
            / F.countDistinct("l_partkey")
            <= 3 * 0.02
        ).alias("within_tol"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      COUNT(*) AS n,
      {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: hierarchical rollup (flag, status) → (flag) → ()."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: full cube over two dimensions."""
    o = load_table(spark, "orders", sf_dir)
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@query(
    "agg_conditional",
    oracle=f"""
    SELECT
      l_linestatus,
      {sql_dsum("CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END")} AS returned_value,
      {sql_dsum("CASE WHEN l_discount > 0.05 THEN l_extendedprice * l_discount ELSE 0 END")} AS big_discounts,
      COUNT(CASE WHEN l_quantity >= 25 THEN 1 END) AS n_bulk
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: filtered/conditional aggregation via when/otherwise."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_linestatus").agg(
        dsum(F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(0.0)).alias("returned_value"),
        dsum(
            F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice") * F.col("l_discount")).otherwise(0.0)
        ).alias("big_discounts"),
        F.count(F.when(F.col("l_quantity") >= 25, 1)).alias("n_bulk"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT
      l_returnflag,
      array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
      COUNT(DISTINCT l_linestatus) AS n_status
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: collect_set, sorted then joined so the oracle hash is order-free."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias("statuses"),
        F.countDistinct("l_linestatus").alias("n_status"),
    )


@query(
    "agg_global",
    oracle=f"""
    SELECT
      COUNT(*) AS n_rows,
      {sql_dsum('l_extendedprice')} AS total_price,
      MIN(l_shipdate) AS first_ship,
      MAX(l_shipdate) AS last_ship,
      COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: global (no-group) aggregation → single row."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_extendedprice")).alias("total_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# O1/O2 sort + limit, O3/O4 set ops
# --------------------------------------------------------------------------

@query(
    "orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2: multi-key sort + limit → TakeOrderedAndProject (no global sort)."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "union_all_counts",
    oracle="""
    SELECT side, COUNT(*) AS n FROM (
      SELECT 'open' AS side, o_custkey FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT 'done' AS side, o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    GROUP BY side
    """,
)
def q_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: unionByName (no shuffle — concatenation of partitions)."""
    o = load_table(spark, "orders", sf_dir)
    open_side = o.filter(F.col("o_orderstatus") == "O").select(
        F.lit("open").alias("side"), "o_custkey"
    )
    done_side = o.filter(F.col("o_orderstatus") == "F").select(
        F.lit("done").alias("side"), "o_custkey"
    )
    return open_side.unionByName(done_side).groupBy("side").agg(F.count(F.lit(1)).alias("n"))


@query(
    "intersect_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: customers having both an open and a finished order."""
    o = load_table(spark, "orders", sf_dir)
    open_keys = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_keys = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_keys.intersect(done_keys)


@query(
    "except_custkeys",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: customers who ordered but have nothing pending (EXCEPT distinct)."""
    o = load_table(spark, "orders", sf_dir)
    all_keys = o.select("o_custkey")
    pending = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return all_keys.subtract(pending)


# --------------------------------------------------------------------------
# Statistical aggregates + sampling
# --------------------------------------------------------------------------

@query(
    "agg_percentiles",
    oracle="""
    SELECT
      l_returnflag,
      ROUND(quantile_cont(l_quantity, 0.5), 4) AS qty_median,
      ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS price_p25,
      ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS price_p95,
      MIN(l_extendedprice) AS price_min,
      MAX(l_extendedprice) AS price_max
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group.

    Rounded to 4 dp: Spark computes (1-d)*a + d*b, DuckDB a + (b-a)*d —
    algebraically equal, last-ulp different.
    """
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("qty_median"),
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("price_p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("price_p95"),
        F.min("l_extendedprice").alias("price_min"),
        F.max("l_extendedprice").alias("price_max"),
    )


@query(
    "agg_variance_exact",
    oracle="""
    SELECT
      l_linestatus,
      COUNT(*) AS n,
      CAST(
        (CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(18,6))) AS DOUBLE)
         - CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
           * CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
        / (COUNT(*) - 1) AS DOUBLE) AS disc_var
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance via exact decimal sums (order-insensitive).

    Built-in var_samp accumulates float sums whose partitioning order
    changes the last bits; routing sum(x) and sum(x^2) through DECIMAL
    makes the result bit-stable and oracle-exact. Same two-pass-free
    shape (single aggregation), deterministic at any parallelism.
    """
    li = load_table(spark, "lineitem", sf_dir)
    d6 = "decimal(18,6)"
    sum_x = F.sum(F.col("l_discount").cast(d6)).cast("double")
    sum_x2 = F.sum((F.col("l_discount") * F.col("l_discount")).cast(d6)).cast("double")
    n = F.count(F.lit(1))
    return li.groupBy("l_linestatus").agg(
        n.alias("n"),
        ((sum_x2 - sum_x * sum_x / n) / (n - 1)).cast("double").alias("disc_var"),
    )


@query(
    "sample_seeded",
    oracle="""
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_total,
      TRUE AS ok_fraction
    FROM orders
    """,
)
def q_sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample of orders (reproducible across runs).

    The 100 TB use case: cheap pipeline smoke-runs and data profiling
    on a fixed, replayable subset. The sampler's RNG stream is
    Spark-specific, so the oracle is a statistical contract that still
    binds a real value: both engines emit the base-table row count
    (hash-compared), and the sampled fraction must sit inside a
    6-sigma Bernoulli(0.1) band around that count. A sampler bug
    that returns everything (or nothing) flips ok_fraction; a scan
    bug changes n_total.
    """
    o = load_table(spark, "orders", sf_dir)
    sample = o.sample(fraction=0.1, seed=42).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # 6-sigma band around p=0.1: p ± 6*sqrt(p(1-p)/n); at sf0.01
    # (n=15k orders) that's 0.1 ± 0.0147 — loose enough for any SF ≥ 0.001.
    stats = o.agg(F.count(F.lit(1)).alias("n_total")).crossJoin(
        sample.agg(F.count(F.lit(1)).alias("n_sample"))
    )
    frac = F.col("n_sample") / F.col("n_total")
    sigma = F.sqrt(0.1 * 0.9 / F.col("n_total"))
    return stats.select(
        F.col("n_total"),
        # vacuously true on an empty table (and keeps the division
        # ANSI-safe when n_total = 0)
        F.when(F.col("n_total") == 0, F.lit(True))
        .otherwise(
            (frac >= 0.1 - 6 * sigma) & (frac <= 0.1 + 6 * sigma)
        )
        .alias("ok_fraction"),
    )


@query(
    "agg_argmax",
    oracle="""
    WITH mx AS (
      SELECT l_returnflag, MAX(l_extendedprice) AS max_price
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT
      m.l_returnflag,
      m.max_price,
      MIN(l.l_orderkey) AS argmax_orderkey
    FROM mx m
    JOIN lineitem l
      ON l.l_returnflag = m.l_returnflag AND l.l_extendedprice = m.max_price
    GROUP BY m.l_returnflag, m.max_price
    """,
)
def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax per group, tie-broken deterministically (lowest orderkey).

    max_by's tie behavior is unspecified, so the engine uses the
    classic max-then-join-back formulation — two cheap aggregations
    instead of one nondeterministic one. The join-back is a broadcast
    (group cardinality is tiny next to the fact table).
    """
    li = load_table(spark, "lineitem", sf_dir)
    mx = li.groupBy("l_returnflag").agg(F.max("l_extendedprice").alias("max_price"))
    return (
        li.join(
            F.broadcast(mx),
            (li.l_returnflag == mx.l_returnflag)
            & (li.l_extendedprice == mx.max_price),
        )
        .drop(mx.l_returnflag)
        .groupBy("l_returnflag", "max_price")
        .agg(F.min("l_orderkey").alias("argmax_orderkey"))
    )


@query(
    "scalar_null_funcs",
    oracle="""
    SELECT
      o_orderstatus,
      COUNT(*) AS n_rows,
      COUNT(NULLIF(o_orderpriority, '4-NOT SPECIFIED')) AS n_specified,
      CAST(SUM(CASE WHEN NULLIF(o_orderpriority, '4-NOT SPECIFIED') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unspecified,
      COALESCE(MIN(NULLIF(o_orderpriority, '4-NOT SPECIFIED')), 'none') AS min_priority
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_scalar_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling family: nullif / coalesce / null-skipping aggregates.

    The fixtures contain no physical nulls, so nullif manufactures them
    — exercising count's null-skip, sum-over-case, and coalesce
    fallback semantics end-to-end.
    """
    o = load_table(spark, "orders", sf_dir)
    specified = F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED"))
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(specified).alias("n_specified"),
        F.sum(F.when(specified.isNull(), 1).otherwise(0)).alias("n_unspecified"),
        F.coalesce(F.min(specified), F.lit("none")).alias("min_priority"),
    )


@query(
    "unpivot_price_measures",
    oracle="""
    SELECT o_orderkey, measure, val FROM (
      SELECT o_orderkey, 'total'     AS measure, o_totalprice            AS val FROM orders
      UNION ALL
      SELECT o_orderkey, 'total_x2'  AS measure, o_totalprice * 2        AS val FROM orders
      UNION ALL
      SELECT o_orderkey, 'total_neg' AS measure, 0.0 - o_totalprice      AS val FROM orders
    )
    WHERE o_orderkey % 100 = 0
    """,
)
def q_unpivot_price_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long): measure columns melted into rows.

    The inverse of PIVOT (sql_pivot_status_by_priority); the oracle
    states the semantics from first principles as a UNION ALL.
    """
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") % 100 == 0)
    wide = o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("total"),
        (F.col("o_totalprice") * 2).alias("total_x2"),
        (-F.col("o_totalprice")).alias("total_neg"),
    )
    return wide.unpivot(
        ids=["o_orderkey"],
        values=["total", "total_x2", "total_neg"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@query(
    "agg_corr_covar",
    oracle="""
    WITH s AS (
      SELECT
        l_returnflag,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
                 * CAST(l_extendedprice AS DECIMAL(19,6)))
             AS DOUBLE) AS sxy,
        CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
                 * CAST(l_quantity AS DECIMAL(19,6)))
             AS DOUBLE) AS sx2,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))
                 * CAST(l_extendedprice AS DECIMAL(19,6)))
             AS DOUBLE) AS sy2
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT
      l_returnflag,
      CAST(n AS BIGINT) AS n,
      ROUND((sxy - sx * sy / n) / (n - 1), 4) AS covar_qty_price,
      ROUND((sxy - sx * sy / n)
        / SQRT((sx2 - sx * sx / n) * (sy2 - sy * sy / n)), 9) AS corr_qty_price
    FROM s
    """,
)
def q_agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance and Pearson correlation of quantity vs price
    per return flag, bit-stable at any parallelism.

    Built-in corr/covar_samp accumulate float partials whose merge
    order varies with partitioning; like ``agg_variance_exact``, the
    five raw moments route through DECIMAL sums (order-insensitive;
    operands cast to decimal BEFORE the product so both engines sum
    the identical exact decimals, dodging double->decimal rounding-
    mode skew),
    and the closed-form combination of their double casts is then the
    same IEEE arithmetic in every engine (the one residual skew —
    DuckDB's scaled-int128 decimal->double cast double-rounds vs
    Java's correctly-rounded BigDecimal — sits at 1 ulp and is
    absorbed by the fixed ROUND). One aggregation, no second pass
    over the data.
    """
    li = load_table(spark, "lineitem", sf_dir)
    d19 = "decimal(19,6)"
    qty = F.col("l_quantity").cast(d19)
    price = F.col("l_extendedprice").cast(d19)
    n = F.count(F.lit(1))
    agg = li.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double").alias("sx"),
        F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).cast("double").alias("sy"),
        F.sum(qty * price).cast("double").alias("sxy"),
        F.sum(qty * qty).cast("double").alias("sx2"),
        F.sum(price * price).cast("double").alias("sy2"),
    )
    nn = F.col("n")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / nn) / (nn - 1)
    corr = (F.col("sxy") - F.col("sx") * F.col("sy") / nn) / F.sqrt(
        (F.col("sx2") - F.col("sx") * F.col("sx") / nn)
        * (F.col("sy2") - F.col("sy") * F.col("sy") / nn)
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.round(cov, 4).alias("covar_qty_price"),
        F.round(corr, 9).alias("corr_qty_price"),
    )


@query(
    "setop_all_variants",
    oracle="""
    WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
    urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
    ex AS (SELECT o_custkey FROM hi EXCEPT ALL SELECT o_custkey FROM urgent),
    ix AS (SELECT o_custkey FROM hi INTERSECT ALL SELECT o_custkey FROM urgent)
    SELECT 'except_all' AS op, o_custkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM ex GROUP BY o_custkey
    UNION ALL
    SELECT 'intersect_all' AS op, o_custkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM ix GROUP BY o_custkey
    """,
)
def q_setop_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 completion: EXCEPT ALL / INTERSECT ALL — the bag (multiset)
    set operations. Unlike the DISTINCT forms, multiplicities carry:
    a customer with 3 big orders and 1 urgent one keeps 2 rows in
    EXCEPT ALL and 1 in INTERSECT ALL. Spark implements both as a
    single hash aggregation over tagged counts (no join); the output
    rolls each branch up to (key, multiplicity) so the oracle compare
    is order-free.
    """
    o = load_table(spark, "orders", sf_dir)
    hi = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    ex = (
        hi.exceptAll(urgent)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "o_custkey", "n")
    )
    ix = (
        hi.intersectAll(urgent)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "o_custkey", "n")
    )
    return ex.unionByName(ix)


@query(
    "join_null_safe_props",
    oracle="""
    WITH tagged AS (
      SELECT event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS tag
      FROM events
    ),
    dim AS (
      SELECT DISTINCT
             CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS tag,
             CASE WHEN event_type = 'error' THEN 'untagged'
                  ELSE upper(event_type) END AS label
      FROM events
    )
    SELECT t.tag, d.label, CAST(COUNT(*) AS BIGINT) AS n
    FROM tagged t JOIN dim d ON t.tag IS NOT DISTINCT FROM d.tag
    GROUP BY t.tag, d.label
    """,
)
def q_join_null_safe_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of silently dropping — the semantics
    corner that loses rows in naive dimension joins when the fact has
    unclassified (NULL) keys. Spark's ``eqNullSafe`` stays a hash join
    (NULL hashes like any value under null-safe equality), so the plan
    is identical to the plain equi-join's.
    """
    ev = load_table(spark, "events", sf_dir)
    tag = F.when(F.col("event_type") == "error", None).otherwise(
        F.col("event_type")
    )
    tagged = ev.select("event_id", tag.alias("tag"))
    dim = (
        ev.select(
            tag.alias("tag"),
            F.when(F.col("event_type") == "error", "untagged")
            .otherwise(F.upper("event_type"))
            .alias("label"),
        )
        .distinct()
    )
    return (
        tagged.join(dim, tagged["tag"].eqNullSafe(dim["tag"]))
        .groupBy(tagged["tag"], "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "sql_explode_outer_keep_empty",
    oracle="""
    WITH src AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN []
                  ELSE string_split(text, ' ')[1:3] END AS toks
      FROM documents WHERE doc_id <= 50
    )
    SELECT s.doc_id, u.tok
    FROM src s LEFT JOIN LATERAL (SELECT UNNEST(s.toks) AS tok) u ON TRUE
    """,
)
def q_sql_explode_outer_keep_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer``: rows with EMPTY arrays survive as a single
    NULL-element row instead of vanishing — the difference between an
    inner and outer lateral unnest. Plain ``explode`` silently drops
    every 7th doc here; pipelines that must account for every input
    row (audits, per-doc joins back) need the outer form.
    """
    d = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") <= 50)
    toks = F.when(
        F.col("doc_id") % 7 == 0, F.array().cast("array<string>")
    ).otherwise(F.slice(F.split(F.col("text"), " "), 1, 3))
    return d.select(
        "doc_id", F.explode_outer(toks).alias("tok")
    )


@query(
    "agg_mode_priority_by_nation",
    oracle="""
    WITH counts AS (
      SELECT n.n_name, o.o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT n_name, o_orderpriority, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY n_name) AS BIGINT) AS n_orders,
             ROW_NUMBER() OVER (
               PARTITION BY n_name ORDER BY cnt DESC, o_orderpriority
             ) AS rn
      FROM counts
    )
    SELECT
      n_name,
      o_orderpriority AS mode_priority,
      cnt AS mode_count,
      n_orders,
      ROUND(CAST(cnt AS DOUBLE) / n_orders, 6) AS mode_share
    FROM ranked WHERE rn = 1
    """,
)
def q_agg_mode_priority_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal order priority per nation (the MODE() aggregate with a
    deterministic lexicographic tie-break, which the bare built-in
    doesn't guarantee) plus its share of the nation's orders.

    Scale: one fact shuffle into the (nation, priority) counts (both
    dims broadcast); the rank window runs over the |nations|·|priorities|
    grid — KB forever.
    """
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    counts = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    by_nation = Window.partitionBy("n_name")
    rn = F.row_number().over(
        by_nation.orderBy(F.desc("cnt"), "o_orderpriority")
    )
    return (
        counts.select(
            "n_name",
            "o_orderpriority",
            "cnt",
            F.sum("cnt").over(by_nation).alias("n_orders"),
            rn.alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "n_name",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").alias("mode_count"),
            "n_orders",
            F.round(
                F.col("cnt").cast("double") / F.col("n_orders"), 6
            ).alias("mode_share"),
        )
    )
