"""Data-lake maintenance operators (Tier C extension): SCD2 history
merge, CDC changelog compaction, column profiling, and declarative
constraint checks.

The reference only appends to a Kafka topic (``go/producer/
producer.go:105-115``); anyone landing that topic in a lake
immediately needs upserts (SCD), changelog compaction (CDC), and data
quality gates — the same ops Delta/Iceberg/Hudi or Deequ provide.
OSS Spark without a table format expresses them as pure DataFrame
transforms over the relational definitions, which is what this module
does; ``sources/io.py`` pairs them with partition-overwrite writes.

Scale notes (100 TB): every op here is one or two key-partitioned
shuffles of the fact table with the dimension/changelog side
broadcast or pre-aggregated; the profiling and constraint queries are
single-pass partial/final aggregates (no per-column re-scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_kakfa_spark.operators.distributed_rank import with_global_ntile
from flink_kakfa_spark.operators.merge import merge_scd2
from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table


@query(
    "merge_scd2_orders",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             1 AS version, 1 AS is_current
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    source AS (
      SELECT o_orderkey, 'X' AS o_orderstatus,
             o_totalprice + 1000.0 AS o_totalprice
      FROM orders WHERE o_orderkey % 6 = 0
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice, version, is_current
    FROM target WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source)
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice, version, 0 AS is_current
    FROM target WHERE o_orderkey IN (SELECT o_orderkey FROM source)
    UNION ALL
    SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice,
           2 AS version, 1 AS is_current
    FROM source s
    """,
)
def q_merge_scd2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history merge: amendments close the old version, append v2.

    Same target/source split as ``merge_scd1_orders``, but superseded
    rows survive with ``is_current = 0`` and the amendment lands as
    ``version = 2``. The engine op (``operators/merge.py::merge_scd2``)
    is a semi/anti split plus a per-key MAX(version) — two broadcast-
    able joins against the (small) amendment batch; the fact table is
    scanned once. The oracle is the three-branch UNION definition.
    """
    o = load_table(spark, "orders", sf_dir)
    target = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit(1).alias("version"),
        F.lit(1).alias("is_current"),
    )
    source = o.filter(F.col("o_orderkey") % 6 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
    )
    return merge_scd2(target, source, "o_orderkey")


@query(
    "cdc_apply_changelog",
    oracle="""
    WITH changelog AS (
      SELECT o_orderkey AS key, 1 AS seq, 'I' AS op,
             o_totalprice AS price
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, 2, 'U', o_totalprice + 500.0
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, 3, 'D', NULL
      FROM orders WHERE o_orderkey % 20 = 0
    ),
    latest AS (
      SELECT key, seq, op, price,
             ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
      FROM changelog
    )
    SELECT key, op AS last_op, seq AS last_seq, price
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def q_cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction: replay an I/U/D changelog to the latest live rows.

    The changelog is synthesized deterministically from orders (insert
    every 5th key, update every 10th, delete every 20th, seq = op
    order) so both engines see identical input. Compaction is the
    standard formulation: last-writer-wins per key by sequence number,
    then drop keys whose final op is a delete — ONE shuffle
    (``partitionBy(key)``), no joins. This is exactly the foreachBatch
    upsert kernel the streaming materialized view uses
    (``streaming/matview.py``), here as a batch oracle-checked query.
    """
    o = load_table(spark, "orders", sf_dir)

    def _branch(mod: int, seq: int, op: str, price: F.Column) -> DataFrame:
        return o.filter(F.col("o_orderkey") % mod == 0).select(
            F.col("o_orderkey").alias("key"),
            F.lit(seq).alias("seq"),
            F.lit(op).alias("op"),
            price.alias("price"),
        )

    changelog = (
        _branch(5, 1, "I", F.col("o_totalprice"))
        .unionByName(_branch(10, 2, "U", F.col("o_totalprice") + 500.0))
        .unionByName(_branch(20, 3, "D", F.lit(None).cast("double")))
    )
    w = Window.partitionBy("key").orderBy(F.col("seq").desc())
    return (
        changelog.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "key",
            F.col("op").alias("last_op"),
            F.col("seq").alias("last_seq"),
            "price",
        )
    )


@query(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_custkey' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           ROUND(MIN(o_custkey), 4) AS min_value,
           ROUND(MAX(o_custkey), 4) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           ROUND(MIN(o_totalprice), 4), ROUND(MAX(o_totalprice), 4)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           NULL, NULL
    FROM orders
    """,
)
def q_profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style column profiler: null/distinct/min/max per column.

    ONE scan and ONE aggregate compute every per-column statistic
    (Spark plans the multi-distinct via Expand), then ``stack``
    unpivots the single stats row into one row per column — the
    opposite of the naive per-column re-scan loop, which at 100 TB
    would read the table once per column. String columns report NULL
    min/max (cross-engine float/varchar rendering differs; distinct
    and null counts carry the signal). The oracle states the same
    stats as per-column UNION branches.
    """
    o = load_table(spark, "orders", sf_dir)
    num_cols = ["o_custkey", "o_totalprice"]
    str_cols = ["o_orderstatus", "o_orderpriority"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in num_cols + str_cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
    for c in num_cols:
        aggs.append(F.round(F.min(c).cast("double"), 4).alias(f"mn_{c}"))
        aggs.append(F.round(F.max(c).cast("double"), 4).alias(f"mx_{c}"))
    stats = o.agg(*aggs)

    def _row(c: str, numeric: bool):
        mn = F.col(f"mn_{c}") if numeric else F.lit(None).cast("double")
        mx = F.col(f"mx_{c}") if numeric else F.lit(None).cast("double")
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"nn_{c}").alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            mn.alias("min_value"),
            mx.alias("max_value"),
        )

    rows = [_row(c, True) for c in num_cols] + [_row(c, False) for c in str_cols]
    return stats.select(F.inline(F.array(*rows)))


@query(
    "constraint_check_summary",
    oracle="""
    SELECT
      CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows,
      CAST((SELECT COUNT(*) FROM (
        SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
      )) AS BIGINT) AS n_dup_keys,
      CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
           AS BIGINT) AS n_null_custkey,
      CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
           AS BIGINT) AS n_nonpositive_price,
      CAST((SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
            )) AS BIGINT) AS n_orphan_lineitems,
      CAST((SELECT COUNT(*) FROM orders
            WHERE o_orderdate < TIMESTAMP '1992-01-01'
               OR o_orderdate >= TIMESTAMP '1999-01-01')
           AS BIGINT) AS n_date_out_of_range
    """,
)
def q_constraint_check_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate: key uniqueness, null checks, value
    ranges, and referential integrity in one summary row.

    Row-local predicates (nulls, ranges) fold into ONE aggregate over
    a single orders scan. Key uniqueness is a groupBy on the key — the
    same shuffle an upsert would need anyway. Referential integrity is
    a LEFT ANTI join of lineitem against broadcast-able order keys
    (at 100 TB: the anti join shuffles on the key both sides already
    share). A zero count is the PASS state of each constraint.
    """
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    row_local = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("n_null_custkey"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias(
            "n_nonpositive_price"
        ),
        F.sum(
            (
                (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
                | (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
            ).cast("long")
        ).alias("n_date_out_of_range"),
    )
    dup_keys = (
        o.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count(F.lit(1)).alias("n_dup_keys"))
    )
    orphans = li.join(
        o.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("n_orphan_lineitems"))
    return (
        row_local.crossJoin(dup_keys)
        .crossJoin(orphans)
        .select(
            "n_rows",
            "n_dup_keys",
            "n_null_custkey",
            "n_nonpositive_price",
            "n_orphan_lineitems",
            "n_date_out_of_range",
        )
    )


_BLOOM_BITS = 1 << 15  # 32768 bits -> 512 longs; ~1% fp at fixture scale
_BLOOM_K = 3


def bloom_semi_join(
    big: DataFrame,
    small_keys: DataFrame,
    big_key: str,
    small_key: str,
    n_bits: int = _BLOOM_BITS,
    k: int = _BLOOM_K,
) -> DataFrame:
    """Semi join with a Bloom-filter pre-filter on the probe side.

    Builds a ``n_bits``-bit Bloom filter from the (deduplicated) build
    side entirely inside the plan — bit positions come from
    ``xxhash64(key, seed)``, the bitmap is OR-folded per 64-bit word
    and carried as a one-row ``map<int,long>`` that broadcasts to the
    probe side. Probe rows failing any of the ``k`` membership tests
    are dropped BEFORE the exact semi join, which then removes the
    false positives (a Bloom filter has no false negatives, so the
    result is exactly the plain semi join).

    At 100 TB this is the manual form of runtime filtering: when the
    build side is too large to broadcast as a hash relation but its
    Bloom bitmap (KBs) is not, the pre-filter cuts the probe-side
    shuffle by the filter's selectivity. Spark's own
    ``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`` does
    this automatically for shuffle joins; the explicit operator keeps
    the technique available regardless of optimizer version/config.
    """
    keys = small_keys.select(F.col(small_key).alias("_k")).distinct()
    positions = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col("_k"), F.lit(i)), F.lit(n_bits))
                    for i in range(k)
                ]
            )
        ).alias("pos")
    )
    bitmap = (
        positions.select(
            (F.col("pos") / 64).cast("int").alias("word"),
            (F.col("pos") % 64).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("bits"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("word", "bits"))
            ).alias("_bloom")
        )
    )
    probed = big.crossJoin(F.broadcast(bitmap))
    test = F.lit(True)
    for i in range(k):
        hit = F.expr(
            f"coalesce(element_at(_bloom, "
            f"CAST(pmod(xxhash64({big_key}, {i}), {n_bits}) / 64 AS INT)), "
            f"CAST(0 AS BIGINT)) & shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pmod(xxhash64({big_key}, {i}), {n_bits}) % 64 AS INT)) != 0"
        )
        test = test & hit
    candidates = probed.filter(test).drop("_bloom")
    return candidates.join(
        F.broadcast(keys),
        candidates[big_key] == F.col("_k"),
        "left_semi",
    )


@query(
    "join_bloom_filtered_revenue",
    oracle="""
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_items,
      ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
    FROM lineitem l
    WHERE EXISTS (
      SELECT 1 FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'GERMANY' AND s.s_suppkey = l.l_suppkey
    )
    """,
)
def q_join_bloom_filtered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from German suppliers via an explicit Bloom semi join.

    The build side (German supplier keys) feeds ``bloom_semi_join``;
    the Bloom bitmap broadcasts and pre-filters lineitem before the
    exact semi join confirms. The oracle is the plain EXISTS — the
    Bloom stage must be invisible in the result. Locally the exact
    join is broadcast anyway; the operator exists for the scale regime
    where the build side outgrows the broadcast threshold but its
    bitmap does not.
    """
    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    german = sup.join(
        F.broadcast(nat.filter(F.col("n_name") == "GERMANY")),
        sup.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    filtered = bloom_semi_join(li, german, "l_suppkey", "s_suppkey")
    revenue = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(18,6)"
        )
    )
    return filtered.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(revenue.cast("double"), 2).alias("revenue"),
    )


_Z_BITS = 8


def _z_terms_sql(px: str, py: str) -> str:
    """Morton interleave as a sum of shift/mask terms (SQL text)."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({px} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({py} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _z_terms_col(px, py):
    """Morton interleave as a sum of shift/mask Columns (same structure
    as the SQL twin so both engines evaluate identical integer math)."""
    z = F.lit(0)
    for i in range(_Z_BITS):
        z = z + F.shiftleft(F.shiftright(px, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(py, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


@query(
    "lake_zorder_layout",
    oracle=f"""
    WITH keyed AS (
      SELECT
        o_orderkey,
        CAST({_z_terms_sql("(o_custkey % 256)",
                           "((CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 256)")}
             AS BIGINT) AS zval,
        o_custkey % 256 AS cust_bucket,
        (CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 256 AS date_bucket
      FROM orders
    )
    SELECT o_orderkey, zval,
           CAST(cust_bucket AS BIGINT) AS cust_bucket,
           CAST(date_bucket AS BIGINT) AS date_bucket
    FROM keyed ORDER BY zval, o_orderkey LIMIT 50
    """,
)
def q_lake_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (customer, order date).

    The data-layout half of lake maintenance: sorting files by the
    bit-interleaved key clusters rows that are close in BOTH dimensions
    into the same file, so min/max file statistics prune scans for
    either predicate (`WHERE o_custkey = ?` AND/OR date ranges) — the
    same effect Delta/Iceberg OPTIMIZE ZORDER provides. The key is pure
    integer shift/mask math (identical in both engines); at scale the
    full pipeline is `df.repartitionByRange(N, zval).sortWithinPartitions
    (zval).write(...)` — this query emits the leading key block as the
    verifiable artifact.
    """
    o = load_table(spark, "orders", sf_dir)
    px = F.pmod(F.col("o_custkey"), F.lit(256)).cast("int")
    py = F.pmod(
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")),
        F.lit(256),
    ).cast("int")
    keyed = o.select(
        "o_orderkey",
        _z_terms_col(px, py).cast("bigint").alias("zval"),
        px.cast("bigint").alias("cust_bucket"),
        py.cast("bigint").alias("date_bucket"),
    )
    return keyed.orderBy("zval", "o_orderkey").limit(50)


_SKEW_TOPN = 10


@query(
    "profile_join_key_skew",
    oracle=f"""
    WITH per_key AS (
      SELECT l_orderkey AS key, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_orderkey
    ),
    stats AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n_keys,
        CAST(SUM(n) AS BIGINT) AS n_rows,
        CAST(MAX(n) AS BIGINT) AS max_rows
      FROM per_key
    ),
    top AS (
      SELECT key, n, ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rk
      FROM per_key
    )
    SELECT
      t.key, t.n, CAST(t.rk AS INTEGER) AS rk,
      s.n_keys, s.n_rows,
      CAST(s.max_rows AS DOUBLE) * s.n_keys / s.n_rows AS skew_ratio
    FROM top t, stats s
    WHERE t.rk <= {_SKEW_TOPN}
    """,
)
def q_profile_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: the heaviest join keys plus the global
    skew ratio (max key frequency over mean key frequency).

    The pre-flight check before any large shuffle join: a skew_ratio
    near 1 means hash partitioning balances; a ratio of 10³ means the
    hottest key's reducer gets 1000× the average and the join needs
    AQE skew split or explicit salting (``join_salted_skew_revenue``).
    One fact shuffle (per-key counts); stats fold to one row and
    broadcast back; top-N is a TakeOrdered partial.
    """
    li = load_table(spark, "lineitem", sf_dir)
    per_key = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_rows"),
    )
    w = Window.orderBy(F.col("n").desc(), "key")
    top = (
        per_key.orderBy(F.col("n").desc(), "key")
        .limit(_SKEW_TOPN)
        .withColumn("rk", F.row_number().over(w).cast("int"))
    )
    return top.crossJoin(F.broadcast(stats)).select(
        "key",
        "n",
        "rk",
        "n_keys",
        "n_rows",
        (
            F.col("max_rows").cast("double") * F.col("n_keys") / F.col("n_rows")
        ).alias("skew_ratio"),
    )


_EQUIDEPTH_BINS = 8


@query(
    "profile_equidepth_price",
    oracle=f"""
    WITH binned AS (
      SELECT
        o_totalprice,
        NTILE({_EQUIDEPTH_BINS}) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    )
    SELECT
      bin,
      CAST(COUNT(*) AS BIGINT) AS n,
      MIN(o_totalprice) AS lo,
      MAX(o_totalprice) AS hi
    FROM binned GROUP BY bin
    """,
)
def q_profile_equidepth_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of order prices: {_EQUIDEPTH_BINS} bins of
    equal row count with their value ranges — the optimizer-statistics
    shape (ANALYZE histograms) and the range-partitioner's split-point
    computation.

    Scale: the oracle's NTILE would move every row through ONE
    partition (Exchange SinglePartition); the engine instead computes
    the exact same tiles via ``operators/distributed_rank.py`` —
    approx-percentile range bins, per-bin offsets, and a bin-
    partitioned local rank — so the only fact-table shuffle is a hash
    on ~32 range bins and the plan stays parallel at 100 TB. The
    driver's value-hash vs DuckDB's true NTILE proves exact
    equivalence (deterministic tie-break on o_orderkey).
    """
    o = load_table(spark, "orders", sf_dir).select(
        "o_totalprice", "o_orderkey"
    )
    tiled = with_global_ntile(
        o,
        ["o_totalprice", "o_orderkey"],
        _EQUIDEPTH_BINS,
        value_col="o_totalprice",
        tile_name="bin",
    )
    return tiled.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@query(
    "imv_signed_delta_agg",
    oracle="""
    WITH final_state AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 10 = 0
                  THEN CAST(o_totalprice + 100.00 AS DECIMAL(18,2))
                  ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price
      FROM orders WHERE o_orderkey % 17 <> 0
      UNION ALL
      SELECT o_orderpriority, CAST(50.00 AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderkey % 10 = 5
    )
    SELECT
      o_orderpriority,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(price) AS DOUBLE) AS revenue
    FROM final_state
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_imv_signed_delta_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance with signed deltas: a materialized
    revenue-by-priority summary is brought up to date by folding in a
    changelog of updates (price corrections, +100 on ``key % 10 = 0``),
    deletes (``key % 17 = 0``) and inserts (a 50.00 rush copy of
    ``key % 10 = 5``) as (+1/-1)-signed rows — the classic
    retract/insert dataflow (the multiplicity semantics Flink's
    retract streams and DBSP/Materialize use) — WITHOUT rescanning the
    base table. The oracle recomputes the post-change state from
    scratch; matching it proves the algebraic maintenance is exact.

    Engine plan: the base summary (one map-side-combined groupBy —
    this is the KB-sized materialized view) unions with the aggregated
    changelog partials (COUNT -> SUM(sign), SUM(price) ->
    SUM(sign * price), both over DECIMAL so the merge is exact), and
    one final 5-row groupBy merges them. At 100 TB the base is never
    re-read: maintenance cost is O(|changelog|) + a view-sized merge,
    the whole point of keeping the view's aggregates in the
    sign-mergeable (count, sum) form rather than as AVG-style
    finalized values.

    Delete precedence: an updated key that is also deleted emits only
    its retraction (no re-insert), matching the oracle's
    ``WHERE key % 17 <> 0`` on the updated branch.
    """
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    base = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("price").alias("rev"),
    )
    sign = F.col("sign")
    upd = o.filter((F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % 17 != 0))
    changelog = (
        upd.select("o_orderpriority", "price", F.lit(-1).alias("sign"))
        .unionByName(
            upd.select(
                "o_orderpriority",
                (F.col("price") + F.lit(100.00).cast("decimal(18,2)"))
                .cast("decimal(18,2)")
                .alias("price"),
                F.lit(1).alias("sign"),
            )
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 17 == 0).select(
                "o_orderpriority", "price", F.lit(-1).alias("sign")
            )
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 10 == 5).select(
                "o_orderpriority",
                F.lit(50.00).cast("decimal(18,2)").alias("price"),
                F.lit(1).alias("sign"),
            )
        )
    )
    delta = changelog.groupBy("o_orderpriority").agg(
        F.sum(sign).cast("long").alias("n"),
        F.sum(sign.cast("decimal(18,2)") * F.col("price")).alias("rev"),
    )
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            F.sum("rev").cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# --- small-file compaction planning -----------------------------------
# Iceberg/Delta-style table maintenance: given a file manifest, group
# undersized files into merge jobs of ~target size. The planner runs on
# METADATA (the manifest), never the data files — at 100 TB the
# manifest is a few million rows while the table is billions, which is
# why compaction planning is a metadata-only query in every lake
# format. Here the manifest is simulated from orders as one "file" per
# (month, o_orderkey % 8) with a fixed 48-byte row-size proxy.

_COMPACT_TARGET = 4096  # bytes per merge group
_COMPACT_ROW_BYTES = 48


def compaction_plan(manifest: DataFrame, target: int) -> DataFrame:
    """Per-partition merge groups over small files.

    ``manifest``: (part, file_id, bytes). Files with ``bytes >= target``
    are left alone; the rest are ordered largest-first within their
    partition and cut into groups by cumulative-byte range — every
    group's input totals ~``target`` bytes (ordering by size first
    packs tightly; the deterministic (bytes desc, file_id) order makes
    the plan reproducible). Returns (part, group_id, n_files,
    group_bytes).
    """
    small = manifest.filter(F.col("bytes") < target)
    w = Window.partitionBy("part").orderBy(F.col("bytes").desc(), F.col("file_id"))
    cum = F.sum("bytes").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        small.withColumn(
            "group_id", F.floor((cum - 1) / F.lit(target)).cast("long")
        )
        .groupBy("part", "group_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("group_bytes"),
        )
    )


@query(
    "lake_compaction_plan",
    oracle=f"""
    WITH manifest AS (
      SELECT date_trunc('month', o_orderdate) AS part,
             o_orderkey % 8 AS file_id,
             CAST(COUNT(*) * {_COMPACT_ROW_BYTES} AS BIGINT) AS bytes
      FROM orders GROUP BY 1, 2
    ),
    small AS (
      SELECT part, file_id, bytes,
             SUM(bytes) OVER (
               PARTITION BY part ORDER BY bytes DESC, file_id
               ROWS UNBOUNDED PRECEDING
             ) AS cum
      FROM manifest WHERE bytes < {_COMPACT_TARGET}
    ),
    grp AS (
      SELECT part,
             CAST(FLOOR((cum - 1) / {_COMPACT_TARGET}) AS BIGINT) AS group_id,
             CAST(COUNT(*) AS BIGINT) AS n_files,
             CAST(SUM(bytes) AS BIGINT) AS group_bytes
      FROM small GROUP BY 1, 2
    ),
    tot AS (
      SELECT part, CAST(COUNT(*) AS BIGINT) AS n_files
      FROM manifest GROUP BY part
    )
    SELECT
      CAST(t.part AS DATE) AS part_month,
      t.n_files,
      CAST(COALESCE(SUM(g.n_files), 0) AS BIGINT) AS n_small_files,
      CAST(COUNT(g.group_id) AS BIGINT) AS n_merge_groups,
      CAST(COALESCE(SUM(g.group_bytes), 0) AS BIGINT) AS small_bytes,
      CAST(COALESCE(MAX(g.group_bytes), 0) AS BIGINT) AS max_group_bytes
    FROM tot t LEFT JOIN grp g USING (part)
    GROUP BY 1, 2
    ORDER BY part_month
    """,
)
def q_lake_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction planning summary per month-partition: how many files
    exist, how many are undersized, and how they pack into merge
    groups of ~{_COMPACT_TARGET} bytes (largest-first cumulative-range
    grouping — deterministic, and each group's input is within one
    file of the target).

    Engine plan: the manifest build is one map-side-combinable groupBy
    of the fact table (at production scale the manifest already exists
    as table metadata and the fact scan disappears); everything after
    runs on manifest rows — a per-partition window (bounded by files
    per partition), two KB-sized aggregates, one left join. Months
    whose files are all at target produce zero groups, not zero rows.
    """
    o = load_table(spark, "orders", sf_dir)
    manifest = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("part"),
        (F.col("o_orderkey") % 8).alias("file_id"),
    ).agg(
        (F.count(F.lit(1)) * _COMPACT_ROW_BYTES).cast("long").alias("bytes")
    )
    grp = compaction_plan(manifest, _COMPACT_TARGET)
    tot = manifest.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("n_files")
    )
    grp2 = grp.select(
        "part",
        F.col("n_files").alias("g_files"),
        "group_id",
        "group_bytes",
    )
    return (
        tot.join(grp2, "part", "left")
        .groupBy("part", "n_files")
        .agg(
            F.coalesce(F.sum("g_files"), F.lit(0))
            .cast("long")
            .alias("n_small_files"),
            F.count("group_id").cast("long").alias("n_merge_groups"),
            F.coalesce(F.sum("group_bytes"), F.lit(0))
            .cast("long")
            .alias("small_bytes"),
            F.coalesce(F.max("group_bytes"), F.lit(0))
            .cast("long")
            .alias("max_group_bytes"),
        )
        .select(
            F.col("part").alias("part_month"),
            "n_files",
            "n_small_files",
            "n_merge_groups",
            "small_bytes",
            "max_group_bytes",
        )
        .orderBy("part_month")
    )
