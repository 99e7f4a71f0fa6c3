"""Time-series / hypertable operators (driver mandate: "hypertable
rollup"-class custom operators): gap-filled resampling and
last-observation-carried-forward interpolation.

Spark has no native gapfill — the composition is: bucket spine
(``sequence`` over the observed range, exploded) × dimension values,
left-joined with the bucketed aggregates; LOCF is then a
``last(ignorenulls)`` window over the spine — the same carry-forward
machinery as the as-of join (``operators/asof.py``).

Scale notes (100 TB): the spine is tiny (buckets × dims — thousands of
rows for years of hourly data) and broadcast; the data-side bucketed
aggregation is the only full-data pass, an ordinary partial/final hash
agg. LOCF windows partition by dim, so no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_kakfa_spark.functions.numeric import dsum, sql_dsum
from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table


def hourly_spine(df: DataFrame, ts_col: str, dims: DataFrame) -> DataFrame:
    """All (hour, dim) combinations spanning the observed time range."""
    bounds = df.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket")
    )
    return F.broadcast(hours).crossJoin(F.broadcast(dims))


@query(
    "ts_resample_gapfill",
    oracle=f"""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT g.bucket, t.event_type
      FROM bounds, UNNEST(generate_series(bounds.lo, bounds.hi, INTERVAL 1 HOUR)) AS g(bucket)
      CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    ),
    agg AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type,
             COUNT(*) AS n, {sql_dsum('value')} AS total
      FROM events GROUP BY 1, 2
    )
    SELECT
      s.bucket, s.event_type,
      COALESCE(a.n, 0) AS n,
      COALESCE(a.total, 0.0) AS total
    FROM spine s LEFT JOIN agg a USING (bucket, event_type)
    """,
)
def q_ts_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with gap fill: empty hours appear as zero rows.

    The hypertable-rollup staple — downstream joins/charts need dense
    buckets, not just the hours that happened to have events.
    """
    e = load_table(spark, "events", sf_dir)
    dims = e.select("event_type").distinct()
    spine = hourly_spine(e, "ts", dims)
    agg = e.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total"))
    return spine.join(agg, ["bucket", "event_type"], "left").select(
        "bucket",
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("total"), F.lit(0.0)).alias("total"),
    )


@query(
    "ts_gapfill_locf",
    oracle=f"""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT g.bucket, t.event_type
      FROM bounds, UNNEST(generate_series(bounds.lo, bounds.hi, INTERVAL 1 HOUR)) AS g(bucket)
      CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    ),
    agg AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type,
             {sql_dsum('value')} AS observed
      FROM events GROUP BY 1, 2
    ),
    joined AS (
      SELECT s.bucket, s.event_type, a.observed
      FROM spine s LEFT JOIN agg a USING (bucket, event_type)
    )
    SELECT
      bucket, event_type, observed,
      last_value(observed IGNORE NULLS) OVER (
        PARTITION BY event_type ORDER BY bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS filled
    FROM joined
    """,
)
def q_ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill + LOCF: empty hours inherit the last observed value.

    ``observed`` keeps the raw (nullable) hourly sum; ``filled`` carries
    the most recent non-null forward within each event_type — the
    interpolation mode sensor/metrics pipelines default to.
    """
    e = load_table(spark, "events", sf_dir)
    dims = e.select("event_type").distinct()
    spine = hourly_spine(e, "ts", dims)
    agg = e.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(dsum(F.col("value")).alias("observed"))
    joined = spine.join(agg, ["bucket", "event_type"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "bucket",
        "event_type",
        "observed",
        F.last("observed", ignorenulls=True).over(w).alias("filled"),
    )


@query(
    "ts_rolling_1h_value",
    oracle="""
    SELECT event_id, event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,4)))
                OVER (PARTITION BY event_type
                      ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS rolling_1h
    FROM events
    """,
)
def q_ts_rolling_1h_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval window frame: per-type trailing-1-hour value sum
    at every event (RANGE BETWEEN INTERVAL '1 hour' PRECEDING).

    The frame is defined on microsecond epoch values, so tie handling
    and the inclusive 1-hour bound are identical integer semantics in
    both engines; the summed measure routes through DECIMAL so the
    varying per-frame summation order cannot produce float drift
    (decimal addition is exactly associative, which is also what makes
    the decomposition below value-identical).

    TWO-BUCKET DECOMPOSITION (round 10): the naive form —
    ``partitionBy(event_type).orderBy(ts).rangeBetween(-1h, 0)`` —
    funnels each type's ENTIRE history through one window task
    (event_type has ~10 values, so at crawl scale that is a serial
    sort of terabytes; the fixtures hide it because one task fits).
    Instead, bucket events into 1-hour-aligned epochs: the trailing
    [t-1h, t] frame spans exactly its own bucket b = t div 1h and the
    previous one (t-1h lands in b-1 for every t, and nothing older
    than b-1 can reach t-1h), so

      rolling(t) = prefix(own bucket, ts' <= t)
                 + [bucket b-1 total - prefix(bucket b-1, ts' < t-1h)]

    Each event also emits a PROBE row pinned at (type, b-1, t-1h);
    one window pass over the real+probe union partitioned by
    (type, bucket) — thousands of independent partitions instead of
    ~10 — yields the inclusive prefix for real rows and the
    strict-prefix + partition total for probes (RANGE upper bound -1
    on integer microseconds = strictly-less, so ties at exactly t-1h
    stay INSIDE the frame, matching the oracle's inclusive bound;
    probes carry NULL values so they never pollute a sum). Probes
    join back by event_id. Two high-cardinality exchanges replace the
    one ~10-partition exchange.
    """
    hour = 3_600_000_000
    e = load_table(spark, "events", sf_dir).select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("tu"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    # Pure-integer floor bucketing: tu - pmod(tu, hour) is an exact
    # multiple of hour (pmod floors on negatives, unlike div), so the
    # div is exact at any epoch. The previous floor(tu / hour) was
    # DOUBLE division, which drifts off the true hour grid once the
    # long->double cast of tu loses microseconds (epoch 2^53 us, year
    # ~2255; measured — round-to-nearest absorbs the error below
    # that). Those drifts are upward-only/monotone/<=+1, which this
    # decomposition happens to tolerate (every consumer applies the
    # SAME bucket function), but exactness resting on a rounding-
    # consistency argument instead of integer arithmetic is exactly
    # the kind of latent dependency a refactor silently breaks —
    # tests/test_round5_ops.py pins the far-epoch boundary behavior.
    bucket = F.expr(f"(tu - pmod(tu, {hour})) div {hour}")
    reals = e.select(
        "event_id", "event_type", "tu",
        bucket.alias("b"),
        "v", F.lit(False).alias("is_probe"),
    )
    probes = e.select(
        "event_id", "event_type",
        (F.col("tu") - hour).alias("tu"),
        (bucket - 1).alias("b"),
        F.lit(None).cast("decimal(18,4)").alias("v"),
        F.lit(True).alias("is_probe"),
    )
    un = reals.unionByName(probes)
    part = Window.partitionBy("event_type", "b")
    incl = F.sum("v").over(
        part.orderBy("tu").rangeBetween(Window.unboundedPreceding, 0)
    )
    strict = F.sum("v").over(
        part.orderBy("tu").rangeBetween(Window.unboundedPreceding, -1)
    )
    total = F.sum("v").over(part)
    # n_s = how many NON-NULL prev-bucket values sit inside the frame:
    # distinguishes "suffix sums to NULL because nothing is there"
    # from "suffix genuinely sums values" so the all-NULL-frame corner
    # returns NULL exactly like the oracle's SUM
    n_s = F.count("v").over(part) - F.count("v").over(
        part.orderBy("tu").rangeBetween(Window.unboundedPreceding, -1)
    )
    scored = un.select(
        "event_id", "is_probe",
        incl.alias("p"),
        (total - F.coalesce(strict, F.lit(0).cast("decimal(18,4)"))).alias("s"),
        n_s.alias("ns"),
    )
    own = scored.filter(~F.col("is_probe")).select("event_id", "p")
    prev = scored.filter(F.col("is_probe")).select("event_id", "s", "ns")
    return (
        own.join(prev, "event_id")
        .join(e.select("event_id", "event_type"), "event_id")
        .select(
            "event_id",
            "event_type",
            # NULL only when the whole frame is NULL-valued (both
            # halves empty of non-null values) — the oracle's SUM rule
            F.when(
                F.col("p").isNull() & (F.col("ns") == 0), F.lit(None)
            )
            .otherwise(
                F.coalesce(F.col("p"), F.lit(0).cast("decimal(18,4)"))
                + F.coalesce(
                    F.when(F.col("ns") > 0, F.col("s")),
                    F.lit(0).cast("decimal(18,4)"),
                )
            )
            .cast("double")
            .alias("rolling_1h"),
        )
    )


@query(
    "ts_dow_seasonality",
    oracle=f"""
    WITH daily AS (
      SELECT
        event_type,
        CAST(ts AS DATE) AS day,
        CAST(isodow(ts) AS INTEGER) AS dow,
        value
      FROM events
    ),
    per_dow AS (
      SELECT
        event_type, dow,
        CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        SUM(CAST(value AS DECIMAL(18,4))) AS dv
      FROM daily GROUP BY 1, 2
    )
    SELECT
      event_type, dow, n_days, n_events,
      CAST(dv AS DOUBLE) AS dow_value,
      CAST(dv AS DOUBLE)
        / CAST(SUM(dv) OVER (PARTITION BY event_type) AS DOUBLE) AS share,
      ROUND(CAST(dv AS DOUBLE)
        / CAST(SUM(dv) OVER (PARTITION BY event_type) AS DOUBLE) * 7, 4)
        AS seasonal_idx
    FROM per_dow
    """,
)
def q_ts_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: each ISO
    weekday's share of the type's total value, and the seasonal index
    (share x 7 — 1.0 means a flat week, >1 an over-indexed day).

    The additive-decomposition building block that is exactly
    computable at any scale: value sums route through DECIMAL (exact,
    order-insensitive), the weekly share divides two exact decimals,
    so every number is bit-identical across engines and
    partitionings — unlike a rolling-mean trend, whose sliding double
    sums are evaluation-order-sensitive (the LOCF/rolling family
    handles those via frame windows over decimal sums:
    ``ts_rolling_1h_value``).

    Scale: one shuffle of the fact table onto (event_type, dow) with
    map-side combine; the share window runs over the ≤ |types|·7-row
    grid.
    """
    ev = load_table(spark, "events", sf_dir)
    iso_dow = ((F.dayofweek("ts") + 5) % 7 + 1).cast("int")
    per_dow = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            iso_dow.alias("dow"),
            "value",
        )
        .groupBy("event_type", "dow")
        .agg(
            F.countDistinct("day").alias("n_days"),
            F.count(F.lit(1)).alias("n_events"),
            # keep the DECIMAL sum: the share's window total must sum
            # decimals (exact, order-insensitive), not doubles
            F.sum(F.col("value").cast("decimal(18,4)")).alias("dv"),
        )
    )
    w = Window.partitionBy("event_type")
    share = F.col("dv").cast("double") / F.sum("dv").over(w).cast("double")
    return per_dow.select(
        "event_type",
        "dow",
        "n_days",
        "n_events",
        F.col("dv").cast("double").alias("dow_value"),
        share.alias("share"),
        F.round(share * 7, 4).alias("seasonal_idx"),
    )
