"""Behavioral analytics over the events stream (Tier C extension).

Ordered-funnel analysis: of the users who signed up, how many later
clicked, and of those, how many later purchased. The reference's
consumer only logs events (``go/consumer/consumer.go:79-81``); funnels
are the first analytic any owner of that event stream asks for.

Scale notes (100 TB of events): the whole funnel is computed with ONE
shuffle — both per-user "first qualifying event" columns come from
window aggregates over the same ``partitionBy(user_id)``, so Catalyst
reuses a single Exchange, and the final stage counts are a global
partial/final aggregate. No self-joins of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table


@query(
    "funnel_signup_click_purchase",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS ts0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS ts1
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts >= s.ts0
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS ts2
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.ts1
      GROUP BY e.user_id
    )
    SELECT
      CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signup,
      CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_after,
      CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_after,
      ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
            / (SELECT COUNT(*) FROM s), 4) AS r_click,
      ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
            / (SELECT COUNT(*) FROM c), 4) AS r_purchase
    """,
)
def q_funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-stage funnel: signup → click → purchase.

    Stage timestamps are per-user window minimums (conditional, so a
    user's click only counts if at-or-after their first signup, and a
    purchase only if at-or-after that click). Both windows share one
    ``partitionBy(user_id)`` exchange; the oracle states the same
    semantics with per-stage joins, which is the formulation you'd
    NOT run at scale.
    """
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "ts0",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
        )
        .withColumn(
            "ts1",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("ts0")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "ts2",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("ts1")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max(F.col("ts0").isNotNull()).alias("did_s"),
        F.max(F.col("ts1").isNotNull()).alias("did_c"),
        F.max(F.col("ts2").isNotNull()).alias("did_p"),
    )
    n_s = F.sum(F.col("did_s").cast("long"))
    n_c = F.sum(F.col("did_c").cast("long"))
    n_p = F.sum(F.col("did_p").cast("long"))
    return per_user.agg(
        n_s.alias("n_signup"),
        n_c.alias("n_click_after"),
        n_p.alias("n_purchase_after"),
        F.round(n_c.cast("double") / n_s, 4).alias("r_click"),
        F.round(n_p.cast("double") / n_c, 4).alias("r_purchase"),
    )


@query(
    "agg_salted_wordcount",
    oracle="""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_agg_salted_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship word count through the salted two-stage aggregation.

    Word frequencies are Zipfian — at 100 TB a handful of stopwords
    carry a double-digit share of all rows and would funnel into
    single reducers under plain groupBy. ``salted_count`` splits every
    key into 16 synthetic subkeys, pre-aggregates, then combines: two
    small shuffles instead of one skewed one. The oracle is the plain
    word count — salting must be invisible in the result.
    """
    from flink_kakfa_spark.functions.skew import salted_count

    d = load_table(spark, "documents", sf_dir)
    words = d.select(
        F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    return salted_count(words, "word", n_salts=16, out="cnt")


_CEP_GAP_MS = 300_000  # error -> purchase within 5 minutes


@query(
    "cep_error_then_purchase",
    oracle=f"""
    WITH seq AS (
      SELECT
        user_id, event_id, event_type, ts,
        LEAD(event_type) OVER w AS next_type,
        LEAD(event_id)   OVER w AS next_event_id,
        LEAD(ts)         OVER w AS next_ts
      FROM events
      WHERE event_type IN ('error', 'purchase')
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT
      user_id,
      event_id AS error_event_id,
      next_event_id AS purchase_event_id,
      CAST(epoch_ms(next_ts) - epoch_ms(ts) AS BIGINT) AS gap_ms
    FROM seq
    WHERE event_type = 'error' AND next_type = 'purchase'
      AND epoch_ms(next_ts) - epoch_ms(ts) <= {_CEP_GAP_MS}
    """,
)
def q_cep_error_then_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink-CEP-style pattern: an error IMMEDIATELY followed (among the
    two tracked event types) by a purchase within 5 minutes, per user.

    The pattern compiles to one ``lead`` window over
    ``partitionBy(user_id)`` — a single exchange of the pre-filtered
    fact rows; no self-join, no per-row state. The streaming twin
    (``streaming/stateful.py::error_purchase_matches``) detects the
    same pairs incrementally with keyed state.
    """
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.filter(F.col("event_type").isin("error", "purchase"))
        .select(
            "user_id",
            "event_id",
            "event_type",
            "ts",
            F.lead("event_type").over(w).alias("next_type"),
            F.lead("event_id").over(w).alias("next_event_id"),
            F.lead("ts").over(w).alias("next_ts"),
        )
    )
    gap = F.unix_millis("next_ts") - F.unix_millis("ts")
    return (
        seq.filter(
            (F.col("event_type") == "error")
            & (F.col("next_type") == "purchase")
            & (gap <= _CEP_GAP_MS)
        )
        .select(
            "user_id",
            F.col("event_id").alias("error_event_id"),
            F.col("next_event_id").alias("purchase_event_id"),
            gap.alias("gap_ms"),
        )
    )


@query(
    "anomaly_zscore_events",
    oracle="""
    WITH stats AS (
      SELECT
        event_id, event_type, value,
        AVG(value) OVER (PARTITION BY event_type) AS mu,
        STDDEV_SAMP(value) OVER (PARTITION BY event_type) AS sigma
      FROM events
    )
    SELECT event_id, event_type, value,
           ROUND((value - mu) / sigma, 4) AS z
    FROM stats
    WHERE ABS((value - mu) / sigma) > 3
    """,
)
def q_anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| > 3) in one window pass.

    Mean and stddev come from unbounded frames over the same
    ``partitionBy(event_type)`` — one exchange, no separate stats
    join. At 100 TB you'd compute the per-type moments as a tiny
    aggregate and broadcast them instead; the window form keeps the
    single-pass shape testable here.
    """
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type")
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
    return (
        ev.select("event_id", "event_type", "value", z.alias("zraw"))
        .filter(F.abs(F.col("zraw")) > 3)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(F.col("zraw"), 4).alias("z"),
        )
    )


@query(
    "streak_longest_purchase_days",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      FROM events WHERE event_type = 'purchase'
    ),
    grouped AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, anchor,
             CAST(COUNT(*) AS BIGINT) AS streak_len,
             MIN(day) AS streak_start
      FROM grouped GROUP BY user_id, anchor
    ),
    best AS (
      SELECT user_id, streak_len, streak_start,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY streak_len DESC, streak_start) AS rn
      FROM streaks
    )
    SELECT user_id, streak_len, streak_start
    FROM best WHERE rn = 1 AND streak_len >= 3
    """,
)
def q_streak_longest_purchase_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of consecutive purchase
    days (reported when it reaches 3+ days).

    The classic island key — calendar day minus the day's per-user row
    number — is constant exactly within a consecutive run, so streaks
    fall out of one groupBy. All three windows/aggregations share the
    same ``partitionBy(user_id)`` hash partitioning, so the fact rows
    shuffle once (the distinct day set is the only thing that moves).
    """
    ev = load_table(spark, "events", sf_dir)
    days = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    grouped = days.withColumn(
        "anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = grouped.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("day").alias("streak_start"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), F.col("streak_start")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(wb))
        .filter((F.col("rn") == 1) & (F.col("streak_len") >= 3))
        .select("user_id", "streak_len", "streak_start")
    )


@query(
    "anomaly_mad_events",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value,
             m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value,
           ROUND((d.value - d.med) / (1.4826 * m.mad), 4) AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE ABS((d.value - d.med) / (1.4826 * m.mad)) > 3.5
    """,
)
def q_anomaly_mad_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outliers via median absolute deviation (|robust z| > 3.5,
    the Iglewicz–Hoaglin rule; 1.4826 rescales MAD to sigma under
    normality).

    The robust sibling of ``anomaly_zscore_events``: mean/stddev move
    with the outliers they're hunting (masking), medians don't — the
    standard pick for long-tailed metric streams.

    Scale: two per-type exact medians (tiny grouped aggregates on the
    event_type key — the |types|-row relations broadcast back onto the
    stream), and the fact table never shuffles: both joins are
    broadcast, so the plan is two narrow passes over events. At lake
    scale swap exact medians for the mergeable histogram sketch
    (``agg_hist_quantile_rollup``) without touching the gate logic.
    """
    ev = load_table(spark, "events", sf_dir)
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    rz = (F.col("value") - F.col("med")) / (1.4826 * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            rz.alias("rz"),
        )
        .filter(F.abs(F.col("rz")) > 3.5)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(F.col("rz"), 4).alias("robust_z"),
        )
    )
