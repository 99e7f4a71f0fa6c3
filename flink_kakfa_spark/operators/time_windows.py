"""Event-time window operators in batch form (SURVEY.md §2.8 T1–T3).

The same ``window()`` / ``session_window()`` expressions drive the
streaming word-count job (``flink_kakfa_spark/streaming/wordcount.py``);
running them over the bounded ``events`` table makes them
oracle-checkable — the DuckDB oracles rebuild tumbling buckets with
``time_bucket`` and session windows with first-principles
gaps-and-islands SQL, so a hash match here certifies the window
semantics the streaming layer relies on.

Scale notes: windowed aggregation is an ordinary hash agg keyed on
(bucket, dims) — partial/final, no sort. Session windows shuffle once
on the partition key then sort within partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kakfa_spark.functions.numeric import dsum, sql_dsum
from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table


@query(
    "window_tumbling_events",
    oracle=f"""
    SELECT
      time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
      time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS win_end,
      event_type,
      COUNT(*) AS n,
      {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_window_tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 (batch form): 1-hour tumbling windows per event type."""
    e = load_table(spark, "events", sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "window_sliding_events",
    oracle="""
    WITH panes AS (
      SELECT
        e.event_type,
        time_bucket(INTERVAL 30 MINUTE, e.ts) - k.k * INTERVAL 30 MINUTE AS win_start
      FROM events e, UNNEST([0, 1]) AS k(k)
      WHERE e.ts >= time_bucket(INTERVAL 30 MINUTE, e.ts) - k.k * INTERVAL 30 MINUTE
        AND e.ts <  time_bucket(INTERVAL 30 MINUTE, e.ts) - k.k * INTERVAL 30 MINUTE + INTERVAL 1 HOUR
    )
    SELECT win_start, win_start + INTERVAL 1 HOUR AS win_end, event_type, COUNT(*) AS n
    FROM panes
    GROUP BY 1, 2, 3
    """,
)
def q_window_sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 (batch form): 1-hour windows sliding every 30 minutes.

    Each event lands in window/slide = 2 panes; the oracle materializes
    the panes explicitly via UNNEST.
    """
    e = load_table(spark, "events", sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
        )
    )


@query(
    "window_session_events",
    oracle="""
    WITH marked AS (
      SELECT
        user_id, ts,
        CASE WHEN LAG(ts) OVER w IS NULL
               OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
      SELECT
        user_id, ts,
        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    )
    SELECT
      user_id,
      MIN(ts) AS sess_start,
      MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
      COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sess_id
    """,
)
def q_window_session_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 (batch form): 30-minute-gap session windows per user.

    The oracle derives identical sessions from first principles
    (gaps-and-islands over LAG), certifying ``session_window``'s
    gap-merge semantics.
    """
    e = load_table(spark, "events", sf_dir)
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("sess_start"),
            F.col("win.end").alias("sess_end"),
            "n_events",
        )
    )
