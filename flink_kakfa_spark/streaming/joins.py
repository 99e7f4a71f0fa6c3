"""Stream-stream joins (SURVEY.md §2.3 J9's bigger sibling).

The reference never correlates two topics (its consumer is
pass-through), but any real deployment of its produce/consume pair
ends up correlating streams — clicks with purchases, inputs with
outputs. Structured Streaming supports this natively; the engine's
job is only to state the two things that bound the join state:

- a **watermark on both sides** (how late data may arrive), and
- an **event-time range constraint** in the join condition (how far
  apart matching rows may be).

Together they let Spark evict buffered rows once no future match is
possible — without them, stream-stream join state grows forever,
which is the 100 TB/day failure mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "key",
    time_col: str = "ts",
    tolerance: str = "10 seconds",
    how: str = "inner",
    late_by: str | None = None,
) -> DataFrame:
    """Equi-join of two (streaming or batch) message frames.

    Matches rows with equal ``key`` where the right event lands in
    ``[left.ts, left.ts + tolerance]``. Batch frames pass through the
    same plan (no watermark), so the batch join is the oracle for the
    streaming one.

    ``tolerance`` is only the event-time MATCH window; ``late_by`` is
    the independent watermark delay bounding how far out-of-order each
    input may arrive before its rows are dropped as late (state
    retention grows with it). It defaults to ``tolerance`` — the
    smallest delay that never drops an in-window match when inputs
    arrive in order — but a source with stragglers should pass a
    larger ``late_by`` rather than widening the join window.

    ``how="left_outer"`` emits unmatched left rows null-extended — in
    streaming mode Spark holds them until the watermark proves no
    future right row can match (left.ts + tolerance < watermark), so
    outer results trail the watermark rather than the data.
    """
    delay = late_by if late_by is not None else tolerance
    l = left.withWatermark(time_col, delay) if left.isStreaming else left
    r = right.withWatermark(time_col, delay) if right.isStreaming else right
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{time_col}") >= F.col(f"l.{time_col}"))
        & (
            F.col(f"r.{time_col}")
            <= F.col(f"l.{time_col}") + F.expr(f"INTERVAL {tolerance}")
        )
    )
    return (
        l.alias("l")
        .join(r.alias("r"), cond, how)
        .select(
            F.col(f"l.{key}").alias("key"),
            F.col("l.value").alias("l_value"),
            F.col("r.value").alias("r_value"),
            F.col(f"l.{time_col}").alias("l_ts"),
            F.col(f"r.{time_col}").alias("r_ts"),
        )
    )
