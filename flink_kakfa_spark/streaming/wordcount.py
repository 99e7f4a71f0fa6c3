"""The missing Flink job (SURVEY.md Tier B, §2.8 T1–T5): streaming word
count with tumbling / sliding / session windows and watermark handling.

The reference's repo is named after this job and its consumer reads its
output topic (``word-count-output``, ``go/consumer/consumer.go:13``),
but the job itself was never written. This module is that job, on
Structured Streaming.

All transformations here accept either a batch or a streaming
DataFrame with columns (value: string, ts: timestamp) — the batch
engine is the oracle for the streaming engine (SURVEY.md §5.2 item 3).

Scale notes: windowed streaming aggs keep state per (window, word);
watermarks bound that state (T4) — without them, 100 TB/day of stream
would grow state forever. Output goes through the same partial/final
hash agg as the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words(messages: DataFrame) -> DataFrame:
    """value sentence → one row per word, keeping event time."""
    return (
        messages.select(
            F.explode(F.split(F.col("value"), " ")).alias("word"), F.col("ts")
        )
        .filter(F.col("word") != "")
    )


def streaming_word_counts(messages: DataFrame) -> DataFrame:
    """T0/A1: global word count (complete-mode output for streams)."""
    return _words(messages).groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def windowed_word_counts(
    messages: DataFrame,
    window: str = "10 seconds",
    watermark: str | None = "10 seconds",
) -> DataFrame:
    """T1+T4: tumbling-window word count with optional watermark."""
    src = messages
    if watermark is not None and messages.isStreaming:
        src = messages.withWatermark("ts", watermark)
    w = _words(src)
    return (
        w.groupBy(F.window(F.col("ts"), window).alias("win"), F.col("word"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "word",
            "cnt",
        )
    )


def sliding_word_counts(
    messages: DataFrame,
    window: str = "30 seconds",
    slide: str = "10 seconds",
    watermark: str | None = "10 seconds",
) -> DataFrame:
    """T2: sliding-window word count (each row lands in window/slide panes)."""
    src = messages
    if watermark is not None and messages.isStreaming:
        src = messages.withWatermark("ts", watermark)
    w = _words(src)
    return (
        w.groupBy(F.window(F.col("ts"), window, slide).alias("win"), F.col("word"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "word",
            "cnt",
        )
    )


def session_word_counts(
    messages: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 seconds",
) -> DataFrame:
    """T3: session windows — a session closes after ``gap`` of silence."""
    src = messages.withWatermark("ts", watermark) if messages.isStreaming else messages
    w = _words(src)
    return (
        w.groupBy(F.session_window(F.col("ts"), gap).alias("win"), F.col("word"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "word",
            "cnt",
        )
    )


def dedup_messages(
    messages: DataFrame,
    keys: list[str] | None = None,
    watermark: str | None = "10 seconds",
) -> DataFrame:
    """T5: streaming dedup; watermark-bounded state when streaming."""
    keys = keys or ["key"]
    if messages.isStreaming and watermark is not None:
        return messages.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return messages.dropDuplicates(keys)


def trending_topk(counts: DataFrame, k: int = 3) -> DataFrame:
    """Top-k words per tumbling window (deterministic tie-break).

    Rank-over-window isn't allowed directly on a streaming aggregate,
    so this runs as batch post-processing on each micro-batch's
    windowed counts (see :func:`materialize_trending`) — the standard
    "streaming topN" recipe: aggregate in the engine, rank in
    ``foreachBatch``.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("win_start").orderBy(
        F.col("cnt").desc(), F.col("word").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def materialize_trending(
    messages: DataFrame,
    path: str,
    checkpoint: str,
    window: str = "10 seconds",
    k: int = 3,
):
    """T-row composition: continuously-maintained "trending words"
    table — tumbling-window counts (streaming agg, complete mode),
    ranked per window in ``foreachBatch``, idempotently overwritten
    per window partition. Crash replay rewrites identical partitions,
    so the table is exactly-once like ``materialize_word_counts``.
    """
    counts = windowed_word_counts(messages, window, watermark=None)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        (
            trending_topk(batch_df, k)
            .repartition("win_start")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("win_start")
            .parquet(path)
        )

    return (
        counts.writeStream.outputMode("complete")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
