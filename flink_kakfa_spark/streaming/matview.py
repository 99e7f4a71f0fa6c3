"""Streaming materialized view: a continuously-maintained aggregate table.

The reference's implied end state — word counts continuously published
to ``word-count-output`` (``go/consumer/consumer.go:13``) — but landed
as a queryable Parquet table instead of a topic: every micro-batch
rewrites the aggregate via an **idempotent overwrite**, so batch
readers always see a complete, consistent snapshot, and replaying a
micro-batch after a crash converges to the same bytes (exactly-once
at the table level, strictly stronger than the reference's
at-least-once delivery).

Scale notes: complete-mode word counts are vocabulary-sized (bounded,
~KBs even for TB corpora), so a full overwrite per batch is the
cheapest correct maintenance strategy. Partitioning the view by
``pfx`` (first letter) keeps single-key lookups pruned; a fact-sized
aggregate would instead use dynamic partition overwrite to rewrite
only the partitions a batch touched — the hook below sets
``partitionOverwriteMode=dynamic`` so that path is exercised too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_kakfa_spark.streaming.wordcount import streaming_word_counts


def materialize_word_counts(messages: DataFrame, path: str, checkpoint: str):
    """Maintain word counts as a Parquet table; returns the StreamingQuery.

    Complete-mode aggregate → ``foreachBatch`` → dynamic-partition
    overwrite keyed by first letter. Idempotent: re-running a batch
    (crash replay) rewrites the same partitions with the same rows.
    """
    counts = streaming_word_counts(messages)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("pfx", F.substring("word", 1, 1))
            .repartition("pfx")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("pfx")
            .parquet(path)
        )

    return (
        counts.writeStream.outputMode("complete")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
