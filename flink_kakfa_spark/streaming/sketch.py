"""Streaming count-min sketch: a continuously-maintained, mergeable
frequency summary of the word stream.

The mergeability that makes the batch CMS useful at 100 TB
(``operators/sketches.py::q_sketch_cms_heavy_hitters`` — shard
sketches add cell-wise) is exactly what makes it streamable: each
micro-batch contributes a delta sketch, and the maintained table is
the cell-wise sum of every delta so far. State is O(depth x width)
— 768 cells — no matter how much stream has passed, which is the
entire point of sketching the stream instead of counting it.

Exactly-once: the sketch table is VERSIONED BY BATCH ID
(``<path>/v=<epoch>``). Replaying micro-batch N after a crash
recomputes version N from version N-1 plus batch N's delta — the
same bytes — so a duplicate delivery cannot double-count (same
idempotent-overwrite discipline as ``streaming/matview.py``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_kakfa_spark.operators.sketches import (
    _CMS_DEPTH,
    _cms_bucket_spark,
)


def cms_delta(words: DataFrame) -> DataFrame:
    """Word rows -> (salt, bucket, total) delta-sketch cells.

    Works on batch and streaming DataFrames alike (narrow explode +
    one aggregation); the batch form is the oracle for the stream.
    """
    cells = words.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(salt).alias("salt"),
                        _cms_bucket_spark(F.col("word"), salt).alias("bucket"),
                    )
                    for salt in range(_CMS_DEPTH)
                ]
            )
        ).alias("sb")
    ).select("sb.salt", "sb.bucket")
    return cells.groupBy("salt", "bucket").agg(
        F.count(F.lit(1)).alias("total")
    )


def _versions(spark, path: str) -> list[int]:
    from py4j.protocol import Py4JJavaError  # noqa: F401 - doc only

    hadoop_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hadoop_path):
        return []
    out = []
    for st in fs.listStatus(hadoop_path):
        m = re.fullmatch(r"v=(\d+)", st.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def read_cms(spark, path: str) -> DataFrame | None:
    """Latest committed sketch version, or None before the first batch."""
    vs = _versions(spark, path)
    if not vs:
        return None
    return spark.read.parquet(f"{path}/v={vs[-1]}")


def materialize_cms(messages: DataFrame, path: str, checkpoint: str):
    """Maintain the CMS table from a (value, ts) message stream.

    Stateless stream (no streaming agg): each micro-batch folds its
    delta into the previous version with plain batch code inside
    ``foreachBatch`` — the merge is a union + re-aggregate of two
    768-cell tables, so the per-batch cost is the batch scan plus
    O(1) sketch work.
    """
    spark = messages.sparkSession
    words = messages.select(
        F.explode(F.split(F.col("value"), " ")).alias("word")
    ).filter(F.col("word") != "")

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        delta = cms_delta(batch_df)
        prior = [v for v in _versions(spark, path) if v < batch_id]
        if prior:
            base = spark.read.parquet(f"{path}/v={prior[-1]}")
            merged = (
                base.unionByName(delta)
                .groupBy("salt", "bucket")
                .agg(F.sum("total").alias("total"))
            )
        else:
            merged = delta
        merged.coalesce(1).write.mode("overwrite").parquet(
            f"{path}/v={batch_id}"
        )

    return (
        words.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
