"""End-to-end pipeline integration: the reference's topology, complete.

Mirrors ``go/integration/integration_test.go:20-62`` — produce the three
canonical sentences, run the (formerly missing) word-count job, consume
its output — using the engine's broker-less file channel in place of
topics. Assertions keep the reference's philosophy: order-insensitive,
set-containment (``go/producer/producer_test.go:187-194``), with the
expected flagship result from FIXTURES.md §1.3: each of the 8 words
exactly once.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_kakfa_spark.cli import main

CANONICAL = ["hello world", "flink kafka streaming", "data processing pipeline"]


def test_produce_wordcount_consume_round_trip(spark, tmp_path):
    topic_in = tmp_path / "input-words"        # producer's default topic name
    topic_out = tmp_path / "word-count-output"  # consumer's default topic name

    # --- produce: the 3 canonical sentences as reference-shaped messages
    msgs = [
        Row(key=f"key-{1704067200 + i}", value=s, ts=f"2024-01-01 00:00:{i:02d}")
        for i, s in enumerate(CANONICAL)
    ]
    # watermark-advancer closes the window (append-mode emission)
    msgs.append(Row(key="key-x", value="flush", ts="2024-01-01 01:00:00"))
    (
        spark.createDataFrame(msgs, "key string, value string, ts string")
        .withColumn("ts", F.to_timestamp("ts"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{topic_in}/b0")
    )

    # --- the word-count job (the reference's missing middle)
    rc = main(
        [
            "wordcount",
            "--source", f"dir:{topic_in}",
            "--sink", f"parquet:{topic_out}",
            "--checkpoint", str(tmp_path / "ckpt"),
            "--window", "1 minute",
            "--duration", "25",
        ]
    )
    assert rc == 0

    # --- consume: word-count-output carries key=word, value=count
    out = spark.read.parquet(str(topic_out))
    received = {(r["key"], r["value"]) for r in out.collect()}
    expected_words = {w for s in CANONICAL for w in s.split(" ")}
    assert len(expected_words) == 8
    # set-containment, order-insensitive — every word counted exactly once
    assert {(w, "1") for w in expected_words} <= received
    counts = {r["word"]: r["cnt"] for r in out.collect() if r["word"] in expected_words}
    assert all(c == 1 for c in counts.values())
