"""Streaming monitors: incremental checksum manifest and PSI drift."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_kakfa_spark.registry import all_queries
from flink_kakfa_spark.streaming.monitors import (
    PSI_BINS,
    psi_report,
    read_manifest,
    reference_profile,
    streaming_checksum_manifest,
    streaming_psi_monitor,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streamed_manifest_equals_batch_manifest(spark, tmp_path):
    """Stream the orders fixture file-by-file; the folded manifest
    must equal the batch operator's (commutativity end-to-end)."""
    src = tmp_path / "src"
    (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .repartition(3)
        .write.parquet(str(src))
    )
    stream = (
        spark.readStream.schema(
            spark.read.parquet(str(src)).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = streaming_checksum_manifest(
        stream, str(tmp_path / "manifest"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {
        r["shard"]: (r["n_rows"], r["sum_hash"], r["xor_hash"])
        for r in read_manifest(spark, str(tmp_path / "manifest")).collect()
    }
    want = {
        r["shard"]: (r["n_rows"], r["sum_hash"], r["xor_hash"])
        for r in all_queries()["reconcile_table_checksum"](
            spark, SF_DIR
        ).collect()
    }
    assert got == want
    # crash replay: restarting with the same checkpoint and no new
    # data must not change the manifest (per-batch overwrite)
    q2 = streaming_checksum_manifest(
        stream, str(tmp_path / "manifest"), str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    got2 = {
        r["shard"]: (r["n_rows"], r["sum_hash"], r["xor_hash"])
        for r in read_manifest(spark, str(tmp_path / "manifest")).collect()
    }
    assert got2 == want


def _events(uid_vals, minute0=0):
    t0 = dt.datetime(2024, 1, 1)
    return [
        Row(
            event_id=i,
            ts=t0 + dt.timedelta(minutes=minute0 + i),
            user_id=1,
            event_type="metric",
            value=float(v),
            props="",
        )
        for i, v in enumerate(uid_vals)
    ]


def _python_psi(ref_vals, batch_vals):
    lo, hi = min(ref_vals), max(ref_vals)

    def bin_of(v):
        if hi == lo:
            return 0
        return min(PSI_BINS - 1, max(0, math.floor((v - lo) * PSI_BINS / (hi - lo))))

    cr = [0] * PSI_BINS
    for v in ref_vals:
        cr[bin_of(v)] += 1
    cb = [0] * PSI_BINS
    for v in batch_vals:
        cb[bin_of(v)] += 1
    psi = 0.0
    for i in range(PSI_BINS):
        p = (cr[i] + 1) / (len(ref_vals) + PSI_BINS)
        q = (cb[i] + 1) / (len(batch_vals) + PSI_BINS)
        psi += (q - p) * math.log(q / p)
    return round(psi, 6)


def test_psi_report_matches_python_model_and_flags_shift(spark):
    ref_vals = [i % 10 for i in range(100)]  # uniform 0..9
    same_vals = [i % 10 for i in range(50)]  # same shape
    hot_vals = [9] * 50  # mass collapsed to the top bin
    ref = spark.createDataFrame(_events(ref_vals))
    prof = reference_profile(ref)
    same = psi_report(spark.createDataFrame(_events(same_vals)), prof).collect()[0]
    hot = psi_report(spark.createDataFrame(_events(hot_vals)), prof).collect()[0]
    assert same["psi"] == _python_psi(ref_vals, same_vals)
    assert hot["psi"] == _python_psi(ref_vals, hot_vals)
    assert same["drifted"] == 0
    assert hot["drifted"] == 1
    assert hot["psi"] > same["psi"]


def test_streaming_psi_monitor_appends_per_batch_reports(spark, tmp_path):
    ref = spark.createDataFrame(_events([i % 10 for i in range(100)]))
    prof = reference_profile(ref)
    src = tmp_path / "src"
    b0 = spark.createDataFrame(_events([i % 10 for i in range(40)]))
    b1 = spark.createDataFrame(_events([9] * 40, minute0=100))
    b0.coalesce(1).write.parquet(str(src / "f0.parquet"))
    b1.coalesce(1).write.parquet(str(src / "f1.parquet"))
    stream = (
        spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = streaming_psi_monitor(
        stream, prof, str(tmp_path / "log"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    rows = (
        spark.read.parquet(f"{tmp_path}/log/batch_id=*")
        .orderBy("batch_id")
        .collect()
    )
    assert len(rows) == 2
    assert sorted(r["drifted"] for r in rows) == [0, 1]  # one calm, one hot
    assert all(r["n_batch"] == 40 for r in rows)


def _typed_events(vals, event_type, minute0=0, id0=0):
    t0 = dt.datetime(2024, 1, 1)
    return [
        Row(
            event_id=id0 + i,
            ts=t0 + dt.timedelta(minutes=minute0 + i),
            user_id=1,
            event_type=event_type,
            value=float(v),
            props="",
        )
        for i, v in enumerate(vals)
    ]


def test_psi_report_flags_absent_type(spark):
    """A type present in the reference but absent from the batch must
    still produce a report row — total disappearance is the strongest
    drift signal — with n_batch=0, drifted=1, and the PSI of the
    all-smoothed-floor (uniform) live shares. An inner join on the
    batch totals would silently drop the row instead."""
    ref_vals = [i % 10 for i in range(100)]
    ref = spark.createDataFrame(
        _typed_events(ref_vals, "view") + _typed_events(ref_vals, "click", id0=200)
    )
    prof = reference_profile(ref)
    batch = spark.createDataFrame(_typed_events([i % 10 for i in range(50)], "view"))
    rows = {r["event_type"]: r for r in psi_report(batch, prof).collect()}
    assert set(rows) == {"view", "click"}
    assert rows["view"]["drifted"] == 0
    absent = rows["click"]
    assert absent["n_batch"] == 0
    assert absent["drifted"] == 1
    assert absent["psi"] == _python_psi(ref_vals, [])


def test_streamed_manifest_restart_with_new_data(spark, tmp_path):
    """Kill/restart evidence for the checksum manifest: stream part of
    the table, stop, land more files, restart from the same checkpoint
    — the folded manifest must equal the batch operator over the full
    table, exactly once (no double-counted shards)."""
    full = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    first = full.filter(F.col("o_orderkey") % 2 == 0)
    second = full.filter(F.col("o_orderkey") % 2 == 1)
    src = tmp_path / "src"
    first.repartition(2).write.parquet(str(src / "part0"))

    def run_once():
        stream = (
            spark.readStream.schema(full.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = streaming_checksum_manifest(
            stream, str(tmp_path / "manifest"), str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)

    run_once()  # half the table
    second.repartition(2).write.parquet(str(src / "part1"))
    run_once()  # restart: only the new files are processed
    got = {
        r["shard"]: (r["n_rows"], r["sum_hash"], r["xor_hash"])
        for r in read_manifest(spark, str(tmp_path / "manifest")).collect()
    }
    want = {
        r["shard"]: (r["n_rows"], r["sum_hash"], r["xor_hash"])
        for r in all_queries()["reconcile_table_checksum"](spark, SF_DIR).collect()
    }
    assert got == want


def test_streaming_psi_monitor_restart_exactly_once(spark, tmp_path):
    """Kill/restart evidence for the PSI monitor: score one batch,
    stop, land a drifted batch, restart from the same checkpoint, then
    restart once more with nothing new — exactly two report rows, no
    duplicates, correct per-batch verdicts."""
    ref = spark.createDataFrame(_events([i % 10 for i in range(100)]))
    prof = reference_profile(ref)
    src = tmp_path / "src"
    b0 = spark.createDataFrame(_events([i % 10 for i in range(40)]))
    b0.coalesce(1).write.parquet(str(src / "f0.parquet"))

    def run_once():
        stream = (
            spark.readStream.schema(b0.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = streaming_psi_monitor(
            stream, prof, str(tmp_path / "log"), str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)

    run_once()
    b1 = spark.createDataFrame(_events([9] * 40, minute0=100))
    b1.coalesce(1).write.parquet(str(src / "f1.parquet"))
    run_once()  # restart picks up only the drifted batch
    run_once()  # nothing new: must add nothing
    rows = (
        spark.read.parquet(f"{tmp_path}/log/batch_id=*")
        .orderBy("batch_id")
        .collect()
    )
    assert len(rows) == 2
    assert [r["drifted"] for r in rows] == [0, 1]
    assert all(r["n_batch"] == 40 for r in rows)


def test_streaming_cusum_matches_batch_and_restarts_exactly_once(
    spark, tmp_path
):
    """Kill/restart evidence for the CUSUM monitor: stream half the
    event history, stop, land the other half, restart from the same
    checkpoint, restart once more with nothing new — the folded report
    must equal the batch operator over the full fixture (same peak,
    same day), proving the partials merged exactly once."""
    from flink_kakfa_spark.streaming.monitors import (
        read_cusum_report,
        streaming_cusum_monitor,
    )

    full = spark.read.parquet(f"{SF_DIR}/events.parquet")
    first = full.filter(F.col("event_id") % 2 == 0)
    second = full.filter(F.col("event_id") % 2 == 1)
    src = tmp_path / "src"
    first.repartition(2).write.parquet(str(src / "part0"))

    def run_once():
        stream = (
            spark.readStream.schema(full.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = streaming_cusum_monitor(
            stream, str(tmp_path / "state"), str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)

    run_once()
    second.repartition(2).write.parquet(str(src / "part1"))
    run_once()  # restart: only the new files are processed
    run_once()  # nothing new: partials must not double-count
    got = {
        r["event_type"]: (r["n_days"], r["change_day"], r["max_cusum_scaled"])
        for r in read_cusum_report(spark, str(tmp_path / "state")).collect()
    }
    want = {
        r["event_type"]: (r["n_days"], r["change_day"], r["max_cusum_scaled"])
        for r in all_queries()["ts_cusum_changepoint"](spark, SF_DIR).collect()
    }
    assert got == want


def test_streaming_cms_matches_batch_estimates_after_restart(spark, tmp_path):
    """Kill/restart evidence for the count-min monitor: stream half the
    corpus, stop, land the rest, restart, restart again with nothing
    new — folded-cell estimates for the batch operator's top-20 words
    must equal that operator's cms_estimate values exactly (cell-wise
    SUM mergeability), with no double counting."""
    from flink_kakfa_spark.streaming.monitors import (
        read_cms_estimates,
        streaming_cms_monitor,
    )

    full = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    first = full.filter(F.col("doc_id") % 2 == 0)
    second = full.filter(F.col("doc_id") % 2 == 1)
    src = tmp_path / "src"
    first.repartition(2).write.parquet(str(src / "part0"))

    def run_once():
        stream = (
            spark.readStream.schema(full.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = streaming_cms_monitor(
            stream, str(tmp_path / "cms"), str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)

    run_once()
    second.repartition(2).write.parquet(str(src / "part1"))
    run_once()
    run_once()  # nothing new: cells must not double-count
    batch = {
        r["word"]: r["cms_estimate"]
        for r in all_queries()["sketch_cms_heavy_hitters"](spark, SF_DIR).collect()
    }
    got = {
        r["word"]: r["cms_estimate"]
        for r in read_cms_estimates(
            spark, str(tmp_path / "cms"), sorted(batch)
        ).collect()
    }
    assert got == batch


def test_streaming_snapshot_diff_matches_batch_after_restart(spark, tmp_path):
    """Kill/restart evidence for the snapshot-diff monitor: stream half
    of orders, stop, land the other half, restart from the same
    checkpoint, restart once more with nothing new — the folded
    per-class diff (counts, key checksum, DECIMAL-exact price drift)
    must equal the batch operator's report exactly, with no double
    counting."""
    from flink_kakfa_spark.streaming.monitors import (
        read_snapshot_diff,
        streaming_snapshot_diff_monitor,
    )

    full = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    first = full.filter(F.col("o_orderkey") % 2 == 0)
    second = full.filter(F.col("o_orderkey") % 2 == 1)
    src = tmp_path / "src"
    first.repartition(2).write.parquet(str(src / "part0"))

    def run_once():
        stream = (
            spark.readStream.schema(full.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = streaming_snapshot_diff_monitor(
            stream, str(tmp_path / "diff"), str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)

    run_once()
    second.repartition(2).write.parquet(str(src / "part1"))
    run_once()
    run_once()  # nothing new: partials must not double-fold
    batch = {
        r["change_type"]: (r["n_rows"], r["sum_key"], r["sum_price_delta"])
        for r in all_queries()["reconcile_snapshot_diff"](
            spark, SF_DIR
        ).collect()
    }
    got = {
        r["change_type"]: (r["n_rows"], r["sum_key"], r["sum_price_delta"])
        for r in read_snapshot_diff(spark, str(tmp_path / "diff")).collect()
    }
    assert got == batch


def test_streaming_kmv_matches_batch_estimates_after_restart(spark, tmp_path):
    """Kill/restart evidence for the KMV monitor: stream half the
    event history, stop, land the rest, restart, restart again with
    nothing new — the folded per-type distinct-user estimates must
    equal the batch operator's kmv_users exactly (k-min-of-union
    mergeability), with no double counting."""
    from flink_kakfa_spark.streaming.monitors import (
        read_kmv_estimates,
        streaming_kmv_monitor,
    )

    full = spark.read.parquet(f"{SF_DIR}/events.parquet")
    first = full.filter(F.col("event_id") % 2 == 0)
    second = full.filter(F.col("event_id") % 2 == 1)
    src = tmp_path / "src"
    first.repartition(2).write.parquet(str(src / "part0"))

    def run_once():
        stream = (
            spark.readStream.schema(full.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = streaming_kmv_monitor(
            stream, str(tmp_path / "kmv"), str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)

    run_once()
    second.repartition(2).write.parquet(str(src / "part1"))
    run_once()
    run_once()  # nothing new: sketches must not double-merge
    batch = {
        r["event_type"]: r["kmv_users"]
        for r in all_queries()["sketch_kmv_distinct_rollup"](
            spark, SF_DIR
        ).collect()
    }
    got = {
        r["event_type"]: r["kmv_users"]
        for r in read_kmv_estimates(spark, str(tmp_path / "kmv")).collect()
    }
    assert got == batch
