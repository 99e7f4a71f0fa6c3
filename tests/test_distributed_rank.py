"""Distributed global rank: exact ROW_NUMBER/NTILE parity with the
single-partition window it replaces, including duplicate-heavy and
uneven-bucket (n % k != 0) inputs, plus the no-SinglePartition-window
plan assertion that is the whole point."""

from __future__ import annotations

import re

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from flink_kakfa_spark.operators.distributed_rank import (
    _ranked_with_counts,
    global_row_number,
    tie_dispersed,
    with_global_ntile,
)


def _fixture(spark, n=137):
    # duplicate-heavy values (v = i % 17) exercise the ties-in-one-bin
    # path; (v, id) is the total order
    rows = [Row(id=i, v=float((i * 7) % 17)) for i in range(n)]
    return spark.createDataFrame(rows).repartition(8)


def test_global_row_number_matches_window(spark):
    df = _fixture(spark)
    got = {
        r["id"]: r["_grn"]
        for r in global_row_number(df, ["v", "id"], "v", n_bins=8).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_ntile_matches_window_uneven(spark):
    # 137 % 4 = 1: first bucket takes the extra row
    df = _fixture(spark, n=137)
    got = {
        r["id"]: r["_tile"]
        for r in with_global_ntile(df, ["v", "id"], 4, "v", n_bins=8).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["t"]
        for r in df.withColumn("t", F.ntile(4).over(w)).collect()
    }
    assert got == want


def test_global_ntile_more_buckets_than_rows(spark):
    # k > n: NTILE degenerates to row_number
    df = _fixture(spark, n=5)
    got = {
        r["id"]: (r["_tile"], r["_grn"])
        for r in with_global_ntile(df, ["v", "id"], 9, "v", n_bins=4).collect()
    }
    assert sorted(t for t, _ in got.values()) == [1, 2, 3, 4, 5]
    assert all(t == rn for t, rn in got.values())


def test_tie_dispersal_rebalances_df_heavy_column(spark):
    """Gate the BALANCE property the round-10 tie-dispersal fix bought
    (VERDICT r10 item 4), not just rank correctness under ties: on a
    Zipf-shaped value column (df=1 for 85% of rows, like any real
    shingle dictionary) raw binning funnels the df=1 mass through ONE
    bin — the single-partition sort resurrected through tie skew —
    while tie_dispersed must spread it to near-ideal. A future
    "simplification" dropping the hash fraction keeps every
    correctness test green; this is the test that fails. (The 4M-row
    r10 measurement — 85% -> 3.1% max bin — shrinks to 50k rows.)"""
    n, n_bins = 50_000, 32
    rows = [
        # 85% df=1; the rest a heavy-ish tail so boundaries are real
        Row(shingle=f"s{i}", df=1 if i % 20 < 17 else 2 + (i * 13) % 97)
        for i in range(n)
    ]
    freq = spark.createDataFrame(rows).repartition(8)

    def max_bin_share(df, value_col):
        _, counts = _ranked_with_counts(
            df, [value_col, "shingle"], value_col, n_bins, "_grn"
        )
        cnts = [r["_cnt"] for r in counts.collect()]
        return max(cnts) / sum(cnts)

    # control: raw df binning must exhibit the skew this gate detects
    raw_share = max_bin_share(freq, "df")
    assert raw_share >= 0.5, f"control lost its skew: {raw_share:.3f}"
    # dispersed: max bin share near ideal (<= ~2x of 1/n_bins)
    disp = freq.withColumn("_v", tie_dispersed(F.col("df"), F.col("shingle")))
    disp_share = max_bin_share(disp, "_v")
    assert disp_share <= 2.0 / n_bins, (
        f"tie dispersion regressed: max bin share {disp_share:.3f} "
        f"(ideal {1 / n_bins:.3f}; raw-df control {raw_share:.3f})"
    )
    # the integer part still orders: rank under [_v, shingle] must be
    # df-ascending (rare-first), or the dictionary order is corrupted
    ranked = global_row_number(disp, ["_v", "shingle"], "_v", n_bins=n_bins)
    seq = [r["df"] for r in ranked.orderBy("_grn").select("df").collect()]
    assert seq == sorted(seq), "dispersion broke the df-ascending order"


def test_no_single_partition_window_on_fact(spark):
    """The replacement plan must not funnel the fact through one task:
    every Window node above an Exchange SinglePartition may only see
    the n_bins-row offset relation (child of the tiny counts agg)."""
    df = _fixture(spark, n=200)
    ranked = global_row_number(df, ["v", "id"], "v", n_bins=8)
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "windowspecdefinition" in ln and re.search(r"\bWindow\b", ln):
            window_block = "\n".join(lines[i : i + 8])
            if "Exchange SinglePartition" in window_block:
                # must be the offsets window: its subtree aggregates
                # counts (partial_count), never raw fact rows
                assert "count(1)" in window_block or "HashAggregate" in window_block, plan
