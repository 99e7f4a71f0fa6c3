"""Contracts for the ML feature-prep operators: leakage-safe target
encoding, k-anonymity auditing, feature hashing."""

from __future__ import annotations

import hashlib
from datetime import datetime

from pyspark.sql import Row

from flink_kakfa_spark.registry import all_queries


def _fold(orderkey: int, k: int = 5) -> int:
    return int(hashlib.md5(str(orderkey).encode()).hexdigest()[:8], 16) % k


def test_target_encode_excludes_own_fold(spark, tmp_path):
    rows = [
        Row(
            o_orderkey=i,
            o_custkey=1,
            o_orderstatus="O",
            o_totalprice=float(100 + i),
            o_orderdate=datetime(2024, 1, 1),
            o_orderpriority="1-URGENT" if i < 30 else "2-HIGH",
        )
        for i in range(60)
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/orders.parquet"
    )
    out = all_queries()["feature_target_encode"](spark, str(tmp_path)).collect()
    # recompute expectation from raw rows using the same md5 fold deal
    agg: dict[tuple[str, int], tuple[int, float]] = {}
    for r in rows:
        key = (r.o_orderpriority, _fold(r.o_orderkey))
        n, s = agg.get(key, (0, 0.0))
        agg[key] = (n + 1, s + r.o_totalprice)
    for row in out:
        key = (row["category"], row["fold"])
        n, s = agg[key]
        tot_n = sum(v[0] for k, v in agg.items() if k[0] == row["category"])
        tot_s = sum(v[1] for k, v in agg.items() if k[0] == row["category"])
        assert row["n_rows"] == n
        # engine value is ROUND(...,4)
        assert abs(row["oof_mean"] - (tot_s - s) / (tot_n - n)) < 1e-4
    # leakage check: a fold's own rows never contribute to its encoding
    assert len(out) == len(agg)


def test_k_anonymity_reports_only_violations(spark, tmp_path):
    rows = [
        Row(c_custkey=i, c_name=f"c{i}", c_nationkey=1, c_acctbal=0.0,
            c_mktsegment="RARE")
        for i in range(3)  # 3 < k=10: violating combo
    ] + [
        Row(c_custkey=100 + i, c_name=f"d{i}", c_nationkey=2, c_acctbal=0.0,
            c_mktsegment="COMMON")
        for i in range(12)  # 12 >= k: safe combo
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/customer.parquet"
    )
    out = all_queries()["privacy_k_anonymity"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert (out[0]["nationkey"], out[0]["segment"], out[0]["n_rows"]) == (
        1, "RARE", 3,
    )


def test_hashing_trick_conserves_tokens_and_buckets_match_md5(spark, tmp_path):
    docs = [
        Row(doc_id=0, text="alpha beta gamma alpha"),
        Row(doc_id=1, text="delta alpha"),
    ]
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = all_queries()["text_hashing_trick"](spark, str(tmp_path)).collect()
    assert sum(r["n_tokens"] for r in out) == 6
    assert sum(r["n_distinct_words"] for r in out) == 4

    def bucket(word: str) -> int:
        return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % 64

    by_bucket = {r["bucket"]: r for r in out}
    assert by_bucket[bucket("alpha")]["n_tokens"] >= 3
