"""10× scale-posture runner (the SCALE.md measurement protocol, scripted).

Builds a 10×-replicated copy of the sf0.1 fixtures under /tmp (ids
shifted so keys stay unique; texts replicated VERBATIM so the corpus is
dup-heavy — the regime that breaks quadratic near-dup plans), then
times the named queries at sf0.1 vs 10× (warmed plans, noop sink) and
prints per-query scaling factors.

Usage: python tools/scale10.py q1 q2 ...     [SPARK_GRAFT_SF_DIR to override base]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_kakfa_spark.registry import all_queries
from flink_kakfa_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_scale10"
COPIES = 10

# per-table key columns to shift per replica (user_id deliberately NOT
# shifted in events: 10× events per user stresses the per-user windows)
SHIFT = {
    "documents": ["doc_id"],
    "events": ["event_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "embeddings": ["vec_id"],
}
SMALL = ["region", "nation", "customer", "supplier", "part"]


def build(spark) -> None:
    if os.path.isdir(OUT):
        if os.environ.get("SPARK_GRAFT_SCALE10_REUSE") == "1":
            return  # reuse the previously built 10x fixtures
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    for t in SMALL:
        shutil.copy(f"{BASE}/{t}.parquet", f"{OUT}/{t}.parquet")
    for t, keys in SHIFT.items():
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        offs = {k: df.agg(F.max(k)).collect()[0][0] + 1 for k in keys}
        parts = []
        for i in range(COPIES):
            p = df
            for k, off in offs.items():
                p = p.withColumn(k, F.col(k) + F.lit(i * off))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")


def timed(fn, spark, sf_dir: str) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: python tools/scale10.py QUERY ...", file=sys.stderr)
        raise SystemExit(2)
    spark = get_spark("scale10")
    qs = all_queries()
    build(spark)
    print(f"| query | sf0.1 | 10x data | scaling |")
    print(f"|---|---|---|---|")
    for name in names:
        t1 = timed(qs[name], spark, BASE)
        t10 = timed(qs[name], spark, OUT)
        print(f"| {name} | {t1:.2f} s | {t10:.2f} s | ~{t10 / t1:.1f}x |", flush=True)


if __name__ == "__main__":
    main()
