"""Prefix-pruning demonstration for the exact PPJoin census
(``dedup_jaccard_prefix_filter``) on a realistic Zipfian vocabulary.

The driver's documents fixture draws every text from a ~31-word
vocabulary, which deliberately DEFEATS prefix pruning: with so few
distinct tokens, even each document's rarest tokens are shared by a
large fraction of the corpus, so the candidate join approaches the
all-pairs census and the query's cost is the size of its own answer.
Real crawl text is Zipfian — most tokens are rare — and the prefix
filter indexes exactly each document's rarest tokens, so candidate
buckets stay tiny.

This tool builds a deterministic Zipf-vocabulary documents fixture
(same row count and schema as the base fixture, ~3% injected near-dup
pairs at J >= 0.9) and counts, for the base fixture and the Zipf one:

- representatives after exact collapse,
- all-pairs baseline (reps choose 2),
- candidate pairs surviving prefix + size filter (via
  ``ppjoin_candidates`` — the same code path the query runs),
- and the full query's wall time.

Usage: python tools/zipf_ppjoin.py  [SPARK_GRAFT_SF_DIR to override base]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from flink_kakfa_spark.operators.dedup import ppjoin_candidates
from flink_kakfa_spark.registry import all_queries
from flink_kakfa_spark.session import get_spark
from flink_kakfa_spark.sources.tables import load_table

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_zipf"
VOCAB = 20_000
ZIPF_S = 1.05
SEED = 20260815


def build_zipf_fixture(n_docs: int) -> None:
    """Deterministic Zipfian documents table: doc lengths 30-80
    distinct tokens, ~3% of docs cloned with one token dropped
    (J = (n-1)/n >= 0.966 — above the 0.9 census threshold)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    ranks = np.arange(1, VOCAB + 1)
    p = 1.0 / ranks**ZIPF_S
    p /= p.sum()
    texts: list[str] = []
    n_base = n_docs - n_docs // 33  # leave room for injected near-dups
    for _ in range(n_base):
        length = int(rng.integers(30, 81))
        words = rng.choice(VOCAB, size=length, replace=False, p=p)
        texts.append(" ".join(f"w{w}" for w in words))
    while len(texts) < n_docs:  # near-dup: clone minus one token
        src = texts[int(rng.integers(0, n_base))].split(" ")
        drop = int(rng.integers(0, len(src)))
        texts.append(" ".join(t for i, t in enumerate(src) if i != drop))
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, n_docs + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_docs, pa.string()),
            "source": pa.array(["zipf"] * n_docs, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{OUT}/documents.parquet")


def measure(spark, sf_dir: str, label: str) -> None:
    d = load_table(spark, "documents", sf_dir)
    groups, cand = ppjoin_candidates(d)
    n_reps = groups.count()
    n_cand = cand.count()
    allpairs = n_reps * (n_reps - 1) // 2
    fn = all_queries()["dedup_jaccard_prefix_filter"]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    t = time.time() - t0
    print(
        f"| {label} | {n_reps} | {allpairs} | {n_cand} "
        f"| {n_cand / max(allpairs, 1):.4%} | {t:.2f} s |",
        flush=True,
    )


def main() -> None:
    spark = get_spark("zipf-ppjoin")
    n_docs = load_table(spark, "documents", BASE).count()
    build_zipf_fixture(n_docs)
    print("| fixture | reps | all-pairs | candidates | cand/all-pairs | query time |")
    print("|---|---|---|---|---|---|")
    measure(spark, BASE, f"dense-vocab ({BASE})")
    measure(spark, OUT, f"zipf-vocab (v={VOCAB}, s={ZIPF_S})")


if __name__ == "__main__":
    main()
