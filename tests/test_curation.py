"""Curation round-2 operators: incremental ingest admission, DSIR
weights, tokenizer fertility, and the zlib compression-ratio gate
(python-oracle: DuckDB has no zlib)."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from flink_kakfa_spark.operators.curation import (
    DSIR_TARGET_LANG,
    q_corpus_dsir_weights,
    q_dedup_incremental_ingest,
    q_quality_compression_ratio,
)
from flink_kakfa_spark.sources.tables import load_table


def test_compression_ratio_matches_python_zlib(spark, sf_dir):
    """Exact python oracle: recompute every ratio with zlib directly."""
    got = {
        r["doc_id"]: (r["orig_bytes"], r["comp_bytes"], r["compression_ratio"])
        for r in q_quality_compression_ratio(spark, sf_dir).collect()
    }
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text").collect()
    assert len(got) == len(docs) > 0
    for r in docs:
        raw = r["text"].encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        assert got[r["doc_id"]] == (
            len(raw),
            comp,
            round(comp / len(raw), 4),
        )


def test_compression_ratio_flags_repetitive_text(spark):
    """A pure-boilerplate doc must compress far below a varied one."""
    df = spark.createDataFrame(
        [(1, "spam " * 200), (2, " ".join(f"w{i}x{i * 7 % 97}" for i in range(200)))],
        "doc_id long, text string",
    )

    import flink_kakfa_spark.operators.curation as cur

    # drive the same mapInPandas body through a synthetic frame
    orig = cur.load_table
    try:
        cur.load_table = lambda *_a, **_k: df
        rows = {r["doc_id"]: r["compression_ratio"]
                for r in q_quality_compression_ratio(spark, "ignored").collect()}
    finally:
        cur.load_table = orig
    assert rows[1] < 0.1 < rows[2]


def test_incremental_ingest_statuses(spark, sf_dir):
    out = q_dedup_incremental_ingest(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["status"] in {"exact_dup", "near_dup", "new"}
        assert 0 <= r["n_shared"] <= r["n_shingles"]
        want = (
            "near_dup"
            if r["overlap_ratio"] >= 0.5
            else "new"
        )
        # exact_dup may override, but only upward
        assert r["status"] in {want, "exact_dup"}


def test_dsir_weights_favor_target_lang(spark, sf_dir):
    """On average, target-language docs must score above the rest."""
    w = q_corpus_dsir_weights(spark, sf_dir)
    d = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    joined = w.join(d, "doc_id").groupBy(
        (F.col("lang") == DSIR_TARGET_LANG).alias("is_target")
    ).agg(F.avg("dsir_logratio").alias("m"))
    m = {r["is_target"]: r["m"] for r in joined.collect()}
    assert m[True] > m[False]
