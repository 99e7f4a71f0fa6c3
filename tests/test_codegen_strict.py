"""Strict-codegen gate for the generated-expression-heavy queries.

The r11 lesson (`SCALE.md`, embedding-LSH): a Janino compile failure —
one whole-stage-codegen method growing past the JVM's 64 KB limit —
falls back to interpreted evaluation SILENTLY. Answers stay correct,
wall time multiplies, and every value-based check stays green; the
defect survived three rounds that way. Two confs make the failure loud:

- ``spark.sql.codegen.fallback=false``: a WSCG compile error aborts the
  query instead of dropping the stage to interpreted mode.
- ``spark.sql.codegen.factoryMode=CODEGEN_ONLY``: expression-level
  codegen (UnsafeProjection etc.) errors propagate instead of silently
  switching to the interpreted factory.

This gate runs the queries that BUILD large generated expressions —
unrolled signature/permutation/dot-product SQL whose term count is a
code-size liability — under both confs at sf0.001. Full-registry
coverage runs per-round in ``tools/diffcheck.py`` under the same confs;
``tools/plan_audit.py`` additionally flags any final plan with zero
WSCG spans (the post-compile ``hugeMethodLimit`` soft fallback, which
``codegen.fallback=false`` does NOT catch).
"""

from __future__ import annotations

import pytest

from flink_kakfa_spark import registry

# Every query whose plan carries a hand-unrolled expression family:
# minhash permutation lanes, simhash bit packs, hyperplane dots,
# PQ/SQ8 codebook distances, sketch register lanes, winnow rolling
# hashes. These are the code-size liabilities; trivial Projects cannot
# hit the 64 KB method limit.
STRICT_QUERIES = [
    "agg_hll_mergeable_rollup",
    "dedup_embedding_cosine",  # the r11 defect: 64-term dot x tables*bits lanes
    "dedup_jaccard_prefix_filter",
    "dedup_minhash_lsh",
    "dedup_minhash_portable",
    "dedup_near_unique",
    "dedup_simhash",
    "sim_pq_adc_topk",
    "sim_sq8_rescore_topk",
    "sketch_kmv_set_overlap",
    "text_winnow_fingerprints",
]

_CONFS = {
    "spark.sql.codegen.fallback": "false",
    "spark.sql.codegen.factoryMode": "CODEGEN_ONLY",
}


@pytest.fixture(scope="module")
def strict_spark(spark):
    """The shared session with codegen failures made fatal; restored after."""
    registry.load_all()
    saved = {k: spark.conf.get(k) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


@pytest.mark.parametrize("name", STRICT_QUERIES)
def test_compiles_under_strict_codegen(strict_spark, sf_dir, name):
    """The query must execute with codegen fallback disabled — a Janino
    64 KB failure (or any expression-codegen error) raises here instead
    of silently running interpreted."""
    rows = registry.QUERIES[name](strict_spark, sf_dir).collect()
    assert rows is not None  # execution itself is the assertion


def test_embedding_lsh_final_plan_has_codegen_spans(spark, sf_dir):
    """Anchor for the soft-fallback path the strict confs cannot see:
    after a successful compile, a method over ``hugeMethodLimit`` still
    drops its stage to interpreted WITHOUT an error. The fixed
    signature stage generates a few KB per stage, so the executed plan
    must contain whole-stage-codegen spans; zero spans means the
    broadcast-weights form regressed to an unrolled shape again."""
    registry.load_all()
    df = registry.QUERIES["dedup_embedding_cosine"](spark, sf_dir)
    df.collect()  # finalize the AQE plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("*(") >= 1, "no WSCG spans: signature stage is interpreted"
