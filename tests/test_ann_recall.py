"""ANN recall audit (``sim_ann_recall_at_k``): shape invariants and
measured recall floors for every ANN shortlist in the engine, against
brute-force cosine ground truth (VERDICT r6 item 5).

The floors are deliberately below the measured values (sf0.001:
ivf 0.7 / lsh 0.2 / lsh_multiprobe 0.9 after the round-8 Hamming-2
upgrade / pq_adc 0.9 / sq8 1.0) so a QUANTIZER regression trips them
while fixture regeneration noise does not; the exact values are
oracle-pinned by the driver differential.
"""

from __future__ import annotations

from flink_kakfa_spark.registry import all_queries


def _recall(spark, sf_dir):
    rows = all_queries()["sim_ann_recall_at_k"](spark, sf_dir).collect()
    return {r["method"]: r for r in rows}


def test_recall_audit_shape_and_bounds(spark, sf_dir):
    got = _recall(spark, sf_dir)
    assert set(got) == {"ivf_portable", "lsh", "lsh_multiprobe", "pq_adc", "sq8"}
    for m, r in got.items():
        assert r["k"] == 10
        assert 0 <= r["n_hits"] <= 10
        assert abs(r["recall"] - r["n_hits"] / 10) < 1e-9, m

    # measured floors (see module docstring for the quiet margins)
    assert got["sq8"]["recall"] == 1.0  # 50-wide rescore catches all of top-10
    assert got["pq_adc"]["recall"] >= 0.5
    assert got["ivf_portable"]["recall"] >= 0.5
    assert got["lsh"]["recall"] >= 0.1


def test_multiprobe_dominates_single_probe(spark, sf_dir):
    """Hamming-≤2 multi-probe candidates are a SUPERSET of the single
    bucket's, so its recall can never be lower — and recovering the
    one- and two-bit misses lifts recall to a usable index level
    (measured 0.9 here; ≥0.7 is the regression floor, VERDICT r7
    item 3) even on these worst-case near-uniform fixture vectors."""
    got = _recall(spark, sf_dir)
    assert got["lsh_multiprobe"]["recall"] >= got["lsh"]["recall"]
    assert got["lsh_multiprobe"]["recall"] >= 0.7
