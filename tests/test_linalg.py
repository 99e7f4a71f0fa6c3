"""Spectral diagnostics: integer covariance + power iteration vs numpy."""

from __future__ import annotations

import numpy as np

from flink_kakfa_spark.registry import all_queries


def test_power_iteration_recovers_planted_axis(spark, tmp_path):
    """On a corpus with a PLANTED dominant direction (spectral gap
    ~10x, so k=3 rounds converge) the fixed-point iterate aligns with
    numpy's top principal axis of the SAME quantized covariance and
    the Rayleigh quotient lands within 2% of numpy's top eigenvalue.
    (The sf fixtures are isotropic noise — no dominant axis exists to
    recover there, which is exactly what emb_covariance_stats'
    near-flat spectrum reports.)"""
    rng = np.random.default_rng(7)
    d, n = 64, 200
    axis = rng.normal(size=d)
    axis /= np.linalg.norm(axis)
    emb = np.outer(rng.normal(scale=0.4, size=n), axis) + rng.normal(
        scale=0.04, size=(n, d)
    )
    rows_in = [
        {"vec_id": i, "embedding": [float(x) for x in emb[i]], "label": 0}
        for i in range(n)
    ]
    spark.createDataFrame(
        rows_in, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    # numpy twin of the integer covariance (on the same float32 data
    # the query reads back)
    emb32 = np.array([r["embedding"] for r in rows_in], dtype=np.float32)
    xq = np.floor(emb32.astype(np.float64) * 1000)
    s = xq.sum(axis=0)
    c = np.floor((n * (xq.T @ xq) - np.outer(s, s)) / (n * n))

    rows = all_queries()["emb_power_iteration_top"](
        spark, str(tmp_path)
    ).collect()
    v = np.array([r["v_fp"] for r in sorted(rows, key=lambda r: r["dim"])])
    lam_fp = rows[0]["lambda_fp"]

    evals, evecs = np.linalg.eigh(c)
    top = evecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.99
    assert abs(lam_fp - evals[-1]) / evals[-1] < 0.02


def test_covariance_stats_match_numpy(spark, sf_dir):
    """Every reported cov_fp equals the numpy integer covariance at
    (j, k), and the trace equals numpy's diagonal sum."""
    emb = np.array(
        [
            r["embedding"]
            for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    xq = np.floor(emb * 1000)
    n = xq.shape[0]
    s = xq.sum(axis=0)
    c = np.floor((n * (xq.T @ xq) - np.outer(s, s)) / (n * n))

    rows = all_queries()["emb_covariance_stats"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["cov_fp"] == c[r["j"] - 1, r["k"] - 1]
        assert r["trace_fp"] == np.trace(c)
    # rows really are the strongest off-diagonal entries
    off = np.abs(np.triu(c, 1))
    top10 = np.sort(off[off > 0].ravel())[-10:]
    assert {abs(r["cov_fp"]) for r in rows} <= set(top10.astype(int).tolist()) | {
        int(t) for t in top10
    }


def test_kmeans_matches_python_lloyd_twin(spark, tmp_path):
    """Planted 2-cluster data: the Spark result must equal a plain-
    Python integer Lloyd's twin EXACTLY (no tolerance), and separate
    the planted clusters."""
    rng = np.random.default_rng(3)
    d = 64
    a = rng.normal(0.3, 0.02, size=(30, d))
    b = rng.normal(-0.3, 0.02, size=(30, d))
    emb = np.vstack([a, b])
    rows_in = [
        {"vec_id": i, "embedding": [float(x) for x in emb[i]], "label": 0}
        for i in range(60)
    ]
    spark.createDataFrame(
        rows_in, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    from flink_kakfa_spark.operators.linalg import _KM_K, _KM_ROUNDS

    # python twin on the same float32-read data
    emb32 = np.array([r["embedding"] for r in rows_in], dtype=np.float32)
    xq = np.floor(emb32.astype(np.float64) * 1000).astype(np.int64)
    cent = {cid: xq[cid].copy() for cid in range(_KM_K)}  # seeds: lowest ids
    for _ in range(_KM_ROUNDS):
        assign = {}
        for i in range(len(xq)):
            best = min(
                (int(((xq[i] - cent[c]) ** 2).sum()), c) for c in cent
            )
            assign[i] = best[1]
        for c in cent:
            members = [xq[i] for i in assign if assign[i] == c]
            if members:
                cent[c] = np.floor(
                    np.sum(members, axis=0) / len(members)
                ).astype(np.int64)
    expected = {
        c: (
            sum(1 for i in assign if assign[i] == c),
            tuple(int(x) for x in cent[c][:4]),
        )
        for c in cent
        if any(assign[i] == c for i in assign)
    }

    got = {
        r["cluster_id"]: (
            r["n_members"],
            (r["c1"], r["c2"], r["c3"], r["c4"]),
        )
        for r in all_queries()["emb_kmeans_portable"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == expected
    # the two planted blobs end up in different clusters
    sizes = sorted(v[0] for v in got.values())
    assert sum(sizes) == 60 and max(sizes) <= 30
