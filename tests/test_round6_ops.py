"""Algorithmic contracts for the round-6 operators: the KMV distinct
sketch (mergeability, exact-degrade, estimator sanity) and contrastive
hard-negative mining (label exclusion, true top-k). The oracle
differential proves engine parity; these prove the algorithms do what
their papers say, on micro-fixtures with KNOWN structure.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_kakfa_spark.operators.sketches import _KMV_K, _KMV_SPACE
from flink_kakfa_spark.registry import all_queries


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    return str(tmp_path)


def _event(eid, day, uid, etype="view"):
    return Row(
        event_id=eid,
        ts=dt.datetime(2024, 1, day, 12, 0, 0),
        user_id=uid,
        event_type=etype,
        value=1.0,
        props="",
    )


def test_kmv_degrades_to_exact_below_k(spark, tmp_path):
    """Fewer than k distinct users -> the sketch holds every hash and
    the 'estimate' IS the exact count, even with users spread across
    days and repeated within them (merge dedups by hash)."""
    rows = [
        _event(eid, day, uid)
        for eid, (day, uid) in enumerate(
            [(d, u) for d in (1, 2, 3) for u in range(1, 21)]  # 20 users/day
        )
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = all_queries()["sketch_kmv_distinct_rollup"](spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert r["exact_users"] == 20
    assert r["kmv_users"] == 20  # < k: no estimation error at all
    assert r["err_bp"] == 0


def test_kmv_estimator_within_theory_bound_on_fixture(spark, sf_dir):
    """On the real fixture (distinct users >> k) the estimate must land
    within 5 relative standard errors of exact — KMV's RSE is
    ~1/sqrt(k-2), so a violation means broken hash or estimator math,
    not bad luck."""
    rows = all_queries()["sketch_kmv_distinct_rollup"](spark, sf_dir).collect()
    assert rows
    rse = 1.0 / math.sqrt(_KMV_K - 2)
    for r in rows:
        if r["exact_users"] <= _KMV_K:
            assert r["kmv_users"] == r["exact_users"]
        else:
            rel = abs(r["kmv_users"] - r["exact_users"]) / r["exact_users"]
            assert rel <= 5 * rse, (r["event_type"], rel)


def test_kmv_daily_merge_equals_single_sketch(spark, tmp_path):
    """Mergeability, the property the rollup rests on: many days with
    k+ distinct users each must yield the same estimate as the same
    users all landing on one day — the merged k-mins equal the global
    k-mins regardless of how rows split across days."""
    users = list(range(1, 301))
    spread = [
        _event(i, (u % 28) + 1, u) for i, u in enumerate(users)
    ]  # 300 users over 28 days
    single = [
        _event(i, 1, u) for i, u in enumerate(users)
    ]  # same 300 users, one day
    got_spread = all_queries()["sketch_kmv_distinct_rollup"](
        spark, _write_events(spark, tmp_path / "a", spread)
    ).collect()[0]
    got_single = all_queries()["sketch_kmv_distinct_rollup"](
        spark, _write_events(spark, tmp_path / "b", single)
    ).collect()[0]
    assert got_spread["kmv_users"] == got_single["kmv_users"]
    assert got_spread["exact_users"] == got_single["exact_users"] == 300


def test_kmv_estimator_formula_pins_hash_space(spark, tmp_path):
    """The estimator must be (k-1) * 2^32 // kth_min over the md5_32
    hash — recompute it from first principles in Python and match."""
    import hashlib

    users = list(range(1, 501))
    sf = _write_events(
        spark, tmp_path, [_event(i, 1, u) for i, u in enumerate(users)]
    )
    got = all_queries()["sketch_kmv_distinct_rollup"](spark, sf).collect()[0]
    hashes = sorted(
        int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) for u in users
    )
    kth = hashes[_KMV_K - 1]
    assert got["kmv_users"] == (_KMV_K - 1) * _KMV_SPACE // kth


def test_hard_negatives_label_exclusion_and_true_topk(spark, sf_dir):
    """Every mined negative carries a different label than its anchor,
    and per anchor they are exactly the brute-force top-3 by rounded
    cosine (vec_id tiebreak) computed independently in numpy."""
    import numpy as np
    import pyarrow.parquet as pq

    got = all_queries()["emb_hard_negatives"](spark, sf_dir).collect()
    assert got
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    embs = {
        int(r.vec_id): (np.array(r.embedding, dtype=np.float64), int(r.label))
        for r in tbl.itertuples()
    }
    by_anchor: dict[int, list] = {}
    for r in got:
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    anchors = [v for v in embs if v % 100 == 0]
    assert set(by_anchor) == set(anchors)
    for aid, rows in by_anchor.items():
        avec, albl = embs[aid]
        assert all(r["negative_label"] != albl for r in rows)
        cand = []
        for vid, (v, lbl) in embs.items():
            if lbl == albl:
                continue
            cos = float(v @ avec / (np.linalg.norm(v) * np.linalg.norm(avec)))
            cand.append((round(cos, 6), vid, lbl))
        cand.sort(key=lambda t: (-t[0], t[1]))
        want = [(vid, lbl, c) for c, vid, lbl in cand[:3]]
        have = [
            (r["negative_id"], r["negative_label"], r["cos_sim"]) for r in rows
        ]
        assert have == want, aid


def test_hard_negatives_plan_broadcasts_anchors(spark, sf_dir):
    """The anchor side must broadcast (nested-loop on the label
    inequality) — a shuffle of the full vector table against 1% of
    itself would be the wrong plan."""
    df = all_queries()["emb_hard_negatives"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
