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


# ---------------------------------------------------------------- round-6 ops


def _write_parts(spark, tmp_path, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/part.parquet"
    )
    return str(tmp_path)


def _part(pk, price, size):
    return Row(
        p_partkey=pk,
        p_name=f"part {pk}",
        p_brand="B",
        p_type="T",
        p_size=size,
        p_retailprice=float(price),
    )


def test_pareto_frontier_bruteforce_parity(spark, sf_dir):
    """The windowed-sweep frontier must equal the quadratic
    brute-force domination check computed independently in Python."""
    import pyarrow.parquet as pq

    got = {
        r["p_partkey"]
        for r in all_queries()["pareto_frontier_parts"](spark, sf_dir).collect()
    }
    t = pq.read_table(f"{sf_dir}/part.parquet").to_pandas()
    pts = list(zip(t.p_partkey, t.p_retailprice, t.p_size))
    want = {
        pk
        for pk, pr, sz in pts
        if not any(
            (qr <= pr and qs >= sz and (qr < pr or qs > sz))
            for _, qr, qs in pts
        )
    }
    assert got == want and got


def test_pareto_frontier_tie_semantics(spark, tmp_path):
    """Ties on both axes all survive (no strict dominator); a same-size
    strictly-cheaper part kills the pricier one; a same-price
    strictly-larger part kills the smaller one."""
    sf = _write_parts(
        spark,
        tmp_path,
        [
            _part(1, 10.0, 50),  # frontier
            _part(2, 10.0, 50),  # exact tie of 1 -> survives too
            _part(3, 12.0, 50),  # same size as 1, pricier -> dominated
            _part(4, 10.0, 40),  # same price as 1, smaller -> dominated
            _part(5, 5.0, 30),   # cheaper, smaller -> frontier
            _part(6, 20.0, 60),  # biggest -> frontier
        ],
    )
    got = sorted(
        r["p_partkey"]
        for r in all_queries()["pareto_frontier_parts"](spark, sf).collect()
    )
    assert got == [1, 2, 5, 6]


def test_pareto_frontier_plan_broadcasts_frontier(spark, sf_dir):
    df = all_queries()["pareto_frontier_parts"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_imv_delta_equals_engine_recompute(spark, sf_dir):
    """Algebraic maintenance == full recompute, proven INSIDE the
    engine (the oracle differential proves cross-engine parity; this
    proves the signed-delta fold against Spark's own from-scratch
    aggregation of the post-change state)."""
    from flink_kakfa_spark.sources.tables import load_table

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    survivors = o.filter(F.col("o_orderkey") % 17 != 0).select(
        "o_orderpriority",
        F.when(
            F.col("o_orderkey") % 10 == 0,
            (F.col("price") + F.lit(100.00).cast("decimal(18,2)")).cast(
                "decimal(18,2)"
            ),
        )
        .otherwise(F.col("price"))
        .alias("price"),
    )
    inserts = o.filter(F.col("o_orderkey") % 10 == 5).select(
        "o_orderpriority", F.lit(50.00).cast("decimal(18,2)").alias("price")
    )
    want = {
        r["o_orderpriority"]: (r["n"], r["rev"])
        for r in survivors.unionByName(inserts)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("price").cast("double").alias("rev"),
        )
        .collect()
    }
    got = {
        r["o_orderpriority"]: (r["n_orders"], r["revenue"])
        for r in all_queries()["imv_signed_delta_agg"](spark, sf_dir).collect()
    }
    assert got == want


def test_kmv_overlap_exact_degrade_below_k(spark, tmp_path):
    """Two types sharing exactly 10 of 30/25 user-days, all unions
    below k: the sketch holds everything and the estimate IS exact."""
    rows = []
    eid = 0
    for u in range(1, 31):  # type view: users 1..30 on day 1
        rows.append(_event(eid, 1, u, "view"))
        eid += 1
    for u in range(21, 46):  # type click: users 21..45 -> overlap 21..30
        rows.append(_event(eid, 1, u, "click"))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = all_queries()["sketch_kmv_set_overlap"](spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["type_a"], r["type_b"]) == ("click", "view")
    assert r["exact_overlap"] == 10
    assert r["kmv_overlap"] == 10
    assert r["err_bp"] == 0


def test_kmv_overlap_estimates_on_fixture(spark, sf_dir):
    """On the real fixture (unions >> k, heavy overlap) every pair's
    estimate must land within 50% of exact — far looser than the
    expected sketch error, so a failure means broken set algebra, not
    variance."""
    rows = all_queries()["sketch_kmv_set_overlap"](spark, sf_dir).collect()
    assert len(rows) == 10  # 5 types -> C(5,2) pairs
    for r in rows:
        assert r["exact_overlap"] > 0
        rel = abs(r["kmv_overlap"] - r["exact_overlap"]) / r["exact_overlap"]
        assert rel <= 0.5, (r["type_a"], r["type_b"], rel)


def test_ab_test_recompute_from_first_principles(spark, tmp_path):
    """Arm split, conversion cut, rates and z recomputed independently
    in Python (hashlib md5 parity + the pooled z formula) must match
    the engine row exactly."""
    import hashlib
    import math

    rows = []
    eid = 0
    for u in range(1, 41):  # user u makes u purchases -> mean split
        for _ in range(u):
            rows.append(_event(eid, (eid % 28) + 1, u, "purchase"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    r = all_queries()["ab_test_proportions"](spark, sf).collect()[0]
    np_by_user = {u: u for u in range(1, 41)}
    total = sum(np_by_user.values())
    n_users = len(np_by_user)
    arm = {
        u: int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        for u in np_by_user
    }
    conv = {u: int(np_by_user[u] * n_users > total) for u in np_by_user}
    n_a = sum(1 for u in arm if arm[u] == 0)
    n_b = n_users - n_a
    conv_a = sum(conv[u] for u in arm if arm[u] == 0)
    conv_b = sum(conv[u] for u in arm if arm[u] == 1)
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (
        n_a, conv_a, n_b, conv_b,
    )
    ra, rb = conv_a / n_a, conv_b / n_b
    p = (conv_a + conv_b) / (n_a + n_b)
    se = math.sqrt(p * (1 - p) * (1 / n_a + 1 / n_b))
    z = (ra - rb) / se if se > 0 else 0.0
    assert r["rate_a"] == round(ra, 6) and r["rate_b"] == round(rb, 6)
    assert r["z_score"] == round(z, 4)
    assert r["significant"] == int(abs(z) > 1.96)


def test_jl_projection_numpy_mirror(spark, sf_dir):
    """Full numpy mirror of the JL pipeline: md5-parity signs,
    floor-quantization, integer projection, per-label micro-ratio
    aggregates — every output cell must match exactly."""
    import hashlib
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from flink_kakfa_spark.operators.linalg import _JL_M, _JL_SCALE

    d = 64
    S = np.array(
        [
            [
                1
                if int(
                    hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:8], 16
                )
                % 2
                == 0
                else -1
                for i in range(d)
            ]
            for j in range(_JL_M)
        ],
        dtype=np.int64,
    )
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    per_label: dict[int, list] = {}
    for rec in t.itertuples():
        xq = np.floor(np.array(rec.embedding, dtype=np.float64) * _JL_SCALE
                      ).astype(np.int64)
        nx = int(xq @ xq)
        y = S @ xq
        ny = int(y @ y)
        micros = (
            int(math.floor(float(ny) / (_JL_M * float(nx)) * 1000000))
            if nx > 0
            else 0
        )
        per_label.setdefault(int(rec.label), []).append(micros)
    want = {
        lbl: (
            len(ms),
            round(sum(ms) / (len(ms) * 1000000.0), 6),
            round(min(ms) / 1000000.0, 6),
            round(max(ms) / 1000000.0, 6),
        )
        for lbl, ms in per_label.items()
    }
    got = {
        r["label"]: (r["n_vecs"], r["avg_ratio"], r["min_ratio"], r["max_ratio"])
        for r in all_queries()["emb_jl_projection_quality"](spark, sf_dir).collect()
    }
    assert got == want


def test_jl_projection_preserves_norms_on_average(spark, sf_dir):
    """The JL property itself: mean ratio within 15% of 1.0 for every
    label (expectation is exactly 1 for Rademacher projections)."""
    for r in all_queries()["emb_jl_projection_quality"](spark, sf_dir).collect():
        assert 0.85 <= r["avg_ratio"] <= 1.15, (r["label"], r["avg_ratio"])


# ---- round-6 second batch: compaction / privacy / coverage / ---------
# ---- code detector / dim variance / theta difference -----------------

from flink_kakfa_spark.operators.lake import compaction_plan


def test_compaction_plan_groups_small_files_only(spark):
    """Large files are left alone; small files pack into cumulative-
    range groups whose count is exactly ceil(total_small/target) and
    whose bytes sum to the small total (nothing dropped/duplicated)."""
    rows = [
        Row(part="2024-01", file_id=i, bytes=b)
        for i, b in enumerate([5000, 4096, 1000, 900, 800, 700, 50])
    ]
    manifest = spark.createDataFrame(rows)
    got = compaction_plan(manifest, 4096).collect()
    # 5000 and 4096 are at/over target -> excluded
    small_total = 1000 + 900 + 800 + 700 + 50
    assert sum(r["group_bytes"] for r in got) == small_total
    assert sum(r["n_files"] for r in got) == 5
    expect_groups = (small_total - 1) // 4096 + 1
    assert len(got) == expect_groups
    assert sorted(r["group_id"] for r in got) == list(range(expect_groups))


def test_compaction_plan_is_deterministic_largest_first(spark):
    """Same manifest in any row order -> identical plan (ordering is
    (bytes desc, file_id), not input order)."""
    rows = [Row(part="p", file_id=i, bytes=100 * (i % 7 + 1)) for i in range(20)]
    a = compaction_plan(spark.createDataFrame(rows), 1000)
    b = compaction_plan(spark.createDataFrame(list(reversed(rows))), 1000)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def _order(okey, status, month, prio="1-URGENT"):
    return Row(
        o_orderkey=okey,
        o_custkey=okey,
        o_orderstatus=status,
        o_totalprice=100.0,
        o_orderdate=dt.datetime(2024, month, 1),
        o_orderpriority=prio,
    )


def test_l_diversity_flags_homogeneous_classes(spark, tmp_path):
    """A (priority, month) class with one distinct status violates
    l=2; a class with two statuses does not; rows_at_risk counts only
    violating-class rows."""
    rows = (
        [_order(i, "F", 1) for i in range(4)]                  # homogeneous
        + [_order(10 + i, "F" if i % 2 else "O", 2) for i in range(6)]
    )
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/orders.parquet"
    )
    got = all_queries()["privacy_l_diversity"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_classes"] == 2
    assert r["n_violating"] == 1
    assert r["min_diversity"] == 1
    assert r["rows_at_risk"] == 4


def test_theta_difference_exact_below_k(spark, tmp_path):
    """With fewer than k distinct keys per type AND in the union, all
    three KMV estimates are exact counts, so inclusion-exclusion gives
    the exact difference: err_bp == 0 on every pair."""
    rows = []
    eid = 0
    # type A: users 1..30; type B: users 21..50 (overlap 10, only_a 20)
    for u in range(1, 31):
        rows.append(_event(eid, 1, u, "a_type")); eid += 1
    for u in range(21, 51):
        rows.append(_event(eid, 1, u, "b_type")); eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = all_queries()["sketch_theta_difference"](spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert r["exact_only_a"] == 20
    assert r["est_only_a"] == 20
    assert r["err_bp"] == 0


def test_dim_variance_identifies_constant_and_spread_dims(spark, tmp_path):
    """A constant dimension has var_q 0; an alternating +-1 dimension
    has the exact fixed-point variance q^2; ordering puts the spread
    dimension first."""
    q = 1 << 12
    rows = [
        Row(vec_id=i, embedding=[0.5, 1.0 if i % 2 == 0 else -1.0], label=0)
        for i in range(4)
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    got = all_queries()["emb_dim_variance_top"](spark, str(tmp_path)).collect()
    assert [r["dim"] for r in got] == [1, 0]
    top = got[0]
    # floor(1.0*q)=q, floor(-1.0*q)=-q; mean 0 -> var = q^2 exactly
    assert top["var_q"] == q * q
    assert top["sum_q"] == 0
    assert got[1]["var_q"] == 0  # constant dim


def _doc(doc_id, text, source):
    return Row(
        doc_id=doc_id, text=text, lang="en", source=source,
        n_chars=len(text),
    )


def test_ngram_coverage_separates_mirrored_and_unique_sources(spark, tmp_path):
    """Two identical docs (different sources) -> every shingle shared
    (10000 bp in both); a third doc with disjoint vocabulary -> 0 bp."""
    rows = [
        _doc(1, "alpha beta gamma delta", "mirror1"),
        _doc(2, "alpha beta gamma delta", "mirror2"),
        _doc(3, "uniq1 uniq2 uniq3 uniq4", "fresh"),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r["source"]: r
        for r in all_queries()["text_ngram_coverage"](spark, str(tmp_path)).collect()
    }
    assert got["mirror1"]["dup_rate_bp"] == 10000
    assert got["mirror2"]["dup_rate_bp"] == 10000
    assert got["fresh"]["dup_rate_bp"] == 0
    assert got["fresh"]["n_shingles"] == 2  # 4 tokens -> 2 trigrams


def test_code_detector_density_and_threshold(spark, tmp_path):
    """All-keyword doc -> 10000 bp and counted structured; no-keyword
    doc -> 0 bp; mixed doc gets the exact floored density."""
    rows = [
        _doc(1, "join filter sort group", "s"),    # 4/4 keywords
        _doc(2, "alpha beta gamma delta", "s"),    # 0/4
        _doc(3, "join alpha beta", "s"),           # 1/3 -> 3333 bp
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = all_queries()["quality_code_detector"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_docs"] == 3
    assert r["n_structured"] == 1
    assert r["max_density_bp"] == 10000
    assert r["min_density_bp"] == 0
    assert r["avg_density_bp"] == (10000 + 0 + 3333) // 3


# ---- round-6 third batch: forward as-of, SCD3, k-fold, ---------------
# ---- retrieval eval, encoding QA --------------------------------------

from flink_kakfa_spark.operators.asof import asof_join_forward
from flink_kakfa_spark.operators.merge import merge_scd3


def test_asof_forward_picks_earliest_at_or_after(spark):
    """Forward as-of semantics: equal-time right rows ARE visible;
    earlier rights are not; among later rights the earliest wins."""
    left = spark.createDataFrame(
        [Row(k=1, t=10), Row(k=1, t=20), Row(k=1, t=31)]
    )
    right = spark.createDataFrame(
        [Row(k=1, t=5, v="past"), Row(k=1, t=20, v="same"),
         Row(k=1, t=25, v="soon"), Row(k=1, t=30, v="later")]
    )
    got = {
        r["t"]: r["v_next"]
        for r in asof_join_forward(left, right, "k", "t", ["v"]).collect()
    }
    assert got == {10: "same", 20: "same", 31: None}


def test_asof_forward_tie_breaks_deterministically(spark):
    """Two right rows at the same (key, time): first() must always see
    the smallest value tuple."""
    left = spark.createDataFrame([Row(k=1, t=10)])
    right = spark.createDataFrame(
        [Row(k=1, t=15, v="bbb"), Row(k=1, t=15, v="aaa")]
    )
    got = asof_join_forward(left, right, "k", "t", ["v"]).collect()
    assert got[0]["v_next"] == "aaa"


def test_scd3_shift_noop_insert_passthrough(spark):
    """The four SCD3 states: changed update shifts old value to prev;
    no-op update leaves prev; insert lands with NULL prev; unmatched
    target passes through."""
    target = spark.createDataFrame(
        [Row(k=1, v="A", p="old"), Row(k=2, v="B", p=None),
         Row(k=3, v="C", p="keep")]
    )
    source = spark.createDataFrame(
        [Row(k=1, v="Z"),     # changed -> p becomes 'A'
         Row(k=2, v="B"),     # no-op -> p stays NULL
         Row(k=9, v="N")]     # insert -> p NULL
    )
    got = {r["k"]: (r["v"], r["p"])
           for r in merge_scd3(target, source, "k", "v", "p").collect()}
    assert got == {
        1: ("Z", "A"), 2: ("B", None), 9: ("N", None), 3: ("C", "keep"),
    }


def test_kfold_partition_and_determinism(spark, sf_dir):
    """Folds partition the corpus exactly (sum of n_docs == N, k rows)
    and the assignment is a pure function — two runs agree."""
    q = all_queries()["pipeline_kfold_assignment"]
    a = q(spark, sf_dir).collect()
    b = q(spark, sf_dir).collect()
    assert a == b
    assert len(a) == 5
    import duckdb
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in a) == n


def test_retrieval_metrics_bounds_and_consistency(spark, sf_dir):
    """NDCG/MRR/precision all live in [0, 1]; if any top-10 doc is
    binary-relevant then MRR and precision are positive together."""
    got = all_queries()["eval_retrieval_metrics"](spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    for c in ("ndcg_10", "mrr_10", "p_at_10"):
        assert 0.0 <= r[c] <= 1.0, (c, r[c])
    assert (r["mrr_10"] > 0) == (r["p_at_10"] > 0)
    # the fixture corpus guarantees relevant docs exist
    assert r["n_relevant"] > 0
    assert r["ndcg_10"] > 0


def test_encoding_qa_flags_mojibake_and_control(spark, tmp_path):
    """A doc with U+FFFD, a doc with a C0 control char, and a clean
    ASCII doc produce exactly the expected per-source counts."""
    rows = [
        _doc(1, "bad � decode", "s"),
        _doc(2, "ctrl \x07 char", "s"),
        _doc(3, "clean ascii text", "s"),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = all_queries()["text_encoding_qa"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_docs"] == 3
    assert r["n_replacement_docs"] == 1
    assert r["n_control_docs"] == 1
    assert r["nonprintable_cp"] == 2  # the U+FFFD and the BEL


# ---- round-6 fourth batch: CUSUM, LSH band stats, --------------------
# ---- neighbor Jaccard, JS divergence ----------------------------------


def test_cusum_locates_a_planted_level_shift(spark, tmp_path):
    """A series that steps up on day 11 of 20 peaks its CUSUM exactly
    at the last day of the high regime reachable from the shift — for
    a clean step, the prefix-sum-minus-prefix-min form peaks on the
    final day with the max spanning the shifted segment; the planted
    change is visible as max_cusum >> 0 and change_day in the high
    regime."""
    rows = []
    eid = 0
    for day in range(1, 21):
        v = 1.0 if day <= 10 else 5.0
        rows.append(
            Row(event_id=eid, ts=dt.datetime(2024, 1, day, 12), user_id=1,
                event_type="view", value=v, props="")
        )
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = all_queries()["ts_cusum_changepoint"](spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_days"] == 20
    assert r["max_cusum_scaled"] > 0
    assert r["change_day"] >= dt.date(2024, 1, 11)


def test_cusum_flat_series_peaks_at_zero_ish(spark, tmp_path):
    """A constant series has zero deviations everywhere: the CUSUM
    max is exactly 0 (scaled integers, no float fuzz)."""
    rows = [
        Row(event_id=i, ts=dt.datetime(2024, 1, 1 + i, 12), user_id=1,
            event_type="view", value=2.0, props="")
        for i in range(10)
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = all_queries()["ts_cusum_changepoint"](spark, sf).collect()[0]
    assert r["max_cusum_scaled"] == 0.0


def test_lsh_band_stats_census_identities(spark, sf_dir):
    """Per band: docs partition into buckets (sum == n_docs and equals
    every other band's total), singletons <= buckets, and the
    candidate-pair count obeys sum C(n,2) >= 0 with max_bucket
    consistency (a bucket of size m implies >= C(m,2) pairs)."""
    got = all_queries()["dedup_lsh_band_stats"](spark, sf_dir).collect()
    assert len(got) == 4
    totals = {r["n_docs"] for r in got}
    assert len(totals) == 1  # every band sees every doc once
    for r in got:
        assert r["singletons"] <= r["n_buckets"]
        m = r["max_bucket"]
        assert r["candidate_pairs"] >= m * (m - 1) // 2


def test_neighbor_jaccard_is_normalized_and_new_links_only(spark, sf_dir):
    """Scores are valid basis points (0..10000]; no predicted pair is
    an existing edge; ordering is by score desc."""
    from flink_kakfa_spark.operators.graph import _copurchase_edges
    got = all_queries()["graph_neighbor_jaccard_top20"](spark, sf_dir).collect()
    assert 0 < len(got) <= 20
    scores = [r["jaccard_bp"] for r in got]
    assert scores == sorted(scores, reverse=True)
    assert all(0 < s <= 10000 for s in scores)
    edges = {
        (r["src"], r["dst"])
        for r in _copurchase_edges(spark, sf_dir).collect()
    }
    assert all((r["node_a"], r["node_b"]) not in edges for r in got)


def test_js_divergence_mirror_source_is_near_corpus(spark, tmp_path):
    """A source whose text IS the corpus distribution scores ~0; a
    disjoint-vocabulary source scores much higher."""
    base = "alpha beta gamma delta epsilon"
    rows = (
        [_doc(i, base, "typical") for i in range(1, 9)]
        + [_doc(9, base, "mirror")]
        + [_doc(10, "zz1 zz2 zz3 zz4 zz5", "weird")]
    )
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r["source"]: r["js_divergence"]
        for r in all_queries()["text_js_divergence_sources"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["weird"] > 10 * max(got["mirror"], 1e-9)
    assert got["mirror"] < 0.05


# ---- round-6 fifth batch: multi-query BM25, RAKE ----------------------


def test_multiquery_bm25_consistent_with_single_ranker(spark, sf_dir):
    """Each query's ranking is internally consistent: scores descend,
    ranks are 1..k, and every returned doc actually contains at least
    one of the query's terms."""
    import duckdb
    got = all_queries()["rag_bm25_multiquery_topk"](spark, sf_dir).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {"q_join", "q_scan", "q_stream"}
    from flink_kakfa_spark.operators.analytics import _MQ_QUERIES
    con = duckdb.connect()
    for q, rows in by_q.items():
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        terms = _MQ_QUERIES[q]
        for r in rows:
            hit = con.execute(
                f"""SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')
                    WHERE doc_id = {r['doc_id']}
                      AND ({' OR '.join(f"list_contains(string_split(text, ' '), '{t}')" for t in terms)})"""
            ).fetchone()[0]
            assert hit == 1, (q, r["doc_id"])


def test_rake_scores_multiword_phrases_by_degree(spark, tmp_path):
    """RAKE first principles on a crafted doc: with stopword 'the'
    separating phrases, a longer phrase accumulates its words' degree
    scores and outranks repeated singletons."""
    text = "deep learning models the deep learning models the corpus"
    rows = [_doc(1, text, "s")]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = all_queries()["text_keyphrase_rake"](spark, str(tmp_path)).collect()
    by_phrase = {r["phrase"]: r for r in got}
    assert set(by_phrase) == {"deep learning models", "corpus"}
    top = got[0]
    assert top["phrase"] == "deep learning models"
    assert top["n_occ"] == 2
    assert top["n_words"] == 3
    # each word: freq 2, degree 6 -> wscore 3.0; phrase = 9.0
    assert top["score"] == 9.0
    assert by_phrase["corpus"]["score"] == 1.0


def test_survivor_selection_rule_and_census(spark, tmp_path):
    """Groups share the first-8-token head; the survivor is the copy
    with the most unique tokens (then longest, then lowest id); the
    casualty census counts the rest; singleton groups are silent."""
    head = "h1 h2 h3 h4 h5 h6 h7 h8"
    rows = [
        _doc(1, head + " tail tail tail", "s"),          # 2 uniq tail words... 
        _doc(2, head + " a b c", "s"),                   # most unique -> survivor
        _doc(3, head + " a a a a a a a a a a", "s"),     # longest but fewer uniq
        _doc(4, "different head entirely alone", "s"),   # singleton -> silent
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = all_queries()["dedup_survivor_selection"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["survivor_id"] == 2
    assert r["grp_size"] == 3
    assert r["n_dropped"] == 2
