"""As-of join semantics on hand-computed micro-fixtures."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_kakfa_spark.operators.asof import asof_join


def _ts(s):
    return f"2024-01-01 00:00:{s:02d}"


def test_asof_picks_most_recent_at_or_before(spark):
    left = spark.createDataFrame(
        [Row(k="u", ts=_ts(5), ev="a"), Row(k="u", ts=_ts(10), ev="b"),
         Row(k="u", ts=_ts(2), ev="c")],
        "k string, ts string, ev string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [Row(k="u", ts=_ts(3), px=30.0), Row(k="u", ts=_ts(7), px=70.0)],
        "k string, ts string, px double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["ev"]: r["px_asof"] for r in asof_join(left, right, "k", "ts", ["px"]).collect()}
    assert out == {"c": None, "a": 30.0, "b": 70.0}


def test_asof_equal_timestamp_is_inclusive(spark):
    left = spark.createDataFrame(
        [Row(k="u", ts=_ts(3), ev="same")], "k string, ts string, ev string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [Row(k="u", ts=_ts(3), px=1.0)], "k string, ts string, px double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join(left, right, "k", "ts", ["px"]).collect()
    assert out[0]["px_asof"] == 1.0  # at-or-before, not strictly-before


def test_asof_respects_key_partitions(spark):
    left = spark.createDataFrame(
        [Row(k="a", ts=_ts(9), ev="x"), Row(k="b", ts=_ts(9), ev="y")],
        "k string, ts string, ev string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [Row(k="a", ts=_ts(1), px=10.0)], "k string, ts string, px double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["ev"]: r["px_asof"] for r in asof_join(left, right, "k", "ts", ["px"]).collect()}
    assert out == {"x": 10.0, "y": None}  # no cross-key leakage


def test_asof_tied_right_rows_resolve_deterministically(spark):
    """Two right rows at the same (key, ts): the greatest value tuple
    wins, independent of partitioning/sort nondeterminism."""
    left = spark.createDataFrame(
        [Row(k="u", ts=_ts(5), ev="e")], "k string, ts string, ev string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [Row(k="u", ts=_ts(2), px=10.0), Row(k="u", ts=_ts(2), px=99.0)],
        "k string, ts string, px double",
    ).withColumn("ts", F.to_timestamp("ts"))
    for _ in range(3):
        out = asof_join(left, right, "k", "ts", ["px"]).collect()
        assert out[0]["px_asof"] == 99.0


def test_asof_tied_rows_attach_wholesale(spark):
    """Tie-heavy fixture, multiple value columns: the winning right row
    attaches as a unit. (10.0, qty=5) vs (99.0, qty=1) at the same
    (key, ts) — the greatest struct is (99.0, 1), so qty_asof must be 1,
    never a per-column blend like (99.0, 5). A third NULL-px row at the
    same instant must not poison the carry either (struct-carry, not
    per-column last(ignorenulls))."""
    left = spark.createDataFrame(
        [Row(k="u", ts=_ts(5), ev="e"), Row(k="v", ts=_ts(5), ev="f")],
        "k string, ts string, ev string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            Row(k="u", ts=_ts(2), px=10.0, qty=5),
            Row(k="u", ts=_ts(2), px=99.0, qty=1),
            # NULL px sorts before non-NULL in ascending struct order,
            # so it never wins a tie — but its qty must not leak
            Row(k="u", ts=_ts(2), px=None, qty=777),
            # key v: only a NULL-px row; it still attaches wholesale
            Row(k="v", ts=_ts(2), px=None, qty=42),
        ],
        "k string, ts string, px double, qty int",
    ).withColumn("ts", F.to_timestamp("ts"))
    for _ in range(3):
        out = {
            r["ev"]: (r["px_asof"], r["qty_asof"])
            for r in asof_join(left, right, "k", "ts", ["px", "qty"]).collect()
        }
        assert out == {"e": (99.0, 1), "f": (None, 42)}


def test_asof_plan_has_exactly_one_exchange(spark, sf_dir):
    """Scale posture: the union+window as-of join shuffles ONCE (on the
    key) — no range-join blowup, no second exchange for tie handling."""
    from flink_kakfa_spark.registry import all_queries

    df = all_queries()["asof_last_purchase"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = plan.count("Exchange ") + plan.count("Exchange(")
    reuses = plan.count("ReusedExchange")
    assert exchanges - reuses == 1, f"expected 1 shuffle, plan:\n{plan}"


def test_forward_asof_semantics_and_ties(spark):
    """The round-7 descending-sort rewrite (O(n) incremental frame
    instead of the O(n^2) unbounded-following frame) must keep the
    exact forward semantics: earliest right row at-or-after, equal
    timestamps visible, and right-vs-right (key, time) ties resolving
    to the SMALLEST value tuple."""
    from flink_kakfa_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(5), tag="mid"),     # between rights
            Row(k=1, ts=_ts(10), tag="equal"),  # exactly on a right ts
            Row(k=1, ts=_ts(30), tag="after"),  # after every right
            Row(k=2, ts=_ts(1), tag="otherkey"),
        ]
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "tag")
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(3), v=99.0),
            Row(k=1, ts=_ts(10), v=7.0),   # tie pair at :10 ...
            Row(k=1, ts=_ts(10), v=4.0),   # ... smallest v must win
            Row(k=2, ts=_ts(2), v=1.0),
        ]
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    got = {
        r["tag"]: (r["ts_next"], r["v_next"])
        for r in asof_join_forward(left, right, "k", "ts", ["ts", "v"])
        .withColumnRenamed("ts_next", "ts_next")
        .collect()
    }
    assert got["mid"][1] == 4.0 and str(got["mid"][0]).endswith("00:00:10")
    assert got["equal"][1] == 4.0  # equal-time right row IS visible
    assert got["after"] == (None, None)  # nothing at-or-after
    assert got["otherkey"][1] == 1.0  # keys never leak


def test_expand_collapsed_pairs_matches_bruteforce_topk(spark):
    """Property check for the 21-member expansion cap: on synthetic
    digest groups (sizes 1..30, scored rep pairs straddling the top-20
    boundary) the expanded top-20 must equal the top-20 of the FULL
    brute-force member-pair expansion."""
    from itertools import combinations, product

    from flink_kakfa_spark.operators.dedup import expand_collapsed_pairs

    # groups: ids chosen so classes interleave in the global order
    raw_groups = {
        "g1": list(range(0, 30)),          # 30 members: exceeds the cap
        "g2": list(range(100, 102)),       # pair group
        "g3": [200],                       # singleton
        "g4": list(range(300, 325)),       # 25 members: exceeds the cap
    }
    self_scores = {"g1": 0.9, "g2": 0.95, "g3": 0.8, "g4": 0.9}
    rep_pairs_py = [  # (grpA, grpB, score) between reps
        ("g1", "g2", 0.95),
        ("g1", "g4", 0.9),
        ("g2", "g3", 0.6),
    ]

    # brute force over FULL membership
    brute = []
    for g, mem in raw_groups.items():
        for x, y in combinations(sorted(mem), 2):
            brute.append((x, y, self_scores[g]))
    for ga, gb, s in rep_pairs_py:
        for x, y in product(raw_groups[ga], raw_groups[gb]):
            brute.append((min(x, y), max(x, y), s))
    expected = sorted(brute, key=lambda t: (-t[2], t[0], t[1]))[:20]

    groups = spark.createDataFrame(
        [
            Row(
                rep_id=min(mem),
                members=sorted(mem)[:21],
                n_members=len(mem),
                self_score=self_scores[g],
            )
            for g, mem in raw_groups.items()
        ]
    )
    rep_pairs = spark.createDataFrame(
        [
            Row(
                doc_a=min(min(raw_groups[ga]), min(raw_groups[gb])),
                doc_b=max(min(raw_groups[ga]), min(raw_groups[gb])),
                score=s,
            )
            for ga, gb, s in rep_pairs_py
        ]
    )
    got = [
        (r["doc_a"], r["doc_b"], r["score"])
        for r in expand_collapsed_pairs(rep_pairs, groups, "score")
        .orderBy(F.desc("score"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(20)
        .collect()
    ]
    assert got == expected
