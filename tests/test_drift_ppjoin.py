"""PSI drift report and prefix-filtered similarity join semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from flink_kakfa_spark.registry import all_queries


def test_psi_flags_shifted_type_only(spark, tmp_path):
    """One event type keeps its distribution across halves, the other
    jumps from the bottom of the range to the top — only the shifted
    type may carry the drift flag, and its PSI must dominate."""
    t0 = dt.datetime(2024, 1, 1)
    evs = []

    def add(et, minute, value):
        evs.append(
            Row(
                event_id=len(evs),
                ts=t0 + dt.timedelta(minutes=minute),
                user_id=1,
                event_type=et,
                value=float(value),
                props="{}",
            )
        )

    for i in range(50):
        add("stable", i, 10 + (i % 5))          # first half
        add("stable", 100 + i, 10 + (i % 5))    # second half: same shape
        add("shifty", i, 0 + (i % 3))           # first half: low
        add("shifty", 100 + i, 97 + (i % 3))    # second half: high
    spark.createDataFrame(evs).write.parquet(str(tmp_path / "events.parquet"))
    rows = {
        r["event_type"]: r
        for r in all_queries()["drift_psi_report"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows["shifty"]["drifted"] == 1
    assert rows["stable"]["drifted"] == 0
    assert rows["shifty"]["psi"] > rows["stable"]["psi"]
    assert rows["stable"]["n_a"] == rows["stable"]["n_b"] == 50


def _write_docs(spark, tmp_path, docs):
    rows = [
        Row(doc_id=i, text=" ".join(ws), lang="en", source="s", n_chars=1)
        for i, ws in enumerate(docs)
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "documents.parquet"))


def test_prefix_filter_exact_at_threshold_boundary(spark, tmp_path):
    """A pair at Jaccard exactly 0.9 (9 shared of 10 union) must be
    found; one just below (9 of 11) must not. Float ceil of 0.9*n
    would shorten the prefix and can silently drop the boundary pair —
    this pins the integer-arithmetic guarantee."""
    base = [f"tok{i}" for i in range(10)]
    docs = [
        base,                      # 0: 10 tokens
        base[:9],                  # 1: subset of 9 -> J(0,1) = 9/10
        base[:9] + ["x1", "x2"],   # 2: J(0,2) = 9/12, J(1,2) = 9/11 < 0.9
    ]
    _write_docs(spark, tmp_path, docs)
    got = all_queries()["dedup_jaccard_prefix_filter"](
        spark, str(tmp_path)
    ).collect()
    # exactly one qualifying pair (0,1): bucket floor(0.9*20) = 18
    assert [(r["bucket"], r["n_pairs"], r["sum_keys"]) for r in got] == [
        (18, 1, 1)
    ]


def test_prefix_filter_matches_naive_on_duplicate_heavy_fixture(spark, tmp_path):
    """Identical docs and high-overlap docs: census equals the naive
    all-pairs model computed in Python."""
    base = [f"w{i}" for i in range(20)]
    docs = [base, list(base), base[:19], base[:18] + ["zzz", "yyy"], ["solo"]]
    _write_docs(spark, tmp_path, docs)
    got = {
        r["bucket"]: (r["n_pairs"], r["sum_keys"])
        for r in all_queries()["dedup_jaccard_prefix_filter"](
            spark, str(tmp_path)
        ).collect()
    }
    import itertools

    sets = [set(ws) for ws in docs]
    model: dict[int, list[int]] = {}
    for a, b in itertools.combinations(range(len(sets)), 2):
        c = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if 10 * c >= 9 * u:
            bucket = int((c / u) * 20)
            n, s = model.get(bucket, (0, 0))
            model[bucket] = (n + 1, s + a + b)
    assert got == {k: v for k, v in model.items()}


def test_prefix_filter_salted_join_census_exact(spark, tmp_path):
    """Round-12 salted candidate join: a corpus whose prefixes all land
    in a handful of hot buckets (few distinct rare tokens -> n_buckets
    < 2*parallelism, so the deterministic salt engages) must produce
    the identical census as the naive all-pairs model — every pair
    meets exactly once at the a-side's salt."""
    import itertools

    # 12 docs sharing a long common core, differing in 1-2 tokens:
    # deep prefix buckets + many near-threshold pairs
    core = [f"c{i}" for i in range(18)]
    docs = [core + [f"v{i}"] for i in range(6)]
    docs += [core + [f"v{i}", "extra"] for i in range(3)]
    docs += [list(core) for _ in range(3)]
    _write_docs(spark, tmp_path, docs)
    got = {
        r["bucket"]: (r["n_pairs"], r["sum_keys"])
        for r in all_queries()["dedup_jaccard_prefix_filter"](
            spark, str(tmp_path)
        ).collect()
    }
    sets = [set(ws) for ws in docs]
    model: dict[int, list[int]] = {}
    for a, b in itertools.combinations(range(len(sets)), 2):
        c = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if 10 * c >= 9 * u:
            bucket = int((c / u) * 20)
            n, s = model.get(bucket, (0, 0))
            model[bucket] = (n + 1, s + a + b)
    assert got == model
