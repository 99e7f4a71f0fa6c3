"""Property-based tests (hypothesis): engine operators vs pure-Python
models on randomized inputs. Extends the reference's light
property-testing style (go/producer/producer_test.go:196-213) with real
randomized coverage.

Example counts are kept small — every example round-trips through the
JVM — but each one checks full result equality, not just invariants.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_kakfa_spark.functions.skew import salted_count
from flink_kakfa_spark.operators.asof import asof_join
from flink_kakfa_spark.operators.wordcount import word_counts

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.sampled_from(["alpha", "beta", "gamma", "delta", "x", "real-time"])
sentences = st.lists(words, min_size=0, max_size=8).map(" ".join)


@SLOW
@given(docs=st.lists(sentences, min_size=0, max_size=12))
def test_word_counts_match_python_counter(spark, docs):
    expected = Counter(w for s in docs for w in s.split(" ") if w != "")
    df = spark.createDataFrame([Row(text=s) for s in docs], "text string")
    got = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    assert got == dict(expected)


@SLOW
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 3)),
        min_size=1,
        max_size=30,
    )
)
def test_salted_count_matches_counter(spark, rows):
    expected = Counter(k for k, _ in rows)
    df = spark.createDataFrame([Row(k=k, v=v) for k, v in rows])
    got = {r["k"]: r["cnt"] for r in salted_count(df, "k").collect()}
    assert got == dict(expected)


@SLOW
@given(
    left_ts=st.lists(st.integers(0, 50), min_size=1, max_size=10, unique=True),
    right_ts=st.lists(st.integers(0, 50), min_size=0, max_size=10, unique=True),
)
def test_asof_join_matches_naive_model(spark, left_ts, right_ts):
    left = spark.createDataFrame(
        [Row(k="u", ts=f"2024-01-01 00:00:{t:02d}.000", ev=t) for t in left_ts],
        "k string, ts string, ev int",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [Row(k="u", ts=f"2024-01-01 00:00:{t:02d}.000", px=float(t)) for t in right_ts],
        "k string, ts string, px double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["ev"]: r["px_asof"] for r in asof_join(left, right, "k", "ts", ["px"]).collect()}
    for t in left_ts:
        prior = [rt for rt in right_ts if rt <= t]
        assert got[t] == (float(max(prior)) if prior else None)


@given(
    baskets=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),  # order key
            st.lists(
                st.integers(min_value=1, max_value=12),  # part keys
                min_size=1,
                max_size=7,
            ),
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_copurchase_inarray_pairs_equal_naive_self_join(spark, baskets):
    """The in-array basket pair expansion (collect_set -> nested
    transform/slice) must emit EXACTLY the distinct src<dst pairs of
    the naive distinct-items self-join, for arbitrary baskets with
    duplicate items and orders."""
    from pyspark.sql import Row

    from flink_kakfa_spark.operators.graph import _copurchase_edges

    rows = [
        Row(l_orderkey=ok, l_partkey=pk) for ok, parts in baskets for pk in parts
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "l_orderkey long, l_partkey long"
        ).write.parquet(f"{d}/lineitem.parquet")
        got = {
            (r["src"], r["dst"])
            for r in _copurchase_edges(spark, d).collect()
        }
    merged: dict[int, set] = {}
    for ok, parts in baskets:  # same order key twice = ONE basket
        merged.setdefault(ok, set()).update(parts)
    expected = set()
    for ps_set in merged.values():
        ps = sorted(ps_set)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                expected.add((ps[i], ps[j]))
    # merge across orders (same pair in two orders counts once)
    assert got == expected
