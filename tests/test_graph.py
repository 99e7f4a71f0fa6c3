"""Graph analytics: co-purchase edges, triangles, integer PageRank."""

from __future__ import annotations

from pyspark.sql import Row

from flink_kakfa_spark.operators.graph import _PR_ITERS, _PR_SCALE
from flink_kakfa_spark.registry import all_queries


def _lineitem(spark, tmp_path, baskets):
    rows = [
        Row(l_orderkey=ok, l_partkey=pk)
        for ok, parts in baskets
        for pk in parts
    ]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )


BASKETS = [
    (1, [1, 2, 3]),  # triangle 1-2-3
    (2, [3, 4]),  # pendant edge
    (3, [1, 2]),  # duplicate edge 1-2: must dedup
    (4, [2, 2]),  # same part twice in one order: no self-loop
]


def test_degree_stats_counts_and_buckets(spark, tmp_path):
    _lineitem(spark, tmp_path, BASKETS)
    rows = {
        r["degree_bucket"]: r
        for r in all_queries()["graph_degree_stats"](
            spark, str(tmp_path)
        ).collect()
    }
    # degrees: node1=2, node2=2, node3=3, node4=1
    assert rows[0]["n_nodes"] == 1  # degree 1 (node 4)
    assert rows[1]["n_nodes"] == 3  # degrees 2..3
    assert rows[1]["min_degree"] == 2 and rows[1]["max_degree"] == 3


def test_triangle_count_exact(spark, tmp_path):
    _lineitem(spark, tmp_path, BASKETS)
    [row] = all_queries()["graph_triangle_count"](
        spark, str(tmp_path)
    ).collect()
    assert row["n_triangles"] == 1


def test_triangle_count_k4_and_no_double_count(spark, tmp_path):
    # K4 has exactly 4 triangles; each must count once despite the
    # wedge join seeing every triangle from multiple vertices.
    _lineitem(spark, tmp_path, [(1, [1, 2, 3, 4])])
    [row] = all_queries()["graph_triangle_count"](
        spark, str(tmp_path)
    ).collect()
    assert row["n_triangles"] == 4


def _pagerank_reference(edges, iters=_PR_ITERS, scale=_PR_SCALE):
    """Plain-Python twin of the integer fixed-point recurrence."""
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    rank = {n: scale for n in adj}
    for _ in range(iters):
        contrib: dict[int, int] = {n: 0 for n in adj}
        for u, nbrs in adj.items():
            share = rank[u] // len(nbrs)
            for v in nbrs:
                contrib[v] += share
        rank = {n: (15 * scale + 85 * contrib[n]) // 100 for n in adj}
    return rank


def test_pagerank_matches_integer_reference(spark, tmp_path):
    """The fixed-point recurrence is exactly reproducible in plain
    Python — no float tolerance, the values must be identical."""
    _lineitem(spark, tmp_path, BASKETS)
    expected = _pagerank_reference([(1, 2), (1, 3), (2, 3), (3, 4)])
    got = {
        r["p_partkey"]: r["pagerank_fp"]
        for r in all_queries()["graph_pagerank_top20"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == expected
    # the hub (node 3) outranks everything else
    assert max(got, key=got.get) == 3


def test_pagerank_rounds_are_exchange_free(spark, tmp_path):
    """Round-11 shuffle contract: the adjacency is hash-partitioned by
    ``dst`` once, so NO planner-inserted shuffle (ENSURE_REQUIREMENTS
    exchange) may appear anywhere in the per-round join+aggregate
    pipeline — the only shuffles are the deliberate REPARTITION_BY_COL
    fan-outs on dst (plus broadcasts). A regression that re-introduces
    a per-round aggregate exchange (e.g. dropping the repartition or
    re-keying it) shows up as an ENSURE_REQUIREMENTS exchange."""
    _lineitem(spark, tmp_path, BASKETS)
    df = all_queries()["graph_pagerank_top20"](spark, str(tmp_path))
    # Finalize the adaptive plan first: before an action runs, the
    # dump is the initial (pre-AQE) plan and proves nothing about the
    # executed shuffles (round 12, ADVICE item). Audit only the final
    # section — a finalized AdaptiveSparkPlan appends an
    # "== Initial Plan ==" copy that would double-count.
    df.collect()
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # Match the shuffle origin directly (the old parenthesized-
    # partitioning regex missed 'Exchange SinglePartition, ...').
    assert "ENSURE_REQUIREMENTS" not in plan, (
        "planner-inserted shuffle leaked into the PageRank loop:\n" + plan
    )


def test_substring_runs_merge_and_coverage(spark, tmp_path):
    """Two docs share one 10-token span -> its 3 overlapping 8-token
    windows merge into ONE run of exactly 10 tokens; a doc with no
    repeated window reports nothing."""
    from pyspark.sql import Row

    shared = " ".join(f"s{i}" for i in range(10))
    docs = [
        Row(doc_id=1, text=shared + " " + " ".join(f"a{i}" for i in range(20))),
        Row(doc_id=2, text=" ".join(f"b{i}" for i in range(20)) + " " + shared),
        Row(doc_id=3, text=" ".join(f"c{i}" for i in range(30))),
    ]
    spark.createDataFrame(docs).write.parquet(str(tmp_path / "documents.parquet"))
    from flink_kakfa_spark.registry import all_queries

    rows = {
        r["doc_id"]: r
        for r in all_queries()["dedup_substring_runs"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(rows) == {1, 2}  # doc 3 has no duplicated window
    for doc_id in (1, 2):
        r = rows[doc_id]
        assert r["n_dup_runs"] == 1
        assert r["max_run_tokens"] == 10  # union of the 3 windows
        assert r["dup_tokens"] == 10
    assert rows[1]["dup_token_fraction"] == 10 / 30  # 30-token doc


def test_adamic_adar_predicts_only_new_links(spark, tmp_path):
    """Path 1-2-3 predicts exactly (1,3) through center 2 with score
    floor(1e9/ln(2)); existing edges are never predicted."""
    import math

    _lineitem(spark, tmp_path, [(1, [1, 2]), (2, [2, 3])])
    rows = all_queries()["graph_adamic_adar_top20"](
        spark, str(tmp_path)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["node_a"], r["node_b"]) == (1, 3)
    assert r["common_neighbors"] == 1
    assert r["score_fp"] == math.floor(1e9 / math.log(2))


def test_adamic_adar_triangle_has_no_predictions(spark, tmp_path):
    """A closed triangle already contains every pair -> empty output."""
    _lineitem(spark, tmp_path, [(1, [1, 2, 3])])
    assert (
        all_queries()["graph_adamic_adar_top20"](spark, str(tmp_path)).count()
        == 0
    )


def test_decontam_embedding_flags_planted_leak(spark, tmp_path):
    """A corpus vector equal to an eval vector scores cosine 1.0 and is
    flagged against THAT eval id; an orthogonal vector is not."""
    from pyspark.sql import Row

    dim = 8
    ev = [1.0] + [0.0] * (dim - 1)          # eval vector (vec_id 20)
    leak = [1.0] + [0.0] * (dim - 1)        # identical -> cosine 1.0
    ortho = [0.0, 1.0] + [0.0] * (dim - 2)  # cosine 0.0
    rows = [
        Row(vec_id=20, embedding=ev, label=0),
        Row(vec_id=1, embedding=leak, label=0),
        Row(vec_id=2, embedding=ortho, label=0),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    from flink_kakfa_spark.registry import all_queries

    got = {
        r["vec_id"]: r
        for r in all_queries()["decontam_embedding"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {1}
    assert got[1]["best_eval_id"] == 20
    assert got[1]["best_cos"] == 1.0
