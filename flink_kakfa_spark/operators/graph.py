"""Graph analytics over the co-purchase graph (Tier C extension; round 5).

The reference's pipeline ends at per-message handling
(``go/consumer/consumer.go:79-81``); a lakehouse team with the same
order history ships graph reports over it: the co-purchase graph
(parts bought together in one order — the classic market-basket
projection), its degree profile, its triangle census, a PageRank
centrality, and Adamic–Adar link prediction. All are textbook
distributed-graph shapes (degree-ordered triangle counting, Suri &
Vassilvitskii WWW 2011; fixed-point integer PageRank for
determinism; degree-capped common-neighbor scoring).

Scale posture (100 TB of orders):

- **Edge construction is bounded per order**: a TPC-H-shaped order has
  ≤ 7 lines, so the within-order self-join emits ≤ C(7,2) = 21 pairs
  per order — linear in the fact table, never quadratic in the
  catalog. The only data-sized shuffles are the per-order pair
  generation (hash on ``l_orderkey``) and the edge dedup (hash on the
  pair).
- **Triangle counting uses degree-ordered wedges**: every edge is
  directed from its lower-(degree, id) endpoint to the higher one, so
  each wedge is generated exactly once at its lowest-ranked vertex
  and a vertex's wedge fan-out is bounded by its *out*-degree ≤
  O(sqrt(m)) — the standard bound that keeps hub vertices from
  exploding the join. Wedge → closing-edge check is an equi-join on
  the (u, w) pair, not a scan.
- **PageRank runs in exact integer fixed-point** (SCALE = 1e9):
  contributions are ``rank // degree`` (integer floor division) and
  damping is ``(15 * S + 85 * contrib) // 100``. Integer sums are
  associative and overflow-safe in BIGINT (total mass ≤ n · SCALE),
  so the result is bit-identical across engines, partitionings, and
  retries — no IEEE summation-order drift. The iteration count is a
  fixed small k (unrolled in the oracle); the adjacency is hash-
  partitioned by ``dst`` once, so every round's per-dst aggregate is
  exchange-free (round 11 — see ``q_graph_pagerank_top20``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table

# Fixed-point scale for integer PageRank: 9 decimal digits keeps
# n * SCALE far below int64 while leaving ~9 significant digits.
_PR_SCALE = 1_000_000_000
_PR_ITERS = 3

# Shared SQL for the distinct undirected co-purchase edge list
# (canonical orientation src < dst), used by all three oracles.
_EDGES_SQL = """
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected co-purchase edges, canonically src < dst.

    One ``l_orderkey`` shuffle for the within-order pair generation
    (``collect_set`` per order, ≤ 7 parts, exploded to ≤ C(7,2) = 21
    pairs — in-array pair expansion instead of a self-join, so the
    order's lines move through the exchange once, not twice), one
    pair shuffle for the global dedup.
    """
    li = load_table(spark, "lineitem", sf_dir)
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    # all i<j pairs of the (sorted, ≤7-element) basket, in-array
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("parts"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("parts"),
                            i + 2,
                            F.size("parts"),
                        ),
                        lambda y: F.struct(
                            x.alias("src"), y.alias("dst")
                        ),
                    ),
                )
            )
        ).alias("e")
    )
    return pairs.select("e.src", "e.dst").distinct()


def _degrees(edges: DataFrame) -> DataFrame:
    """Node degrees via in-array endpoint explode — reads the edge
    list once (no self-union, which would duplicate the whole edge-
    construction subtree in the physical plan)."""
    return (
        edges.select(
            F.explode(F.array(F.col("src"), F.col("dst"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


@query(
    "graph_degree_stats",
    oracle=f"""
    WITH {_EDGES_SQL},
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (
        SELECT src AS node FROM edges
        UNION ALL
        SELECT dst AS node FROM edges
      ) GROUP BY node
    )
    SELECT
      CAST(FLOOR(LOG2(degree)) AS INTEGER) AS degree_bucket,
      CAST(COUNT(*) AS BIGINT) AS n_nodes,
      CAST(MIN(degree) AS BIGINT) AS min_degree,
      CAST(MAX(degree) AS BIGINT) AS max_degree
    FROM deg
    GROUP BY 1
    ORDER BY degree_bucket
    """,
)
def q_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed degree distribution of the co-purchase graph.

    The degree profile is the pre-flight for every downstream graph
    job (it sizes the triangle join and flags hub vertices for
    salting) — same role as ``profile_join_key_skew`` for joins.

    Scale: edge construction as above; the degree count is one
    shuffle of the (node) projection of the edge list, and the
    bucket histogram aggregates the per-node degrees — output is
    ~64 rows forever.
    """
    edges = _copurchase_edges(spark, sf_dir)
    deg = _degrees(edges)
    return (
        deg.groupBy(
            F.floor(F.log2("degree")).cast("int").alias("degree_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("degree").alias("min_degree"),
            F.max("degree").alias("max_degree"),
        )
        .orderBy("degree_bucket")
    )


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH {_EDGES_SQL},
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (
        SELECT src AS node FROM edges
        UNION ALL
        SELECT dst AS node FROM edges
      ) GROUP BY node
    ),
    -- re-orient every edge from lower-(degree, id) to higher
    oriented AS (
      SELECT
        CASE WHEN (ds.degree, e.src) < (dd.degree, e.dst)
             THEN e.src ELSE e.dst END AS u,
        CASE WHEN (ds.degree, e.src) < (dd.degree, e.dst)
             THEN e.dst ELSE e.src END AS v
      FROM edges e
      JOIN deg ds ON ds.node = e.src
      JOIN deg dd ON dd.node = e.dst
    ),
    wedges AS (
      SELECT o1.u AS a, o1.v AS b, o2.v AS c
      FROM oriented o1 JOIN oriented o2
        ON o1.v = o2.u
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM wedges w
    JOIN oriented o ON o.u = w.a AND o.v = w.c
    """,
)
def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle census via degree-ordered adjacency intersection.

    The MapReduce-era standard (Suri & Vassilvitskii, WWW 2011):
    orient each edge from its lower-(degree, id) endpoint, then count
    per edge (u, v) the size of N⁺(u) ∩ N⁺(v) over the ORIENTED
    out-neighbor lists — every triangle is counted exactly once at
    its lowest-ranked vertex. The intersection form beats the naive
    wedge-materializing join (measured 12.7 s → 7.5 s at sf0.1): the
    Σ out-deg² wedge rows never exist as shuffle records; they are
    an in-array ``array_intersect`` over neighbor lists bounded by
    out-degree ≤ O(sqrt(m)) — the degree-ordering bound that keeps
    hub vertices from exploding either form.

    Scale: beyond edge construction, one groupBy building the
    out-adjacency lists and two hash joins attaching them to each
    edge's endpoints (both sides shuffle at edge-list size; the
    arrays total exactly m longs). No broadcast assumption — at
    100 TB the adjacency relation is data-sized.
    """
    edges = _copurchase_edges(spark, sf_dir)
    deg = _degrees(edges)
    e = (
        edges.join(
            deg.select(
                F.col("node").alias("src"), F.col("degree").alias("sdeg")
            ),
            "src",
        )
        .join(
            deg.select(
                F.col("node").alias("dst"), F.col("degree").alias("ddeg")
            ),
            "dst",
        )
    )
    low_first = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    # Materialize the oriented edge list once: it feeds the adjacency
    # build AND both endpoint joins, and those consumers shuffle on
    # DIFFERENT keys (u vs v), so exchange reuse cannot help here —
    # without the checkpoint the whole edge-construction subtree is
    # duplicated 3x (measured as a 62-exchange plan). Cost of the
    # checkpoint: one retained block set per invocation until
    # ContextCleaner GC (see SCALE.md "localCheckpoint is not a CSE
    # tool") — acceptable for a census query, and why the other graph
    # queries avoid it.
    oriented = e.select(
        F.when(low_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(low_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
    ).localCheckpoint()
    nbrs = oriented.groupBy("u").agg(
        F.sort_array(F.collect_list("v")).alias("ns")
    )
    # inner join on v is safe: an edge whose head has no out-neighbors
    # contributes 0 triangles either way
    j = oriented.join(
        nbrs.select("u", F.col("ns").alias("ns_u")), "u"
    ).join(
        nbrs.select(F.col("u").alias("v"), F.col("ns").alias("ns_v")), "v"
    )
    return j.agg(
        F.sum(F.size(F.array_intersect("ns_u", "ns_v")))
        .cast("long")
        .alias("n_triangles")
    )


def _pagerank_oracle() -> str:
    """Unrolled k-iteration integer-fixed-point PageRank oracle SQL."""
    prev = "r0"
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(
            f"""
    r{i} AS (
      SELECT
        n.node,
        CAST((15 * CAST({_PR_SCALE} AS BIGINT) +
              85 * COALESCE(SUM(p.rank // d.degree), CAST(0 AS BIGINT))) // 100
             AS BIGINT) AS rank
      FROM nodes n
      LEFT JOIN adj a ON a.dst = n.node
      LEFT JOIN {prev} p ON p.node = a.src
      LEFT JOIN deg d ON d.node = a.src
      GROUP BY n.node
    )"""
        )
        prev = f"r{i}"
    return f"""
    WITH {_EDGES_SQL},
    adj AS (
      SELECT src, dst FROM edges
      UNION ALL
      SELECT dst AS src, src AS dst FROM edges
    ),
    deg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM adj GROUP BY src
    ),
    nodes AS (SELECT node FROM deg),
    r0 AS (
      SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM nodes
    ),{",".join(steps)}
    SELECT node AS p_partkey, rank AS pagerank_fp
    FROM {prev}
    ORDER BY pagerank_fp DESC, p_partkey
    LIMIT 20
    """


@query("graph_pagerank_top20", oracle=_pagerank_oracle())
def q_graph_pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank centrality in exact integer fixed-point.

    Classic damped PageRank (d = 0.85) on the symmetrized co-purchase
    graph, but computed entirely in int64 fixed-point (SCALE = 1e9):
    each round every node emits ``rank // degree`` to each neighbor
    and absorbs ``(15·S + 85·Σ contrib) // 100``. Floor divisions and
    integer sums are exactly associative, so the ranks are
    bit-identical across engines, partition counts, and retries —
    the determinism trick that makes an iterative job value-hashable
    (same reason ``sample_weighted_topk`` uses dyadic uniforms).

    Scale: k fixed rounds, each one shuffle of the adjacency list on
    ``src`` (join ranks → groupBy dst). The rank frame is one row per
    node — always tiny next to the edge list — and is re-derived per
    round from the prior round's aggregate, so lineage depth is k, not
    data-sized. For large k, checkpoint every few rounds exactly as
    ``dedup.py::propagate_min_labels`` does.
    """
    edges = _copurchase_edges(spark, sf_dir)
    # symmetrize in-array (one read of the edge list, no self-union)
    adj = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # Materialize the adjacency ONCE — (src, dst) only. Exchange reuse
    # does NOT dedupe the edge-construction subtree across rounds —
    # measured directly: without the checkpoint, every round re-runs
    # edge construction from the fact table — k full scans at 100 TB
    # (22.7 s vs ~5 s at sf0.1). Round 12: degree no longer rides the
    # edge list — the old groupBy(src)+join put a second edge-scale
    # consumer on the UN-pinned adjacency and re-ran its construction
    # (build measured 3.53 s with the join vs 1.65 s without; r11
    # misattributed the delta to the checkpoint write, which is
    # ~0.4 s). Degree now lives in the node-sized rank frame below.
    # Retention cost: one edge-sized block set per invocation until
    # ContextCleaner GC (SCALE.md).
    adj_cp = adj.localCheckpoint()
    # ONE dst-keyed exchange serves every round (round 11, guide §2.4):
    # each round ends in groupBy(dst), so hash-partitioning the
    # checkpointed adjacency by dst ONCE lets all k per-round
    # aggregates run exchange-free (HashPartitioning(dst) satisfies
    # the aggregate's ClusteredDistribution), and AQE stage reuse
    # dedupes the identical repartition subtrees across rounds. The
    # checkpoint itself cannot carry the partitioning (LogicalRDD
    # under AQE reports UnknownPartitioning — probed on this build),
    # hence the explicit repartition ABOVE it. Plan-asserted in
    # tests/test_graph.py::test_pagerank_rounds_are_exchange_free.
    adj_part = adj_cp.repartition(F.col("dst"))
    # On the symmetrized graph in-degree == degree, so the degree table
    # falls out of a groupBy(dst) that rides the existing partitioning
    # — exchange-free, no src-keyed aggregate, no join back onto the
    # adjacency (round 12; replaces the pre-checkpoint degree join).
    deg = adj_part.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    # rank_0 = SCALE for every node; degree travels IN the node-sized
    # rank frame (each round's aggregate re-derives the receiving
    # node's degree as count(1) — the inner join against the full rank
    # frame keeps every adjacency row, so the count is exact).
    ranks = deg.select(
        "node", F.lit(_PR_SCALE).cast("long").alias("rank"), "degree"
    )
    for _ in range(_PR_ITERS):
        # The broadcast hint is load-bearing: under AQE the adjacency
        # repartition stage completes first and proves small, so the
        # planner otherwise broadcasts the EDGE side (BuildLeft) and
        # re-shuffles every round's aggregate (measured: 2 ENSURE
        # exchanges, values identical, ~40% slower). The rank frame is
        # node-sized — always the side to ship; at a catalog too big
        # to broadcast, drop the hint and key the rank frame by dst
        # instead (same exchange-free aggregate, one node-sized
        # shuffle per round).
        ranks = (
            adj_part.join(
                F.broadcast(
                    ranks.select(F.col("node").alias("src"), "rank", "degree")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(
                    F.floor(F.col("rank") / F.col("degree")).cast("long")
                ).alias("contrib"),
                F.count(F.lit(1)).alias("degree"),
            )
            .select(
                "node",
                F.floor(
                    (F.lit(15 * _PR_SCALE) + 85 * F.col("contrib")) / 100
                )
                .cast("long")
                .alias("rank"),
                "degree",
            )
        )
    return (
        ranks.select(
            F.col("node").alias("p_partkey"),
            F.col("rank").alias("pagerank_fp"),
        )
        .orderBy(F.desc("pagerank_fp"), "p_partkey")
        .limit(20)
    )


# Hub cap for link-prediction wedges: centers above this degree are
# excluded (their per-pair evidence is weakest — 1/ln(deg) — and they
# are what makes common-neighbor enumeration quadratic). Same df-cap
# posture as text_winnow_guarded / dedup_ngram_jaccard_guarded.
_AA_DEGREE_CAP = 64


@query(
    "graph_adamic_adar_top20",
    oracle=f"""
    WITH {_EDGES_SQL},
    adj AS (
      SELECT src, dst FROM edges
      UNION ALL
      SELECT dst AS src, src AS dst FROM edges
    ),
    deg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS c
      FROM adj GROUP BY src
    ),
    ctr AS (
      SELECT a.src AS w, a.dst AS nb, d.c AS degw
      FROM adj a JOIN deg d ON d.node = a.src
      WHERE d.c BETWEEN 2 AND {_AA_DEGREE_CAP}
    ),
    pairs AS (
      SELECT
        o1.nb AS a, o2.nb AS c,
        CAST(FLOOR(1000000000.0 / LN(o1.degw)) AS BIGINT) AS contrib
      FROM ctr o1 JOIN ctr o2 ON o1.w = o2.w AND o1.nb < o2.nb
    ),
    aa AS (
      SELECT a, c,
             CAST(COUNT(*) AS BIGINT) AS common_neighbors,
             CAST(SUM(contrib) AS BIGINT) AS score_fp
      FROM pairs GROUP BY a, c
    )
    SELECT
      aa.a AS node_a, aa.c AS node_b, aa.common_neighbors, aa.score_fp
    FROM aa LEFT JOIN edges e ON e.src = aa.a AND e.dst = aa.c
    WHERE e.src IS NULL
    ORDER BY score_fp DESC, node_a, node_b
    LIMIT 20
    """,
)
def q_graph_adamic_adar_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted links by Adamic–Adar score, in integer
    fixed-point.

    Adamic–Adar (2003) scores a candidate pair by Σ 1/ln(deg(w)) over
    common neighbors w — the standard common-neighbor link predictor.
    Two scale levers: (1) hubs above ``_AA_DEGREE_CAP`` are excluded
    as wedge centers, bounding pair fan-out to cap² per node (the
    guarded-join posture; an uncapped hub of degree n would emit
    O(n²) pairs while contributing the least-informative evidence);
    (2) contributions are floor(1e9 / ln(deg)) in int64, so the
    summed score is exactly associative — bit-identical across
    engines/partitionings — making desc-score top-k deterministic.

    Plan: one wedge self-join on the (degree-capped) center, one
    (a, c) pair aggregate, a left-anti join against existing edges
    (only NEW links are predictions), TakeOrdered(20).
    """
    edges = _copurchase_edges(spark, sf_dir)
    adj = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("degw"))
    ctr = (
        adj.join(deg, "src")
        # degree-1 centers cannot form a wedge (and ln(1)=0 would
        # divide by zero under ANSI mode) — filter before computing
        # the contribution
        .filter(
            (F.col("degw") >= 2) & (F.col("degw") <= _AA_DEGREE_CAP)
        )
        .select(
            F.col("src").alias("w"),
            F.col("dst").alias("nb"),
            F.floor(F.lit(1_000_000_000.0) / F.log(F.col("degw")))
            .cast("long")
            .alias("contrib"),
        )
        # materialized once: AQE does not reuse exchanges across its
        # stages here (see graph_pagerank_top20), so without this the
        # degree-capped center relation — and the edge construction
        # under it — would build once per wedge side
        .localCheckpoint()
    )
    o1, o2 = ctr.alias("o1"), ctr.alias("o2")
    pairs = o1.join(
        o2,
        (F.col("o1.w") == F.col("o2.w")) & (F.col("o1.nb") < F.col("o2.nb")),
    ).select(
        F.col("o1.nb").alias("a"),
        F.col("o2.nb").alias("c"),
        F.col("o1.contrib").alias("contrib"),
    )
    aa = pairs.groupBy("a", "c").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum("contrib").alias("score_fp"),
    )
    return (
        aa.join(
            edges,
            (aa["a"] == edges["src"]) & (aa["c"] == edges["dst"]),
            "left_anti",
        )
        .select(
            F.col("a").alias("node_a"),
            F.col("c").alias("node_b"),
            "common_neighbors",
            "score_fp",
        )
        .orderBy(F.desc("score_fp"), "node_a", "node_b")
        .limit(20)
    )


@query(
    "graph_neighbor_jaccard_top20",
    oracle=f"""
    WITH {_EDGES_SQL},
    adj AS (
      SELECT src, dst FROM edges
      UNION ALL
      SELECT dst AS src, src AS dst FROM edges
    ),
    deg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS c
      FROM adj GROUP BY src
    ),
    ctr AS (
      SELECT a.src AS w, a.dst AS nb
      FROM adj a JOIN deg d ON d.node = a.src
      WHERE d.c BETWEEN 2 AND {{cap}}
    ),
    common AS (
      SELECT o1.nb AS a, o2.nb AS c, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM ctr o1 JOIN ctr o2 ON o1.w = o2.w AND o1.nb < o2.nb
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT
        m.a, m.c, m.n_common,
        CAST(m.n_common * 10000
             // (da.c + dc.c - m.n_common) AS BIGINT) AS jaccard_bp
      FROM common m
      JOIN deg da ON da.node = m.a
      JOIN deg dc ON dc.node = m.c
    )
    SELECT
      s.a AS node_a, s.c AS node_b, s.n_common, s.jaccard_bp
    FROM scored s LEFT JOIN edges e ON e.src = s.a AND e.dst = s.c
    WHERE e.src IS NULL
    ORDER BY s.jaccard_bp DESC, s.n_common DESC, node_a, node_b
    LIMIT 20
    """.format(cap=64),
)
def q_graph_neighbor_jaccard_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted links by neighbor-set Jaccard — the normalized
    companion to ``graph_adamic_adar_top20`` (common neighbors over
    union of neighborhoods, so high-degree nodes can't dominate on raw
    overlap count). Same guarded-wedge plan: degree-capped centers
    bound pair fan-out; |N(a) n N(c)| comes from the wedge aggregate,
    never a set materialization, and the union size is the degree
    identity da + dc - common, so the score needs only the degree
    table (two KB-sized joins). Integer basis points make desc-score
    top-k deterministic. Existing edges are anti-joined out — only NEW
    links are predictions.

    Scale: one wedge self-join on capped centers + one (a, c)
    aggregate — identical cost envelope to Adamic-Adar; everything
    else is degree-table-sized.
    """
    # edges feeds the adjacency AND the final anti-join; deg feeds the
    # wedge filter AND both score joins — materialize each once (AQE
    # does not reuse exchanges across stages, see graph_pagerank_top20;
    # without these the co-purchase edge build re-ran once per
    # consumer: 19 exchanges vs 6)
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    adj = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    deg = (
        adj.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    ctr = (
        adj.join(deg, "src")
        .filter((F.col("c") >= 2) & (F.col("c") <= _AA_DEGREE_CAP))
        .select(F.col("src").alias("w"), F.col("dst").alias("nb"))
        .localCheckpoint()
    )
    o1 = ctr.select(F.col("w"), F.col("nb").alias("a"))
    o2 = ctr.select(F.col("w"), F.col("nb").alias("c"))
    common = (
        o1.join(o2, "w")
        .filter(F.col("a") < F.col("c"))
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    da = deg.select(F.col("src").alias("a"), F.col("c").alias("da"))
    dc = deg.select(F.col("src").alias("c"), F.col("c").alias("dc"))
    scored = (
        common.join(da, "a")
        .join(dc, "c")
        .select(
            "a",
            "c",
            "n_common",
            F.floor(
                F.col("n_common")
                * 10000
                / (F.col("da") + F.col("dc") - F.col("n_common"))
            )
            .cast("long")
            .alias("jaccard_bp"),
        )
    )
    ex = edges.select(
        F.col("src").alias("a"), F.col("dst").alias("c"), F.lit(1).alias("_e")
    )
    return (
        scored.join(ex, ["a", "c"], "left")
        .filter(F.col("_e").isNull())
        .select(
            F.col("a").alias("node_a"),
            F.col("c").alias("node_b"),
            "n_common",
            "jaccard_bp",
        )
        .orderBy(
            F.col("jaccard_bp").desc(),
            F.col("n_common").desc(),
            "node_a",
            "node_b",
        )
        .limit(20)
    )
