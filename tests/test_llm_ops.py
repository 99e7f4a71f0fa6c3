"""Tests for the LLM-pipeline operators: dedup, similarity, text,
multimodal. Synthetic micro-fixtures with *known* duplicates/neighbors
(the driver corpus has none), plus contract checks on the fixture data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_kakfa_spark.registry import all_queries


@pytest.fixture(scope="module")
def dup_docs(spark):
    """Corpus with one exact dup pair and one near-dup pair."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    other = "completely different words about spark engines and shuffle plans here"
    return spark.createDataFrame(
        [
            Row(doc_id=0, text=base),
            Row(doc_id=1, text=base),      # exact dup of 0
            Row(doc_id=2, text=near),      # near dup of 0/1
            Row(doc_id=3, text=other),
        ]
    )


def test_exact_dedup_finds_known_dup(spark, dup_docs):
    fp = F.md5(F.col("text").cast("binary"))
    groups = (
        dup_docs.groupBy(fp.alias("fp"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keep"))
        .collect()
    )
    dup_group = [g for g in groups if g["n"] > 1]
    assert len(dup_group) == 1
    assert dup_group[0]["keep"] == 0 and dup_group[0]["n"] == 2


def test_ngram_jaccard_ranks_known_pairs(spark, dup_docs, monkeypatch, tmp_path):
    # route the registered query at our micro-corpus via a parquet dir
    dup_docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = all_queries()["dedup_ngram_jaccard"](spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out}
    assert pairs[(0, 1)] == 1.0                      # exact dup
    assert 0.5 < pairs[(0, 2)] < 1.0                 # near dup
    assert (0, 3) not in pairs                       # no shared shingle
    # ranking: exact dup above near dup
    assert out[0]["jaccard"] >= out[-1]["jaccard"]


def test_simhash_near_dup_smallest_distance(spark, dup_docs, tmp_path):
    dup_docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = all_queries()["dedup_simhash"](spark, str(tmp_path)).collect()
    top = out[0]
    assert (top["doc_a"], top["doc_b"]) == (0, 1) and top["hamming"] == 0
    by_pair = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out}
    # banded candidates keep only hamming<=3 pairs: the unrelated doc 3
    # must NOT pair with anything, while the near-dup pair survives
    assert all(h <= 3 for h in by_pair.values())
    assert not any(3 in p for p in by_pair)
    assert (0, 2) in by_pair


def test_minhash_portable_catches_known_pairs(spark, dup_docs, tmp_path):
    """The portable MinHash must recover the exact dup (J=1: every band
    agrees) and rank it first; disjoint docs never become candidates."""
    dup_docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = all_queries()["dedup_minhash_portable"](spark, str(tmp_path)).collect()
    assert (out[0]["doc_a"], out[0]["doc_b"]) == (0, 1) and out[0]["jaccard"] == 1.0
    assert not any(3 in (r["doc_a"], r["doc_b"]) for r in out)


def test_minhash_lsh_catches_exact_dup(spark, dup_docs, tmp_path):
    dup_docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = all_queries()["dedup_minhash_lsh"](spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (0, 1) in pairs


def test_cosine_topk_self_similarity(spark, sf_dir):
    """Nearest neighbor of a vector close to vec 0 should score ~1."""
    out = all_queries()["sim_cosine_topk"](spark, sf_dir).collect()
    assert len(out) == 10
    sims = [r["cos_sim"] for r in out]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)


def test_embedding_lsh_dedup_finds_planted_pairs(spark, tmp_path):
    """Planted near-identical vectors must be recovered by the LSH
    candidate stage (miss probability per planted pair ~(1-0.95)^8,
    i.e. negligible), and rank at the top by exact cosine rescore."""
    import random

    rng = random.Random(7)
    base = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(60)]
    rows = [Row(vec_id=i, embedding=[float(x) for x in v], label=0)
            for i, v in enumerate(base)]
    # plant 5 near-duplicates of vectors 0..4 (tiny perturbation)
    for k in range(5):
        rows.append(Row(
            vec_id=100 + k,
            embedding=[float(x + 0.001 * (j % 3)) for j, x in enumerate(base[k])],
            label=0,
        ))
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = all_queries()["dedup_embedding_cosine"](spark, str(tmp_path)).collect()
    top5 = {(r["vec_a"], r["vec_b"]) for r in out[:5]}
    assert top5 == {(k, 100 + k) for k in range(5)}
    assert all(r["cos_sim"] > 0.99 for r in out[:5])


def test_embedding_lsh_adaptive_bits_matches_oracle(spark, tmp_path):
    """Above 4096 vectors the LSH bit depth leaves its fixture floor
    (bits = ceil_log2(n) - 4); no committed fixture exercises that
    branch, so this pins Spark == DuckDB on a 4200-vector deterministic
    corpus where bits = 9 — the adaptive formula must produce the same
    integer on both engines (int.bit_length vs FORMAT('{:b}')) or the
    buckets diverge wholesale."""
    import duckdb

    from flink_kakfa_spark.operators.dedup import _EMB_ORACLE, _emb_bits
    from flink_kakfa_spark.registry import all_queries

    n = 4200
    assert _emb_bits(n) == 9  # the test is pointless if it stays at the floor
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE VIEW embeddings AS
        SELECT i AS vec_id,
               [CAST((((i * 64 + d) * 2654435761) % 2000) / 1000.0 - 1.0
                     AS FLOAT) FOR d IN range(64)] AS embedding,
               0 AS label
        FROM range({n}) t(i)
        """
    )
    con.execute(
        f"COPY (SELECT * FROM embeddings) TO '{tmp_path}/embeddings.parquet'"
        " (FORMAT PARQUET)"
    )
    expected = con.execute(_EMB_ORACLE).fetchall()
    got = [
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in all_queries()["dedup_embedding_cosine"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == [tuple(r) for r in expected]
    assert len(got) > 0


@pytest.fixture(scope="module")
def mutated_dup_corpus(spark, tmp_path_factory):
    """Deterministic MUTATED-duplicate corpus (the tools/scale10.py
    SPARK_GRAFT_SCALE_MUTATE regime at pytest scale): 25 base docs x 12
    copies, each copy perturbed by ONE token, so every text digest
    differs while shingle sets / signatures stay near-identical — the
    exact-collapse cannot fire and band buckets genuinely deepen with
    multiplicity. Three groups also carry one VERBATIM duplicate so
    both collapse levels (text digest AND signature/stream form) are
    exercised in the same corpus. Docs are 40 tokens (round 10, was
    16) so the one-token mutation keeps token Jaccard ABOVE
    dedup_jaccard_prefix_filter's t = 0.9 (copy-vs-copy 38/42 ~ 0.905,
    copy-vs-original 39/41 ~ 0.951) — at 16 tokens no mutated pair
    qualified (15/17 ~ 0.88) and that gate would only see the
    verbatim duplicates."""
    rows = []
    did = 0
    for b in range(25):
        toks = [f"base{b}tok{j}" for j in range(40)]
        # shared vocabulary across groups: simhash signature bits vote
        # on vocabulary and must correlate for the deep-bucket regime
        toks[0], toks[1], toks[7] = "the", "common", "pipeline"
        for i in range(12):
            t = list(toks)
            if i > 0:
                t[(did + i) % len(t)] = f"mu{i}"
            rows.append(Row(doc_id=did, text=" ".join(t)))
            did += 1
        if b < 3:  # verbatim duplicate of the group's unmutated original
            rows.append(Row(doc_id=did, text=" ".join(toks)))
            did += 1
    path = str(tmp_path_factory.mktemp("mutdup"))
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )
    return path


# min_rows: the top-20 listers must SATURATE their bound (exactly 20);
# dedup_near_unique emits every rep pair at J >= 0.5 (each group's 12
# mutated variants are pairwise ~0.85 => >= 25 * C(12,2) = 1650 pairs);
# dedup_jaccard_prefix_filter emits a histogram whose every bucket must
# be populated by MUTATED pairs, not just the verbatim ones (buckets
# 18/19 from the ~0.905/~0.951 mutated pairs + 20 from the verbatim
# dups) — a corpus where only verbatim pairs qualify would leave one
# row and silently stop exercising the prefix filter.
@pytest.mark.parametrize(
    "name,min_rows",
    [
        ("dedup_simhash", 20),
        ("dedup_minhash_portable", 20),
        ("text_winnow_fingerprints", 20),
        ("dedup_near_unique", 1650),
        ("dedup_jaccard_prefix_filter", 3),
    ],
)
def test_mutated_dup_corpus_matches_oracle(spark, mutated_dup_corpus, name, min_rows):
    """Spark == DuckDB on the mutated-duplicate corpus for every pair
    lister rewritten for that regime (simhash's r8 signature collapse
    + double pigeonhole; minhash's r9 zero-materialization band join;
    winnow's r9 adaptive two-phase rare-first prefix top-k — three
    killed predecessor forms, the highest regression surface in the
    repo; near_unique's r9 prefix-filter + witness-minimal uniqueness;
    jaccard_prefix_filter's r9 witness-minimal census): pins the
    collapse-losslessness, seed-bound, prefix and witness arguments as
    a permanent gate instead of a one-off 100x sweep (VERDICT r8 task
    5, extended to all five in r10 per VERDICT r9 task 3)."""
    import duckdb

    from flink_kakfa_spark.registry import ORACLES

    qs = all_queries()  # triggers load_all(), populating ORACLES
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{mutated_dup_corpus}/documents.parquet/*.parquet')"
    )
    expected = [tuple(r) for r in con.execute(ORACLES[name]).fetchall()]
    got = [tuple(r) for r in qs[name](spark, mutated_dup_corpus).collect()]
    if min_rows == 20:
        assert len(got) == 20, name  # the corpus must saturate the top-20
    else:
        assert len(got) >= min_rows, name
    if name in ("dedup_near_unique", "dedup_jaccard_prefix_filter"):
        # unordered emitters: the driver compare sorts rows too
        assert sorted(got) == sorted(expected)
    else:
        assert got == expected


def test_banded_dedup_plans_have_no_quadratic_join(spark, sf_dir):
    """The round-3 rewrites must leave no cartesian/BNLJ stage."""
    for name in ("dedup_simhash", "dedup_embedding_cosine"):
        df = all_queries()[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_lsh_ann_subset_of_brute_force_space(spark, sf_dir):
    """ANN results must be genuine vectors with valid cosine scores."""
    out = all_queries()["sim_lsh_ann_topk"](spark, sf_dir).collect()
    assert all(-1.0 <= r["cos_sim"] <= 1.0 for r in out)


def test_text_quality_bounds(spark, sf_dir):
    rows = all_queries()["text_quality_score"](spark, sf_dir).collect()
    for r in rows:
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 <= r["short_ratio"] <= 1.0
        assert r["len_ok"] in (0, 1)


def test_rolling_fingerprint_order_sensitive(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="a b c"), Row(doc_id=1, text="c b a")]
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = all_queries()["text_fingerprint_rolling"](spark, str(tmp_path)).collect()
    fps = {r["doc_id"]: r["rolling_fp"] for r in out}
    assert fps[0] != fps[1]  # permutation changes the fingerprint


def test_mm_decode_frames_contract(spark, sf_dir):
    out = all_queries()["mm_decode_frames"](spark, sf_dir)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "frame_idx", "width", "height", "brightness"
    ]
    rows = out.filter(F.col("doc_id") == 0).collect()
    assert len(rows) == 3
    assert all(0.0 <= r["brightness"] <= 1.0 for r in rows)


def test_mm_extract_features_dim(spark, sf_dir):
    rows = all_queries()["mm_extract_features"](spark, sf_dir).limit(5).collect()
    # 4 scalar feature dims (de-arrayed in r5 so the driver canonicalizer
    # can sort the result) + byte count
    for r in rows:
        assert {"f_mean", "f_min", "f_max", "f_mod", "n_bytes"} <= set(r.asDict())
        assert 0.0 <= r["f_min"] <= r["f_mean"] <= r["f_max"] <= 255.0
    assert all(r["n_bytes"] > 0 for r in rows)


def test_stop_shingle_guard_bounds_candidates(spark, tmp_path):
    """max_shingle_df drops boilerplate shingles from candidate
    generation without touching rare (signal) shingles."""
    from pyspark.sql import Row

    from flink_kakfa_spark.operators.dedup import _jaccard_pairs

    boiler = "standard legal disclaimer text here"
    docs = [Row(doc_id=i, text=f"{boiler} unique{i} a b") for i in range(6)]
    docs += [Row(doc_id=10, text="rare pair xyz q w"), Row(doc_id=11, text="rare pair xyz q z")]
    spark.createDataFrame(docs).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    unguarded = _jaccard_pairs(spark, str(tmp_path)).count()
    guarded_pairs = _jaccard_pairs(spark, str(tmp_path), max_shingle_df=3)
    guarded = {(r["doc_a"], r["doc_b"]) for r in guarded_pairs.collect()}
    # boilerplate clique (15 pairs among docs 0-5) is gone...
    assert unguarded >= 15 + 1
    assert all(a >= 10 for a, _ in guarded)
    # ...but the rare near-dup pair (df=2 shingles) survives
    assert (10, 11) in guarded


def test_near_unique_collapses_exact_dups_first(spark, tmp_path):
    """dedup_near_unique must not emit pairs between identical texts."""
    from pyspark.sql import Row

    from flink_kakfa_spark.registry import all_queries

    base = "one two three four five six seven"
    docs = [Row(doc_id=0, text=base), Row(doc_id=1, text=base), Row(doc_id=2, text=base),
            Row(doc_id=3, text=base + " eight")]
    spark.createDataFrame(docs).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {(r["doc_a"], r["doc_b"]) for r in
           all_queries()["dedup_near_unique"](spark, str(tmp_path)).collect()}
    # copies 1,2 collapsed into representative 0; only the near-dup edge remains
    assert out == {(0, 3)}


def test_pack_sequences_layout_invariants(spark, sf_dir):
    """Pack layout: offsets are contiguous per shard, bins hold exactly
    512 token slots, and spans_boundary is set iff a doc crosses one."""
    rows = all_queries()["pipeline_pack_sequences"](spark, sf_dir).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in docs:
            assert r["start_offset"] == offset
            assert r["pack_bin"] == r["start_offset"] // 512
            end_bin = (r["start_offset"] + r["n_tokens"] - 1) // 512
            assert r["spans_boundary"] == (r["pack_bin"] != end_bin)
            offset += r["n_tokens"]


def test_decontam_flags_planted_leak(spark, tmp_path):
    """Eval split excluded from output; leaked text scores ratio 1.0."""
    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    partial = "alpha beta gamma delta nine ten eleven twelve"
    clean = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=eval_text),   # 0 % 101 == 0 -> eval split
            Row(doc_id=1, text=eval_text),   # verbatim benchmark leak
            Row(doc_id=2, text=partial),     # shares exactly one 4-gram
            Row(doc_id=3, text=clean),       # no overlap
        ]
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in all_queries()["decontam_eval_overlap"](spark, str(tmp_path)).collect()
    }
    assert 0 not in out                       # eval docs never scored
    assert out[1]["contamination_ratio"] == 1.0
    assert out[1]["n_shared"] == out[1]["n_shingles"]
    assert out[2]["n_shared"] == 1            # only "alpha beta gamma delta"
    assert out[3]["n_shared"] == 0 and out[3]["contamination_ratio"] == 0.0


def test_repetition_ngrams_exact_counts_and_narrow_plan(spark, tmp_path):
    """Known bigram stats; whole query must compile to a shuffle-free map."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="x y x y x y"),  # bigrams: 5 total, 2 distinct
            Row(doc_id=2, text="a b c"),        # all distinct
        ]
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    df = all_queries()["text_repetition_ngrams"](spark, str(tmp_path))
    out = {r["doc_id"]: r for r in df.collect()}
    assert out[1]["n_bigrams"] == 5 and out[1]["n_distinct"] == 2
    assert out[1]["max_repeat"] == 3            # "x y" occurs 3 times
    assert abs(out[1]["dup_fraction"] - 0.6) < 1e-12
    assert out[2]["n_bigrams"] == 2 and out[2]["max_repeat"] == 1
    assert out[2]["dup_fraction"] == 0.0
    plan = df._jdf.queryExecution().executedPlan().toString()
    # narrow map over the scan: no wide exchange (the only allowed one
    # is parallelize()'s fixture-oriented round-robin repartition)
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan


def test_dedup_clusters_long_chain_bounded_lineage(spark):
    """A 60-node path graph (diameter 59) converges to one component
    with correct labels AND bounded plan depth — the r5 lineage
    hardening: labels are localCheckpoint-ed every 5 rounds, so the
    plan resets to a leaf instead of nesting one join per round."""
    from pyspark.sql import functions as F

    from flink_kakfa_spark.operators.dedup import propagate_min_labels

    chain = [(i, i + 1) for i in range(59)]          # 0-1-2-...-59
    tri = [(100, 101), (101, 102), (100, 102)]       # separate component
    edges = spark.createDataFrame(chain + tri, ["src", "dst"])
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()

    labels = propagate_min_labels(sym, checkpoint_every=5)
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert all(got[i] == 0 for i in range(60))
    assert all(got[i] == 100 for i in (100, 101, 102))
    # localCheckpoint truncation: the converged result's plan is a
    # scan of checkpointed partitions, not 59 nested join rounds
    plan = labels._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 2000, f"lineage not truncated: {len(plan)} chars"
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan


def test_text_length_histogram_partitions_corpus(spark, sf_dir):
    """Buckets cover every doc exactly once and fractions sum to 1."""
    rows = all_queries()["text_length_histogram"](spark, sf_dir).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    assert n_docs == all_queries()["dedup_exact_stats"](spark, sf_dir).collect()[0]["n_docs"]
    assert abs(sum(r["frac_docs"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r["bucket_lo"] == 2 ** r["bucket"]
        assert r["bucket_hi"] == 2 ** (r["bucket"] + 1) - 1


def test_text_oov_rate_flags_rare_words(spark, tmp_path):
    """A word below the 0.1% floor counts as OOV; frequent words don't."""
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="common " * 99 + "common", lang="en",
             source="s", n_chars=700) for i in range(10)]
        + [Row(doc_id=99, text="common rareword " + "common " * 97 + "common",
               lang="en", source="s", n_chars=700)]
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in all_queries()["text_oov_rate"](spark, str(tmp_path)).collect()}
    # 'rareword' appears once in ~1100 tokens -> below the 0.1% floor
    assert out[99]["n_oov"] == 1
    assert out[0]["n_oov"] == 0
    assert abs(out[99]["oov_rate"] - 1 / out[99]["n_tokens"]) < 1e-12


def test_dedup_paragraphs_detects_shared_segment(spark, tmp_path):
    """Two docs sharing an identical 16-token block are flagged; a
    unique doc is not."""
    from pyspark.sql import Row

    shared = " ".join(f"s{i}" for i in range(16))
    uniq_a = " ".join(f"a{i}" for i in range(16))
    uniq_b = " ".join(f"b{i}" for i in range(16))
    uniq_c = " ".join(f"c{i}" for i in range(32))
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=shared + " " + uniq_a, lang="en", source="s", n_chars=1),
            Row(doc_id=2, text=shared + " " + uniq_b, lang="en", source="s", n_chars=1),
            Row(doc_id=3, text=uniq_c, lang="en", source="s", n_chars=1),
        ]
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in all_queries()["dedup_paragraphs"](spark, str(tmp_path)).collect()}
    assert out[1]["n_segments"] == 2 and out[1]["n_dup_segments"] == 1
    assert out[2]["n_dup_segments"] == 1
    assert out[3]["n_dup_segments"] == 0
    assert abs(out[1]["dup_token_fraction"] - 0.5) < 1e-12


def test_emb_matryoshka_retention_bounds(spark, sf_dir):
    """Retention is a cosine in (0, 1]; prefix can't exceed full norm."""
    rows = all_queries()["emb_matryoshka_quality"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["min_retention"] <= r["avg_retention"] <= 1.0


def test_sim_sq8_rescore_recall_vs_exact(spark, sf_dir):
    """SQ8 shortlist + rescore must recover the exact brute-force
    top-10 (64-dim, 8-bit codes: quantization error is far below the
    neighbor gap in the fixture) and report approx close to exact."""
    exact = [r["vec_id"] for r in all_queries()["sim_cosine_topk"](spark, sf_dir).collect()]
    sq8 = all_queries()["sim_sq8_rescore_topk"](spark, sf_dir).collect()
    assert [r["vec_id"] for r in sq8] == exact
    for r in sq8:
        assert abs(r["approx_cos"] - r["cos_sim"]) < 0.01


def test_char_entropy_bounds_and_extremes(spark, sf_dir):
    """Entropy lies in [0, log2(distinct_chars)]; a repeated-char doc
    would score 0 (verified on a constructed frame)."""
    import math

    from flink_kakfa_spark.registry import all_queries

    rows = all_queries()["text_char_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["entropy_bits"] <= math.log2(r["n_distinct_chars"]) + 1e-9
    # constructed extremes: uniform chars -> log2(k); single char -> 0
    df = spark.createDataFrame(
        [(1, "aaaa", None, None, 4), (2, "abcd", None, None, 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.createOrReplaceTempView("ent_docs")
    from pyspark.sql import functions as F

    chars = df.select("doc_id", F.explode(F.split("text", "")).alias("ch")).filter(
        F.col("ch") != ""
    )
    counted = chars.groupBy("doc_id", "ch").count()
    got = {r["doc_id"]: r["count"] for r in counted.groupBy("doc_id").count().collect()}
    assert got == {1: 1, 2: 4}


def test_dedup_clusters_invariant_under_verbatim_duplication(spark, sf_dir, tmp_path):
    """The 100x-sweep regression pinned as a correctness property:
    replicating every document verbatim (shifted ids) must (a) keep
    every base component with its base cluster_id — copies only ever
    ADD Jaccard-1.0 members, and min doc_id stays the base minimum —
    and (b) turn every previously-edgeless eligible doc into a clique
    of its own copies seeded at the base id. Exercises the
    exact-collapse seeds and the member re-attach join directly."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    off = base.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = 3
    rep = base
    for i in range(1, copies):
        rep = rep.unionByName(base.withColumn("doc_id", F.col("doc_id") + i * off))
    rep.write.parquet(str(tmp_path / "documents.parquet"))

    qs = all_queries()
    base_out = {
        r["doc_id"]: r["cluster_id"]
        for r in qs["dedup_clusters"](spark, sf_dir).collect()
    }
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in qs["dedup_clusters"](spark, str(tmp_path)).collect()
    }

    eligible = {
        r["doc_id"]
        for r in base.filter(
            F.col("text").isNotNull() & (F.size(F.split("text", " ")) >= 3)
        ).collect()
    }
    expected = {}
    for d in eligible:
        cluster = base_out.get(d, d)  # edgeless docs seed their own clique
        for i in range(copies):
            expected[d + i * off] = cluster
    assert got == expected
