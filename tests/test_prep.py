"""Chunking, surprisal, and quantile-sketch operators: hand-checked semantics."""

from __future__ import annotations

import math

from pyspark.sql import Row

from flink_kakfa_spark.registry import all_queries


def _docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="src0", n_chars=len(t))
            for i, t in enumerate(texts)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))


def test_chunking_windows_and_overlap(spark, tmp_path):
    """40 words at chunk=32/stride=24 → two chunks: [1..32] and [25..40]."""
    words = [f"w{i}" for i in range(1, 41)]
    _docs(spark, tmp_path, [" ".join(words), "a b c"])
    out = all_queries()["pipeline_chunk_documents"](spark, str(tmp_path))
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    assert len([k for k in rows if k[0] == 0]) == 2
    assert rows[(0, 0)]["n_tokens"] == 32
    assert rows[(0, 0)]["chunk_text"].split(" ")[0] == "w1"
    assert rows[(0, 1)]["n_tokens"] == 16  # words 25..40
    assert rows[(0, 1)]["chunk_text"].split(" ")[0] == "w25"
    # 8-word overlap: last 8 of chunk0 == first 8 of chunk1
    assert (
        rows[(0, 0)]["chunk_text"].split(" ")[-8:]
        == rows[(0, 1)]["chunk_text"].split(" ")[:8]
    )
    # short doc -> one whole-doc chunk
    assert rows[(1, 0)]["n_tokens"] == 3 and (1, 1) not in rows


def test_unigram_surprisal_matches_hand_math(spark, tmp_path):
    """Corpus 'x x' + 'x y': p(x)=3/4, p(y)=1/4."""
    _docs(spark, tmp_path, ["x x", "x y"])
    out = {
        r["doc_id"]: r
        for r in all_queries()["text_unigram_surprisal"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[0]["surprisal"] == round(-math.log(0.75), 4)
    assert out[1]["surprisal"] == round(
        (-math.log(0.75) - math.log(0.25)) / 2, 4
    )
    assert out[0]["n_tokens"] == 2


def test_approx_percentile_stays_in_rank_bounds(spark, sf_dir):
    rows = all_queries()["agg_approx_percentile_bounds"](spark, sf_dir).collect()
    assert rows
    assert all(r["p50_in_bounds"] and r["p90_in_bounds"] for r in rows)
    assert all(r["exact_p50"] < r["exact_p90"] for r in rows)


def test_chunking_reconstructs_documents(spark, tmp_path):
    """Property over 60 random-length docs: dropping each chunk's 8-word
    overlap (except the first) and concatenating reconstructs the doc."""
    import random

    rng = random.Random(42)
    texts = [
        " ".join(f"t{i}_{j}" for j in range(rng.randint(1, 130)))
        for i in range(60)
    ]
    _docs(spark, tmp_path, texts)
    out = all_queries()["pipeline_chunk_documents"](spark, str(tmp_path))
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"]))
    for i, text in enumerate(texts):
        chunks = [t for _, t in sorted(by_doc[i])]
        words = chunks[0].split(" ")
        for c in chunks[1:]:
            words.extend(c.split(" ")[8:])
        assert words == text.split(" "), f"doc {i} failed reconstruction"


def test_media_payloads_are_real_files(spark, tmp_path):
    """The WAV/BMP bytes are genuine containers: stdlib `wave` parses
    the audio and the bitmap honors its own header geometry."""
    import io
    import struct
    import wave as wavelib

    _docs(spark, tmp_path, ["a b c", "d e f"])
    from flink_kakfa_spark.operators import media

    rows = all_queries()["mm_wav_roundtrip_features"](
        spark, str(tmp_path)
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[0]["n_frames"] == 800 and by_id[1]["n_frames"] == 900
    assert all(r["sample_rate"] == 8000 for r in rows)

    brows = {r["doc_id"]: r for r in all_queries()["mm_bmp_roundtrip_features"](
        spark, str(tmp_path)
    ).collect()}
    assert brows[0]["width"] == 8 and brows[1]["width"] == 9
    assert all(r["height"] == 8 for r in brows.values())


def test_curriculum_stages_are_monotone_in_difficulty(spark, sf_dir):
    """Stage k's max token count <= stage k+1's min (NTILE over a
    total order), and positions are a permutation within each stage."""
    from flink_kakfa_spark.registry import all_queries

    rows = all_queries()["pipeline_curriculum_order"](spark, sf_dir).collect()
    by_stage: dict[int, list] = {}
    for r in rows:
        by_stage.setdefault(r["stage"], []).append(r)
    stages = sorted(by_stage)
    assert stages == list(range(1, len(stages) + 1))
    for a, b in zip(stages, stages[1:]):
        assert max(r["n_tokens"] for r in by_stage[a]) <= min(
            r["n_tokens"] for r in by_stage[b]
        )
    for s in stages:
        poss = sorted(r["pos"] for r in by_stage[s])
        assert poss == list(range(1, len(poss) + 1))


def test_shuffle_shards_partition_and_positions(spark, sf_dir):
    """Every doc lands in exactly one shard, shard ids are bounded,
    positions are 1..shard_size, and the assignment is md5-stable
    across runs."""
    from flink_kakfa_spark.registry import all_queries

    rows = all_queries()["pipeline_shuffle_shards"](spark, sf_dir).collect()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["shard"] < 16
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        poss = sorted(r["pos"] for r in shard_rows)
        assert poss == list(range(1, len(poss) + 1))
        assert all(r["shard_size"] == len(shard_rows) for r in shard_rows)
    rows2 = all_queries()["pipeline_shuffle_shards"](spark, sf_dir).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in rows2} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in rows
    }


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    """E-S keys: expected length bias — the sampled docs' mean n_chars
    should exceed the corpus mean (weights proportional to length);
    ranks are 1..k and deterministic across repeated runs."""
    from flink_kakfa_spark.registry import all_queries
    from flink_kakfa_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    q = all_queries()["sample_weighted_topk"]
    rows1 = q(spark, sf_dir).collect()
    rows2 = q(spark, sf_dir).collect()
    assert [r["doc_id"] for r in rows1] == [r["doc_id"] for r in rows2]
    assert [r["rk"] for r in rows1] == list(range(1, len(rows1) + 1))
    corpus_mean = (
        load_table(spark, "documents", sf_dir).agg(F.avg("n_chars")).collect()[0][0]
    )
    sample_mean = sum(r["n_chars"] for r in rows1) / len(rows1)
    assert sample_mean > corpus_mean


def test_neyman_allocation_favors_high_variance_stratum(spark, tmp_path):
    """Two equal-size strata, one with 10x the length spread: the
    allocation must give it the larger share, and per-stratum picks
    must not exceed the allocation."""
    from pyspark.sql import Row

    rows = []
    for i in range(50):  # tight stratum: lengths 100±1
        rows.append(Row(doc_id=i, text="x", lang="aa", source="s",
                        n_chars=100 + (i % 3)))
    for i in range(50):  # wide stratum: lengths 100±40
        rows.append(Row(doc_id=100 + i, text="x", lang="bb", source="s",
                        n_chars=60 + (i % 5) * 20))
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "documents.parquet"))
    from flink_kakfa_spark.registry import all_queries

    out = all_queries()["sample_neyman_allocation"](
        spark, str(tmp_path)
    ).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    n_aa = len(by_lang.get("aa", []))
    n_bb = len(by_lang["bb"])
    assert n_bb > n_aa  # variance-proportional
    for lang, picks in by_lang.items():
        assert len(picks) == picks[0]["n_alloc"]
    assert n_aa + n_bb <= 60  # floor allocation never overshoots


def test_winsorize_clips_both_tails(spark, tmp_path):
    """Values 1..100 (plus one spike at 10000) clip at exact p01/p99;
    the winsorized sum equals the hand-computed clipped total."""
    from pyspark.sql import Row

    vals = [float(v) for v in range(1, 101)] + [10000.0]
    rows = [
        Row(event_id=i, ts=None, user_id=1, event_type="view", value=v,
            props="{}")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    from flink_kakfa_spark.registry import all_queries

    [r] = all_queries()["prep_winsorize_values"](
        spark, str(tmp_path)
    ).collect()
    lo, hi = r["p01"], r["p99"]
    assert lo == 2.0  # quantile_cont(0.01) over 101 values
    assert r["n_clipped_low"] == 1 and r["n_clipped_high"] == 1
    expected = sum(min(max(v, lo), hi) for v in vals)
    assert abs(r["winsorized_sum"] - expected) < 1e-6
