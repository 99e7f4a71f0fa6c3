"""Algorithmic contracts for the round-5 operators: perceptual image
hashing, audio VAD features, winnowing fingerprints, bigram LM
scoring, product quantization, and SemDeDup — micro-fixtures with
KNOWN structure (the oracle differential proves engine parity; these
prove the algorithms do what their papers say).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F  # noqa: F401

from flink_kakfa_spark.registry import all_queries


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def _write_embeddings(spark, tmp_path, vecs):
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in v], label=0)
        for i, v in enumerate(vecs)
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    return str(tmp_path)


# ---------------------------------------------------------------- media


def test_ahash_known_bit_pattern_and_dup_groups(spark, tmp_path):
    """doc 0's red crop is r(x,y)=y: exactly rows 4..7 exceed the mean,
    so the hash is hi=0xFFFFFFFF/lo=0 — and doc 256 (same doc_id%256
    class) must land in the same group."""
    sf = _write_docs(
        spark, tmp_path, [Row(doc_id=i) for i in [0, 1, 3, 256, 257]]
    )
    out = all_queries()["mm_image_ahash_groups"](spark, sf).collect()
    groups = {r["min_doc_id"]: r for r in out}
    assert set(groups) == {0, 1}          # (0,256) and (1,257); 3 alone
    g0 = groups[0]
    assert g0["n_images"] == 2
    assert g0["hash_hi"] == 0xFFFFFFFF and g0["hash_lo"] == 0


def test_vad_features_match_closed_form(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [Row(doc_id=3)])
    row = all_queries()["mm_audio_vad_features"](spark, sf).collect()[0]
    n = 800 + 3 % 5 * 100
    s = [(3 * 31 + i * 17) % 2048 - 1024 for i in range(n)]
    zc = sum((s[i] >= 0) != (s[i - 1] >= 0) for i in range(1, n))
    assert row["n_frames"] == n
    assert row["zero_crossings"] == zc
    assert row["peak"] == max(abs(x) for x in s)
    assert row["n_active"] == sum(abs(x) > 512 for x in s)


# ------------------------------------------------------------ winnowing


def test_winnow_guarantees_shared_run_detection(spark, tmp_path):
    """Coverage theorem: a shared token run of length >= w+k-1 (= 6)
    must produce at least one shared fingerprint; disjoint-vocab docs
    share none."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6-token shared run
    a = "one two three four five " + shared + " six seven eight nine ten"
    b = "uno dos tres cuatro cinco " + shared + " seis siete ocho nueve"
    c = "red orange yellow green blue indigo violet amber cyan magenta"
    sf = _write_docs(
        spark,
        tmp_path,
        [Row(doc_id=0, text=a), Row(doc_id=1, text=b), Row(doc_id=2, text=c)],
    )
    out = all_queries()["text_winnow_fingerprints"](spark, sf).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in out}
    assert pairs.get((0, 1), 0) >= 1
    assert (0, 2) not in pairs and (1, 2) not in pairs


# ------------------------------------------------------------- bigram LM


def test_bigram_xent_lower_for_predictable_text(spark, tmp_path):
    """A document of one repeated bigram pattern is maximally
    predictable under the corpus bigram LM; a same-length document of
    all-unique transitions scores strictly higher cross-entropy."""
    predictable = " ".join(["ping pong"] * 12)
    unique_words = " ".join(f"w{i}" for i in range(24))
    sf = _write_docs(
        spark,
        tmp_path,
        [
            Row(doc_id=0, text=predictable),
            Row(doc_id=1, text=unique_words),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in all_queries()["text_bigram_perplexity"](spark, sf).collect()
    }
    assert out[0]["n_bigrams"] == 23 and out[1]["n_bigrams"] == 23
    assert out[0]["bigram_xent"] < out[1]["bigram_xent"]
    # all-unique transitions: every bigram occurs once, p = .75*1/1 + eps
    assert out[1]["bigram_xent"] > 0


# ------------------------------------------------------------------- PQ


def test_pq_equals_brute_force_when_shortlist_covers_corpus(spark, tmp_path):
    """With n <= shortlist the PQ candidate set is the whole corpus, so
    the rescored top-10 must equal exact brute-force cosine top-10."""
    import random

    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(40)]
    # plant one near-duplicate of the query (vec 0) outside the codebook
    vecs[30] = [x + 0.01 for x in vecs[0]]
    sf = _write_embeddings(spark, tmp_path, vecs)
    out = all_queries()["sim_pq_adc_topk"](spark, sf).collect()

    def cos(a, b):
        # mirror the engine: float32 storage, double math
        import struct

        a = [struct.unpack("f", struct.pack("f", x))[0] for x in a]
        b = [struct.unpack("f", struct.pack("f", x))[0] for x in b]
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    brute = sorted(
        ((cos(v, vecs[0]), -i) for i, v in enumerate(vecs) if i != 0),
        reverse=True,
    )[:10]
    assert [r["vec_id"] for r in out] == [-i for _, i in brute]
    assert out[0]["vec_id"] == 30  # the planted near-dup wins


# ------------------------------------------------------------- SemDeDup


def test_semdedup_drops_planted_semantic_duplicate(spark, tmp_path):
    import random

    rng = random.Random(11)
    vecs = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(30)]
    # vec 20 duplicates vec 9 (both land in the cell anchored nearest
    # vec 9; cosine ~ 1 >= tau) — SemDeDup must count a drop somewhere
    vecs[20] = [x + 0.001 for x in vecs[9]]
    sf = _write_embeddings(spark, tmp_path, vecs)
    out = all_queries()["dedup_semdedup"](spark, sf).collect()
    assert sum(r["n_dropped"] for r in out) >= 1
    for r in out:
        assert 1 <= r["n_dropped"] + 1 <= r["n_members"] or r["n_dropped"] == 0
        assert -1.0 <= r["avg_cos"] <= 1.0
    # cells partition the corpus: reported members + singleton cells = n
    assert sum(r["n_members"] for r in out) <= 30


def test_semdedup_members_conserved(spark, tmp_path):
    """Every vector lands in exactly one cell; cells with >= 2 members
    all report, so total membership is conserved up to singletons."""
    import random

    rng = random.Random(3)
    vecs = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(50)]
    sf = _write_embeddings(spark, tmp_path, vecs)
    out = all_queries()["dedup_semdedup"](spark, sf).collect()
    n_cells = len(out)
    assert 1 <= n_cells <= 8
    # every vector lands in exactly one cell; only singleton cells are
    # absent from the report, and there are at most 8 cells total
    total = sum(r["n_members"] for r in out)
    assert 50 - (8 - n_cells) <= total <= 50


# --------------------------------------------------- cross-set minhash


def test_decontam_minhash_finds_paraphrased_leak(spark, tmp_path):
    eval_doc = "the quick brown fox jumps over the lazy dog again and again"
    leaked = "the quick brown fox jumps over the lazy dog again and again ok"
    clean = "entirely different vocabulary discussing shuffle partitions here"
    sf = _write_docs(
        spark,
        tmp_path,
        [
            Row(doc_id=0, text=eval_doc),    # doc_id % 101 == 0 -> eval
            Row(doc_id=5, text=leaked),      # near-copy in training set
            Row(doc_id=7, text=clean),
        ],
    )
    out = all_queries()["decontam_minhash"](spark, sf).collect()
    pairs = {(r["train_doc"], r["eval_doc"]): r["jaccard"] for r in out}
    assert pairs.get((5, 0), 0) > 0.5
    assert (7, 0) not in pairs


# ----------------------------------------------------- eval metrics


def test_langid_metrics_confusion_counts(spark, tmp_path):
    en_hit = "the cat sat on the mat and the dog is in it"     # stopword-rich
    miss = "cats dogs birds fish reptiles mammals insects"     # no stopwords
    sf = _write_docs(
        spark,
        tmp_path,
        [
            Row(doc_id=0, text=en_hit, lang="en"),   # tp
            Row(doc_id=1, text=en_hit, lang="fr"),   # fp
            Row(doc_id=2, text=miss, lang="en"),     # fn
            Row(doc_id=3, text=miss, lang="de"),     # tn
        ],
    )
    row = all_queries()["eval_langid_metrics"](spark, sf).collect()[0]
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (1, 1, 1, 1)
    assert row["precision_en"] == 0.5 == row["recall_en"] == row["f1_en"]


# ---------------------------------------------- interval range frames


def test_rolling_1h_inclusive_boundary(spark, tmp_path):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        Row(event_id=0, ts=t0, user_id=1, event_type="x", value=1.0,
            props="{}"),
        Row(event_id=1, ts=t0 + timedelta(minutes=30), user_id=1,
            event_type="x", value=2.0, props="{}"),
        # exactly 1h after event 0: the inclusive RANGE bound keeps it
        Row(event_id=2, ts=t0 + timedelta(hours=1), user_id=1,
            event_type="x", value=4.0, props="{}"),
        # 1h + 1us after event 1: event 0 has fallen out
        Row(event_id=3, ts=t0 + timedelta(hours=1, minutes=30,
                                          microseconds=1), user_id=1,
            event_type="x", value=8.0, props="{}"),
        Row(event_id=4, ts=t0, user_id=2, event_type="y", value=16.0,
            props="{}"),  # other partition: untouched
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    out = {
        r["event_id"]: r["rolling_1h"]
        for r in all_queries()["ts_rolling_1h_value"](spark, str(tmp_path)).collect()
    }
    assert out[0] == 1.0
    assert out[1] == 3.0
    assert out[2] == 7.0      # includes event 0 at exactly -1h
    # event 1 is 1h + 1us before event 3 — just past the bound, so the
    # frame is {event 2, event 3} = 4 + 8
    assert out[3] == 12.0
    assert out[4] == 16.0


def test_rolling_1h_far_epoch_boundary(spark, tmp_path):
    """Bucket assignment at epochs past 2^53 us (~year 2255), where the
    pre-r11 floor(tu / DOUBLE hour) form drifts off the true hour grid
    because the long->double cast of tu loses microseconds. The
    integer pmod/div form is exact at any epoch; this pins the
    boundary-adjacent frames there so a refactor back to float
    bucketing (or any non-floor division) fails loudly."""
    from datetime import datetime, timedelta

    hour_us = 3_600_000_000
    # 2255-06-06 00:00 UTC is hour-aligned and past 2^53 microseconds
    t0 = datetime(2255, 6, 6, 0, 0, 0)
    rows = [
        Row(event_id=0, ts=t0 - timedelta(minutes=30), user_id=1,
            event_type="x", value=1.0, props="{}"),
        # last microsecond of the bucket before t0 — the first epoch
        # where the double form mis-buckets (upward) vs the true grid
        Row(event_id=1, ts=t0 - timedelta(microseconds=1), user_id=1,
            event_type="x", value=2.0, props="{}"),
        Row(event_id=2, ts=t0, user_id=1, event_type="x", value=4.0,
            props="{}"),
        Row(event_id=3, ts=t0 + timedelta(minutes=30), user_id=1,
            event_type="x", value=8.0, props="{}"),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    # sanity: the fixture really sits past the double-exact horizon
    epoch_us = int((t0 - datetime(1970, 1, 1)).total_seconds()) * 1_000_000
    assert epoch_us > 2**53 and epoch_us % hour_us == 0
    out = {
        r["event_id"]: r["rolling_1h"]
        for r in all_queries()["ts_rolling_1h_value"](spark, str(tmp_path)).collect()
    }
    assert out[0] == 1.0
    assert out[1] == 3.0   # {e0, e1}
    assert out[2] == 7.0   # {e0, e1, e2}: e0 at exactly -1h-... inside
    # e3's frame [t0-30min, t0+30min] keeps e0 (inclusive bound), e1, e2
    assert out[3] == 15.0


# ------------------------------------------------------- media resize


def test_resize_thumbnail_known_values(spark, tmp_path):
    """doc 0, w=8: r(x,y) = y, boxes are exact 2x2 blocks, so box
    (bx, by) averages rows {2*by, 2*by+1} -> value 2*by (integer mean
    of y and y+1 floors to the even row)."""
    sf = _write_docs(spark, tmp_path, [Row(doc_id=0)])
    row = all_queries()["mm_image_resize_thumb"](spark, sf).collect()[0]
    assert (row["t00"], row["t30"]) == (0, 0)
    assert (row["t03"], row["t33"]) == (6, 6)
    # 4 columns x values (0, 2, 4, 6) per box-row
    assert row["thumb_sum"] == 4 * (0 + 2 + 4 + 6)
