"""Quality-filter and sketch/recursive operators: hand-computed semantics."""

from __future__ import annotations

from pyspark.sql import Row

from flink_kakfa_spark.registry import all_queries


def _docs(spark, texts):
    return spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="src0", n_chars=len(t))
            for i, t in enumerate(texts)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_gopher_rules_on_handmade_docs(spark, tmp_path, monkeypatch):
    """Each rule trips on the doc engineered to violate exactly it."""
    import flink_kakfa_spark.operators.quality as q

    good = "the table " + " ".join(f"word{i}" for i in range(30))  # 32 words
    short = "the a key"  # violates word-count bound
    no_stop = " ".join(f"w{i}" for i in range(30))  # 0 stopwords
    repeated = "the a " + " ".join(["key"] * 40)  # uniq_frac = 3/42 < 0.2
    d = _docs(spark, [good, short, no_stop, repeated])
    d.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in all_queries()["quality_gopher_filter"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False and out[1]["r_wordcount"] is False
    assert out[2]["keep"] is False and out[2]["r_stopwords"] is False
    assert out[3]["keep"] is False and out[3]["r_unique"] is False
    # metrics are what a human computes
    assert out[1]["n_words"] == 3 and out[1]["n_stop"] == 3  # the, a, key
    assert abs(out[3]["uniq_frac"] - round(3 / 42, 4)) < 1e-12


def test_containment_identifies_boilerplate(spark, tmp_path):
    """A doc fully contained in another scores 1.0; a unique doc 0.0."""
    a = "one two three four five six"
    b = a + " seven eight nine"  # shares all of a's shingles
    c = "totally different words here now ok"
    d = _docs(spark, [a, b, c])
    d.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in all_queries()["quality_containment_score"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[0]["containment"] == 1.0  # all of a's shingles are in b
    assert out[2]["containment"] == 0.0  # c shares nothing
    # b: 7 shingles, the 4 from a are shared
    assert out[1]["n_shingles"] == 7 and out[1]["n_shared"] == 4


def test_hll_rollup_merge_equals_direct_estimate(spark, sf_dir):
    """Merged daily sketches land within tolerance of the exact count
    (the within_tol column the oracle asserts TRUE)."""
    rows = all_queries()["agg_hll_mergeable_rollup"](spark, sf_dir).collect()
    assert rows and all(r["within_tol"] for r in rows)
    assert all(r["exact_users"] > 0 for r in rows)


def test_recursive_spine_has_no_gaps(spark, sf_dir):
    """Spine months are consecutive; order counts reconcile with the table."""
    rows = all_queries()["sql_recursive_month_spine"](spark, sf_dir).collect()
    months = sorted(r["mon_str"] for r in rows)
    assert len(months) == len(set(months))
    y0, m0 = map(int, months[0].split("-"))
    y1, m1 = map(int, months[-1].split("-"))
    assert len(months) == (y1 - y0) * 12 + (m1 - m0) + 1  # consecutive
    from flink_kakfa_spark.sources.tables import load_table

    n_orders = load_table(spark, "orders", sf_dir).count()
    assert sum(r["n_orders"] for r in rows) == n_orders
