"""Flagship word-count tests, mirroring the reference's test strategy
(SURVEY.md §5): the three canonical sentences from
go/producer/producer_test.go:36-40 / go/integration/integration_test.go:40-44,
plus empty/edge inputs in the reference's bounds-testing style.
"""

from __future__ import annotations

from pyspark.sql import Row

from flink_kakfa_spark.operators.wordcount import word_counts

# The reference's canonical integration-test sentences.
CANONICAL = ["hello world", "flink kafka streaming", "data processing pipeline"]


def test_canonical_sentences_each_word_once(spark):
    df = spark.createDataFrame([Row(text=s) for s in CANONICAL])
    result = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    expected = {w: 1 for s in CANONICAL for w in s.split(" ")}
    assert result == expected
    assert len(result) == 8


def test_duplicate_words_counted(spark):
    df = spark.createDataFrame([Row(text="a b a"), Row(text="b a")])
    result = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    assert result == {"a": 3, "b": 2}


def test_empty_and_blank_documents(spark):
    df = spark.createDataFrame([Row(text=""), Row(text=" "), Row(text="x")])
    result = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    assert result == {"x": 1}


def test_empty_input(spark):
    df = spark.createDataFrame([], "text string")
    assert word_counts(df).count() == 0


def test_hyphenated_words_kept_whole(spark):
    # the reference's word list contains "real-time" and "fault-tolerant";
    # the tokenizer splits on single space only (go/producer/producer.go:137)
    df = spark.createDataFrame([Row(text="real-time fault-tolerant real-time")])
    result = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    assert result == {"real-time": 2, "fault-tolerant": 1}


def test_flagship_on_fixture_partial_agg_plan(spark, sf_dir):
    """The physical plan must show two-phase (partial+final) hash agg."""
    from flink_kakfa_spark.registry import all_queries

    df = all_queries()["wordcount"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    rows = df.collect()
    assert len(rows) > 0
    assert rows[0]["cnt"] >= rows[-1]["cnt"]  # ordered desc
