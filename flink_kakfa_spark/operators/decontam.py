"""Corpus-hygiene operators for LLM training pipelines: benchmark
decontamination and intra-document repetition scoring.

These extend the reference's data-processing surface the way a
training-data pipeline needs (driver mandate "text analysis" /
"deduplication" family); the reference itself has no analogue — its
corpus handling stops at produce/consume of sentences
(go/producer/producer.go:119-131).

Scale notes (100 TB):
- Decontamination joins the corpus's shingle inverted index against
  the eval set's shingles. The eval side is tiny by construction
  (benchmarks are KBs-to-MBs, corpora are TBs), so it broadcasts —
  the corpus is touched exactly once, one shuffle for the per-doc
  aggregate, and no shuffle carries document text (only 4-gram
  strings).
- Repetition scoring is a pure narrow map: every statistic (total /
  distinct / max-repeat of bigrams) is computed per row with
  higher-order functions on the token array. Zero shuffles, zero
  Python — it scales linearly with input splits and survives any
  corpus size that scans do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kakfa_spark.registry import query
from flink_kakfa_spark.sources.tables import load_table, parallelize

EVAL_MOD = 101  # doc_id % EVAL_MOD == 0 -> held-out "benchmark" split
DECONTAM_K = 4  # words per decontamination shingle


def _shingles4(df: DataFrame) -> DataFrame:
    """doc_id + exploded DISTINCT 4-word shingles (docs with >=4 tokens).

    Longer shingles than the 3-gram dedup index: decontamination wants
    high-precision matches (a shared longer n-gram is strong evidence
    the benchmark text leaked), not fuzzy similarity. Real pipelines
    use 8-13; 4 is the precision knee for this fixture's 16-word
    vocabulary.
    """
    t = F.split(F.col("text"), " ")
    sh = F.transform(
        F.sequence(F.lit(1), F.size(t) - (DECONTAM_K - 1)),
        lambda i: F.concat_ws(
            " ",
            F.element_at(t, i),
            F.element_at(t, i + 1),
            F.element_at(t, i + 2),
            F.element_at(t, i + 3),
        ),
    )
    return df.filter(F.size(t) >= DECONTAM_K).select(
        "doc_id", F.explode(F.array_distinct(sh)).alias("shingle")
    )


@query(
    "decontam_eval_overlap",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
        ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]
          AS shingle
      FROM tok, UNNEST(generate_series(1, len(ts) - 3)) AS g(i)
      WHERE len(ts) >= 4
    ),
    ev AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0
    ),
    tr AS (SELECT * FROM sh WHERE doc_id % {EVAL_MOD} <> 0)
    SELECT
      tr.doc_id,
      COUNT(*) AS n_shingles,
      CAST(SUM(CASE WHEN ev.shingle IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_shared,
      CAST(SUM(CASE WHEN ev.shingle IS NOT NULL THEN 1 ELSE 0 END)
           AS DOUBLE) / COUNT(*) AS contamination_ratio
    FROM tr LEFT JOIN ev ON tr.shingle = ev.shingle
    GROUP BY tr.doc_id
    ORDER BY n_shared DESC, doc_id ASC
    LIMIT 50
    """,
)
def q_decontam_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: the 50 training docs sharing the most
    distinct 4-gram shingles with the held-out eval split
    (``doc_id % 101 == 0`` stands in for a benchmark suite).

    Plan shape: eval shingles are DISTINCT'd then BROADCAST — the
    training-side inverted index streams past them map-side; the only
    shuffle is the per-doc count aggregate.
    """
    d = parallelize(load_table(spark, "documents", sf_dir), spark)
    is_eval = (F.col("doc_id") % EVAL_MOD) == 0
    ev = (
        _shingles4(d.filter(is_eval))
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    tr = _shingles4(d.filter(~is_eval))
    return (
        tr.join(F.broadcast(ev), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("long")
            .alias("n_shared"),
            (
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("double")
                / F.count(F.lit(1))
            ).alias("contamination_ratio"),
        )
        .orderBy(F.col("n_shared").desc(), F.col("doc_id").asc())
        .limit(50)
    )


def _max_run(sorted_arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a sorted
    array — i.e. the max occurrence count of any element — computed
    with F.aggregate entirely JVM-side (no explode, no shuffle)."""
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, zero, step, lambda acc: acc["best"])


@query(
    "text_repetition_ngrams",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    bg AS (
      SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bigram
      FROM tok, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
      WHERE len(ts) >= 2
    ),
    cnt AS (
      SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2
    )
    SELECT
      doc_id,
      CAST(SUM(c) AS BIGINT) AS n_bigrams,
      COUNT(*) AS n_distinct,
      CAST(1 AS DOUBLE)
        - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
        AS dup_fraction,
      CAST(MAX(c) AS BIGINT) AS max_repeat
    FROM cnt
    GROUP BY doc_id
    """,
)
def q_text_repetition_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signals: per document, the total
    and distinct bigram counts, the duplicated-bigram fraction, and the
    highest single-bigram repeat count.

    Every statistic comes from higher-order functions over the token
    array of the row itself — the whole query is a narrow map over the
    scan: no wide (hash) exchange anywhere, verify with .explain().
    The only exchange is parallelize()'s round-robin split of the
    single-row-group fixture file, a no-op at lake scale where inputs
    arrive in many splits. The oracle computes the same numbers the
    relational way (explode + two aggregates).
    """
    d = parallelize(load_table(spark, "documents", sf_dir), spark)
    t = F.split(F.col("text"), " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
    )
    n_total = F.size(bigrams)
    n_distinct = F.size(F.array_distinct(bigrams))
    return d.filter(F.size(t) >= 2).select(
        "doc_id",
        n_total.cast("long").alias("n_bigrams"),
        n_distinct.cast("long").alias("n_distinct"),
        (
            F.lit(1.0) - n_distinct.cast("double") / n_total.cast("double")
        ).alias("dup_fraction"),
        _max_run(F.array_sort(bigrams)).cast("long").alias("max_repeat"),
    )
