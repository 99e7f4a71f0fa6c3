"""Synthetic sentence source (SURVEY.md §2.1 S1, Tier A).

Behavioral twin of the reference's producer loop: one random sentence
of 1–5 words from a 16-word list per tick, keyed ``"key-" +
unix-seconds`` (``go/producer/producer.go:79-97,118-138``). Expressed
as Spark's ``rate`` streaming source plus deterministic hash-derived
"randomness", so the stream is reproducible (an improvement over the
reference's wall-clock seed, ``go/producer/producer.go:48``) and the
whole generator stays JVM-side.

The batch twin (``spark.range`` + identical expressions) exists so
tests can assert generator properties without a streaming trigger, and
is the oracle for the streaming form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kakfa_spark.config import DEFAULT_WORD_LIST, ProducerConfig

MIN_WORDS = 1
MAX_WORDS = 5  # 1-5 words, go/producer/producer.go:129


def _sentence_expr(seed_col: Column, word_list: list[str]) -> Column:
    """Deterministic 1–5-word sentence derived from a seed column."""
    words = F.array(*[F.lit(w) for w in word_list])
    n = len(word_list)
    n_words = F.pmod(F.xxhash64(seed_col), F.lit(MAX_WORDS - MIN_WORDS + 1)) + MIN_WORDS
    picks = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(words, (F.pmod(F.xxhash64(seed_col, i), F.lit(n)) + 1).cast("int")),
    )
    return F.array_join(picks, " ")


def _with_message_shape(df: DataFrame, seed: Column, ts: Column, word_list: list[str]) -> DataFrame:
    """Produce the reference's message schema: key/value/ts."""
    return df.select(
        F.concat(F.lit("key-"), F.unix_timestamp(ts).cast("string")).alias("key"),
        _sentence_expr(seed, word_list).alias("value"),
        ts.alias("ts"),
    )


def sentence_stream(
    spark: SparkSession,
    cfg: ProducerConfig | None = None,
    rows_per_second: float | None = None,
) -> DataFrame:
    """Unbounded generator: streaming DataFrame of (key, value, ts).

    ``rows_per_second`` defaults to the config interval (reference
    default: one message per 2 s → 0.5 rows/s).
    """
    cfg = cfg or ProducerConfig()
    rps = rows_per_second or (1.0 / cfg.interval_seconds)
    if rps >= 1.0:
        raw = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", int(round(rps)))
            .load()
        )
    else:
        # The rate source only takes integer rows/sec; honor fractional
        # rates (reference default: 1 msg per 2 s = 0.5 rps) by running
        # at 1 rps and keeping every Nth row — exact average rate, even
        # spacing, instead of silently flooring 0.5 up to 1.
        stride = max(int(round(1.0 / rps)), 1)
        raw = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .load()
            .filter(F.col("value") % stride == 0)
        )
    return _with_message_shape(
        raw, F.col("value"), F.col("timestamp"), cfg.word_list or DEFAULT_WORD_LIST
    )


def sentence_batch(
    spark: SparkSession,
    n: int,
    cfg: ProducerConfig | None = None,
    start_ts: str = "2024-01-01 00:00:00",
) -> DataFrame:
    """Bounded twin: n generated messages with synthetic timestamps.

    Timestamps advance by the configured interval per message, mirroring
    the producer's ticker cadence.
    """
    cfg = cfg or ProducerConfig()
    raw = spark.range(n)
    ts = F.to_timestamp(F.lit(start_ts)) + F.make_interval(
        secs=F.col("id") * F.lit(float(cfg.interval_seconds))
    )
    return _with_message_shape(raw, F.col("id"), ts, cfg.word_list or DEFAULT_WORD_LIST)
