from flink_kakfa_spark.streaming.generator import sentence_batch, sentence_stream  # noqa: F401
from flink_kakfa_spark.streaming.wordcount import (  # noqa: F401
    session_word_counts,
    sliding_word_counts,
    streaming_word_counts,
    windowed_word_counts,
)
