"""Arbitrary stateful streaming operator (SURVEY.md §2.8 T7).

The reference's generator word list names "state" and "checkpoint"
(``go/producer/producer.go:22``) — the features its missing job would
have exercised. This module is the custom-state path Structured
Streaming offers beyond built-in windowed aggs:
``applyInPandasWithState`` with an explicit per-key state schema.

Scale notes: state lives in the executor state store keyed by group,
checkpointed per batch; each micro-batch shuffles only that batch's
rows on the group key. The pandas function receives Arrow batches per
key — no per-row Python overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def running_word_totals(messages: DataFrame) -> DataFrame:
    """Cumulative all-time count per word, emitted on every change.

    This is the 'word count with durable state' the reference pipeline
    implies: totals survive across micro-batches (and restarts, via the
    checkpoint) rather than resetting per window.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    words = (
        messages.select(F.explode(F.split(F.col("value"), " ")).alias("word"))
        .filter(F.col("word") != "")
    )

    # closure (not module-level) so cloudpickle ships it by value and
    # workers never need this package importable — see multimodal.py
    def update_totals(key, pdfs, state):
        import pandas as pd

        batch_count = sum(len(pdf) for pdf in pdfs)
        total = (state.get[0] if state.exists else 0) + batch_count
        state.update((total,))
        yield pd.DataFrame({"word": [key[0]], "total": [total]})

    return words.groupBy("word").applyInPandasWithState(
        update_totals,
        outputStructType="word string, total long",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """transformWithStateInPandas needs protobuf for its state-server
    protocol; absent in this environment (no installs allowed)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_word_totals_tws(messages: DataFrame) -> DataFrame:
    """Same cumulative per-word totals on the transformWithStateInPandas
    API (the successor to applyInPandasWithState): explicit named state
    variables on a StatefulProcessor handle instead of a single state
    tuple. State is a ValueState<total> per word; output and recovery
    semantics are identical to ``running_word_totals``, which the test
    asserts by running both.

    Requires the ``protobuf`` package at runtime (Spark's
    TransformWithStateInPySpark driver worker speaks protobuf to the
    state server); raises an actionable error when it is missing.
    """
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(google.protobuf) for Spark's state-server protocol; it is "
            "not installed in this environment. Use "
            "running_word_totals (applyInPandasWithState) instead."
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    words = (
        messages.select(F.explode(F.split(F.col("value"), " ")).alias("word"))
        .filter(F.col("word") != "")
    )

    # defined in-closure so cloudpickle serializes the class by value
    # and workers never need this package importable
    class TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState(
                "total", StructType([StructField("total", LongType(), True)])
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            batch_count = sum(len(pdf) for pdf in rows)
            prev = self._total.get()[0] if self._total.exists() else 0
            total = prev + batch_count
            self._total.update((total,))
            yield pd.DataFrame({"word": [key[0]], "total": [total]})

        def close(self) -> None:
            pass

    return words.groupBy("word").transformWithStateInPandas(
        statefulProcessor=TotalsProcessor(),
        outputStructType="word string, total long",
        outputMode="Update",
        timeMode="None",
    )
