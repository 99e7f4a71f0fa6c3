"""Consumer-lag / offset observability (SURVEY.md §2.1 S3 companion).

The reference's consumer joins a consumer GROUP and Kafka tracks its
committed offsets, so ``kafka-consumer-groups.sh --describe`` reports
per-partition lag (``go/consumer/consumer.go:92-106`` — GroupID
config). Structured Streaming replaces group coordination with
checkpointed offsets, so the equivalent observability comes from
``StreamingQuery.lastProgress``: each micro-batch reports the source's
``startOffset``/``endOffset``/``latestOffset`` per topic-partition,
and lag = latest - end.

These helpers normalize that JSON into flat rows — engine-agnostic
(the Kafka source reports ``{topic: {partition: offset}}`` maps; file
and rate sources report scalar offsets, which map to a single
pseudo-partition). Pure driver-side metadata: a few KB per query
regardless of data scale.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

PROGRESS_SCHEMA = (
    "query_id string, batch_id long, source string, topic string, "
    "partition int, start_offset long, end_offset long, latest_offset long, "
    "lag long, input_rows long, rows_per_sec double"
)


def _offset_map(raw: Any) -> dict[tuple[str, int], int]:
    """Normalize a source offset blob to {(topic, partition): offset}.

    Kafka sources report ``{"topic": {"0": 123, ...}}``; file/rate/
    memory sources report a scalar or an object without topics, which
    collapses to the pseudo-partition ("", 0).
    """
    import json

    if raw is None:
        return {}
    if isinstance(raw, str):
        try:
            raw = json.loads(raw)
        except (ValueError, TypeError):
            return {("", 0): 0}
    if isinstance(raw, int):
        return {("", 0): raw}
    if isinstance(raw, dict):
        out: dict[tuple[str, int], int] = {}
        for topic, parts in raw.items():
            if isinstance(parts, dict):
                for p, off in parts.items():
                    if isinstance(off, int):
                        out[(topic, int(p))] = off
            elif isinstance(parts, int):
                # e.g. file-source {"logOffset": N}
                out[("", 0)] = parts
        return out
    return {("", 0): 0}


def progress_rows(progress: dict | None) -> list[dict]:
    """Flatten one ``lastProgress`` dict into per-partition lag rows."""
    if not progress:
        return []
    rows = []
    for src in progress.get("sources", []):
        start = _offset_map(src.get("startOffset"))
        end = _offset_map(src.get("endOffset"))
        latest = _offset_map(src.get("latestOffset"))
        for key in sorted(set(end) | set(latest) | set(start)):
            e = end.get(key)
            lt = latest.get(key)
            rows.append(
                {
                    "query_id": progress.get("id", ""),
                    "batch_id": progress.get("batchId", -1),
                    "source": src.get("description", ""),
                    "topic": key[0],
                    "partition": key[1],
                    "start_offset": start.get(key),
                    "end_offset": e,
                    "latest_offset": lt,
                    "lag": (lt - e) if (lt is not None and e is not None) else None,
                    "input_rows": src.get("numInputRows", 0),
                    "rows_per_sec": float(src.get("processedRowsPerSecond", 0.0)),
                }
            )
    return rows


def consumer_lag(spark: SparkSession, query: StreamingQuery) -> DataFrame:
    """Per-topic-partition offset/lag for a running query's last batch —
    the ``kafka-consumer-groups.sh --describe`` twin for checkpointed
    offsets. Driver-side metadata only; O(partitions) rows."""
    return spark.createDataFrame(
        progress_rows(query.lastProgress), PROGRESS_SCHEMA
    )


def lag_history(spark: SparkSession, query: StreamingQuery) -> DataFrame:
    """Same, over the query's retained ``recentProgress`` batches —
    enough to chart catch-up/fall-behind trends."""
    rows = [r for p in query.recentProgress for r in progress_rows(p)]
    return spark.createDataFrame(rows, PROGRESS_SCHEMA)
