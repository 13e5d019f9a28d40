"""Structured Streaming operators (beyond-reference roadmap).

The reference predates streaming entirely (SURVEY.md §2.8 negative);
this package is the engine's forward surface: watermarked windowed
rollups and custom stateful operators over the ``events`` stream
shape, written so the same code runs on a file stream locally and a
Kafka/queue source on a cluster (swap ``readStream`` options only).
"""

from hadoop__spark.streaming.rollup import (
    dedup_events_stream,
    hourly_rollup,
    parse_kafka_events,
    read_events_stream,
    run_stream_to_memory,
    sessionize,
    sliding_rollup,
)
from hadoop__spark.streaming.ingest_loop import ingest_foreach_batch
from hadoop__spark.streaming.joins import attribute_conversions
from hadoop__spark.streaming.continuous import (
    read_rollup,
    run_incremental_rollup,
)
from hadoop__spark.streaming.stateful import running_totals

__all__ = [
    "attribute_conversions",
    "dedup_events_stream",
    "hourly_rollup",
    "ingest_foreach_batch",
    "parse_kafka_events",
    "read_events_stream",
    "read_rollup",
    "run_incremental_rollup",
    "run_stream_to_memory",
    "running_totals",
    "sessionize",
    "sliding_rollup",
]
