"""Driver probes for the streaming plane.

st01 replays the events fixture through Structured Streaming (file
source → watermarked tumbling window → memory sink, availableNow) and
returns the drained result — oracle-checked against DuckDB computing
the same hourly rollup in batch SQL.  One probe, three engines in
agreement: Spark streaming, Spark batch (h04), DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop__spark.queries import Probe


def _hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from hadoop__spark.streaming.rollup import (
        read_events_stream,
        run_stream_to_memory,
    )

    events = read_events_stream(
        spark, os.path.join(sf_dir, "events.parquet")
    )
    rollup = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    # complete mode: a finite replay never advances the watermark past
    # the tail, so append would withhold the trailing windows.
    # Scope the drain to a sane shuffle-partition count: a vanilla
    # (driver) session defaults to 200, and the per-micro-batch state
    # shuffle at 200 near-empty partitions is pure task overhead at
    # probe scale — partition count does not affect the aggregated
    # result, and the caller's setting is restored afterwards.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    try:
        run_stream_to_memory(rollup, "st01_hourly", output_mode="complete")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table("st01_hourly")


STREAMING_PROBES: list[Probe] = [
    Probe(
        name="st01_hourly_stream",
        fn=_hourly_stream,
        oracle=(
            "SELECT date_trunc('hour', ts) AS hour, event_type, "
            "COUNT(*) AS n_events, "
            "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value "
            "FROM events GROUP BY date_trunc('hour', ts), event_type"
        ),
    ),
]
