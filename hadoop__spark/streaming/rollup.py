"""Watermarked event rollups and sessionization.

Scale notes:

* Watermarks bound state: without ``withWatermark`` a windowed agg
  keeps every window forever — at 100 TB/day that is an OOM, not a
  feature.  The watermark delay is the contract for how late data may
  arrive and still count.
* ``session_window`` is Spark's native gap-based session operator —
  state is per (user, open session) and closes at
  ``watermark - gap``, so memory is proportional to *active* users
  only.
* The rollup output mode is ``append`` (emit once, when the window
  closes past the watermark) so the sink sees each window exactly
  once — the right contract for an idempotent downstream table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Schema of the events fixture (TESTDATA.md); ts arrives as
#: TIMESTAMP(NANOS) parquet which streaming reads need pre-declared.
EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """File-based event stream (drop-in stand-in for a queue source —
    on a cluster this becomes ``format('kafka')`` plus a JSON parse;
    everything downstream is identical)."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = (
        spark.readStream.format("parquet")
        .schema(
            "event_id BIGINT, ts BIGINT, user_id BIGINT, "
            "event_type STRING, value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
    )
    if os.path.isfile(path):
        # the file source accepts directories or globs, not plain files:
        # turn the filename into a glob matching exactly that file
        d, name = os.path.split(path)
        path = os.path.join(d, f"[{name[0]}]{name[1:]}")
        reader = reader.option("basePath", d)
    raw = reader.load(path)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def hourly_rollup(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + value sum.

    Streaming twin of the batch probe ``h04_events_hourly`` — the
    correctness test replays the fixture through the stream and
    compares against the batch groupBy."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_rollup(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts (each event lands in
    window/slide overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based user sessions via native ``session_window`` —
    the custom stateful operator of the roadmap, expressed without
    hand-rolled state (state size ∝ active sessions)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def run_stream_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drain a stream through availableNow into a memory sink (test /
    backfill harness: processes all available input, then stops)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
