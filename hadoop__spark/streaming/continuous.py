"""Incrementally-maintained rollup table (hypertable continuous
aggregate, true streaming form).

``run_incremental_rollup`` drains whatever input is new since the last
run (availableNow + checkpoint) and APPENDS per-micro-batch *partial*
aggregates — (window, event_type, partial count, partial sum) — to a
parquet table.  ``read_rollup`` re-aggregates partials on read, so the
materialized table is:

* **incremental** — each run touches only new input files; old data is
  never rescanned;
* **exactly-once across restarts** — the checkpoint dedups input; a
  rerun with no new data appends nothing (tested);
* **mergeable** — counts and decimal sums are commutative monoids, the
  partial-final split is the same one hash aggregation itself uses.
  Read cost stays O(partials); a periodic compaction (rewrite the
  table as its own read_rollup result) restores O(windows) — at 100 TB
  that compaction is itself one cheap aggregation of the partials, not
  a rescan of raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop__spark.streaming.rollup import read_events_stream


def run_incremental_rollup(
    spark: SparkSession,
    events_path: str,
    table_path: str,
    checkpoint_path: str,
) -> None:
    """Drain new input into the partial-aggregate table (one run =
    one availableNow pass; safe to call repeatedly / on a schedule)."""
    events = read_events_stream(spark, events_path)
    partials = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("p_count"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("p_sum"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "p_count",
            "p_sum",
        )
    )
    q = (
        partials.writeStream.format("parquet")
        .option("path", table_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def compact_rollup(spark: SparkSession, table_path: str) -> None:
    """Collapse accumulated partials to one row per (hour, event_type).

    Periodic maintenance: read cost degrades with partial count, and
    compaction is a single aggregation OF THE PARTIALS — raw events
    are never rescanned.  Safe to interleave with drains (the merged
    rows are themselves valid partials)."""
    merged = (
        spark.read.parquet(table_path)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("p_count").cast("bigint").alias("p_count"),
            F.sum("p_sum").alias("p_sum"),
        )
    )
    # two-phase: write aside, then overwrite (parquet has no txn swap)
    tmp = table_path.rstrip("/") + "__compacting"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(table_path)


def read_rollup(spark: SparkSession, table_path: str) -> DataFrame:
    """Final rollup view over the partial table: merge partials per
    (hour, event_type)."""
    return (
        spark.read.parquet(table_path)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("p_count").cast("bigint").alias("n_events"),
            F.sum("p_sum").cast("double").alias("sum_value"),
        )
    )
