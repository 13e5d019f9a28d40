"""Incrementally-maintained rollup table (hypertable continuous
aggregate, true streaming form).

``run_incremental_rollup`` drains whatever input is new since the last
run (availableNow + checkpoint) and APPENDS per-micro-batch *partial*
aggregates — (window, event_type, partial count, partial sum) — to a
parquet table.  ``read_rollup`` re-aggregates partials on read, so the
materialized table is:

* **incremental** — each run touches only new input files; old data is
  never rescanned;
* **exactly-once across restarts** — the checkpoint dedups input, and
  each micro-batch lands in its own ``partials/batch-<id>`` directory
  written idempotently (tmp + rename; a replayed batch id overwrites
  its own directory), so a rerun with no new data appends nothing;
* **mergeable** — counts and decimal sums are commutative monoids, the
  partial-final split is the same one hash aggregation itself uses.
  Read cost stays O(partials); a periodic compaction (fold the partial
  directories into a ``base`` table) restores O(windows) — at 100 TB
  that compaction is itself one cheap aggregation of the partials, not
  a rescan of raw events.

Layout (all under ``table_path``)::

    base/                 # compacted rollup + _folded manifest
    base__old/            # transient during a compaction swap
    partials/batch-<id>/  # one dir per drained micro-batch
    partials/_tmp_...     # in-flight batch staging (hidden)

Why not a plain streaming file sink?  ``writeStream.format("parquet")``
maintains a ``_spark_metadata`` commit log inside the output dir, and
every batch read of that dir resolves through the log
(``MetadataLogFileIndex``).  A compaction that rewrites the directory
with a batch writer deletes the log; the NEXT drain then recreates it
at the checkpoint's next batch id with the earlier entries missing,
and every subsequent read fails with ``IllegalStateException:
_spark_metadata/0 doesn't exist`` (measured on Spark 4.x) — or, where
the log survives partially, silently drops the compacted files.  The
batch-directory layout above keeps the sink log out of the picture
entirely while preserving the checkpoint's input-side exactly-once;
the ``_folded`` manifest inside ``base`` is the commit point that
makes compaction atomic for readers (the same manifest-as-commit-point
protocol the ingest state's snapshot surgery uses,
operators/ingest.py).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop__spark.operators.util import (
    delete_path,
    list_child_dirs,
    read_text_file,
    rename_path,
    table_exists,
    write_text_file,
)
from hadoop__spark.streaming.rollup import read_events_stream

_BATCH_PREFIX = "batch-"
_FOLDED = "_folded"


def _base_dir(spark: SparkSession, table_path: str) -> str | None:
    """The live compacted base, repairing a crashed swap: a compaction
    that died between its two renames leaves ``base__old`` (complete,
    pre-compact) and no ``base`` — restore it, so readers and the next
    compaction see the last committed state."""
    base, old = f"{table_path}/base", f"{table_path}/base__old"
    if table_exists(spark, base):
        return base
    if table_exists(spark, old):
        rename_path(spark, old, base)
        return base
    return None


def _folded_set(spark: SparkSession, base: str | None) -> set[str]:
    if base is None or not table_exists(spark, f"{base}/{_FOLDED}"):
        return set()
    return set(json.loads(read_text_file(spark, f"{base}/{_FOLDED}")))


def _batch_dirs(spark: SparkSession, table_path: str) -> dict[str, str]:
    """Committed (renamed-into-place) partial dirs, name -> path."""
    out = {}
    for d in list_child_dirs(spark, f"{table_path}/partials"):
        name = d.rstrip("/").rsplit("/", 1)[-1]
        if name.startswith(_BATCH_PREFIX):
            out[name] = d
    return out


def run_incremental_rollup(
    spark: SparkSession,
    events_path: str,
    table_path: str,
    checkpoint_path: str,
) -> None:
    """Drain new input into the partial-aggregate table (one run =
    one availableNow pass; safe to call repeatedly / on a schedule).

    Append-mode watermarking means windows within the 2-hour horizon
    of the max event time seen are NOT yet emitted — they sit in
    checkpoint state until a later drain's events advance the
    watermark past them.  A rollup over a finite, completed input
    therefore under-reports the newest ~2 h until one more drain with
    newer events arrives; that is the streaming finalization contract
    (late data within the horizon still lands in the right window),
    not data loss.

    Each micro-batch writes ``partials/batch-<id>`` via tmp + rename:
    a crash mid-write leaves only hidden staging, and the replay of an
    uncommitted batch id rewrites the same directory — readers never
    see a torn batch and a retry never double-counts.  ``p_sum`` is
    pinned to decimal(28,4) so every partial file and the compacted
    base share one parquet schema."""
    events = read_events_stream(spark, events_path)
    partials = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("p_count"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(28,4)")
            .alias("p_sum"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "p_count",
            "p_sum",
        )
    )

    def _append_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        final = f"{table_path}/partials/{_BATCH_PREFIX}{batch_id:012d}"
        tmp = f"{table_path}/partials/_tmp_{_BATCH_PREFIX}{batch_id:012d}"
        batch_df.write.mode("overwrite").parquet(tmp)
        delete_path(sp, final)  # replayed id: idempotent rewrite
        rename_path(sp, tmp, final)

    q = (
        partials.writeStream.foreachBatch(_append_batch)
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
    are never rescanned.  Safe to interleave with drains: only the
    batch directories present when the fold STARTS are merged and
    deleted; a drain landing mid-compaction adds a new directory this
    pass never touches.  Crash-safe via the ``_folded`` manifest
    inside the new base (written before the swap): a batch dir is
    deleted only after the base naming it is committed, and a dir
    whose deletion crashed (or that a replay recreated after its data
    was folded) is excluded by the manifest at read time and swept by
    the next compaction."""
    base = _base_dir(spark, table_path)
    folded = _folded_set(spark, base)
    dirs = _batch_dirs(spark, table_path)
    fold_now = {n: p for n, p in dirs.items() if n not in folded}
    leftovers = [p for n, p in dirs.items() if n in folded]
    if not fold_now:
        for p in leftovers:  # already in base; sweep
            delete_path(spark, p)
        return
    sources = ([base] if base is not None else []) + sorted(
        fold_now.values()
    )
    merged = (
        spark.read.parquet(*sources)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("p_count").cast("bigint").alias("p_count"),
            # sum(decimal(28,4)) widens to (38,4); pin the stored
            # schema so post-compaction drains append type-identical
            # files
            F.sum("p_sum").cast("decimal(28,4)").alias("p_sum"),
        )
    )
    tmp = f"{table_path}/base__compacting"
    delete_path(spark, tmp)
    merged.write.mode("overwrite").parquet(tmp)
    write_text_file(
        spark,
        f"{tmp}/{_FOLDED}",
        json.dumps(sorted(folded | set(fold_now))),
    )
    # swap: old base aside, new base in, then sweep.  A crash between
    # the renames is repaired by _base_dir (base__old restored); a
    # crash during the sweep leaves manifest-excluded dirs for the
    # next pass.
    old = f"{table_path}/base__old"
    delete_path(spark, old)
    if base is not None:
        rename_path(spark, base, old)
    rename_path(spark, tmp, f"{table_path}/base")
    delete_path(spark, old)
    for p in list(fold_now.values()) + leftovers:
        delete_path(spark, p)


def read_rollup(spark: SparkSession, table_path: str) -> DataFrame:
    """Final rollup view: merge the compacted base (minus nothing —
    it is already one row per key, but kept as mergeable partials)
    with every batch directory not yet folded into it."""
    base = _base_dir(spark, table_path)
    folded = _folded_set(spark, base)
    dirs = _batch_dirs(spark, table_path)
    sources = ([base] if base is not None else []) + sorted(
        p for n, p in dirs.items() if n not in folded
    )
    if not sources:
        raise ValueError(
            f"no rollup data under {table_path!r}: run "
            "run_incremental_rollup first"
        )
    return (
        spark.read.parquet(*sources)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("p_count").cast("bigint").alias("n_events"),
            F.sum("p_sum").cast("double").alias("sum_value"),
        )
    )
