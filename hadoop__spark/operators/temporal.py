"""Temporal joins Spark has no built-in operator for, expressed as
compositions of DataFrame ops (no UDFs, no driver loops).

* **As-of join** — each left row picks the most recent right row with
  ``right.ts <= left.ts`` per key.  Implemented with the union+window
  trick: tag sides, union, and ``last(..., ignorenulls)`` over a
  per-key time-ordered window.  ONE shuffle on the key — contrast a
  naive ``left.ts >= right.ts`` join which is a per-key cross product
  *plus* a max-pick aggregation.
* **Range join** — left rows against right `[start, end)` intervals.
  Implemented by time-bucketing: both sides map to fixed-width
  buckets (intervals explode into every bucket they overlap), the
  join is an equi-join on bucket, and the exact predicate filters.
  Turns a BroadcastNestedLoop/cartesian into a hash join whose fanout
  is interval_length/bucket_width.
* **Time-bucket rollup** — one pass per resolution level
  (minute/hour/day...), the batch form of a hypertable's continuous
  aggregates; each level is an independent partial-aggregated shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Point-in-time (as-of) left join, inclusive (``right.ts <=
    left.ts``), matching DuckDB ``ASOF LEFT JOIN`` semantics.

    Output: all left columns + every non-key right column (renamed
    ``asof_<col>``), null when no right row precedes the left row (or
    the match is older than ``tolerance_seconds``).

    Ties: a right row at exactly ``left.ts`` matches (right sorts
    before left at equal timestamps).  Right rows must be unique per
    (key, ts) — pre-aggregate otherwise.
    """
    from pyspark.sql.types import StructField, StructType, TimestampNTZType

    rcols = [c for c in right.columns if c not in (on, right_ts)]
    # the right payload travels as ONE struct, filled atomically: the
    # struct is null exactly on left rows, so last(ignorenulls) always
    # lands on the nearest preceding right ROW — per-column fills
    # would let a genuine NULL in the nearest right row fall through
    # to a staler row's value, stitching together a row that never
    # existed (and disagreeing with ASOF JOIN semantics, where the
    # matched row's nulls are returned as nulls)
    rt_field = "_rt"
    while rt_field in rcols:
        rt_field += "_"
    r_struct_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in rcols]
        + [StructField(rt_field, TimestampNTZType())]
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        F.struct(
            *[F.col(c).alias(c) for c in rcols],
            F.col(right_ts).cast("timestamp_ntz").alias(rt_field),
        ).alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_asof")
    )
    out = filled.where(F.col("_side") == 1)
    match = F.col("_asof")
    if tolerance_seconds is not None:
        stale = (
            F.unix_timestamp("_t")
            - F.unix_timestamp(F.col("_asof")[rt_field])
            > tolerance_seconds
        )
        # row-level staleness: the whole match is kept or dropped
        match = F.when(stale, F.lit(None)).otherwise(F.col("_asof"))
    return out.select(
        *left.columns,
        *[match[c].alias(f"asof_{c}") for c in rcols],
    )


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    left_ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to every interval with ``start <= ts < end``.

    ``bucket_seconds`` should be ≥ the typical interval length: each
    interval lands in ``len/bucket + 1`` buckets, each left row in
    exactly one, so result pairs are produced exactly once (no
    dedup needed) by an equi-join on the bucket id.

    ``how``: ``'inner'`` or ``'left'``.  The exact range predicate is
    part of the JOIN CONDITION (not a post-filter), so ``'left'``
    keeps unmatched left rows null-extended.  ``'right'``/``'full'``
    are rejected: intervals are replicated once per overlapped bucket,
    so an unmatched interval would surface once per replica.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"range_join supports how='inner'|'left', got {how!r}: "
            "the build side is bucket-replicated, so right/full outer "
            "would emit unmatched intervals once per bucket replica"
        )
    # fractional-second epochs: unix_timestamp() TRUNCATES to whole
    # seconds, so an interval whose exclusive end carries a fraction
    # (e.g. 01:00:00.5) would lose every match in its final bucket.
    # unix_micros keeps the fraction (through the same session-TZ
    # mapping unix_timestamp used for NTZ inputs), and IEEE division
    # by the same b is monotone, so bucket(ts) always lands inside
    # [bucket(start), bucket(end)] whenever start <= ts < end; an end
    # exactly on a bucket boundary costs one empty extra replica (the
    # exact predicate below filters it), never a miss.  floor (not a
    # long cast) keeps pre-1970 epochs in the right bucket.
    b = F.lit(float(bucket_seconds))

    def _sec(c: str) -> Column:
        return F.unix_micros(F.col(c).cast("timestamp")) / F.lit(1e6)

    l_b = left.withColumn("_bucket", F.floor(_sec(left_ts) / b))
    i_b = intervals.withColumn(
        "_ibucket",
        F.explode(
            F.sequence(
                F.floor(_sec(start) / b), F.floor(_sec(end) / b)
            )
        ),
    )
    cond = (
        (l_b["_bucket"] == i_b["_ibucket"])
        & (l_b[left_ts] >= i_b[start])
        & (l_b[left_ts] < i_b[end])
    )
    return l_b.join(i_b, on=cond, how=how).drop("_bucket", "_ibucket")


def sessionize_batch(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Batch gap-based sessionization: the lag/cumsum window idiom.

    A new session starts where the gap to the previous event of the
    same key EXCEEDS ``gap_seconds`` — an event exactly ``gap`` after
    the previous one still extends the session, the same inclusive
    boundary as native ``session_window`` (verified empirically:
    tests/test_sources_streaming.py twin-equality test), so a backfill
    computed with this operator groups events identically to its
    streaming twin ``streaming.sessionize``.  Gaps are measured at
    microsecond precision (``unix_timestamp`` would truncate to whole
    seconds and silently merge a 1800.5 s gap the stream splits).  The
    running sum of session-start flags is the session index.  Two
    window passes over ONE hash-partition-by-key shuffle (both windows
    share the partitioning, Catalyst plans a single Exchange).
    ``session_end`` is the LAST EVENT's timestamp; session_window's
    window end is last event + gap.
    """
    w = Window.partitionBy(key).orderBy(ts)
    ts_us = F.unix_micros(F.col(ts).cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(w)
    is_start = F.when(
        gap.isNull() | (gap > F.lit(int(gap_seconds) * 1_000_000)),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_idx = df.withColumn(
        "session_idx",
        F.sum(is_start).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_idx.groupBy(key, "session_idx")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count("*").cast("bigint").alias("n_events"),
        )
    )


def time_bucket_rollup(
    df: DataFrame,
    ts: str = "ts",
    levels: tuple[str, ...] = ("1 hour", "1 day"),
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Multi-resolution rollup (hypertable continuous-aggregate shape):
    one row per (level, bucket) with the given aggregates.

    Epoch-aligned ``window()`` buckets make hour/day levels equal to
    ``date_trunc`` — which is what the DuckDB oracle recomputes.  At
    scale each level materializes incrementally (append-only buckets);
    here it is the batch equivalent: one partial-agg shuffle per level.
    """
    if aggs is None:
        aggs = [F.count("*").cast("bigint").alias("n_rows")]
    parts = []
    for level in levels:
        rolled = df.groupBy(F.window(ts, level).alias("_w")).agg(*aggs)
        agg_cols = [c for c in rolled.columns if c != "_w"]
        parts.append(
            rolled.select(
                F.lit(level).alias("level"),
                F.col("_w.start").alias("bucket_start"),
                *agg_cols,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
