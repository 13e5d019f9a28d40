"""Stream-stream joins: watermarked interval joins between two event
streams.

Spark's stream-stream join buffers both sides in state; without
watermarks AND a time-range join condition that state grows forever.
The range condition lets the engine derive a state-eviction bound per
side (a click can only match purchases up to ``max_delay`` later, so
clicks older than ``watermark + max_delay`` are evictable) — the same
discipline as the windowed aggregations in ``rollup.py``: state
proportional to the time horizon, not the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def attribute_conversions(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Click→purchase attribution: join each purchase to every click by
    the same user within ``max_delay`` BEFORE it (inclusive on both
    ends, matching the equivalent batch interval join).

    Works identically on batch frames (the watermark is a no-op there),
    so backfills share the code path — the same contract as the other
    streaming operators in this package.

    ``how='left_outer'`` additionally emits unconverted clicks with
    NULL purchase columns — on a stream these surface only once the
    watermark proves no matching purchase can still arrive, so a
    finite replay withholds a tail of at LEAST ``watermark +
    max_delay`` (Spark's derived state watermark for outer emission is
    more conservative than that bound; the test asserts the emitted
    set is a gap-free watermark-ordered prefix of the batch answer
    rather than a specific horizon).  Only 'inner' and 'left_outer'
    are supported: a purchase-outer variant is the same function with
    the sides' roles swapped.

    Output: one row per (click, purchase) pair — attribution policy
    (first-touch, last-touch, split) is a downstream groupBy on
    ``purchase_id``, deliberately not baked in here.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"how must be 'inner' or 'left_outer', got {how!r}"
        )
    c = clicks.select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("purchase_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL '{max_delay}'")
        )
    )
    return c.join(p, cond, how).select(
        F.col("click_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )
