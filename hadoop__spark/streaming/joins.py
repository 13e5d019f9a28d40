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
) -> DataFrame:
    """Click→purchase attribution: join each purchase to every click by
    the same user within ``max_delay`` BEFORE it (inclusive on both
    ends, matching the equivalent batch interval join).

    Works identically on batch frames (the watermark is a no-op there),
    so backfills share the code path — the same contract as the other
    streaming operators in this package.

    Output: one row per (click, purchase) pair — attribution policy
    (first-touch, last-touch, split) is a downstream groupBy on
    ``purchase_id``, deliberately not baked in here.
    """
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
    return c.join(p, cond, "inner").select(
        F.col("click_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )
