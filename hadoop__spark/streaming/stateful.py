"""Custom stateful streaming operator via ``applyInPandasWithState``.

``session_window`` (streaming/rollup.py) covers gap sessions natively;
this module is the escape hatch for state machines Spark has no
built-in for.  The example operator — a per-user running total with a
high-water-mark alert — keeps O(1) state per key, emits only on
change, and uses an event-time timeout so idle keys are evicted by the
watermark instead of accumulating forever (the stateful-operator
equivalent of bounded windows; state size ∝ active keys at 100 TB/day,
not total keys ever seen).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("high_water", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("high_water", DoubleType()),
    ]
)


def running_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user running (count, sum, high-water-mark of the sum).

    The state tuple is three scalars per user; on each micro-batch the
    group's new rows fold into it and one row per updated user is
    emitted.  Event-time timeout + watermark evict users idle past the
    watermark, bounding state.
    """

    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, total, high = (
            state.get if state.exists else (0, 0.0, float("-inf"))
        )
        # Fold row-wise in EVENT-TIME order (stable sort, event_id
        # tiebreak): the high-water mark is then a function of the
        # data, not of Arrow chunk boundaries or micro-batch row order
        # — identical across replays even when values decrease the
        # running total.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            sort_keys = [
                c for c in ("ts", "event_id") if c in pdf.columns
            ]
            if sort_keys:
                pdf = pdf.sort_values(sort_keys, kind="mergesort")
            # NULL values (parse_kafka_events keeps malformed rows,
            # value null) contribute 0, matching F.sum's null-skipping
            # — a bare astype(float) would turn one NULL into NaN and
            # poison this user's total/high_water state forever
            cum = total + pdf["value"].astype(float).fillna(0.0).cumsum()
            n += len(pdf)
            total = float(cum.iloc[-1])
            high = max(high, float(cum.max()))
        state.update((n, total, high))
        # evict when the event-time watermark passes the user's silence
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        yield pd.DataFrame(
            {
                "user_id": pd.Series([user_id], dtype="int64"),
                "n_events": pd.Series([n], dtype="int64"),
                "total_value": [total],
                "high_water": [high],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
