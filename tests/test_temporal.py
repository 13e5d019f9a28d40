"""Temporal operators: as-of join vs pandas merge_asof, tolerance
semantics, range join vs the naive non-equi join, rollup consistency."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hadoop__spark.operators.temporal import (
    asof_join,
    range_join,
    time_bucket_rollup,
)
from hadoop__spark.session import load_tables
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    return load_tables(spark, SF_DIR)["events"]


def test_asof_matches_pandas_merge_asof(spark, events):
    left = events.select("event_id", "user_id", "ts")
    right = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pv"))
    )
    got = (
        asof_join(left, right, on="user_id")
        .select("event_id", "asof_pv")
        .toPandas()
        .set_index("event_id")["asof_pv"]
        .sort_index()
    )
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    want = (
        pd.merge_asof(
            lp, rp, on="ts", by="user_id", direction="backward"
        )
        .set_index("event_id")["pv"]
        .sort_index()
    )
    pd.testing.assert_series_equal(
        got, want, check_names=False, check_dtype=False
    )


def test_asof_tolerance_nulls_stale_matches(spark, events):
    left = events.select("event_id", "user_id", "ts")
    right = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pv"))
    )
    loose = asof_join(left, right, on="user_id")
    tight = asof_join(
        left, right, on="user_id", tolerance_seconds=3600
    )
    n_loose = loose.where(F.col("asof_pv").isNotNull()).count()
    n_tight = tight.where(F.col("asof_pv").isNotNull()).count()
    assert 0 < n_tight < n_loose, "tolerance must null out stale matches"


def test_range_join_equals_naive_nonequi(spark, events):
    intervals = spark.createDataFrame(
        [
            (0, "2024-01-02 00:00:00", "2024-01-02 07:30:00"),
            (1, "2024-01-05 12:00:00", "2024-01-06 01:00:00"),
            (2, "2024-01-29 00:00:00", "2024-01-31 00:00:00"),
        ],
        "iid INT, start_s STRING, end_s STRING",
    ).select(
        "iid",
        F.to_timestamp("start_s").alias("start"),
        F.to_timestamp("end_s").alias("end"),
    )
    fast = range_join(events, intervals, bucket_seconds=3600)
    naive = events.join(
        intervals,
        (events.ts >= intervals.start) & (events.ts < intervals.end),
    )
    got = {(r.event_id, r.iid) for r in fast.collect()}
    want = {(r.event_id, r.iid) for r in naive.collect()}
    assert got == want and len(want) > 0
    # and the fast path must not be a nested-loop/cartesian plan
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rollup_levels_consistent(spark, events):
    out = time_bucket_rollup(
        events,
        levels=("1 hour", "1 day"),
        aggs=[F.count("*").cast("bigint").alias("n")],
    )
    per_level = {
        r.level: r.total
        for r in out.groupBy("level").agg(F.sum("n").alias("total")).collect()
    }
    n = events.count()
    assert per_level == {"1 hour": n, "1 day": n}
    hours = out.where(F.col("level") == "1 hour").count()
    days = out.where(F.col("level") == "1 day").count()
    assert hours > days > 0


def test_range_join_left_keeps_unmatched(spark, events):
    """how='left': the range predicate is part of the join condition,
    so left rows outside every interval survive null-extended."""
    intervals = spark.createDataFrame(
        [(0, "2024-01-02 00:00:00", "2024-01-02 07:30:00")],
        "iid INT, start_s STRING, end_s STRING",
    ).select(
        "iid",
        F.to_timestamp("start_s").alias("start"),
        F.to_timestamp("end_s").alias("end"),
    )
    left = range_join(events, intervals, bucket_seconds=3600, how="left")
    n_events = events.count()
    inner_n = range_join(events, intervals, bucket_seconds=3600).count()
    assert left.count() == n_events, "every left row exactly once"
    matched = left.where(F.col("iid").isNotNull()).count()
    assert matched == inner_n and 0 < matched < n_events


def test_range_join_rejects_right_full(spark, events):
    intervals = spark.createDataFrame(
        [(0, "2024-01-02 00:00:00", "2024-01-02 07:30:00")],
        "iid INT, start_s STRING, end_s STRING",
    ).select(
        "iid",
        F.to_timestamp("start_s").alias("start"),
        F.to_timestamp("end_s").alias("end"),
    )
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="range_join supports"):
            range_join(events, intervals, how=how)
