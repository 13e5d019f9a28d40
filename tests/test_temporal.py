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


def test_asof_null_right_values_stay_null(spark):
    """A genuine NULL in the matched (nearest-preceding) right row
    must come back as NULL — the right payload is filled as one
    struct, so a per-column fill can never stitch values from
    DIFFERENT right rows into a 'match' that never existed (DuckDB
    ASOF semantics: you get THE row, nulls included)."""
    import duckdb

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:03:00"), (1, "2024-01-01 00:00:30")],
        "k INT, ts STRING",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10.0, 5),
            (1, "2024-01-01 00:02:00", None, 7),
        ],
        "k INT, ts STRING, price DOUBLE, qty INT",
    ).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "price", "qty"
    )
    got = sorted(
        (str(r.ts), r.asof_price, r.asof_qty)
        for r in asof_join(left, right, on="k").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l AS SELECT 1 k, TIMESTAMP '2024-01-01 00:03:00' ts "
        "UNION ALL SELECT 1, TIMESTAMP '2024-01-01 00:00:30'"
    )
    con.execute(
        "CREATE TABLE r AS SELECT 1 k, TIMESTAMP '2024-01-01 00:00:00' ts,"
        " 10.0 price, 5 qty UNION ALL SELECT 1,"
        " TIMESTAMP '2024-01-01 00:02:00', NULL, 7"
    )
    want = sorted(
        (str(ts), price, qty)
        for ts, price, qty in con.execute(
            "SELECT l.ts, r.price, r.qty FROM l ASOF LEFT JOIN r"
            " ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    )
    assert got == want
    # the 00:03 left row matched the 00:02 right row: price NULL (not
    # back-filled from 00:00's 10.0), qty 7
    assert got[1] == ("2024-01-01 00:03:00", None, 7)


def test_range_join_fractional_second_bounds(spark):
    """Sub-second interval bounds must not lose final-bucket matches:
    unix_timestamp() truncation would bucket an interval ending at
    01:00:00.5 as if it ended at 01:00:00, dropping a left row at
    01:00:00.2 that the exact predicate admits."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00.2"), (2, "2024-01-01 01:00:00.7")],
        "id INT, ts STRING",
    ).select("id", F.col("ts").cast("timestamp").alias("ts"))
    ivals = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", "2024-01-01 01:00:00.5")],
        "name STRING, start STRING, end STRING",
    ).select(
        "name",
        F.col("start").cast("timestamp").alias("start"),
        F.col("end").cast("timestamp").alias("end"),
    )
    got = sorted(
        (r.id, r.name)
        for r in range_join(left, ivals, bucket_seconds=3600).collect()
    )
    # id 1 (01:00:00.2 < end 01:00:00.5) matches; id 2 does not
    assert got == [(1, "a")]


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
