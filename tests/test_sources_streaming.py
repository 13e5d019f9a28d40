"""Sources: pushdown/pruning discipline and partitioned/bucketed
writes.  Streaming: replay the events fixture through Structured
Streaming and match the batch answer."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hadoop__spark import sources, streaming
from hadoop__spark.session import load_tables
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_read_pushdown_and_pruning(spark):
    df = sources.read_table(spark, os.path.join(SF_DIR, "lineitem.parquet"))
    q = df.where(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan
    # column pruning: the scan schema must carry only the two columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity" in plan


def test_csv_json_roundtrip(spark, tmp_path):
    df = sources.read_table(spark, os.path.join(SF_DIR, "region.parquet"))
    for fmt in ("csv", "json", "orc"):
        path = str(tmp_path / fmt)
        sources.write_table(df, path, fmt=fmt)
        back = sources.read_table(spark, path, fmt=fmt)
        assert back.count() == df.count()
        assert set(c.lower() for c in back.columns) == set(df.columns)


def test_write_partitioned_layout_and_file_count(spark, tmp_path):
    orders = sources.read_table(spark, os.path.join(SF_DIR, "orders.parquet"))
    out = str(tmp_path / "orders_by_status")
    sources.write_partitioned(
        orders, out, partition_by=["o_orderstatus"], files_per_partition=1
    )
    statuses = [
        d for d in os.listdir(out) if d.startswith("o_orderstatus=")
    ]
    assert len(statuses) >= 2
    for d in statuses:
        files = [
            f
            for f in os.listdir(os.path.join(out, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, "one file per partition, no small-file spray"
    back = sources.read_table(spark, out)
    assert back.count() == orders.count()
    # files_per_partition > 1 must actually split a hot partition
    # value across tasks/files (it used to be a silent no-op: the
    # numbered repartition still hashed every row of one value to ONE
    # task); rows round-trip and the cap holds
    out4 = str(tmp_path / "orders_by_status_4")
    sources.write_partitioned(
        orders, out4, partition_by=["o_orderstatus"],
        files_per_partition=4,
    )
    hot = max(
        (d for d in os.listdir(out4) if d.startswith("o_orderstatus=")),
        key=lambda d: len(os.listdir(os.path.join(out4, d))),
    )
    n_hot = sum(
        1
        for f in os.listdir(os.path.join(out4, hot))
        if f.endswith(".parquet")
    )
    assert 2 <= n_hot <= 4, n_hot
    assert sources.read_table(spark, out4).count() == orders.count()
    with pytest.raises(ValueError, match="files_per_partition"):
        sources.write_partitioned(
            orders, str(tmp_path / "bad"), partition_by=["o_orderstatus"],
            files_per_partition=0,
        )
    # partition pruning on the partition column
    plan = _plan(back.where(F.col("o_orderstatus") == "F"))
    assert "PartitionFilters" in plan


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Bucketed tables joined on the bucket key must not shuffle —
    the plan contains no Exchange on either side of the join."""
    warehouse = load_tables(spark, SF_DIR)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sources.write_bucketed_table(
            warehouse["orders"], "b_orders", ["o_custkey"], 8
        )
        sources.write_bucketed_table(
            warehouse["customer"], "b_customer", ["c_custkey"], 8
        )
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = _plan(j.groupBy("c_mktsegment").count())
        before_agg = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in before_agg, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_streaming_hourly_matches_batch(spark):
    events_path = os.path.join(SF_DIR, "events.parquet")
    stream = streaming.read_events_stream(spark, events_path)
    assert stream.isStreaming
    streaming.run_stream_to_memory(
        streaming.hourly_rollup(stream), "hourly_stream", output_mode="complete"
    )  # complete: a finite replay never advances the watermark past the tail
    got = {
        (str(r.hour), r.event_type, r.n_events, round(r.sum_value, 6))
        for r in spark.table("hourly_stream").collect()
    }
    batch = load_tables(spark, SF_DIR)["events"]
    want = {
        (str(r.hour), r.event_type, r.n_events, round(r.sum_value, 6))
        for r in (
            batch.groupBy(
                F.date_trunc("hour", "ts").alias("hour"), "event_type"
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
            .collect()
        )
    }
    assert got == want


def test_sessionize_stream(spark):
    events_path = os.path.join(SF_DIR, "events.parquet")
    stream = streaming.read_events_stream(spark, events_path)
    streaming.run_stream_to_memory(
        streaming.sessionize(stream, gap="30 minutes"), "sessions_stream",
        output_mode="complete",
    )
    sessions = spark.table("sessions_stream")
    n = sessions.count()
    assert n > 0
    # sessions are per-user, disjoint in time, and sum to all events
    total = sessions.agg(F.sum("n_events")).collect()[0][0]
    batch_n = load_tables(spark, SF_DIR)["events"].count()
    assert total == batch_n
    by_user: dict[int, list[tuple]] = {}
    for r in sessions.collect():
        by_user.setdefault(r.user_id, []).append(
            (r.session_start, r.session_end)
        )
    for spans in by_user.values():
        spans.sort()
        for (_, end_a), (start_b, _) in zip(spans, spans[1:]):
            assert start_b >= end_a, "overlapping sessions for one user"


def test_sessionize_batch_matches_streaming_twin(spark, tmp_path):
    """Boundary contract, pinned against the REAL session_window: an
    event exactly gap after the previous one EXTENDS the session
    (inclusive boundary — measured here, not assumed), and gaps are
    compared at microsecond precision: a 1800.5 s gap splits in the
    stream, and the batch twin must split too (whole-second
    unix_timestamp truncation used to read it as 1800 and merge)."""
    from hadoop__spark.operators.temporal import sessionize_batch

    rows = [
        # user 1: exact 1800 s strides -> ONE session (inclusive gap)
        (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 00:30:00", 1, "view", 1.0, "{}"),
        (3, "2024-01-01 01:00:00", 1, "view", 1.0, "{}"),
        # user 2: 1799 s then a big jump -> a 2-event + a 1-event
        (4, "2024-01-01 00:00:00", 2, "view", 1.0, "{}"),
        (5, "2024-01-01 00:29:59", 2, "view", 1.0, "{}"),
        (6, "2024-01-01 02:00:00", 2, "view", 1.0, "{}"),
        # user 3: 1800.5 s gap -> splits (truncation would merge)
        (7, "2024-01-01 00:00:00", 3, "view", 1.0, "{}"),
        (8, "2024-01-01 00:30:00.5", 3, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts STRING, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    src = str(tmp_path / "events_src")
    # micros on disk (not INT96) so the stream reader's footer sniff
    # sees a type the fixtures use
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        df.write.parquet(src)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)

    batch = {
        (r.user_id, str(r.session_start), r.n_events)
        for r in sessionize_batch(
            df.select("user_id", "ts"), gap_seconds=1800
        ).collect()
    }
    stream = streaming.read_events_stream(spark, src)
    streaming.run_stream_to_memory(
        streaming.sessionize(stream, gap="30 minutes"),
        "sessions_twin",
        output_mode="complete",
    )
    live = {
        (r.user_id, str(r.session_start), r.n_events)
        for r in spark.table("sessions_twin").collect()
    }
    assert batch == live
    # exact-gap events merged; the 1800.5 s gap split
    assert (1, "2024-01-01 00:00:00", 3) in batch
    assert sum(1 for u, _, n in batch if u == 3) == 2
    assert (2, "2024-01-01 00:00:00", 2) in batch


def test_stateful_null_value_does_not_poison_state(spark, tmp_path):
    """A NULL value (parse_kafka_events keeps malformed rows with
    value null) must contribute 0 like F.sum's null-skipping — a bare
    astype(float) turned it into NaN, cumsum propagated it, and the
    user's total_value/high_water state was NaN forever after."""
    import math

    from hadoop__spark.streaming.stateful import running_totals

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, "view", 2.0, "{}"),
            (2, "2024-01-01 00:01:00", 7, "view", None, "{}"),
            (3, "2024-01-01 00:02:00", 7, "view", 3.0, "{}"),
        ],
        "event_id LONG, ts STRING, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    src = str(tmp_path / "ev")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        df.write.parquet(src)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    stream = streaming.read_events_stream(spark, src)
    streaming.run_stream_to_memory(
        running_totals(stream), "totals_null", output_mode="update"
    )
    rows = (
        spark.table("totals_null")
        .orderBy(F.desc("n_events"))
        .limit(1)
        .collect()
    )
    r = rows[0]
    assert r.n_events == 3
    assert not math.isnan(r.total_value) and r.total_value == 5.0
    assert not math.isnan(r.high_water) and r.high_water == 5.0


def test_stateful_running_totals(spark):
    """applyInPandasWithState custom operator: final per-user totals
    after a full replay must equal the batch groupBy."""
    from hadoop__spark.streaming.stateful import running_totals

    events_path = os.path.join(SF_DIR, "events.parquet")
    stream = streaming.read_events_stream(spark, events_path)
    streaming.run_stream_to_memory(
        running_totals(stream), "running_totals", output_mode="update"
    )
    # update mode emits one row per user per micro-batch; the LAST row
    # per user is the final state
    out = spark.sql(
        "SELECT user_id, n_events, total_value FROM ("
        "  SELECT *, row_number() OVER ("
        "    PARTITION BY user_id ORDER BY n_events DESC) AS rn"
        "  FROM running_totals) WHERE rn = 1"
    )
    got = {
        (r.user_id, r.n_events, round(r.total_value, 6))
        for r in out.collect()
    }
    batch = load_tables(spark, SF_DIR)["events"]
    want = {
        (r.user_id, r.n_events, round(r.total_value, 6))
        for r in batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    }
    assert got == want


def test_incremental_rollup_exactly_once(spark, tmp_path):
    """Continuous-aggregate table: finalized windows match batch, and a
    second drain with no new input appends nothing (checkpoint gives
    exactly-once across restarts)."""
    from hadoop__spark.streaming.continuous import (
        read_rollup,
        run_incremental_rollup,
    )

    events_path = os.path.join(SF_DIR, "events.parquet")
    table = str(tmp_path / "rollup_table")
    ckpt = str(tmp_path / "ckpt")
    run_incremental_rollup(spark, events_path, table, ckpt)
    got = {
        (str(r.hour), r.event_type, r.n_events, round(r.sum_value, 4))
        for r in read_rollup(spark, table).collect()
    }
    batch = load_tables(spark, SF_DIR)["events"]
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    want_all = {
        (str(r.hour), r.event_type, r.n_events, round(r.sum_value, 4)): r.hour
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    # append emits only windows finalized past the watermark: every
    # emitted window must match batch exactly...
    assert got <= set(want_all)
    # ...and everything older than the watermark horizon must be there
    import datetime

    horizon = max_ts - datetime.timedelta(hours=3, minutes=1)
    missing = {
        k for k, hour in want_all.items() if hour < horizon and k not in got
    }
    assert not missing, f"finalized windows missing: {sorted(missing)[:3]}"
    assert len(got) > 0

    # second drain: no new input -> no new partial rows
    def partial_rows(t):
        from hadoop__spark.streaming.continuous import (
            _base_dir,
            _batch_dirs,
        )

        srcs = [p for p in [_base_dir(spark, t)] if p] + sorted(
            _batch_dirs(spark, t).values()
        )
        return spark.read.parquet(*srcs).count()

    n_before = partial_rows(table)
    run_incremental_rollup(spark, events_path, table, ckpt)
    assert partial_rows(table) == n_before


def test_rollup_compaction_preserves_answer(spark, tmp_path):
    from hadoop__spark.streaming.continuous import (
        compact_rollup,
        read_rollup,
        run_incremental_rollup,
    )

    events_path = os.path.join(SF_DIR, "events.parquet")
    table = str(tmp_path / "rt")
    run_incremental_rollup(spark, events_path, table, str(tmp_path / "ck"))
    before = {
        (str(r.hour), r.event_type, r.n_events, round(r.sum_value, 4))
        for r in read_rollup(spark, table).collect()
    }
    compact_rollup(spark, table)
    after = {
        (str(r.hour), r.event_type, r.n_events, round(r.sum_value, 4))
        for r in read_rollup(spark, table).collect()
    }
    assert before == after
    n_rows = spark.read.parquet(f"{table}/base").count()
    assert n_rows == len(after), "compacted to one partial per key"
    # every drained batch dir was folded and swept
    from hadoop__spark.streaming.continuous import _batch_dirs

    assert _batch_dirs(spark, table) == {}


def test_rollup_compact_between_drains(spark, tmp_path):
    """The compact-then-drain-again sequence — with the old streaming
    file sink this destroyed the sink's _spark_metadata log and left
    the table UNREADABLE (IllegalStateException: _spark_metadata/0
    doesn't exist) after the next drain.  The batch-dir layout keeps
    the sink log out of the picture: rollup totals equal the batch
    aggregation of everything drained, the compacted base and the
    post-compaction partials share one parquet schema, and a second
    compaction folds the tail."""
    import glob
    import shutil

    from hadoop__spark.streaming.continuous import (
        compact_rollup,
        read_rollup,
        run_incremental_rollup,
    )

    # two-phase source dir: half the events per drain (the fixture is
    # one file, so split it by timestamp into two single-file halves)
    ev = load_tables(spark, SF_DIR)["events"]
    n = ev.count()
    halves = str(tmp_path / "halves")
    ev.orderBy("ts", "event_id").limit(n // 2).coalesce(1).write.parquet(
        f"{halves}/h1"
    )
    ev.orderBy(F.desc("ts"), F.desc("event_id")).limit(
        n - n // 2
    ).coalesce(1).write.parquet(f"{halves}/h2")
    src = str(tmp_path / "src")
    os.makedirs(src)

    def feed(h, tag):
        for i, f in enumerate(glob.glob(f"{halves}/{h}/*.parquet")):
            shutil.copy(f, os.path.join(src, f"{tag}_{i}.parquet"))

    feed("h1", "a")
    table, ckpt = str(tmp_path / "rt"), str(tmp_path / "ck")
    run_incremental_rollup(spark, src, table, ckpt)
    compact_rollup(spark, table)
    feed("h2", "b")
    run_incremental_rollup(spark, src, table, ckpt)

    got = {
        (str(r.hour), r.event_type, r.n_events, round(r.sum_value, 4))
        for r in read_rollup(spark, table).collect()
    }
    # same finalized-windows contract as the exactly-once test: every
    # emitted window matches the batch rollup over ALL drained input
    batch = load_tables(spark, SF_DIR)["events"]
    want = {
        (str(r.hour), r.event_type, r.n_events, round(r.sum_value, 4))
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    assert got <= want and len(got) > 0
    # windows finalized by the FIRST drain must all have survived the
    # compact + second drain (the old layout lost or broke them)
    first_drain_rows = spark.read.parquet(f"{table}/base")
    assert first_drain_rows.count() > 0
    # one parquet schema across base and fresh partials
    from hadoop__spark.streaming.continuous import _batch_dirs

    post = _batch_dirs(spark, table)
    assert post, "second drain should land new batch dirs"
    base_schema = spark.read.parquet(f"{table}/base").schema
    for p in post.values():
        assert spark.read.parquet(p).schema == base_schema
    # a second compaction folds the tail and preserves the answer
    compact_rollup(spark, table)
    again = {
        (str(r.hour), r.event_type, r.n_events, round(r.sum_value, 4))
        for r in read_rollup(spark, table).collect()
    }
    assert again == got
    assert _batch_dirs(spark, table) == {}


def test_stateful_high_water_deterministic(spark, tmp_path):
    """high_water must be a function of the data (event-time cumsum
    max), independent of micro-batch / Arrow chunk boundaries: replay
    the same negative-dip stream with different batch sizes."""
    import pandas as pd

    from hadoop__spark.streaming.stateful import running_totals

    # one user, values that dip negative so chunk-boundary folding
    # would move the high-water mark
    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    vals = [5.0, -3.0, 10.0, -20.0, 4.0, 2.0, -1.0, 8.0]
    for i, v in enumerate(vals):
        rows.append(
            {
                "event_id": i,
                "ts": (base + pd.Timedelta(minutes=i)).value,  # ns
                "user_id": 1,
                "event_type": "x",
                "value": v,
                "props": "{}",
            }
        )
    pdf = pd.DataFrame(rows)
    src = tmp_path / "hw_events"
    src.mkdir()
    # several single-row files so maxFilesPerTrigger actually varies
    # the micro-batch boundaries
    for i in range(len(pdf)):
        pdf.iloc[[i]].to_parquet(src / f"part-{i:03d}.parquet")

    cum = pdf["value"].cumsum()
    want = (1, len(vals), round(float(cum.iloc[-1]), 6), round(float(cum.max()), 6))

    for mfpt, sink in ((1, "hw_a"), (3, "hw_b"), (100, "hw_c")):
        stream = streaming.read_events_stream(
            spark, str(src), max_files_per_trigger=mfpt
        )
        streaming.run_stream_to_memory(
            running_totals(stream), sink, output_mode="update"
        )
        out = spark.sql(
            f"SELECT user_id, n_events, total_value, high_water FROM ("
            f"  SELECT *, row_number() OVER ("
            f"    PARTITION BY user_id ORDER BY n_events DESC) AS rn"
            f"  FROM {sink}) WHERE rn = 1"
        ).collect()
        got = (
            out[0].user_id,
            out[0].n_events,
            round(out[0].total_value, 6),
            round(out[0].high_water, 6),
        )
        assert got == want, (mfpt, got, want)


def _drain_event_ids_ts(spark, path: str, sink: str) -> set:
    stream = streaming.read_events_stream(spark, path)
    streaming.run_stream_to_memory(
        stream.select("event_id", "ts"), sink, output_mode="append"
    )
    return {(r.event_id, str(r.ts)) for r in spark.table(sink).collect()}


def test_ts_unit_drift_canary(spark, tmp_path):
    """Unit-drift canary: the stream reader must decode whatever
    physical ts type the fixture file actually carries.  Round 3's only
    wrong answer came from a hardcoded nanos decode applied to a
    regenerated timestamp[us] fixture (a 1000x time compression), so
    this test drains the same rows through the stream reader for all
    three supported physical shapes — the real fixture (timestamp[us]),
    a synthesized timestamp[ns] file, and a synthesized int64-nanos
    file — and requires each to equal the native batch read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(SF_DIR, "events.parquet")
    want = {
        (r.event_id, str(r.ts))
        for r in spark.read.parquet(src).select("event_id", "ts").collect()
    }
    assert _drain_event_ids_ts(spark, src, "canary_native") == want

    table = pq.read_table(src)
    idx = table.schema.get_field_index("ts")
    ns_col = table.column("ts").cast(pa.timestamp("ns"))
    for variant, col in (("ns", ns_col), ("int64", ns_col.cast(pa.int64()))):
        d = tmp_path / f"events_{variant}"
        d.mkdir()
        pq.write_table(
            table.set_column(idx, "ts", col), d / "part-0.parquet"
        )
        got = _drain_event_ids_ts(spark, str(d), f"canary_{variant}")
        assert got == want, f"ts decode drifted for {variant} files"


def test_stream_stream_interval_join_matches_batch(spark):
    """Watermarked stream-stream interval join (click→purchase
    attribution): the full replay must produce exactly the batch
    interval-join pairs, and the batch path shares the function."""
    from hadoop__spark.streaming.joins import attribute_conversions

    events_path = os.path.join(SF_DIR, "events.parquet")
    stream = streaming.read_events_stream(spark, events_path)
    clicks = stream.where(F.col("event_type") == "click")
    purchases = stream.where(F.col("event_type") == "purchase")
    streaming.run_stream_to_memory(
        attribute_conversions(clicks, purchases, max_delay="1 hour"),
        "attrib_stream",
        output_mode="append",
    )
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.table("attrib_stream").collect()
    }
    batch = load_tables(spark, SF_DIR)["events"]
    bc = batch.where(F.col("event_type") == "click")
    bp = batch.where(F.col("event_type") == "purchase")
    want = {
        (r.click_id, r.purchase_id)
        for r in attribute_conversions(bc, bp, max_delay="1 hour").collect()
    }
    assert want, "fixture must contain attributable pairs"
    assert got == want


def test_parse_kafka_events_payload(spark):
    """Kafka-shaped frame (binary value + broker timestamp) parses to
    the events schema; malformed payloads fall back to the broker
    timestamp so late-data accounting still works."""
    import datetime as dt
    import json

    broker_ts = dt.datetime(2024, 3, 1, 12, 0, 5)
    good = json.dumps(
        {
            "event_id": 7,
            "ts": "2024-03-01T11:59:58",
            "user_id": 42,
            "event_type": "click",
            "value": 1.5,
            "props": "{}",
        }
    )
    rows = [
        (b"k1", good.encode(), "events", 0, 100, broker_ts),
        (b"k2", b"not json", "events", 0, 101, broker_ts),
    ]
    raw = spark.createDataFrame(
        rows,
        "key BINARY, value BINARY, topic STRING, partition INT, "
        "offset BIGINT, timestamp TIMESTAMP",
    )
    out = streaming.parse_kafka_events(raw).orderBy("event_id").collect()
    assert [r.event_id for r in out] == [None, 7]
    parsed = out[1]
    assert parsed.user_id == 42 and parsed.event_type == "click"
    assert parsed.ts == dt.datetime(2024, 3, 1, 11, 59, 58)
    assert out[0].ts == broker_ts  # malformed → broker timestamp
    assert streaming.parse_kafka_events(raw).columns == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]


def test_stream_stream_left_outer_join(spark):
    """left_outer additionally emits unconverted clicks, but only once
    the watermark proves no purchase can still arrive — so the streamed
    result is the matched pairs (exactly) plus a watermark-bounded
    prefix of the batch unmatched set."""
    from hadoop__spark.streaming.joins import attribute_conversions

    events_path = os.path.join(SF_DIR, "events.parquet")
    stream = streaming.read_events_stream(spark, events_path)
    streaming.run_stream_to_memory(
        attribute_conversions(
            stream.where(F.col("event_type") == "click"),
            stream.where(F.col("event_type") == "purchase"),
            max_delay="1 hour",
            how="left_outer",
        ),
        "attrib_outer",
        output_mode="append",
    )
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.table("attrib_outer").collect()
    }
    batch = load_tables(spark, SF_DIR)["events"]
    want_all = {
        (r.click_id, r.purchase_id): r.click_ts
        for r in attribute_conversions(
            batch.where(F.col("event_type") == "click"),
            batch.where(F.col("event_type") == "purchase"),
            max_delay="1 hour",
            how="left_outer",
        ).collect()
    }
    assert got <= set(want_all), "stream must never invent rows"
    # matched pairs are complete
    matched_want = {k for k in want_all if k[1] is not None}
    assert {k for k in got if k[1] is not None} == matched_want
    # unmatched clicks are exactly a gap-free watermark-ordered PREFIX
    # of the batch unmatched set: Spark's derived state watermark for
    # the outer side is more conservative than watermark + max_delay,
    # so the exact horizon is an implementation detail — but emissions
    # can never skip an older unmatched click while emitting a newer
    # one, and a finite replay must finalize a nontrivial prefix.
    emitted_un = {k for k in got if k[1] is None}
    assert emitted_un, "some unconverted clicks must emit"
    newest_emitted = max(want_all[k] for k in emitted_un)
    missing = {
        k
        for k, ts in want_all.items()
        if k[1] is None and ts <= newest_emitted and k not in got
    }
    assert not missing, f"gap in unmatched-click prefix: {sorted(missing)[:3]}"
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    assert newest_emitted < max_ts, "tail cannot be finalized"
    with pytest.raises(ValueError, match="how"):
        attribute_conversions(batch, batch, how="full")


def test_stream_stream_left_outer_join_drains_fully(spark, tmp_path):
    """With the watermark advanced past the tail (far-future sentinel
    events on BOTH sides, join-inert via out-of-range users), the
    streamed left-outer result must equal the batch left join in FULL —
    every real unmatched click finalizes, not just a prefix.  Only the
    sentinel click itself stays open (nothing can outrun its own
    watermark)."""
    import datetime as dt
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop__spark.streaming.joins import attribute_conversions

    src = os.path.join(SF_DIR, "events.parquet")
    d = tmp_path / "events_sentinel"
    d.mkdir()
    shutil.copy(src, d / "part-0.parquet")
    table = pq.read_table(src)
    assert set(table.schema.names) == {
        "event_id", "ts", "user_id", "event_type", "value", "props",
    }, table.schema
    max_ts = pa.compute.max(table.column("ts")).as_py()
    sentinel_ts = max_ts + dt.timedelta(days=2)
    sentinel_vals = {
        "event_id": [1_000_000_001, 1_000_000_002],
        "ts": [sentinel_ts, sentinel_ts],
        "user_id": [-1, -2],
        "event_type": ["click", "purchase"],
        "value": [0.0, 0.0],
        "props": ["{}", "{}"],
    }
    pq.write_table(
        pa.table(
            {n: sentinel_vals[n] for n in table.schema.names},
            schema=table.schema,
        ),
        d / "part-1-sentinel.parquet",
    )
    stream = streaming.read_events_stream(spark, str(d))
    streaming.run_stream_to_memory(
        attribute_conversions(
            stream.where(F.col("event_type") == "click"),
            stream.where(F.col("event_type") == "purchase"),
            max_delay="1 hour",
            how="left_outer",
        ),
        "attrib_outer_full",
        output_mode="append",
    )
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.table("attrib_outer_full").collect()
    }
    batch = spark.read.parquet(str(d))
    want = {
        (r.click_id, r.purchase_id)
        for r in attribute_conversions(
            batch.where(F.col("event_type") == "click"),
            batch.where(F.col("event_type") == "purchase"),
            max_delay="1 hour",
            how="left_outer",
        ).collect()
    }
    # the sentinel click is the one row the stream can never finalize
    assert want - got == {(1_000_000_001, None)}, sorted(want - got)[:5]
    assert got <= want, "stream must never invent rows"
    assert any(p is None for _, p in got), "unmatched clicks must emit"


def test_kafka_rollup_on_parsed_frame(spark):
    """The windowed rollup runs unchanged on the Kafka-parse output —
    the format swap is pure configuration."""
    import datetime as dt
    import json

    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = []
    for i in range(20):
        payload = json.dumps(
            {
                "event_id": i,
                "ts": (base + dt.timedelta(minutes=7 * i)).isoformat(),
                "user_id": i % 3,
                "event_type": "a" if i % 2 else "b",
                "value": float(i),
                "props": "{}",
            }
        )
        rows.append((None, payload.encode(), "events", 0, i, base))
    raw = spark.createDataFrame(
        rows,
        "key BINARY, value BINARY, topic STRING, partition INT, "
        "offset BIGINT, timestamp TIMESTAMP",
    )
    events = streaming.parse_kafka_events(raw)
    got = streaming.hourly_rollup(events).orderBy("hour", "event_type")
    expect = (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .orderBy("hour", "event_type")
    )
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in expect.collect()
    ]


def test_read_events_stream_rejects_unknown_format(spark):
    with pytest.raises(ValueError, match="source_format"):
        streaming.read_events_stream(
            spark, "/tmp/x", source_format="socketx"
        )


def test_dedup_events_stream_exactly_once(spark, tmp_path):
    """Duplicate deliveries (the same events file replayed twice) come
    out exactly once; batch frames share the code path."""
    import shutil

    src = os.path.join(SF_DIR, "events.parquet")
    d = tmp_path / "dup_events"
    d.mkdir()
    shutil.copy(src, d / "a.parquet")
    shutil.copy(src, d / "b.parquet")

    events = streaming.read_events_stream(spark, str(d), max_files_per_trigger=1)
    deduped = streaming.dedup_events_stream(events, watermark="10 days")
    streaming.run_stream_to_memory(deduped, "dedup_stream", output_mode="append")
    got = spark.table("dedup_stream").count()

    batch = load_tables(spark, SF_DIR)["events"]
    expect = batch.select("event_id").distinct().count()
    assert got == expect

    # batch path: same function, plain dropDuplicates
    doubled = batch.unionAll(batch)
    assert streaming.dedup_events_stream(doubled).count() == expect


def test_streaming_sliding_matches_batch(spark):
    """Sliding windows: streaming replay equals the batch window()
    aggregation (each event lands in window/slide overlapping
    windows)."""
    events_path = os.path.join(SF_DIR, "events.parquet")
    stream = streaming.read_events_stream(spark, events_path)
    streaming.run_stream_to_memory(
        streaming.sliding_rollup(stream, window="1 hour", slide="15 minutes"),
        "sliding_stream",
        output_mode="complete",
    )
    got = {
        (str(r.win_start), str(r.win_end), r.event_type, r.n_events)
        for r in spark.table("sliding_stream").collect()
    }
    batch = load_tables(spark, SF_DIR)["events"]
    want = {
        (str(r.w.start), str(r.w.end), r.event_type, r.n_events)
        for r in (
            batch.groupBy(
                F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
            )
            .agg(F.count("*").alias("n_events"))
            .collect()
        )
    }
    assert got == want


def test_register_views_cache_switches_sf(spark):
    """The per-session registration cache must be a no-op only for the
    SAME fixture dir: switching dirs re-points the views, switching
    back restores them (the cross-SF semantics the oracle-parity suite
    relies on when pinned sf0.01 probes interleave with live sf0.001
    ones)."""
    from hadoop__spark.session import register_views

    register_views(spark, "/root/testdata/sf0.001")
    n_small = spark.table("lineitem").count()
    register_views(spark, "/root/testdata/sf0.01")
    n_big = spark.table("lineitem").count()
    assert n_big > n_small
    register_views(spark, "/root/testdata/sf0.001")
    assert spark.table("lineitem").count() == n_small
    # idempotent repeat is a no-op but keeps the same answer
    register_views(spark, "/root/testdata/sf0.001")
    assert spark.table("lineitem").count() == n_small
    register_views(spark, SF_DIR)  # restore module default for peers


def test_table_cache_purges_dead_session(spark, monkeypatch):
    """A stop()'d session must not be served cached plans: when the
    liveness probe says dead, the session's cache entries are purged
    and the tables re-read fresh (here the context is actually alive,
    so the re-read succeeds and repopulates)."""
    import os as _os

    from hadoop__spark import session as S

    before = S.load_tables(spark, SF_DIR)["orders"]
    assert S.load_tables(spark, SF_DIR)["orders"] is before  # cache hit
    sid, key = id(spark), (id(spark), _os.path.abspath(SF_DIR))
    monkeypatch.setattr(S, "_is_live", lambda s: False)
    fresh = S.load_tables(spark, SF_DIR)["orders"]
    assert fresh is not before, "dead session served a cached plan"
    monkeypatch.undo()
    assert S._SESSION_REFS[sid] is spark and key in S._TABLE_CACHE
    assert S._is_live(spark)


def test_compact_parquet_right_sizes_and_clusters(spark, tmp_path):
    """compact_parquet rewrites a fragmented dataset into
    ceil(bytes/target) files; with sort_by the per-file min/max ranges
    of the sort key are disjoint (file-skipping layout)."""
    import pyarrow.parquet as pq

    src, dest = str(tmp_path / "frag"), str(tmp_path / "compact")
    orders = load_tables(spark, SF_DIR)["orders"]
    orders.repartition(37).write.parquet(src)  # fragment it
    n_frag = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_frag >= 30
    total = sources.total_bytes(spark, src)
    assert total > 0
    n = sources.compact_parquet(
        spark, src, dest,
        target_file_bytes=total // 3 + 1,
        sort_by=["o_orderkey"],
    )
    files = [f for f in os.listdir(dest) if f.endswith(".parquet")]
    assert 1 <= len(files) <= n < n_frag
    got = spark.read.parquet(dest)
    assert got.count() == orders.count()
    assert set(got.columns) == set(orders.columns)
    # clustering: per-file key ranges must not overlap
    ranges = []
    for f in files:
        col = pq.read_table(
            os.path.join(dest, f), columns=["o_orderkey"]
        )["o_orderkey"]
        if len(col):
            ranges.append((min(col.to_pylist()), max(col.to_pylist())))
    ranges.sort()
    for (_, a_max), (b_min, _) in zip(ranges, ranges[1:]):
        assert a_max <= b_min, "sorted compaction produced overlapping files"
    with pytest.raises(ValueError, match="dest != src"):
        sources.compact_parquet(spark, src, src)


def test_fingerprint_filter_new_on_a_stream(spark, tmp_path):
    """Incremental exact dedup runs unchanged on a live ingest stream:
    the md5 projection is stateless and the stream-static anti-join
    against the persisted fingerprint table needs no watermark or
    state — streamed survivors equal the batch call row-for-row."""
    import shutil

    from hadoop__spark.operators import dedup

    docs = load_tables(spark, SF_DIR)["documents"].select("doc_id", "text")
    corpus_half = docs.where(F.col("doc_id") % 2 == 0)
    fp_path = str(tmp_path / "fp_idx")
    dedup.fingerprint_write(corpus_half, fp_path)

    batch_want = {
        (r.doc_id, r.text)
        for r in dedup.fingerprint_filter_new(
            spark, fp_path, docs
        ).collect()
    }
    # known docs (the indexed half) must be dropped, fresh ones kept
    assert batch_want and all(d % 2 == 1 for d, _ in batch_want)

    feed = tmp_path / "feed"
    feed.mkdir()
    shutil.copy(
        os.path.join(SF_DIR, "documents.parquet"), feed / "part-0.parquet"
    )
    stream = (
        spark.readStream.schema(
            spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).schema
        )
        .parquet(str(feed))
        .select("doc_id", "text")
    )
    streaming.run_stream_to_memory(
        dedup.fingerprint_filter_new(spark, fp_path, stream),
        "fp_filter_stream",
        output_mode="append",
    )
    got = {
        (r.doc_id, r.text)
        for r in spark.table("fp_filter_stream").collect()
    }
    assert got == batch_want


def test_stream_single_file_with_glob_metachars(spark, tmp_path):
    """A single-FILE events source whose name contains glob
    metacharacters must stream exactly that file: the first-char-only
    class trick left 'events[0].parquet' as '[e]vents[0].parquet',
    which matches 'events0.parquet' — a Path-does-not-exist failure
    (or worse, a different file)."""
    import glob as _glob
    import shutil

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
            (2, "2024-01-01 00:01:00", 2, "view", 2.0, "{}"),
        ],
        "event_id LONG, ts STRING, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    staging = str(tmp_path / "staging")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        df.coalesce(1).write.parquet(staging)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    # the decoy the broken glob used to match
    target = str(src_dir / "events[0].parquet")
    decoy = str(src_dir / "events0.parquet")
    part = _glob.glob(f"{staging}/part-*.parquet")[0]
    shutil.copy(part, target)
    with open(decoy, "wb") as fh:
        fh.write(b"PAR1\x00not-a-real-footer")
    stream = streaming.read_events_stream(spark, target)
    streaming.run_stream_to_memory(
        stream.select("event_id"), "glob_events"
    )
    got = sorted(r.event_id for r in spark.table("glob_events").collect())
    assert got == [1, 2]


def test_session_cache_sweeps_dead_sessions(spark):
    """The per-session caches hold strong references; a stopped session
    that is never passed to load_tables again must still be swept on
    the next call (the id-collision purge alone can never fire while
    the dict pins the object)."""
    from hadoop__spark import session as sess_mod

    class _DeadCtx:
        _jsc = None

    class _DeadSession:
        sparkContext = _DeadCtx()

    dead = _DeadSession()
    sid = id(dead)
    sess_mod._SESSION_REFS[sid] = dead
    sess_mod._TABLE_CACHE[(sid, "/nowhere")] = {}
    sess_mod._VIEWS_CURRENT[sid] = "/nowhere"
    load_tables(spark, SF_DIR)
    assert sid not in sess_mod._SESSION_REFS
    assert (sid, "/nowhere") not in sess_mod._TABLE_CACHE
    assert sid not in sess_mod._VIEWS_CURRENT
