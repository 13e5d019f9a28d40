#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is executed to completion through the ``noop`` sink (full
scan→shuffle→agg pipeline, no driver-side materialization cost), after
a session warm-up so JVM/codegen startup isn't attributed to q1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop__spark.queries import probe_map
from hadoop__spark.session import get_spark, register_views

#: The headline set: scan-heavy agg, multi-way joins, window, events
#: rollup, subquery — plus pipeline operators appended as they land.
HEADLINE = [
    "h01_pricing_summary",
    "h02_shipping_priority",
    "h03_local_supplier",
    "h04_events_hourly",
    "j04_multiway_join",
    "a02_distinct_hash",
    "q01_from_subquery",
    "w01_windows",
    "dd01_dedup_exact",
    "dd02_dedup_fingerprint",
    "dd03_minhash_lsh",
    "ts01_token_stats",
    "ann01_cosine_topk",
    "tj01_asof_join",
    "tj04_sessionize_batch",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("hadoop__spark-bench")
    probes = probe_map()

    register_views(spark, sf_dir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()  # warm-up

    # Each query runs twice: the first (cold) pass carries plan
    # compilation + codegen + first-touch page cache and is what the
    # round-over-round gate compares ("queries"/"value", same contract
    # as round 1); the second (warm) pass approximates steady-state
    # cluster throughput (NOTES.md: cold start dominates ~6x at sf0.1).
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in HEADLINE:
        probe = probes.get(name)
        if probe is None:
            continue
        for store in (timings, warm):
            t0 = time.perf_counter()
            df = probe.run(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            store[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "value_warm": round(sum(warm.values()), 4),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
