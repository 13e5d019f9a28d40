#!/usr/bin/env python
"""Per-probe optimization profiler (rounds 14-15).

For each requested probe: run it to completion through the noop sink
``--reps`` times inside one session, record every rep's seconds plus
min/median, count the Spark jobs the rep submitted (job-group scoped),
and optionally dump the formatted physical plan to
``plans/<round>/<probe>_<tag>.txt``.

Job counts come from ``sc.statusTracker().getJobIdsForGroup()``, which
only sees jobs retained by the UI listener (``spark.ui.retainedJobs``,
default 1000) — the session below raises it to 100000 so long
many-probe profiling runs don't silently undercount early reps.

Unlike bench.py (the driver contract: one cold + one warm pass), this
is the measurement harness the optimization loop uses: min-of-N is
robust to the host's noise spikes, and the job count is a
noise-free proxy for fixed per-query overhead (stages, AQE rounds).

Usage:
  python tools/profile_probes.py h01_pricing_summary dd03_minhash_lsh
  python tools/profile_probes.py --all-headline --reps 5 --plans before
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from hadoop__spark.queries import probe_map  # noqa: E402
from hadoop__spark.session import get_spark, register_views  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="probe names to profile")
    ap.add_argument("--all-headline", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--plans",
        metavar="TAG",
        help="dump plans/<round>/<probe>_<TAG>.txt for each probe",
    )
    ap.add_argument("--round", default="r15", help="plans/ subdir")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    names = list(args.names)
    if args.all_headline:
        names = HEADLINE + [n for n in names if n not in HEADLINE]
    if not names:
        ap.error("no probes given")

    probes = probe_map()
    unknown = [n for n in names if n not in probes]
    if unknown:
        ap.error(
            f"unknown probes: {unknown}; known: {sorted(probes)}"
        )
    spark = get_spark(
        "hadoop__spark-profile",
        extra_conf={"spark.ui.retainedJobs": "100000"},
    )
    register_views(spark, args.sf_dir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()  # warm-up

    sc = spark.sparkContext
    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.round,
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    results: dict[str, dict] = {}
    for name in names:
        probe = probes[name]
        times: list[float] = []
        n_jobs: list[int] = []
        for rep in range(args.reps):
            group = f"profile-{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = probe.run(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
            tracker = sc.statusTracker()
            n_jobs.append(len(tracker.getJobIdsForGroup(group)))
            sc.setJobGroup("", "")
        if args.plans:
            os.makedirs(plan_dir, exist_ok=True)
            df = probe.run(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
            with open(
                os.path.join(plan_dir, f"{name}_{args.plans}.txt"), "w"
            ) as f:
                f.write(plan)
        results[name] = {
            "times": times,
            "min": min(times),
            "median": round(statistics.median(times), 4),
            "jobs_per_rep": n_jobs,
        }
        print(
            f"{name:32s} min={min(times):7.3f} med={statistics.median(times):7.3f}"
            f" jobs={n_jobs}",
            file=sys.stderr,
        )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
