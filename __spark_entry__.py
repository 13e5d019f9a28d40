"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-H-Q1-shaped pricing summary;
``queries()`` exposes every implemented probe from SURVEY.md §2 plus
the beyond-reference pipeline, temporal, lineage, and streaming
operators (50 probes, consolidated under the driver's ~50-row
recording cap; see COVERAGE.md for the row-by-row map);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each probe — as
of round 4 every probe carries one: live recomputing oracles where the
semantics are SQL-expressible, pinned VALUES regression oracles
(captured at the sf0.01 gate fixture, bit-deterministic by
construction) for the xxhash/IVF-specific outputs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop__spark.queries import Q1_PRICING, probe_map
from hadoop__spark.session import register_views


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    register_views(spark, "/root/testdata/sf0.001")
    return spark.sql(Q1_PRICING)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, probe in probe_map().items():
        out[name] = probe.run
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per oracle-checkable query."""
    return {
        name: probe.oracle
        for name, probe in probe_map().items()
        if probe.oracle is not None
    }
