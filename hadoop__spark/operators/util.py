"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Spread a narrow input across the cluster before CPU-heavy
    per-row work.

    A small parquet file arrives as one partition (one row group = one
    task), which serializes shingling/hashing onto a single core.  At
    real scale inputs already carry ≥ cores partitions and this is a
    no-op — the repartition only fires when the input is narrower than
    the session's parallelism, so it never adds a shuffle to a 100 TB
    scan.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
