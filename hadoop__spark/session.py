"""SparkSession construction and fixture-table registration.

The reference tool resolved tables through a Hive metastore DAO
(``MetaDataDao.getColumnByDBAndTable``, reference README.md:102,239,814).
We have no Hive dependency: tables are parquet files registered as temp
views, and ``spark.catalog`` serves every metadata lookup the lineage
plane needs.

Scale notes (100 TB design intent, tested on local[N]):

* AQE is on — runtime coalescing, skew-join splitting and dynamic
  broadcast decisions replace hand-tuned partition counts.
* ``spark.sql.shuffle.partitions`` defaults to the local core count; on
  a real cluster this is overridden by AQE's coalescing anyway.
* Arrow is enabled so any Pandas-UDF path ships columnar batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Tables the driver generates at each scale factor (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def get_spark(app_name: str = "hadoop__spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for the local core count.  All configs
    are cluster-safe: on a real deployment only ``master`` changes.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every fixture table found under ``sf_dir``.

    Missing files are skipped so older fixture dirs (without
    documents/embeddings) still work.
    """
    # events.parquet's ts physical type is not fixed by contract —
    # fixture regenerations have shipped timestamp[us] (read natively
    # below) and timestamp[ns] variants.  The conf lets a nanos file
    # load as BIGINT instead of erroring; the conditional decode below
    # only fires when the read actually produced a long (ns-annotated
    # or plain-int64 file, both ns-epoch by convention).  Set here (not
    # only in get_spark) so the driver's vanilla session works too.
    # The streaming reader (streaming/rollup.py) sniffs the footer for
    # the same reason; tests/test_sources_streaming.py pins both paths
    # with a unit-drift canary.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            if name == "events" and dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            out[name] = df
    return out


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register each fixture table as a temp view named after the table.

    This is the engine's equivalent of the reference's metastore: after
    registration, ``spark.sql`` and ``spark.catalog`` resolve the same
    names the probe queries and the lineage plane use.
    """
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
