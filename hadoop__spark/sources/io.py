"""Format readers and scale-aware writers.

Scale discipline baked in (the parts that matter at 100 TB):

* readers never infer schemas twice — pass ``schema`` to skip the
  sampling pass on text formats (CSV/JSON schema inference reads the
  data once before the real scan);
* ``write_partitioned`` repartitions by the partition columns first so
  each task writes one file per partition instead of
  ``tasks × partitions`` small files — the classic small-files failure
  at scale;
* ``write_bucketed_table`` persists a bucketed layout so equi-joins and
  aggregations on the bucket keys skip their shuffle entirely
  (bucket-local sort-merge join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "orc", "json", "csv", "text", "avro")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` in ``fmt``; column pruning and predicate pushdown
    stay available because this returns the raw scan (callers filter /
    select on it declaratively — see tests asserting PushedFilters)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        # schema inference on CSV costs a full extra pass at scale;
        # make it explicit that the caller opted in.  (JSON always
        # infers when no schema is given — inferSchema is a CSV-only
        # option the JSON source ignores, so setting it there would
        # only mislead a reader auditing scan costs.)
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options: str,
) -> None:
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", options.pop("header", "true"))
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    files_per_partition: int = 1,
) -> None:
    """Hive-style partitioned layout (``.../year=2015/month=10/``).

    Repartitioning on the partition columns first bounds output file
    count at ``partitions × files_per_partition`` — without it every
    task holds a writer per partition value and a 1000-task stage over
    1000 partition values emits up to a million small files.

    ``files_per_partition > 1`` adds a deterministic row-content salt
    to the shuffle key, splitting each partition VALUE across that many
    tasks/files — repartition(N, *keys) alone would still hash every
    row of one value to a single task (one straggler, one giant file),
    making the parameter a silent no-op."""
    from pyspark.sql import functions as F

    if files_per_partition < 1:
        raise ValueError(
            f"files_per_partition must be >= 1, got {files_per_partition}"
        )
    keys = [F.col(c) for c in partition_by]
    if files_per_partition == 1:
        shuffled = df.repartition(*keys)
    else:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        # explicit partition count: an un-numbered repartition is
        # advisory and AQE coalesces a small shuffle back to one task,
        # silently undoing the salt
        shuffled = df.repartition(
            df.sparkSession.sparkContext.defaultParallelism, *keys, salt
        )
    shuffled.write.format(fmt).mode(mode).partitionBy(*partition_by).save(path)


def total_bytes(spark: SparkSession, path: str) -> int:
    """Recursive byte size of ``path`` through the Hadoop FileSystem
    API — scheme-agnostic (file://, hdfs://, s3a://), driver-side
    metadata only."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite a fragmented parquet dataset as ``ceil(size/target)``
    right-sized files; returns the file count written.

    Streaming sinks and over-parallel writers fragment datasets into
    thousands of KB-scale files, and at 100 TB the scan's task-launch
    and footer-read overhead then dwarfs the I/O (the classic
    small-files failure).  Sizing from the actual on-disk byte count
    (one driver-side metadata call) rather than row counts keeps the
    math schema-independent.

    With ``sort_by``, rows are range-partitioned and sorted within
    files on those columns, so their parquet row-group min/max stats
    become disjoint — point/range predicates on the sort key then
    skip whole files (the poor man's z-order; one clustering key is
    the common case).  Without it, a plain ``repartition`` balances
    bytes evenly.

    ``dest`` must differ from ``src``: readers may hold ``src`` open,
    so the atomic swap (rename / catalog repoint) is the caller's
    transaction, not this function's.
    """
    if src.rstrip("/") == dest.rstrip("/"):
        raise ValueError("compact_parquet needs dest != src (swap is the caller's step)")
    if target_file_bytes <= 0:
        raise ValueError(f"target_file_bytes must be positive, got {target_file_bytes}")
    n_files = max(1, -(-total_bytes(spark, src) // target_file_bytes))
    df = spark.read.parquet(src)
    if sort_by:
        from pyspark.sql import functions as F

        keys = [F.col(c) for c in sort_by]
        df = df.repartitionByRange(n_files, *keys).sortWithinPartitions(*keys)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(dest)
    return n_files


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist a bucketed (and optionally sorted) table.

    Joins/aggregations keyed on ``bucket_by`` between tables bucketed
    the same way run shuffle-free — at 100 TB this turns the dominant
    cost of a fact-fact join into a bucket-local merge."""
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
