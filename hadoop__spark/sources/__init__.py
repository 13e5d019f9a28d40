"""Source/sink surface (SURVEY.md §2.1).

The reference has no format or connector code at all — tables are
opaque Hive-metastore names (reference README.md, §S12 negative) and
ingestion is just ``LOAD``/``INSERT`` statement kinds.  A complete
engine needs a real read/write surface, so this package provides the
idiomatic Spark one: format readers with schema/pushdown discipline,
partitioned + bucketed writers, and table sinks.
"""

from hadoop__spark.sources.io import (
    compact_parquet,
    read_table,
    total_bytes,
    write_bucketed_table,
    write_partitioned,
    write_table,
)

__all__ = [
    "compact_parquet",
    "read_table",
    "total_bytes",
    "write_bucketed_table",
    "write_partitioned",
    "write_table",
]
