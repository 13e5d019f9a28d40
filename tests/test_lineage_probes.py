"""Pin the analysis-plane probe contract.

Round 2's only red driver row was ln01: the probe returned
ARRAY<STRING> columns and the driver's pandas canonicalizer crashed on
unhashable lists. These tests pin the fix: every lineage probe emits a
FLAT all-string schema, and the exact row sets match the static
expectations that the DuckDB ``VALUES`` oracles are generated from
(so probe, oracle, and engine cannot drift apart silently).
Spark-vs-oracle equality itself is covered by test_oracle_parity.
"""

from __future__ import annotations

from pyspark.sql.types import StringType

from hadoop__spark.plans.probes import (
    _EDGE_ROWS,
    _TABLE_ROWS,
    _lineage_edges,
    _lineage_tables,
)
from tests.conftest import SF_DIR


def test_lineage_probe_schemas_are_flat_strings(spark):
    """Driver canonicalizer compat: no ARRAY/MAP/STRUCT columns."""
    for fn in (_lineage_edges, _lineage_tables):
        df = fn(spark, SF_DIR)
        for field in df.schema.fields:
            assert isinstance(field.dataType, StringType), (
                f"{fn.__name__}.{field.name} is {field.dataType}; the "
                "driver cannot hash non-scalar values"
            )


def test_column_lineage_probe_rows(spark):
    got = [tuple(r) for r in _lineage_edges(spark, SF_DIR).collect()]
    assert got == _EDGE_ROWS


def test_inout_tables_probe_rows(spark):
    got = [tuple(r) for r in _lineage_tables(spark, SF_DIR).collect()]
    assert got == _TABLE_ROWS
