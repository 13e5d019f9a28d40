"""Local mirror of the driver's correctness gate.

For every probe that declares a DuckDB oracle: run the Spark query and
the oracle over the same parquet fixtures, sort columns by name, sort
rows, and require EXACT equality (bitwise for floats — the probes are
written to be bit-deterministic across engines; see queries.py).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from hadoop__spark.queries import probe_map
from tests.conftest import SF_DIR

PROBES = list(probe_map().values())


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False, name=None):
        canon_row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append("<null>")
            elif isinstance(v, float):
                canon_row.append(repr(v))
            else:
                canon_row.append(str(v))
        rows.append(tuple(canon_row))
    return sorted(rows)


ORACLE_PROBES = [p for p in PROBES if p.oracle is not None]


@pytest.mark.parametrize("probe", ORACLE_PROBES, ids=[p.name for p in ORACLE_PROBES])
def test_probe_matches_duckdb(spark, duck, probe):
    # pinned VALUES oracles were captured at the driver's gate SF —
    # run those probes at that SF (the driver always does); their
    # oracles read no tables, so the duck fixture's views are moot
    sf_dir = probe.pinned_sf_dir or SF_DIR
    spark_pdf = probe.run(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(probe.oracle).fetchdf()

    assert len(spark_pdf) == len(duck_pdf), (
        f"{probe.name}: row count {len(spark_pdf)} vs oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{probe.name}: columns {sorted(spark_pdf.columns)} "
        f"vs oracle {sorted(duck_pdf.columns)}"
    )
    s_rows, d_rows = _canon(spark_pdf), _canon(duck_pdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{probe.name}: {len(mismatches)} mismatched rows; "
        f"first: {mismatches[:3]}"
    )


def test_rows_only_probes_run(spark):
    """Probes without an oracle must at least execute and return a schema."""
    for p in PROBES:
        if p.oracle is None:
            df = p.run(spark, SF_DIR)
            assert df.columns, p.name
            df.limit(5).collect()
