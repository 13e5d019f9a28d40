"""Execute every row of the scalar-function parity contract against
both engines (SURVEY.md §2.7 / reference README.md:1114-1122)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop__spark.functions import REFERENCE_FUNCTIONS, register_engine_udfs
from hadoop__spark.session import register_views
from tests.conftest import SF_DIR


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    register_views(spark, SF_DIR)


@pytest.mark.parametrize(
    "spec", REFERENCE_FUNCTIONS, ids=[s.name for s in REFERENCE_FUNCTIONS]
)
def test_function_parity(spark, duck, spec):
    got = spark.sql(f"SELECT {spec.spark_sql} AS v").collect()[0].v
    assert got is not None or spec.name == "null_test"
    if spec.duckdb_sql is None:
        # engine-specific (hash): determinism within Spark is the contract
        again = spark.sql(f"SELECT {spec.spark_sql} AS v").collect()[0].v
        assert got == again
        return
    want = duck.execute(f"SELECT {spec.duckdb_sql} AS v").fetchone()[0]
    assert str(got) == str(want), f"{spec.name}: {got!r} != {want!r}"


def test_registered_pandas_udf(spark):
    register_engine_udfs(spark)
    df = spark.createDataFrame(
        [("the quick fox", "the quick dog"), ("a b", "a b")], ["x", "y"]
    )
    rows = df.select(F.expr("token_set_sim(x, y)").alias("s")).collect()
    assert rows[0].s == pytest.approx(2 / 4)
    assert rows[1].s == pytest.approx(1.0)


def test_unknown_function_lineage_passthrough(spark):
    """The reference's UDF surface: lineage must not break on unknown
    functions (reference README.md:471-487)."""
    from hadoop__spark.plans import LineageAnalyzer
    from hadoop__spark.plans.lineage import DictMetastore

    res = LineageAnalyzer(spark, DictMetastore({})).analyze(
        "select my_mystery_udf(a, 42) as z from t"
    )
    line = res.col_lines[0]
    assert line.from_names == ("default.t.a",)
    assert "COLFUN:my_mystery_udf(default.t.a,42)" in line.conditions
