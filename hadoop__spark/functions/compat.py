"""Reference→Spark function mapping and engine UDF registration.

``REFERENCE_FUNCTIONS`` is the parity contract: every function the
reference's blog post claims (reference README.md:1114-1122) or its
tests exercise (``nvl`` 942, ``to_date``/``date_sub`` 943-949,
``concat`` 981, ``hash`` 1137-1159), with the Spark SQL expression
that implements it and the DuckDB-oracle caveat where dialects
diverge.  tests/test_functions.py executes each row.

UDFs: the reference has no registration surface — unknown functions
pass through its renderer untouched.  The exec plane inherits Spark's:
``spark.udf.register`` for row UDFs, ``pandas_udf`` for the vectorized
path.  ``register_engine_udfs`` installs the engine's own helpers once
per session; everything in it is Arrow-batched, never row-at-a-time
Python (UDFs are the slow path — keep them out of hot loops).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


@dataclass(frozen=True)
class FunctionSpec:
    name: str  # as the reference knows it
    spark_sql: str  # executable Spark SQL expression exercising it
    duckdb_sql: str | None  # oracle equivalent; None = engine-specific
    ref_line: str  # citation into /root/reference/README.md


REFERENCE_FUNCTIONS: list[FunctionSpec] = [
    FunctionSpec(
        "concat",
        "concat('a','-','b')",
        "concat('a','-','b')",
        "README.md:982,1117",
    ),
    FunctionSpec(
        "nvl",
        "nvl(NULL, 'dflt')",
        "coalesce(NULL, 'dflt')",  # DuckDB has no nvl
        "README.md:942,1117",
    ),
    FunctionSpec(
        "to_date",
        "to_date('2015-10-01')",
        "CAST('2015-10-01' AS DATE)",
        "README.md:943,1121",
    ),
    FunctionSpec(
        "date_sub",
        "date_sub(to_date('2015-10-01'), 7)",
        # DuckDB date - interval yields TIMESTAMP; cast back for parity
        "CAST(CAST('2015-10-01' AS DATE) - INTERVAL 7 DAY AS DATE)",
        "README.md:943,1121",
    ),
    FunctionSpec(
        "hash",
        "hash('x')",
        None,  # murmur3, engine-specific by design (SURVEY.md F5)
        "README.md:1137,1159",
    ),
    FunctionSpec(
        "case_when",
        "CASE WHEN 2 > 1 THEN 'big' ELSE 'small' END",
        "CASE WHEN 2 > 1 THEN 'big' ELSE 'small' END",
        "README.md:1117,1139",
    ),
    FunctionSpec(
        "null_test",
        "NULL IS NOT NULL",
        "NULL IS NOT NULL",
        "README.md:1118,1140",
    ),
    FunctionSpec(
        "arith",
        "1 + 2 * 3 - 4 / 2",
        "1 + 2 * 3 - 4 / 2",
        "README.md:1117",
    ),
    FunctionSpec(
        "bool_ops",
        "(1 < 2 AND 2 <> 3) OR 3 >= 4",
        "(1 < 2 AND 2 <> 3) OR 3 >= 4",
        "README.md:1120",
    ),
    # -- beyond the reference: the common HiveQL scalar set a script
    # -- migrating to this engine would actually use
    FunctionSpec(
        "substr",
        "substr('hadoop', 2, 3)",
        "substr('hadoop', 2, 3)",
        "beyond-reference (common HiveQL)",
    ),
    FunctionSpec(
        "instr",
        "instr('hadoop', 'do')",
        "instr('hadoop', 'do')",
        "beyond-reference (common HiveQL)",
    ),
    FunctionSpec(
        "split_index",
        "split('a,b,c', ',')[1]",
        "string_split('a,b,c', ',')[2]",  # DuckDB lists are 1-indexed
        "beyond-reference (common HiveQL)",
    ),
    FunctionSpec(
        "regexp_extract",
        "regexp_extract('foo123bar', '([0-9]+)', 1)",
        "regexp_extract('foo123bar', '([0-9]+)', 1)",
        "beyond-reference (common HiveQL)",
    ),
    FunctionSpec(
        "lpad",
        "lpad('7', 3, '0')",
        "lpad('7', 3, '0')",
        "beyond-reference (common HiveQL)",
    ),
    FunctionSpec(
        "if_cond",
        "if(2 > 1, 'y', 'n')",
        "CASE WHEN 2 > 1 THEN 'y' ELSE 'n' END",  # DuckDB if() arity differs
        "beyond-reference (common HiveQL)",
    ),
    FunctionSpec(
        "from_unixtime",
        "from_unixtime(86400)",  # session is UTC
        "strftime(to_timestamp(86400), '%Y-%m-%d %H:%M:%S')",
        "beyond-reference (common HiveQL)",
    ),
    FunctionSpec(
        "datediff",
        "datediff('2020-01-10', '2020-01-01')",
        "date_diff('day', DATE '2020-01-01', DATE '2020-01-10')",
        "beyond-reference (common HiveQL)",
    ),
    FunctionSpec(
        "get_json_object",
        "get_json_object('{\"k\": 1}', '$.k')",
        "json_extract_string('{\"k\": 1}', '$.k')",
        "beyond-reference (common HiveQL)",
    ),
    FunctionSpec(
        "pmod",
        "pmod(-7, 3)",
        "((-7 % 3) + 3) % 3",  # DuckDB % keeps the dividend's sign
        "beyond-reference (common HiveQL)",
    ),
    FunctionSpec(
        "greatest_least",
        "greatest(1, 5, 3) + least(4, 2, 6)",
        "greatest(1, 5, 3) + least(4, 2, 6)",
        "beyond-reference (common HiveQL)",
    ),
    FunctionSpec(
        "round_floor_ceil",
        "round(2.567, 2) + floor(1.9) + ceil(0.1)",
        "round(2.567, 2) + floor(1.9) + ceil(0.1)",
        "beyond-reference (common HiveQL)",
    ),
    FunctionSpec(
        "agg_distinct",
        "(SELECT count(DISTINCT n_regionkey) FROM nation)",
        "(SELECT count(DISTINCT n_regionkey) FROM nation)",
        "README.md:1119",
    ),
]


def register_engine_udfs(spark: SparkSession) -> None:
    """Install the engine's session-level helper functions.

    All Arrow-batched (``pandas_udf``): the JVM ships columnar batches,
    pandas/numpy does the work vectorized — the only acceptable UDF
    shape in a hot path (10-100x over row-at-a-time Python UDFs).
    """

    @pandas_udf("double")
    def token_set_sim(a: pd.Series, b: pd.Series) -> pd.Series:
        # token-set JACCARD similarity (dedup helper where n-gram
        # Jaccard is too strict).  Honest cost note: Arrow ships the
        # batch columnar, but the set intersection/union is per-row
        # Python — fine for this helper's ad-hoc SQL surface, NOT a
        # hot-path kernel (the hot dedup planes use the JVM-side
        # shingle pipeline in operators/dedup.py instead).
        sa = a.fillna("").str.lower().str.split().apply(set)
        sb = b.fillna("").str.lower().str.split().apply(set)
        inter = pd.Series(
            [len(x & y) for x, y in zip(sa, sb)], index=a.index, dtype="float64"
        )
        union = pd.Series(
            [len(x | y) or 1 for x, y in zip(sa, sb)], index=a.index, dtype="float64"
        )
        return inter / union

    spark.udf.register("token_set_sim", token_set_sim)
