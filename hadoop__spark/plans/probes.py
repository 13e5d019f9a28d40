"""Driver probes for the analysis plane (SURVEY.md §2.9).

Lineage is not SQL-expressible, so these are rows-only probes: each
runs the analyzer on a fixed HiveQL-shaped script over the fixture
tables and returns the result as a DataFrame with a stable schema.
The golden-parity evidence lives in tests/test_lineage_golden.py
(the reference's seven tests, reference README.md:861-1218).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from hadoop__spark.queries import Probe
from hadoop__spark.session import register_views

#: A representative multi-statement script over the TPC-H-ish fixtures:
#: subquery + join + WHERE + expression columns (the testParseJoin /
#: sql25 shapes, reference README.md:934-967, 1126-1171).
_SCRIPT = (
    "select c.c_name, o.o_totalprice, concat(c.c_name,'-',c.c_mktsegment) as tag "
    "from customer c join orders o on c.c_custkey = o.o_custkey "
    "where o.o_totalprice > 1000.0;"
    "select r.r_name, sum_base from ("
    "select n_regionkey, count(n_nationkey) as sum_base from nation "
    "group by n_regionkey) t join region r on t.n_regionkey = r.r_regionkey"
)

_EDGE_SCHEMA = StructType(
    [
        StructField("script", StringType()),
        StructField("to_table", StringType()),
        StructField("to_name_parse", StringType()),
        StructField("from_names", ArrayType(StringType())),
        StructField("conditions", ArrayType(StringType())),
    ]
)

_TABLE_SCHEMA = StructType(
    [
        StructField("direction", StringType()),
        StructField("table_name", StringType()),
    ]
)


def _lineage_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edges for the base script (validated) AND the extended script
    (CTE + view + multi-insert), tagged by script — one probe covers
    both analysis surfaces (driver probe budget is bounded)."""
    from hadoop__spark.plans.lineage import LineageAnalyzer

    register_views(spark, sf_dir)
    rows = []
    for tag, script, validate, ext in (
        ("base", _SCRIPT, True, False),
        ("extended", _SCRIPT_EXTENDED, False, False),
        ("tags", _SCRIPT_TAGS, True, True),
    ):
        res = LineageAnalyzer(spark, extended_tags=ext).analyze(
            script, validate=validate
        )
        rows.extend(
            (
                tag,
                line.to_table,
                line.to_name_parse,
                sorted(line.from_names),
                sorted(line.conditions),
            )
            for line in res.col_lines
        )
    return spark.createDataFrame(rows, _EDGE_SCHEMA).orderBy(
        "script", "to_table", "to_name_parse"
    )


def _lineage_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop__spark.plans.lineage import LineageAnalyzer

    register_views(spark, sf_dir)
    res = LineageAnalyzer(spark).analyze(_SCRIPT)
    rows = [("input", t) for t in sorted(res.input_tables)] + [
        ("output", t) for t in sorted(res.output_tables)
    ]
    return spark.createDataFrame(rows, _TABLE_SCHEMA)


#: Extended-surface script: CTE, CREATE VIEW with view-resolved later
#: statement, and a Hive multi-insert — the beyond-reference analysis
#: features, in one script.
_SCRIPT_EXTENDED = (
    "use default;"
    "create view big_orders as "
    "select o_orderkey, o_custkey, o_totalprice from orders "
    "where o_totalprice > 100000.0;"
    "with cust as (select c_custkey, c_name from customer) "
    "select cust.c_name, b.o_totalprice "
    "from big_orders b join cust on b.o_custkey = cust.c_custkey;"
    "from lineitem "
    "insert overwrite table t_big select l_orderkey where l_quantity > 45 "
    "insert into table t_small select l_orderkey, l_quantity "
    "where l_quantity <= 2"
)


#: Extended-tags surface (beyond the reference): HAVING: always gets
#: its own tag; GROUPBY:/ORDERBY: capture under extended_tags=True.
_SCRIPT_TAGS = (
    "select o_custkey, count(*) as n_orders, sum(o_totalprice) as spend "
    "from orders where o_orderstatus = 'F' "
    "group by o_custkey having count(*) > 1 "
    "order by spend desc limit 100"
)


LINEAGE_PROBES: list[Probe] = [
    Probe(name="ln01_column_lineage", fn=_lineage_edges, oracle=None),
    Probe(name="ln02_inout_tables", fn=_lineage_tables, oracle=None),
]
