"""Driver probes for the analysis plane (SURVEY.md §2.9).

Each probe runs the analyzer on a fixed HiveQL-shaped script over the
fixture views and returns a flat all-string DataFrame. Lineage is not
computed *by* SQL, but because the probe scripts are fixed the expected
output IS static — so each probe carries a DuckDB ``VALUES`` oracle
and gets a full hash-checked driver row rather than a rows-only one.
The golden-parity evidence lives in tests/test_lineage_golden.py
(the reference's seven tests, reference README.md:861-1218); the probe
expectations themselves are pinned in tests/test_lineage_probes.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

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

#: All columns are flat strings: the driver's canonicalizer hashes
#: pandas values and cannot handle ARRAY columns (unhashable lists),
#: so multi-valued fields are serialized — `,` joins source columns
#: and `;` joins condition strings, matching the reference's own
#: string encoding of multi-sources (reference README.md:231, 1002).
_EDGE_SCHEMA = StructType(
    [
        StructField("script", StringType()),
        StructField("to_table", StringType()),
        StructField("to_name_parse", StringType()),
        StructField("from_names", StringType()),
        StructField("conditions", StringType()),
    ]
)

_TABLE_SCHEMA = StructType(
    [
        StructField("script", StringType()),
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
                ",".join(sorted(line.from_names)),
                ";".join(sorted(line.conditions)),
            )
            for line in res.col_lines
        )
    return spark.createDataFrame(rows, _EDGE_SCHEMA).orderBy(
        "script", "to_table", "to_name_parse", "from_names"
    )


def _lineage_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input/output table extraction (reference README.md:115-116,
    134-139) over the base script (inputs only — bare SELECTs) and
    the extended script (CREATE VIEW + multi-insert sinks, so the
    output direction is exercised too)."""
    from hadoop__spark.plans.lineage import LineageAnalyzer

    register_views(spark, sf_dir)
    rows = []
    for tag, script, validate in (
        ("base", _SCRIPT, True),
        ("extended", _SCRIPT_EXTENDED, False),
    ):
        res = LineageAnalyzer(spark).analyze(script, validate=validate)
        rows.extend(
            [(tag, "input", t) for t in sorted(res.input_tables)]
            + [(tag, "output", t) for t in sorted(res.output_tables)]
        )
    return spark.createDataFrame(rows, _TABLE_SCHEMA).orderBy(
        "script", "direction", "table_name"
    )


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


#: The probe scripts are fixed, so the expected edge/table sets are
#: static — emitted as DuckDB ``VALUES`` oracles, which upgrades the
#: analysis plane from rows-only to hash-checked driver rows. The
#: same expectations are pinned in tests/test_lineage_probes.py so a
#: drift is caught in-repo before the driver sees it. Derivation of
#: the expectation style: the reference's golden tests, reference
#: README.md:867-895, 1126-1171.
_EDGE_ROWS: list[tuple[str, str, str, str, str]] = [
    (
        "base",
        "TOK_TMP_FILE",
        "c_name",
        "default.customer.c_name",
        "JOIN:default.customer.c_custkey = default.orders.o_custkey;"
        "WHERE:default.orders.o_totalprice > 1000.0",
    ),
    (
        "base",
        "TOK_TMP_FILE",
        "o_totalprice",
        "default.orders.o_totalprice",
        "JOIN:default.customer.c_custkey = default.orders.o_custkey;"
        "WHERE:default.orders.o_totalprice > 1000.0",
    ),
    (
        "base",
        "TOK_TMP_FILE",
        "r_name",
        "default.region.r_name",
        "JOIN:default.nation.n_regionkey = default.region.r_regionkey",
    ),
    (
        "base",
        "TOK_TMP_FILE",
        "sum_base",
        "default.nation.sum_base",
        "JOIN:default.nation.n_regionkey = default.region.r_regionkey",
    ),
    (
        "base",
        "TOK_TMP_FILE",
        "tag",
        "default.customer.c_mktsegment,default.customer.c_name",
        "COLFUN:concat(default.customer.c_name,'-',default.customer.c_mktsegment);"
        "JOIN:default.customer.c_custkey = default.orders.o_custkey;"
        "WHERE:default.orders.o_totalprice > 1000.0",
    ),
    (
        "extended",
        "TOK_TMP_FILE",
        "c_name",
        "default.customer.c_name",
        "JOIN:default.orders.o_custkey = default.customer.c_custkey",
    ),
    (
        "extended",
        "TOK_TMP_FILE",
        "o_totalprice",
        "default.orders.o_totalprice",
        "JOIN:default.orders.o_custkey = default.customer.c_custkey",
    ),
    (
        "extended",
        "default.big_orders",
        "o_custkey",
        "default.orders.o_custkey",
        "WHERE:default.orders.o_totalprice > 100000.0",
    ),
    (
        "extended",
        "default.big_orders",
        "o_orderkey",
        "default.orders.o_orderkey",
        "WHERE:default.orders.o_totalprice > 100000.0",
    ),
    (
        "extended",
        "default.big_orders",
        "o_totalprice",
        "default.orders.o_totalprice",
        "WHERE:default.orders.o_totalprice > 100000.0",
    ),
    (
        "extended",
        "default.t_big",
        "l_orderkey",
        "default.lineitem.l_orderkey",
        "WHERE:default.lineitem.l_quantity > 45",
    ),
    (
        "extended",
        "default.t_small",
        "l_orderkey",
        "default.lineitem.l_orderkey",
        "WHERE:default.lineitem.l_quantity <= 2",
    ),
    (
        "extended",
        "default.t_small",
        "l_quantity",
        "default.lineitem.l_quantity",
        "WHERE:default.lineitem.l_quantity <= 2",
    ),
    (
        "tags",
        "TOK_TMP_FILE",
        "n_orders",
        "",
        "COLFUN:count(*);GROUPBY:default.orders.o_custkey;"
        "HAVING:count(*) > 1;ORDERBY:default.orders.spend;"
        "WHERE:default.orders.o_orderstatus = 'F'",
    ),
    (
        "tags",
        "TOK_TMP_FILE",
        "o_custkey",
        "default.orders.o_custkey",
        "GROUPBY:default.orders.o_custkey;HAVING:count(*) > 1;"
        "ORDERBY:default.orders.spend;"
        "WHERE:default.orders.o_orderstatus = 'F'",
    ),
    (
        "tags",
        "TOK_TMP_FILE",
        "spend",
        "default.orders.o_totalprice",
        "COLFUN:sum(default.orders.o_totalprice);"
        "GROUPBY:default.orders.o_custkey;HAVING:count(*) > 1;"
        "ORDERBY:default.orders.spend;"
        "WHERE:default.orders.o_orderstatus = 'F'",
    ),
]

_TABLE_ROWS: list[tuple[str, str, str]] = [
    ("base", "input", "default.customer"),
    ("base", "input", "default.nation"),
    ("base", "input", "default.orders"),
    ("base", "input", "default.region"),
    ("extended", "input", "default.customer"),
    ("extended", "input", "default.lineitem"),
    ("extended", "input", "default.orders"),
    ("extended", "output", "default.big_orders"),
    ("extended", "output", "default.t_big"),
    ("extended", "output", "default.t_small"),
]


def _sql_str(value: str) -> str:
    return "'" + value.replace("'", "''") + "'"


def _values_oracle(
    rows: list[tuple[str, ...]], columns: list[str], order_by: list[str]
) -> str:
    values = ",\n".join(
        "(" + ", ".join(_sql_str(v) for v in row) + ")" for row in rows
    )
    return (
        "SELECT * FROM (VALUES\n{values}\n) AS t({cols}) ORDER BY {order}".format(
            values=values,
            cols=", ".join(columns),
            order=", ".join(order_by),
        )
    )


_EDGE_ORACLE = _values_oracle(
    _EDGE_ROWS,
    ["script", "to_table", "to_name_parse", "from_names", "conditions"],
    ["script", "to_table", "to_name_parse", "from_names"],
)

_TABLE_ORACLE = _values_oracle(
    _TABLE_ROWS,
    ["script", "direction", "table_name"],
    ["script", "direction", "table_name"],
)


LINEAGE_PROBES: list[Probe] = [
    Probe(name="ln01_column_lineage", fn=_lineage_edges, oracle=_EDGE_ORACLE),
    Probe(name="ln02_inout_tables", fn=_lineage_tables, oracle=_TABLE_ORACLE),
]
