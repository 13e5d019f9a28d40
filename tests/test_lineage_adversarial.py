"""Negative-surface lineage tests: adversarial HiveQL that must
degrade GRACEFULLY, never crash the analyzer.

The reference's operational value was robustness on unknown input —
``LineParser`` treats any unrecognized function token as an opaque
expression and keeps walking (reference README.md:471-487).  These
tests pin the analyzer's behavior on inputs outside the seven goldens:
unknown multi-argument functions in filters, nested CASE inside a
subscript, UNION branches with mismatched arity, deep subquery
nesting, raw syntax errors, and validation failures — so a future
refactor that starts throwing on any of them fails loudly here."""

from __future__ import annotations

import pytest
from pyspark.errors import ParseException

from hadoop__spark.plans import LineageAnalyzer, LineageError
from hadoop__spark.plans.lineage import DictMetastore


@pytest.fixture()
def analyzer(spark):
    ms = DictMetastore(
        {
            "db.src": ["a", "b", "m", "k"],
            "db.dest": ["x"],
            "db.t2": ["c", "d"],
        }
    )
    return LineageAnalyzer(spark, ms)


def test_unknown_function_with_args_in_where(analyzer):
    """An unregistered 3-arg UDF in a WHERE must not break analysis:
    the predicate lands as an opaque WHERE: tag with every column
    reference qualified, and column lineage is unaffected."""
    res = analyzer.analyze(
        "use db;insert into table dest select a from src "
        "where my_udf(a, b, 3) > 0"
    )
    assert res.input_tables == {"db.src"}
    assert res.output_tables == {"db.dest"}
    (line,) = res.col_lines
    assert line.from_names == ("db.src.a",)
    assert set(line.conditions) == {
        "WHERE:my_udf(db.src.a,db.src.b,3) > 0"
    }
    assert line.to_name == "db.dest.x"


def test_unknown_function_in_select_collects_all_args(analyzer):
    """An unknown function in the projection contributes ALL its column
    arguments as sources and tags the expression COLFUN: — the
    pass-through contract (reference README.md:471-487)."""
    res = analyzer.analyze(
        "use db;insert into table dest select some_udf(a, b, k) from src"
    )
    (line,) = res.col_lines
    assert sorted(line.from_names) == ["db.src.a", "db.src.b", "db.src.k"]
    assert set(line.conditions) == {
        "COLFUN:some_udf(db.src.a,db.src.b,db.src.k)"
    }


def test_nested_case_inside_subscript(analyzer):
    """A CASE WHEN (with a nested function call) used as a map
    subscript key parses and renders as one COLFUN tag; the lineage
    source is the subscripted map column."""
    res = analyzer.analyze(
        "use db;insert into table dest select "
        "m[case when k=1 then concat('x','y') else 'z' end] from src"
    )
    (line,) = res.col_lines
    assert line.from_names == ("db.src.m",)
    assert set(line.conditions) == {
        "COLFUN:db.src.m[case when db.src.k = 1 "
        "then concat('x','y') else 'z' end]"
    }
    assert line.to_name == "db.dest.x"


def test_union_mismatched_arity_degrades(analyzer):
    """UNION branches of different arity: Spark's parser accepts the
    statement (resolution would fail later), and the analyzer keeps
    going — matched positions merge sources across branches, the
    orphaned column keeps its lineage with NO sink assignment
    (to_name None), and validate=True does not turn this into an
    error (validation checks tables, not arity)."""
    sql = (
        "use db;insert into table dest "
        "select a, b from src union all select c from t2"
    )
    for validate in (False, True):
        res = analyzer.analyze(sql, validate=validate)
        assert res.input_tables == {"db.src", "db.t2"}
        lines = {l.to_name_parse: l for l in res.col_lines}
        assert set(lines) == {"a", "b"}
        assert sorted(lines["a"].from_names) == ["db.src.a", "db.t2.c"]
        assert lines["a"].to_name == "db.dest.x"
        assert lines["b"].from_names == ("db.src.b",)
        assert lines["b"].to_name is None


def test_deep_nesting_accumulates_all_filters(analyzer):
    """Three levels of FROM-subquery nesting: lineage tunnels through
    every level and each level's WHERE lands as its own tag."""
    res = analyzer.analyze(
        "use db;insert into table dest select a from "
        "(select a from (select a, b from src where b > 1) x "
        "where a < 5) y"
    )
    (line,) = res.col_lines
    assert line.from_names == ("db.src.a",)
    assert set(line.conditions) == {
        "WHERE:db.src.b > 1",
        "WHERE:db.src.a < 5",
    }


def test_syntax_error_raises_parse_exception(analyzer):
    """Garbage SQL surfaces Spark's ParseException unchanged (a typed,
    diagnosable failure — not a LineageError and not silence)."""
    with pytest.raises(ParseException):
        analyzer.analyze("use db;insert into table dest selct a frm src")


def test_validate_flags_unknown_table(analyzer):
    """validate=True is the LineValidater equivalent: an input table
    absent from the metastore is a LineageError naming the table."""
    with pytest.raises(LineageError, match="db.no_such_table"):
        analyzer.analyze(
            "use db;insert into table dest select a from no_such_table",
            validate=True,
        )
    # the same statement without validation degrades gracefully
    res = analyzer.analyze(
        "use db;insert into table dest select a from no_such_table"
    )
    assert res.input_tables == {"db.no_such_table"}
