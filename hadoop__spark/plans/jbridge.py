"""Convert a Spark *parsed* (unresolved) logical plan into Python nodes.

One py4j pass per statement; everything downstream (resolution,
rendering, lineage) is pure Python.  Each expression node carries the
exact source-text slice from Catalyst's ``Origin`` (startIndex /
stopIndex into the statement), which is what lets the renderer
reproduce literals exactly as written (``"Category159"`` keeps its
double quotes, ``'$V_PARYMD'`` its single quotes — the reference
emits raw token text, reference README.md:523-526).

This is the only JVM boundary of the analysis plane; like the
reference's ``ParseDriver.parse`` (README.md:747-750) it never touches
executors.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession


@dataclass
class Node:
    """A parsed plan/expression node, detached from the JVM."""

    cls: str
    fields: dict[str, Any] = field(default_factory=dict)
    children: list["Node"] = field(default_factory=list)
    src: str | None = None  # exact source slice, expressions only

    def __getitem__(self, key: str) -> Any:
        return self.fields[key]

    def get(self, key: str, default: Any = None) -> Any:
        return self.fields.get(key, default)


def _seq(jseq) -> list:
    return [jseq.apply(i) for i in range(jseq.size())]


def _opt(jopt):
    return jopt.get() if jopt.isDefined() else None


def _name(jobj) -> str:
    return jobj.getClass().getSimpleName()


def _src_of(jnode, sql: str) -> str | None:
    try:
        o = jnode.origin()
        start, stop = _opt(o.startIndex()), _opt(o.stopIndex())
        if start is None or stop is None:
            return None
        return sql[start : stop + 1]
    except Exception:
        return None


#: Plan wrappers that contribute nothing to lineage — unwrapped in place
#: (the reference likewise has no ORDER BY / LIMIT handling,
#: reference README.md §2.8).  Sort is NOT here: it converts to a node
#: so the analyzer's extended-tags mode can emit ``ORDERBY:`` (default
#: mode ignores it, matching the reference).
_PASS_THROUGH = {
    "GlobalLimit",
    "LocalLimit",
    "Offset",
    "Distinct",
    "UnresolvedHint",
    "WithWindowDefinition",
    # DISTRIBUTE BY / CLUSTER BY: physical placement only, no lineage
    "RepartitionByExpression",
    "Repartition",
}

_DDL_TARGET_CLASSES = {
    "UnresolvedIdentifier": "nameParts",
    "UnresolvedTable": "multipartIdentifier",
    "UnresolvedTableOrView": "multipartIdentifier",
    "UnresolvedNamespace": "multipartIdentifier",
    "UnresolvedRelation": "multipartIdentifier",
}


def _ddl_target(jplan) -> list[str] | None:
    """Find the multi-part name of a DDL statement's target table by
    scanning direct children for the Unresolved* placeholder node."""
    for ch in _seq(jplan.children()):
        cname = _name(ch)
        meth = _DDL_TARGET_CLASSES.get(cname)
        if meth:
            return [str(p) for p in _seq(getattr(ch, meth)())]
    return None


def convert_plan(jplan, sql: str) -> Node:
    cls = _name(jplan)

    if cls in _PASS_THROUGH:
        return convert_plan(jplan.children().apply(0), sql)

    if cls == "UnresolvedRelation":
        parts = [str(p) for p in _seq(jplan.multipartIdentifier())]
        return Node("UnresolvedRelation", {"parts": parts})
    if cls == "SubqueryAlias":
        return Node(
            "SubqueryAlias",
            {"alias": str(jplan.alias())},
            [convert_plan(jplan.child(), sql)],
        )
    if cls == "Project":
        plist = [convert_expr(e, sql) for e in _seq(jplan.projectList())]
        return Node("Project", {"exprs": plist}, [convert_plan(jplan.child(), sql)])
    if cls == "Aggregate":
        aggs = [convert_expr(e, sql) for e in _seq(jplan.aggregateExpressions())]
        keys = [convert_expr(e, sql) for e in _seq(jplan.groupingExpressions())]
        return Node(
            "Aggregate",
            {"exprs": aggs, "keys": keys},
            [convert_plan(jplan.child(), sql)],
        )
    if cls == "Filter":
        return Node(
            "Filter",
            {"cond": convert_expr(jplan.condition(), sql)},
            [convert_plan(jplan.child(), sql)],
        )
    if cls == "UnresolvedHaving":
        # Distinct node so the analyzer can tag HAVING: (the reference
        # predates HAVING and had only WHERE:/JOIN tags).
        return Node(
            "Having",
            {"cond": convert_expr(jplan.havingCondition(), sql)},
            [convert_plan(jplan.child(), sql)],
        )
    if cls == "Sort":
        keys = [convert_expr(so.child(), sql) for so in _seq(jplan.order())]
        return Node("Sort", {"keys": keys}, [convert_plan(jplan.child(), sql)])
    if cls == "Join":
        jcond = _opt(jplan.condition())
        # USING/NATURAL joins carry their keys in the join TYPE
        # (UsingJoin(tpe, cols) / NaturalJoin(tpe)), with condition()
        # undefined — unwrap to the inner type for the label and keep
        # the keys so the analyzer can emit the join-condition tag.
        jtype = jplan.joinType()
        using: list[str] | None = None
        natural = False
        jt_cls = _name(jtype)
        if jt_cls == "UsingJoin":
            using = [str(c) for c in _seq(jtype.usingColumns())]
            jtype = jtype.tpe()
        elif jt_cls == "NaturalJoin":
            natural = True
            jtype = jtype.tpe()
        # Inner→JOIN, FullOuter→FULLOUTERJOIN … — the reference labels
        # joins by stripping TOK_ from the Hive token (README.md:276).
        label = str(jtype.sql()).replace(" ", "")
        if label in ("INNER", "CROSS"):
            label = "JOIN"
        elif not label.endswith("JOIN"):
            label += "JOIN"
        return Node(
            "Join",
            {
                "label": label,
                "cond": convert_expr(jcond, sql) if jcond is not None else None,
                "using": using,
                "natural": natural,
            },
            [convert_plan(jplan.left(), sql), convert_plan(jplan.right(), sql)],
        )
    if cls == "Union":
        return Node(
            "Union", {}, [convert_plan(c, sql) for c in _seq(jplan.children())]
        )
    if cls == "UnresolvedWith":
        # WITH ctes (beyond the reference — it predates CTEs): each
        # (name, SubqueryAlias(query)) pair plus the main query child
        ctes = [
            (str(t._1()), convert_plan(t._2().child(), sql))
            for t in _seq(jplan.cteRelations())
        ]
        return Node("With", {"ctes": ctes}, [convert_plan(jplan.child(), sql)])
    if cls == "InsertIntoStatement":
        table = convert_plan(jplan.table(), sql)
        ucols = jplan.userSpecifiedCols()
        return Node(
            "InsertIntoStatement",
            {
                "table_parts": table["parts"],
                "overwrite": bool(jplan.overwrite()),
                # lowercase like every other identifier path: a
                # consumer joining edges on to_name case-sensitively
                # must not see default.sink.C2 beside default.sink.c2
                "cols": [
                    str(ucols.apply(i)).lower()
                    for i in range(ucols.size())
                ],
            },
            [convert_plan(jplan.query(), sql)],
        )
    if cls in ("UpdateTable", "DeleteFromTable"):
        # condition() is Option[Expression] on UpdateTable but a plain
        # Expression on DeleteFromTable — normalize both.
        cond = jplan.condition()
        try:
            cond = _opt(cond)
        except Exception:
            pass
        fields = {
            "cond": convert_expr(cond, sql) if cond is not None else None
        }
        if cls == "UpdateTable":
            fields["assignments"] = [
                (convert_expr(a.key(), sql), convert_expr(a.value(), sql))
                for a in _seq(jplan.assignments())
            ]
        return Node(cls, fields, [convert_plan(jplan.table(), sql)])
    if cls == "MergeIntoTable":
        # MERGE INTO (beyond the reference): target + source relations,
        # the ON condition, and per-action SET/INSERT assignments.
        def _assignments(action) -> list[tuple[Node, Node]]:
            try:
                return [
                    (convert_expr(a.key(), sql), convert_expr(a.value(), sql))
                    for a in _seq(action.assignments())
                ]
            except Exception:
                return []  # DeleteAction / star actions carry none

        actions = []
        for seq in (
            jplan.matchedActions(),
            jplan.notMatchedActions(),
            jplan.notMatchedBySourceActions(),
        ):
            for a in _seq(seq):
                actions.append(
                    {"kind": _name(a), "assignments": _assignments(a)}
                )
        return Node(
            "MergeIntoTable",
            {
                "cond": convert_expr(jplan.mergeCondition(), sql),
                "actions": actions,
            },
            [
                convert_plan(jplan.targetTable(), sql),
                convert_plan(jplan.sourceTable(), sql),
            ],
        )
    if cls == "ScriptTransformation":
        # Hive TRANSFORM ... USING 'script' (beyond the reference): an
        # opaque row transform — every output column derives from every
        # input expression of the child projection.
        return Node(
            "ScriptTransformation",
            {
                "script": str(jplan.script()),
                "out_names": [
                    str(a.name()).lower() for a in _seq(jplan.output())
                ],
            },
            [convert_plan(jplan.child(), sql)],
        )
    if cls == "Generate":
        # LATERAL VIEW (beyond the reference): generator output columns
        # carry the generator expression's sources.
        alias = _opt(jplan.qualifier())
        outs = [convert_expr(a, sql) for a in _seq(jplan.generatorOutput())]
        out_names = [
            o["parts"][-1].lower() for o in outs if o.cls == "Attr"
        ]
        return Node(
            "Generate",
            {
                "alias": str(alias) if alias is not None else None,
                "out_names": out_names,
                "gen": convert_expr(jplan.generator(), sql),
            },
            [convert_plan(jplan.child(), sql)],
        )
    if cls == "CreateTableLikeCommand":
        def _ti_parts(ti) -> list[str]:
            db = _opt(ti.database())
            return ([str(db)] if db is not None else []) + [str(ti.table())]

        return Node(
            "CreateTableLike",
            {
                "table_parts": _ti_parts(jplan.targetTable()),
                "source_parts": _ti_parts(jplan.sourceTable()),
            },
        )
    if cls == "InsertIntoDir":
        # INSERT OVERWRITE [LOCAL] DIRECTORY '/path' — the reference's
        # TOK_DIR destination (README.md:211-225); the path is the sink.
        try:
            uri = _opt(jplan.storage().locationUri())
            path = str(uri) if uri is not None else None
        except Exception:
            path = None
        return Node(
            "InsertIntoDir",
            {"path": path},
            [convert_plan(jplan.child(), sql)],
        )
    if cls == "SetCatalogAndNamespace":
        return Node("Use", {"parts": _ddl_target(jplan) or []})
    if cls in ("CreateTableAsSelect", "ReplaceTableAsSelect"):
        name = jplan.name()
        parts = [str(p) for p in _seq(name.nameParts())]
        return Node(
            "CreateTableAsSelect",
            {"table_parts": parts},
            [convert_plan(jplan.query(), sql)],
        )
    if cls == "DropTable":
        return Node("DropTable", {"table_parts": _ddl_target(jplan)})
    if cls == "TruncateTable":
        return Node("TruncateTable", {"table_parts": _ddl_target(jplan)})
    if cls == "LoadData":
        return Node("LoadData", {"table_parts": _ddl_target(jplan)})
    if cls == "RenameTable":
        return Node(
            "AlterTable",
            {
                "table_parts": _ddl_target(jplan),
                "new_parts": [str(p) for p in _seq(jplan.newName())],
            },
        )
    if cls.startswith(("Alter", "AddColumns", "ReplaceColumns", "RenameColumn",
                       "DropColumns", "SetTableProperties", "AddPartitions",
                       "DropPartitions", "RenamePartitions")):
        return Node("AlterTable", {"table_parts": _ddl_target(jplan)})
    if cls in ("CreateTable", "CreateTableStatement"):
        return Node("CreateTable", {"table_parts": _ddl_target(jplan)})
    if cls == "CreateView":
        return Node(
            "CreateView",
            {"table_parts": _ddl_target(jplan)},
            [convert_plan(jplan.children().apply(1), sql)],
        )
    if cls == "CreateViewCommand":  # CREATE [OR REPLACE] TEMP VIEW
        ti = jplan.name()
        db = _opt(ti.database())
        parts = ([str(db)] if db else []) + [str(ti.table())]
        return Node(
            "CreateView",
            {"table_parts": parts, "temp": True},
            [convert_plan(jplan.plan(), sql)],
        )

    # Unknown plan node: keep class name + children so the walker can
    # recurse (robustness over the full Spark SQL surface).
    children = [convert_plan(c, sql) for c in _seq(jplan.children())]
    return Node(cls, {}, children)


_BINARY_OPS = {
    "EqualTo": "=",
    "EqualNullSafe": "<=>",
    "GreaterThan": ">",
    "GreaterThanOrEqual": ">=",
    "LessThan": "<",
    "LessThanOrEqual": "<=",
    "Add": "+",
    "Subtract": "-",
    "Multiply": "*",
    "Divide": "/",
    "Remainder": "%",
    "BitwiseAnd": "&",
    "BitwiseOr": "|",
    "BitwiseXor": "^",
}


def convert_expr(jexpr, sql: str) -> Node:
    cls = _name(jexpr)
    src = _src_of(jexpr, sql)

    if cls == "UnresolvedAttribute":
        parts = [str(p) for p in _seq(jexpr.nameParts())]
        return Node("Attr", {"parts": parts}, src=src)
    if cls == "UnresolvedStar":
        target = _opt(jexpr.target())
        parts = [str(p) for p in _seq(target)] if target is not None else None
        return Node("Star", {"parts": parts}, src=src)
    if cls == "Alias":
        return Node(
            "Alias",
            {"name": str(jexpr.name())},
            [convert_expr(jexpr.child(), sql)],
            src=src,
        )
    if cls == "UnresolvedAlias":
        return Node("UnresolvedAlias", {}, [convert_expr(jexpr.child(), sql)], src=src)
    if cls == "Literal":
        try:
            value = jexpr.value()
            text = None if value is None else str(value)
        except Exception:
            text = None
        return Node("Literal", {"value": text}, src=src)
    if cls == "UnresolvedFunction":
        fname = ".".join(str(p) for p in _seq(jexpr.nameParts()))
        args = [convert_expr(a, sql) for a in _seq(jexpr.arguments())]
        return Node(
            "Function",
            {"name": fname, "distinct": bool(jexpr.isDistinct())},
            args,
            src=src,
        )
    if cls in ("And", "Or"):
        return Node(
            cls,
            {},
            [convert_expr(jexpr.left(), sql), convert_expr(jexpr.right(), sql)],
            src=src,
        )
    if cls in _BINARY_OPS:
        return Node(
            "BinOp",
            {"op": _BINARY_OPS[cls]},
            [convert_expr(jexpr.left(), sql), convert_expr(jexpr.right(), sql)],
            src=src,
        )
    if cls == "Not":
        return Node("Not", {}, [convert_expr(jexpr.child(), sql)], src=src)
    if cls in ("UnaryMinus", "UnaryPositive"):
        sign = "-" if cls == "UnaryMinus" else "+"
        return Node("Unary", {"op": sign}, [convert_expr(jexpr.child(), sql)], src=src)
    if cls == "BitwiseNot":
        return Node("Unary", {"op": "~"}, [convert_expr(jexpr.child(), sql)], src=src)
    if cls == "In":
        return Node(
            "In",
            {},
            [convert_expr(jexpr.value(), sql)]
            + [convert_expr(e, sql) for e in _seq(jexpr.list())],
            src=src,
        )
    if cls in ("Like", "RLike", "ILike"):
        kw = {"Like": "like", "RLike": "rlike", "ILike": "ilike"}[cls]
        return Node(
            "LikeOp",
            {"kw": kw},
            [convert_expr(jexpr.left(), sql), convert_expr(jexpr.right(), sql)],
            src=src,
        )
    if cls in ("IsNull", "IsNotNull"):
        kw = "isnull" if cls == "IsNull" else "isnotnull"
        return Node("NullTest", {"kw": kw}, [convert_expr(jexpr.child(), sql)], src=src)
    if cls == "CaseWhen":
        branches = []
        for t in _seq(jexpr.branches()):
            branches.append(
                (convert_expr(t._1(), sql), convert_expr(t._2(), sql))
            )
        els = _opt(jexpr.elseValue())
        return Node(
            "CaseWhen",
            {
                "branches": branches,
                "else": convert_expr(els, sql) if els is not None else None,
            },
            src=src,
        )
    if cls == "UnresolvedExtractValue":
        return Node(
            "Subscript",
            {},
            [convert_expr(jexpr.child(), sql), convert_expr(jexpr.extraction(), sql)],
            src=src,
        )

    if cls in ("ScalarSubquery", "Exists", "ListQuery", "LateralSubquery"):
        # expression-level subquery: keep the inner plan so the walker
        # can register its input tables (beyond the reference's Q3).
        # The EXPRESSION origin is unreliable here — Exists spans
        # `NOT EXISTS (…)` under a NOT and the WHOLE statement when
        # bare — but the inner PLAN's origin is the exact subquery
        # text in every case; carry it for the renderer.
        jinner = jexpr.plan()
        return Node(
            "SubqueryExpr",
            {
                "plan": convert_plan(jinner, sql),
                "kind": cls,
                "plan_src": _src_of(jinner, sql),
            },
            src=src,
        )
    if cls == "InSubquery":
        values = [convert_expr(v, sql) for v in _seq(jexpr.values())]
        jinner = jexpr.query().plan()  # ListQuery's inner plan
        return Node(
            "SubqueryExpr",
            {
                "plan": convert_plan(jinner, sql),
                "kind": cls,
                "plan_src": _src_of(jinner, sql),
            },
            values,
            src=src,
        )

    # Unknown expression: generic node; renderer falls back to the
    # source slice, sources = union over children.
    try:
        children = [convert_expr(c, sql) for c in _seq(jexpr.children())]
    except Exception:
        children = []
    return Node("Opaque", {"cls": cls}, children, src=src)


def parse_statement(spark: SparkSession, sql: str) -> Node:
    """Parse one statement with Spark's own SQL parser (py4j, driver
    only — the analysis plane never executes anything) and detach it."""
    jparser = spark._jsparkSession.sessionState().sqlParser()  # noqa: SLF001
    return convert_plan(jparser.parsePlan(sql), sql)
