"""Reference-format rendering of parsed expression trees.

Reproduces the normalization of the reference's ``getCondition`` /
``getColOrData`` / ``getWhenCondition`` (reference README.md:306-337,
344-383, 445-499):

* ``and``/``or`` are parenthesized pairwise: ``(a and b)``;
* comparisons / arithmetic / bitwise are spaced infix: ``a > b``,
  ``1 + 1``;
* function calls are tight: ``nvl(db.t.col,0)``, name case preserved
  as written (``CONCAT`` stays upper);
* ``DISTINCT`` renders as ``fun(distinct (arg))`` (README.md:331-333);
* ``x in (a,b)``, ``x like y``, ``x isnull`` / ``x isnotnull``
  (README.md:475-481);
* subscripts as ``col['key']`` / ``col[0]`` (README.md:488-491);
* CASE as ``case when c then v … else e end`` (README.md:344-360);
* literals are emitted exactly as written in the source (double vs
  single quotes, number format), via the origin slice.

Deviation from the reference (documented): generic multi-argument
functions render *all* arguments; the reference renders only the first
(README.md:471-472, 487) — none of its golden tests exercise the
difference.
"""

from __future__ import annotations

import re
from typing import Callable, Protocol

from hadoop__spark.plans.jbridge import Node

#: column resolver: name parts as written -> fully qualified db.table.col
Qualify = Callable[[list[str]], str]


class LineageError(Exception):
    pass


# scientific notation included: '1e3' is a literal, and treating it as
# a real column name defeats _merge_union's first-non-literal-alias rule
_NUMERIC_RE = re.compile(r"^-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?$")



def not_normal_col(name: str | None) -> bool:
    """A 'column' that is really a literal — number or quoted string
    (reference ``notNormalCol``, README.md:432-435)."""
    if not name:
        return True
    return bool(_NUMERIC_RE.match(name)) or name[0] in ("'", '"')


def _lit(node: Node) -> str:
    """Literal text exactly as written; fall back to the parsed value.

    Catalyst sometimes synthesizes literals whose Origin spans the
    enclosing call — ``count(*)`` parses as ``count(Literal(1))`` with
    the literal's src slice being ``count(*)`` — so a slice containing
    ``(``/``*`` that is not a quoted string is rejected.
    """
    src = node.src
    if src is not None and (
        src[0] in ("'", '"') or ("(" not in src and "*" not in src)
    ):
        return src
    v = node.get("value")
    return "null" if v is None else str(v)


def render(node: Node, qualify: Qualify, simple: bool = False) -> str:
    """Render an expression to the reference's condition syntax.

    ``simple=True`` emits bare column names (used inside ``in (...)``
    lists, reference README.md:476-477).
    """
    cls = node.cls
    if cls == "Attr":
        parts = [p.lower() for p in node["parts"]]
        return parts[-1] if simple else qualify(parts)
    if cls == "Literal":
        return _lit(node)
    if cls == "Star":
        # Catalyst's Origin for UnresolvedStar spans the enclosing call
        # (`count(*)`), so the src-slice fallback would double-render.
        parts = node.get("parts")
        return f"{'.'.join(p.lower() for p in parts)}.*" if parts else "*"
    if cls in ("And", "Or"):
        kw = "and" if cls == "And" else "or"
        l, r = node.children
        return f"({render(l, qualify)} {kw} {render(r, qualify)})"
    if cls == "BinOp":
        l, r = node.children
        return f"{render(l, qualify)} {node['op']} {render(r, qualify)}"
    if cls == "Not":
        (child,) = node.children
        if child.cls == "BinOp" and child["op"] == "=":
            l, r = child.children
            return f"{render(l, qualify)} <> {render(r, qualify)}"
        if child.cls == "SubqueryExpr" and child.children:
            # NOT IN (subquery): the child's own src slice already
            # starts with `NOT IN`, so `not {src}` would double the
            # keyword (`not NOT IN …`)
            return _render_in_subquery(child, qualify, negated=True)
        return f"not {render(child, qualify)}"
    if cls == "Unary":
        return f"{node['op']}{render(node.children[0], qualify)}"
    if cls == "In":
        value, *items = node.children
        body = ",".join(render(i, qualify, simple=True) for i in items)
        return f"{render(value, qualify)} in ({body})"
    if cls == "LikeOp":
        l, r = node.children
        return f"{render(l, qualify)} {node['kw']} {render(r, qualify)}"
    if cls == "NullTest":
        return f"{render(node.children[0], qualify)} {node['kw']}"
    if cls == "CaseWhen":
        parts: list[str] = []
        for i, (cond, val) in enumerate(node["branches"]):
            kw = "case when" if i == 0 else "when"
            parts.append(f"{kw} {render(cond, qualify)} then {render(val, qualify)}")
        els = node["else"]
        tail = f" else {render(els, qualify)} end" if els is not None else " end"
        return " ".join(parts) + tail
    if cls == "Subscript":
        col, key = node.children
        return f"{render(col, qualify)}[{render(key, qualify)}]"
    if cls == "Function":
        args = ",".join(render(a, qualify) for a in node.children)
        # Spark's parser rewrites count(*) to count(1) (the literal's
        # src slice spans the call) — render the star as written.
        if (
            args == "1"
            and node.children[0].cls == "Literal"
            and node.children[0].src is not None
            and "*" in node.children[0].src
        ):
            args = "*"
        if node["distinct"]:
            return f"{node['name']}(distinct ({args}))"
        return f"{node['name']}({args})"
    if cls in ("Alias", "UnresolvedAlias"):
        return render(node.children[0], qualify, simple)
    if cls == "SubqueryExpr":
        if node.children:  # IN (subquery): children are the probed values
            return _render_in_subquery(node, qualify, negated=False)
        if node.get("kind") == "Exists":
            # the Exists EXPRESSION origin spans `NOT EXISTS (…)` under
            # a NOT (→ `not NOT EXISTS …` through the src fallback) and
            # the whole statement when bare — the inner plan's slice is
            # the reliable text
            return f"exists ({_subquery_body(node)})"
        # scalar subquery: the origin slice is the whole expression as
        # written (`(SELECT max(x) FROM t2)`)
        if node.src is not None:
            return node.src
        return f"({_subquery_body(node)})"
    # Opaque / unknown: prefer the exact source slice.
    if node.src is not None:
        return node.src
    inner = ",".join(render(c, qualify) for c in node.children)
    return f"{node.get('cls', cls)}({inner})"


def _subquery_body(node: Node) -> str:
    """The subquery's exact source text, from the inner plan's origin
    (jbridge ``plan_src``)."""
    return node.get("plan_src") or "subquery"


def _render_in_subquery(node: Node, qualify: Qualify, negated: bool) -> str:
    """``x in (SELECT …)`` with the probed value(s) qualified — the
    value children are preserved by jbridge's InSubquery case
    (Catalyst's InSubquery origin slice never covers the value and
    swallows a wrapping NOT, so the src fallback rendered
    ``not NOT IN (…)`` with no probed column)."""
    vals = ",".join(render(c, qualify) for c in node.children)
    if len(node.children) > 1:
        vals = f"({vals})"
    kw = "not in" if negated else "in"
    return f"{vals} {kw} ({_subquery_body(node)})"


def extract_sources(node: Node, qualify: Qualify) -> list[str]:
    """Qualified source columns feeding an expression, literals dropped
    (reference ``getColOrData(withCond=false)`` + ``filterData``,
    README.md:468-499, 575-587), order preserved.

    CASE contributes only THEN/ELSE branch values — WHEN predicates are
    not lineage sources (README.md:368-383) — with exact-duplicate
    branches collapsed before flattening, mirroring the reference's
    per-branch set.
    """
    cls = node.cls
    if cls == "Attr":
        return [qualify([p.lower() for p in node["parts"]])]
    if cls in ("Literal", "Star"):
        return []
    if cls == "CaseWhen":
        branch_vals = [v for _, v in node["branches"]]
        if node["else"] is not None:
            branch_vals.append(node["else"])
        seen: set[str] = set()
        out: list[str] = []
        for v in branch_vals:
            key = render(v, qualify)
            if key in seen:
                continue
            seen.add(key)
            out.extend(extract_sources(v, qualify))
        return out
    if cls == "Subscript":
        return extract_sources(node.children[0], qualify)
    # everything else: union over children, in order
    out = []
    for c in node.children:
        out.extend(extract_sources(c, qualify))
    return out
