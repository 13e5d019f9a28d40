"""Engine session: multi-statement HiveQL-shaped scripts on both planes.

The reference's only public API is ``parse(sqlAll, validate)`` over a
multi-statement script with ``USE db`` session state (reference
README.md:744-764, 637-640).  This module is the execution-plane
counterpart plus the bridge to the analysis plane:

* ``run_script`` splits on non-escaped ``;`` (README.md:746) and
  dispatches each statement to ``spark.sql`` — Catalyst handles
  INSERT OVERWRITE (+ static partitions), CTAS, DROP/TRUNCATE/ALTER,
  and ``USE db`` natively (SURVEY.md §2.1).
* ``lineage`` runs the analysis plane on the same script without
  executing anything, starting from the session's current database.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from hadoop__spark.plans.lineage import (
    LineageAnalyzer,
    LineageResult,
)


def split_statements_exec(script: str) -> list[str]:
    """Quote-aware statement split for the EXECUTION plane.

    The analysis plane's regex split on non-escaped ``;`` is pinned
    reference parity (reference README.md:746) and must not change —
    but handing its output to ``spark.sql`` means a ``;`` inside a
    string literal hard-fails execution.  This splitter tracks
    single/double-quoted strings (with backslash escapes), backticked
    identifiers, and ``--`` / ``/* */`` comments, so only a top-level
    ``;`` terminates a statement.  The reference's ``\\;`` escape is
    still honored at top level (unescaped to ``;``) so scripts written
    for the analysis plane keep running."""
    stmts: list[str] = []
    buf: list[str] = []
    state: str | None = None  # "'", '"', '`', '--', '/*'
    i, n = 0, len(script)
    while i < n:
        c = script[i]
        if state is None:
            if c == ";":
                stmts.append("".join(buf))
                buf = []
                i += 1
                continue
            if c == "\\" and script[i + 1 : i + 2] == ";":
                buf.append(";")
                i += 2
                continue
            if c in ("'", '"', "`"):
                state = c
            elif c == "-" and script[i + 1 : i + 2] == "-":
                state = "--"
            elif c == "/" and script[i + 1 : i + 2] == "*":
                state = "/*"
                buf.append("/*")
                i += 2
                continue
        elif state in ("'", '"'):
            if c == "\\":  # Spark string literals use backslash escapes
                buf.append(script[i : i + 2])
                i += 2
                continue
            if c == state:
                state = None
        elif state == "`":
            if c == "`":
                state = None
        elif state == "--":
            if c == "\n":
                state = None
        else:  # "/*"
            if c == "*" and script[i + 1 : i + 2] == "/":
                state = None
                buf.append("*/")
                i += 2
                continue
        buf.append(c)
        i += 1
    stmts.append("".join(buf))
    return [s.strip() for s in stmts if s.strip()]


@dataclass
class StatementResult:
    sql: str
    df: DataFrame  # spark.sql always returns a DataFrame (may be empty)


class ScriptSession:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    def run_script(
        self, script: str, validate: bool = False
    ) -> list[StatementResult]:
        """Execute every statement in order; returns per-statement
        results (the last SELECT's DataFrame is typically the payload).

        ``USE db`` goes through ``spark.sql`` too, so the catalog's
        current database — not parser state — carries the session
        (≡ reference ``nowQueryDB``, README.md:129, 637-640).

        ``validate=True`` runs the analysis plane FIRST (reference
        ``parse(sql, validate)``, README.md:744-764): every referenced
        table and column must resolve against the catalog before any
        statement executes — a whole-script precheck instead of
        failing halfway through a multi-statement mutation.  The
        precheck runs the analysis plane verbatim, which keeps the
        reference's regex split — a quoted ``;`` that the executor
        handles will fail the precheck; escape it ``\\;`` if both
        planes must see the script."""
        if validate:
            self.lineage(script, validate=True)
        return [
            StatementResult(sql, self.spark.sql(sql))
            for sql in split_statements_exec(script)
        ]

    def run(self, script: str) -> DataFrame | None:
        """Convenience: run the script, return the last result."""
        results = self.run_script(script)
        return results[-1].df if results else None

    def lineage(self, script: str, validate: bool = False) -> LineageResult:
        """Analysis plane over the same session state (never executes)."""
        analyzer = LineageAnalyzer(
            self.spark, current_db=self.spark.catalog.currentDatabase()
        )
        return analyzer.analyze(script, validate=validate)
