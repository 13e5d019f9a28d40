"""Exec-plane probe catalog — SURVEY.md §2 row by row.

Each :class:`Probe` pairs a Spark implementation with an ANSI-SQL oracle
that DuckDB runs over the same parquet fixtures.  The driver compares
row-count + schema + order-insensitive value hash, so every probe is
written to be *bit-deterministic* across engines:

* Aggregates over ``DOUBLE`` columns are summed as ``DECIMAL`` (exact,
  order-independent) and the final value is cast back to ``DOUBLE``.
  A plain ``SUM(double)`` would differ in the last ulps between engines
  because float addition is not associative and partial-aggregation
  order differs.
* Averages are computed as exact decimal sum ÷ count (one deterministic
  double division) rather than the engines' own ``AVG`` accumulators.
* Probes that carry ``LIMIT`` always ``ORDER BY`` a unique key chain.
* Per-row double arithmetic (no aggregation) is IEEE-deterministic and
  compared exactly.

Dialect divergences (documented in SURVEY.md §2 / BASELINE.md):
``nvl``→``coalesce``, ``date_sub``→``- INTERVAL``, Spark arrays are
0-indexed vs DuckDB lists 1-indexed, ``^`` is XOR in Spark but
exponent in DuckDB (→ ``xor()``), and ``hash()`` is murmur3 in Spark —
hash probes compare cardinality, not values.

Reference parity citations are per-probe (``ref:`` lines map to
/root/reference/README.md).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from hadoop__spark.session import register_views


@dataclass(frozen=True)
class Probe:
    """One exec-plane capability probe.

    ``spark_sql`` runs through ``spark.sql`` over the registered fixture
    views (Catalyst plans it like the equivalent DataFrame chain);
    ``fn`` is used instead for DataFrame-API / operator-backed probes.
    ``oracle`` is DuckDB SQL, or ``None`` for engine-only capabilities
    (the driver then records a weaker rows-only check).
    """

    name: str
    spark_sql: Optional[str] = None
    oracle: Optional[str] = None
    fn: Optional[Callable[[SparkSession, str], DataFrame]] = None
    tags: tuple = field(default=())

    def run(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        if self.fn is not None:
            return self.fn(spark, sf_dir)
        assert self.spark_sql is not None
        return spark.sql(self.spark_sql)


def _dec_sum(col: str, alias: str, scale: int = 2) -> str:
    """Deterministic double-sum fragment valid in both dialects."""
    return (
        f"CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"
    )


def _dec_avg(col: str, alias: str, scale: int = 2) -> str:
    """Deterministic double-avg: exact decimal sum ÷ count."""
    return (
        f"CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({col}) AS {alias}"
    )


PROBES: list[Probe] = []


def _probe(name: str, spark_sql: str | None = None, oracle: str | None = None,
           same: bool = False, **kw) -> None:
    if same:
        oracle = spark_sql
    PROBES.append(Probe(name=name, spark_sql=spark_sql, oracle=oracle, **kw))


# ---------------------------------------------------------------------------
# §2.2 Projection / filtering / expressions  (ref README.md:209-337, 468-529)
# ---------------------------------------------------------------------------

# P1 projection (ref README.md:209-255)
_probe(
    "p01_projection",
    "SELECT l_orderkey, l_quantity FROM lineitem",
    same=True,
)

# P2 SELECT * expansion (ref README.md:228-245)
_probe("p02_select_star", "SELECT * FROM nation", same=True)

# P3 column alias (ref README.md:252-254)
_probe("p03_col_alias", "SELECT n_name AS name FROM nation", same=True)

# P4 table alias resolution (ref README.md:188-191, 537-553)
_probe(
    "p04_table_alias",
    "SELECT a.n_name AS n_name, a.n_regionkey AS rk FROM nation a",
    same=True,
)

# P5 WHERE (ref README.md:256-258)
_probe(
    "p05_where",
    "SELECT n_name FROM nation WHERE n_regionkey > 2",
    same=True,
)

# P6 comparison operators (ref README.md:312-317)
_probe(
    "p06_comparisons",
    "SELECT COUNT(*) AS cnt FROM lineitem "
    "WHERE l_quantity <= 10 AND l_linenumber >= 2 AND l_tax < 0.05 "
    "AND l_returnflag <> 'Z' AND l_discount > 0.0",
    same=True,
)

# P7 LIKE (ref README.md:318)
_probe(
    "p07_like",
    "SELECT COUNT(*) AS cnt FROM part WHERE p_name LIKE '%a%' "
    "AND p_type NOT LIKE 'ZZZ%'",
    same=True,
)

# P8 IN list (ref README.md:475-477)
_probe(
    "p08_in_list",
    "SELECT COUNT(*) AS cnt FROM nation WHERE n_regionkey IN (1, 2)",
    same=True,
)

# P9 IS [NOT] NULL (ref README.md:478-481)
_probe(
    "p09_null_checks",
    "SELECT COUNT(*) AS cnt FROM orders "
    "WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL",
    same=True,
)

# P10 boolean AND/OR nesting (ref README.md:307-311)
_probe(
    "p10_bool_logic",
    "SELECT COUNT(*) AS cnt FROM lineitem "
    "WHERE (l_discount > 0.05 AND l_tax < 0.05) OR l_quantity = 1",
    same=True,
)

# P11 arithmetic + - * / % (ref README.md:319-323); per-row doubles are
# IEEE-deterministic so no decimal dance needed.
_probe(
    "p11_arithmetic",
    "SELECT l_orderkey, l_linenumber, "
    "l_extendedprice * (1 - l_discount) AS rev, "
    "l_quantity + l_tax AS qt, l_extendedprice / 2 AS half, "
    "l_orderkey % 7 AS m7 "
    "FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500",
    same=True,
)

# P12 bitwise & ~ | ^ (ref README.md:324-327).  DuckDB: ^ is power → xor().
_probe(
    "p12_bitwise",
    "SELECT n_nationkey, "
    "CAST(n_nationkey & 3 AS INT) AS b_and, "
    "CAST(n_nationkey | 1 AS INT) AS b_or, "
    "CAST(n_nationkey ^ 5 AS INT) AS b_xor, "
    "CAST(~n_nationkey AS INT) AS b_not "
    "FROM nation",
    oracle=(
        "SELECT n_nationkey, "
        "CAST(n_nationkey & 3 AS INT) AS b_and, "
        "CAST(n_nationkey | 1 AS INT) AS b_or, "
        "CAST(xor(n_nationkey, 5) AS INT) AS b_xor, "
        "CAST(~n_nationkey AS INT) AS b_not "
        "FROM nation"
    ),
)

# P13 CASE WHEN (ref README.md:344-383, 473-474)
_probe(
    "p13_case_when",
    "SELECT CASE WHEN l_quantity > 25 THEN 'big' "
    "WHEN l_quantity > 10 THEN 'mid' ELSE 'small' END AS bucket, "
    "COUNT(*) AS cnt FROM lineitem "
    "GROUP BY CASE WHEN l_quantity > 25 THEN 'big' "
    "WHEN l_quantity > 10 THEN 'mid' ELSE 'small' END",
    same=True,
)

# P14 array subscript (ref README.md:488-491).  Spark 0-indexed,
# DuckDB lists 1-indexed — oracle compensates.
_probe(
    "p14_array_subscript",
    "SELECT vec_id, embedding[0] AS e0, embedding[1] AS e1 "
    "FROM embeddings ORDER BY vec_id LIMIT 500",
    oracle=(
        "SELECT vec_id, embedding[1] AS e0, embedding[2] AS e1 "
        "FROM embeddings ORDER BY vec_id LIMIT 500"
    ),
)

# P14b map subscript (ref README.md:981, 993): Spark builds the map and
# subscripts it; oracle verifies the extracted value semantically.
_probe(
    "p14_map_subscript",
    "SELECT event_id, map('type', event_type, 'na', 'x')['type'] AS et "
    "FROM events ORDER BY event_id LIMIT 500",
    oracle=(
        "SELECT event_id, event_type AS et "
        "FROM events ORDER BY event_id LIMIT 500"
    ),
)

# ---------------------------------------------------------------------------
# §2.3 Joins (ref README.md:648-659, 265-278)
# ---------------------------------------------------------------------------

_probe(
    "j01_inner_join",
    "SELECT o.o_orderkey, c.c_name, o.o_totalprice "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "ORDER BY o.o_orderkey LIMIT 500",
    same=True,
)

_probe(
    "j02_left_outer_join",
    "SELECT n.n_name, COUNT(c.c_custkey) AS n_cust "
    "FROM nation n LEFT OUTER JOIN customer c "
    "ON n.n_nationkey = c.c_nationkey GROUP BY n.n_name",
    same=True,
)

_probe(
    "j03_right_outer_join",
    "SELECT n.n_name, COUNT(c.c_custkey) AS n_cust "
    "FROM customer c RIGHT OUTER JOIN nation n "
    "ON n.n_nationkey = c.c_nationkey GROUP BY n.n_name",
    same=True,
)

_probe(
    "j04_full_outer_join",
    "SELECT COUNT(*) AS cnt, COUNT(n.n_nationkey) AS n_left, "
    "COUNT(r.r_regionkey) AS n_right "
    "FROM nation n FULL OUTER JOIN region r "
    "ON n.n_regionkey = r.r_regionkey",
    same=True,
)

# J5 left semi (ref README.md:651).  DuckDB: rewrite as EXISTS.
_probe(
    "j05_left_semi_join",
    "SELECT COUNT(*) AS cnt FROM customer c "
    "LEFT SEMI JOIN orders o ON c.c_custkey = o.o_custkey",
    oracle=(
        "SELECT COUNT(*) AS cnt FROM customer c WHERE EXISTS "
        "(SELECT 1 FROM orders o WHERE c.c_custkey = o.o_custkey)"
    ),
)

# Left anti — free in Spark, included for completeness.
_probe(
    "j05b_left_anti_join",
    "SELECT COUNT(*) AS cnt FROM customer c "
    "LEFT ANTI JOIN orders o ON c.c_custkey = o.o_custkey",
    oracle=(
        "SELECT COUNT(*) AS cnt FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE c.c_custkey = o.o_custkey)"
    ),
)

# J6 map join = broadcast hint (ref README.md:652, TOK_MAPJOIN).  The
# hint is physical-only: identical rows to the plain join oracle.
_probe(
    "j06_map_join_broadcast",
    "SELECT /*+ BROADCAST(n) */ n.n_name, COUNT(*) AS n_cust "
    "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "GROUP BY n.n_name",
    oracle=(
        "SELECT n.n_name, COUNT(*) AS n_cust "
        "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "GROUP BY n.n_name"
    ),
)

# J8 theta / non-equi ON (ref README.md:265-278, 1136, 1147)
_probe(
    "j08_theta_join",
    "SELECT COUNT(*) AS cnt FROM region r1 "
    "JOIN region r2 ON r1.r_regionkey > r2.r_regionkey",
    same=True,
)

# J8b mixed boolean theta ON, mirroring sql25's ON tree
# (ref README.md:1136: ON (p.orderid > c.orderid OR p.a = c.b) AND ...)
_probe(
    "j08b_theta_bool_join",
    "SELECT COUNT(*) AS cnt FROM nation a JOIN nation b "
    "ON (a.n_nationkey > b.n_nationkey OR a.n_regionkey = b.n_regionkey) "
    "AND a.n_nationkey < 20",
    same=True,
)

# J9 multi-way join (ref README.md:1135-1140)
_probe(
    "j09_multiway_join",
    "SELECT c.c_mktsegment, COUNT(*) AS cnt, "
    + _dec_sum("l.l_extendedprice * (1 - l.l_discount)", "revenue", 4)
    + " FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
    "GROUP BY c.c_mktsegment",
    same=True,
)

# ---------------------------------------------------------------------------
# §2.4 Aggregation (ref README.md:468-487, 1119)
# ---------------------------------------------------------------------------

# A1 sum/count/max/min/avg (ref README.md:1119)
_probe(
    "a01_aggregates",
    "SELECT l_returnflag, "
    + _dec_sum("l_quantity", "sum_qty")
    + ", " + _dec_avg("l_extendedprice", "avg_price")
    + ", MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship, "
    "COUNT(*) AS cnt "
    "FROM lineitem GROUP BY l_returnflag",
    same=True,
)

# A2 DISTINCT aggregate (ref README.md:331-333, 469)
_probe(
    "a02_count_distinct",
    "SELECT COUNT(DISTINCT l_suppkey) AS n_supp, "
    "COUNT(DISTINCT l_returnflag) AS n_flag FROM lineitem",
    same=True,
)

# A3 GROUP BY multiple keys (ref README.md:1140)
_probe(
    "a03_group_by_multi",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, "
    + _dec_sum("l_quantity", "sum_qty")
    + " FROM lineitem GROUP BY l_returnflag, l_linestatus",
    same=True,
)

# A4 aggregate over expression: count(distinct hash(x))
# (ref README.md:1139, 1159).  Spark hash() is murmur3 — engine-specific —
# so the oracle checks the *cardinality* equivalence per SURVEY §2.4.
_probe(
    "a04_count_distinct_hash",
    "SELECT COUNT(DISTINCT hash(l_suppkey)) AS n FROM lineitem",
    oracle="SELECT COUNT(DISTINCT l_suppkey) AS n FROM lineitem",
)

# HAVING — absent from the reference (§2.8), free in Spark.
_probe(
    "a05_having",
    "SELECT o_custkey, COUNT(*) AS n_orders FROM orders "
    "GROUP BY o_custkey HAVING COUNT(*) > 5",
    same=True,
)

# ROLLUP — beyond-parity aggregation (§2.4 A5 'free in Catalyst').
_probe(
    "a06_rollup",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt "
    "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)",
    same=True,
)

# A7+ approximate aggregation — the 100 TB substitutes for exact
# DISTINCT/percentile (sketches merge map-side; no full shuffle of the
# distinct values). Sketch internals are engine-specific, so the
# oracle checks cardinality bounds, not values: HLL must land within
# 5% of the exact count (rel err ~1.6% at default p), and the median
# estimate must sit between the true 40th and 60th percentiles —
# both exact in DuckDB, so the check is still a hash-match on a
# boolean + the exact anchor columns.
# JSON extraction from the events props column — the routine
# semi-structured path of a log pipeline; Spark get_json_object vs
# DuckDB's json extraction operator.
_probe(
    "f09_json_extract",
    "SELECT event_id, "
    "CAST(get_json_object(props, '$.k') AS BIGINT) AS k "
    "FROM events WHERE props IS NOT NULL",
    oracle=(
        "SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k "
        "FROM events WHERE props IS NOT NULL"
    ),
)

# explicit window frames (rows between) — running totals over a
# deterministic order
_probe(
    "w03_window_frame",
    "SELECT o_orderkey, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER ("
    "PARTITION BY o_custkey ORDER BY o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) "
    "AS running_spend FROM orders",
    same=True,
)

_probe(
    "a09_grouping_sets",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, "
    "CAST(GROUPING(l_returnflag) AS INT) AS g1, "
    "CAST(GROUPING(l_linestatus) AS INT) AS g2 "
    "FROM lineitem GROUP BY GROUPING SETS "
    "((l_returnflag, l_linestatus), (l_returnflag), ())",
    same=True,
)

_probe(
    "a07_approx_count_distinct",
    "SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_nd, "
    "CAST(approx_count_distinct(l_partkey) BETWEEN "
    "CAST(COUNT(DISTINCT l_partkey) * 0.95 AS BIGINT) AND "
    "CAST(COUNT(DISTINCT l_partkey) * 1.05 AS BIGINT) AS INT) AS hll_ok "
    "FROM lineitem",
    oracle=(
        "SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_nd, "
        "1 AS hll_ok FROM lineitem"
    ),
)

_probe(
    "a08_approx_percentile",
    "SELECT CAST(approx_percentile(l_extendedprice, 0.5, 10000) BETWEEN "
    "(SELECT percentile_cont(0.40) WITHIN GROUP (ORDER BY l_extendedprice) FROM lineitem) AND "
    "(SELECT percentile_cont(0.60) WITHIN GROUP (ORDER BY l_extendedprice) FROM lineitem) "
    "AS INT) AS median_ok FROM lineitem",
    oracle="SELECT 1 AS median_ok",
)

# ---------------------------------------------------------------------------
# §2.5 Set operations (ref README.md:641-647, 396-425)
# ---------------------------------------------------------------------------

_probe(
    "u01_union_all",
    "SELECT n_name FROM nation WHERE n_regionkey = 0 "
    "UNION ALL SELECT n_name FROM nation WHERE n_regionkey = 1 "
    "UNION ALL SELECT r_name FROM region",
    same=True,
)

# U2 positional union with literal branches (ref README.md:1092-1098):
# the second branch contributes literals positionally.
_probe(
    "u02_union_positional",
    "SELECT n_name AS name, n_nationkey AS id FROM nation "
    "UNION ALL SELECT 'x' AS name, CAST(-1 AS INT) AS id FROM region",
    same=True,
)

# U3 UNION DISTINCT / INTERSECT / EXCEPT — absent from reference, free.
_probe(
    "u03_union_distinct",
    "SELECT n_regionkey AS rk FROM nation UNION SELECT r_regionkey AS rk FROM region",
    same=True,
)
_probe(
    "u04_intersect",
    "SELECT n_regionkey AS rk FROM nation "
    "INTERSECT SELECT r_regionkey AS rk FROM region",
    same=True,
)
_probe(
    "u05_except",
    "SELECT n_nationkey AS k FROM nation "
    "EXCEPT SELECT r_regionkey AS k FROM region",
    same=True,
)

# ---------------------------------------------------------------------------
# §2.6 Subqueries (ref README.md:193-207, 596-611)
# ---------------------------------------------------------------------------

_probe(
    "q01_from_subquery",
    "SELECT CAST(SUM(CAST(t.rev AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) "
    "AS avg_rev, COUNT(*) AS n_orders FROM ("
    "  SELECT l_orderkey, "
    + _dec_sum("l_extendedprice", "rev", 4)
    + "  FROM lineitem GROUP BY l_orderkey"
    ") t",
    same=True,
)

# Q3-adjacent (free in Spark): scalar + EXISTS subqueries.
_probe(
    "q02_exists_subquery",
    "SELECT COUNT(*) AS cnt FROM customer c WHERE EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
    " AND o.o_totalprice > 100000)",
    same=True,
)
_probe(
    "q03_scalar_subquery",
    "SELECT COUNT(*) AS cnt FROM orders "
    "WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS "
    "DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)",
    same=True,
)

# ---------------------------------------------------------------------------
# §2.7 Scalar functions (ref README.md:468-487, 1114-1122)
# ---------------------------------------------------------------------------

# F1 concat (ref README.md:482)
_probe(
    "f01_concat",
    "SELECT concat(n_name, '-', r_name) AS nr "
    "FROM nation JOIN region ON n_regionkey = r_regionkey",
    same=True,
)

# F2 nvl (ref README.md:483).  DuckDB has no nvl → coalesce.
_probe(
    "f02_nvl",
    "SELECT nvl(o_orderpriority, 'none') AS prio, COUNT(*) AS cnt "
    "FROM orders GROUP BY nvl(o_orderpriority, 'none')",
    oracle=(
        "SELECT coalesce(o_orderpriority, 'none') AS prio, COUNT(*) AS cnt "
        "FROM orders GROUP BY coalesce(o_orderpriority, 'none')"
    ),
)

# F3 date_sub (ref README.md:484).  DuckDB: date - INTERVAL.
# DATE results are cast to STRING on both sides: Spark hands pandas
# ``datetime.date`` objects while DuckDB hands ``datetime64`` — same
# value, different physical type, which would break a value hash.
_probe(
    "f03_date_sub",
    "SELECT l_orderkey, l_linenumber, "
    "CAST(date_sub(CAST(l_shipdate AS DATE), 7) AS STRING) AS ship_minus_7 "
    "FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "CAST(CAST(CAST(l_shipdate AS DATE) - INTERVAL 7 DAY AS DATE) "
        "AS VARCHAR) AS ship_minus_7 "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500"
    ),
)

# F4 to_date (ref README.md:943, 1121)
_probe(
    "f04_to_date",
    "SELECT o_orderkey, CAST(to_date(o_orderdate) AS STRING) AS od "
    "FROM orders ORDER BY o_orderkey LIMIT 500",
    oracle=(
        "SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od "
        "FROM orders ORDER BY o_orderkey LIMIT 500"
    ),
)

# F5 hash (ref README.md:1137, 1148) — murmur3, engine-specific values;
# determinism within Spark is asserted by unit test, cardinality by a04.
_probe(
    "f05_hash_determinism",
    "SELECT COUNT(*) AS cnt FROM ("
    "  SELECT l_suppkey, hash(l_suppkey) AS h FROM lineitem GROUP BY "
    "  l_suppkey, hash(l_suppkey)"
    ") t",
    oracle="SELECT COUNT(DISTINCT l_suppkey) AS cnt FROM lineitem",
)

# F7 broader string/date/math library (beyond parity bar, ref absent)
_probe(
    "f06_string_funcs",
    "SELECT n_nationkey, upper(n_name) AS up, lower(n_name) AS lo, "
    "length(n_name) AS len, substr(n_name, 1, 3) AS pre, "
    "trim(concat(' ', n_name, ' ')) AS trimmed, "
    "replace(n_name, 'A', '_') AS repl "
    "FROM nation",
    same=True,
)
_probe(
    "f07_math_funcs",
    "SELECT l_orderkey, l_linenumber, "
    "round(l_extendedprice, 1) AS r1, CAST(floor(l_quantity) AS BIGINT) AS fl, "
    "CAST(ceil(l_quantity) AS BIGINT) AS ce, abs(l_discount - 1) AS ab, "
    "CAST(sqrt(l_quantity) AS DOUBLE) AS sq "
    "FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500",
    same=True,
)
_probe(
    "f08_date_funcs",
    "SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m, "
    "day(o_orderdate) AS d "
    "FROM orders ORDER BY o_orderkey LIMIT 500",
    oracle=(
        "SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y, "
        "CAST(month(o_orderdate) AS INT) AS m, "
        "CAST(day(o_orderdate) AS INT) AS d "
        "FROM orders ORDER BY o_orderkey LIMIT 500"
    ),
)

# ---------------------------------------------------------------------------
# §2.8 'free in Spark' extras: ORDER BY / LIMIT / window functions
# ---------------------------------------------------------------------------

_probe(
    "x01_order_limit",
    "SELECT o_orderkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100",
    same=True,
)

_probe(
    "w01_window_rank",
    "SELECT o_orderkey, o_custkey, "
    "ROW_NUMBER() OVER (PARTITION BY o_custkey "
    "ORDER BY o_orderdate, o_orderkey) AS rn, "
    "RANK() OVER (PARTITION BY o_custkey "
    "ORDER BY o_orderdate, o_orderkey) AS rk "
    "FROM orders ORDER BY o_orderkey LIMIT 500",
    oracle=(
        "SELECT o_orderkey, o_custkey, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn, "
        "CAST(RANK() OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rk "
        "FROM orders ORDER BY o_orderkey LIMIT 500"
    ),
)

_probe(
    "w02_window_lag_lead",
    "SELECT o_orderkey, "
    "LAG(o_totalprice) OVER (PARTITION BY o_custkey "
    "ORDER BY o_orderdate, o_orderkey) AS prev_price, "
    "LEAD(o_totalprice) OVER (PARTITION BY o_custkey "
    "ORDER BY o_orderdate, o_orderkey) AS next_price "
    "FROM orders ORDER BY o_orderkey LIMIT 500",
    same=True,
)

# ---------------------------------------------------------------------------
# Headline analytical queries (bench set): TPC-H-shaped over the fixtures
# ---------------------------------------------------------------------------

# TPC-H Q1-shaped pricing summary — the flagship query (entry()).
Q1_PRICING = (
    "SELECT l_returnflag, l_linestatus, "
    + _dec_sum("l_quantity", "sum_qty")
    + ", " + _dec_sum("l_extendedprice", "sum_base_price")
    + ", " + _dec_sum("l_extendedprice * (1 - l_discount)", "sum_disc_price", 4)
    + ", " + _dec_avg("l_quantity", "avg_qty")
    + ", " + _dec_avg("l_extendedprice", "avg_price")
    + ", COUNT(*) AS count_order "
    "FROM lineitem WHERE l_quantity < 50 "
    "GROUP BY l_returnflag, l_linestatus"
)
_probe("h01_pricing_summary", Q1_PRICING, same=True)

# TPC-H Q3-shaped shipping priority (3-way join + agg + top-k).
_probe(
    "h02_shipping_priority",
    "SELECT o.o_orderkey, "
    + _dec_sum("l.l_extendedprice * (1 - l.l_discount)", "revenue", 4)
    + ", o.o_orderdate "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "WHERE c.c_mktsegment = 'BUILDING' "
    "GROUP BY o.o_orderkey, o.o_orderdate "
    "ORDER BY revenue DESC, o_orderkey LIMIT 10",
    same=True,
)

# TPC-H Q5-shaped local-supplier volume (6-way join).
_probe(
    "h03_local_supplier",
    "SELECT n.n_name, "
    + _dec_sum("l.l_extendedprice * (1 - l.l_discount)", "revenue", 4)
    + " FROM customer c "
    "JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    " AND c.c_nationkey = s.s_nationkey "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "GROUP BY n.n_name",
    same=True,
)

# Events-table time bucketing (the 'stream table' batch view).
_probe(
    "h04_events_hourly",
    "SELECT date_trunc('hour', ts) AS hour, event_type, "
    "COUNT(*) AS n_events, "
    + _dec_sum("value", "sum_value", 4)
    + " FROM events GROUP BY date_trunc('hour', ts), event_type",
    same=True,
)


def probe_map() -> dict[str, Probe]:
    """All probes: exec-plane (this module) + pipeline operators.

    Imported lazily to avoid a circular import (operators.probes uses
    :class:`Probe`).
    """
    from hadoop__spark.operators.probes import OPERATOR_PROBES
    from hadoop__spark.plans.probes import LINEAGE_PROBES
    from hadoop__spark.streaming.probes import STREAMING_PROBES

    return {
        p.name: p
        for p in [
            *PROBES,
            *OPERATOR_PROBES,
            *LINEAGE_PROBES,
            *STREAMING_PROBES,
        ]
    }
