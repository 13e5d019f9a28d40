"""Skew-aware join: salting for hot keys.

AQE's skew-join splitting (on in this engine's session) handles most
skew at runtime, but it only splits *partitions* of a sort-merge join.
When a single join key is pathologically hot (the classic null-key /
power-law user), pre-salting is still the reliable fix:

* build side (small-ish): each row is replicated ``salt`` times with a
  salt column 0..salt-1;
* probe side (large, skewed): each row gets a *random-but-
  deterministic* salt (hash of the whole row's id) in 0..salt-1;
* join on (key, salt) — the hot key's rows now spread over ``salt``
  partitions instead of one straggler task.

Cost model: replicates the build side ``salt``×, so use it when
build_size × salt ≪ probe_size — exactly the fact-dimension shape
where one dimension key dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    probe_salt_col: str | Column | None = None,
) -> DataFrame:
    """Equi-join ``probe ⋈ build`` on column ``on`` with hot-key
    spreading.

    ``probe_salt_col`` defaults to a hash of the probe's join key row —
    pass a different column (e.g. a row id) when many probe rows share
    the key, which is the whole point: the default hashes *all* probe
    columns so identical-key rows still spread.

    ``how``: ``'inner'`` or ``'left'`` (probe-outer) only.  The build
    side is replicated ``salt``× before the join, so ``'right'`` /
    ``'full'`` would emit every unmatched build row ``salt`` times —
    rejected rather than silently wrong.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "the build side is replicated salt x, so right/full outer "
            "would duplicate unmatched build rows once per salt value"
        )
    if salt < 1:
        # x % 0 is NULL (non-ANSI) / DIVIDE_BY_ZERO (ANSI) and the
        # build replication becomes sequence(0, -1): an inner join
        # would silently return ZERO rows instead of failing
        raise ValueError(f"salt must be >= 1, got {salt}")
    if probe_salt_col is None:
        probe_salt_col = F.abs(F.xxhash64(*probe.columns)) % salt
    elif isinstance(probe_salt_col, str):
        probe_salt_col = F.abs(F.xxhash64(probe_salt_col)) % salt
    else:
        probe_salt_col = F.abs(probe_salt_col) % salt

    salted_probe = probe.withColumn("_salt", probe_salt_col.cast("int"))
    salted_build = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = salted_probe.join(salted_build, on=[on, "_salt"], how=how)
    return joined.drop("_salt")


def key_skew_report(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts and share of total, descending —
    the 'should I salt this join' question answered from data.

    The grand total is a scalar aggregate broadcast back onto the
    per-key frame: an unpartitioned window here would funnel every
    distinct key through a single task, which for a high-cardinality
    key column is itself the skew this report exists to diagnose.
    Both join branches share the identical per-key aggregate subplan,
    so Catalyst's ReuseExchange collapses them into one scan of ``df``
    (asserted in tests/test_plan_shapes.py).
    """
    agged = df.groupBy(key).agg(F.count("*").alias("n_rows"))
    total = agged.agg(F.sum("n_rows").alias("_total"))
    return (
        agged.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n_rows") / F.col("_total"))
        .drop("_total")
        .orderBy(F.col("n_rows").desc())
        .limit(top)
    )
