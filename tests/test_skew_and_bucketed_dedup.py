"""Skew-aware join correctness + plan shape, and the IVF-bucketed
embedding dedup scale path vs brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop__spark.operators import dedup
from hadoop__spark.operators.skew import key_skew_report, salted_join
from hadoop__spark.session import load_tables
from tests.conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    t = load_tables(spark, SF_DIR)
    # manufacture skew: orders keyed to one hot customer
    probe = t["orders"].withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(1)).otherwise(
            F.col("o_custkey")
        ),
    )
    build = t["customer"].select("c_custkey", "c_name")
    plain = probe.join(
        build, probe.o_custkey == build.c_custkey
    ).select("o_orderkey", "c_name")
    build2 = build.withColumnRenamed("c_custkey", "o_custkey")
    salted = salted_join(probe, build2, on="o_custkey", salt=8).select(
        "o_orderkey", "c_name"
    )
    a = {(r.o_orderkey, r.c_name) for r in plain.collect()}
    b = {(r.o_orderkey, r.c_name) for r in salted.collect()}
    assert a == b and len(a) > 0


def test_salted_join_spreads_hot_key(spark):
    t = load_tables(spark, SF_DIR)
    probe = t["orders"].withColumn("o_custkey", F.lit(7))  # all rows hot
    build = (
        t["customer"].select("c_custkey", "c_name")
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    out = salted_join(probe, build, on="o_custkey", salt=8)
    # pre-drop('_salt') the join key is (o_custkey, _salt): the single
    # hot key must occupy several salt values
    salted_probe = probe.withColumn(
        "_salt", (F.abs(F.xxhash64(*probe.columns)) % 8).cast("int")
    )
    n_salts = salted_probe.select("_salt").distinct().count()
    assert n_salts >= 6, "hot key not spread across salts"
    assert out.count() == probe.count()  # inner join, dim has key 7


def test_key_skew_report(spark):
    t = load_tables(spark, SF_DIR)
    rep = key_skew_report(t["lineitem"], "l_returnflag", top=3)
    rows = rep.collect()
    assert len(rows) == 3
    assert rows[0].n_rows >= rows[1].n_rows >= rows[2].n_rows
    assert 0 < rows[0].share <= 1


def test_bucketed_embedding_dedup_recall(spark):
    embs = load_tables(spark, SF_DIR)["embeddings"]
    brute = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_dedup_pairs(embs, threshold=0.4).collect()
    }
    bucketed = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_dedup_pairs_bucketed(
            embs, threshold=0.4, nlist=8, n_assign=2
        ).collect()
    }
    assert brute, "fixtures contain similar embedding pairs"
    assert bucketed <= brute, "bucketed result must be a subset (no FPs)"
    recall = len(bucketed & brute) / len(brute)
    assert recall >= 0.7, f"bucketed dedup recall {recall}"


def test_embedding_dedup_size_guard_fires(spark):
    """The brute-force entry point enforces its 'must be bucketed
    first' contract: above max_rows it raises and points at the
    bucketed sibling instead of silently launching an O(n²) join."""
    import pytest

    embs = load_tables(spark, SF_DIR)["embeddings"]
    with pytest.raises(ValueError, match="embedding_dedup_pairs_bucketed"):
        dedup.embedding_dedup_pairs(embs, threshold=0.4, max_rows=10)
    # max_rows=None disables the guard for bucket-local callers
    assert (
        dedup.embedding_dedup_pairs(
            embs.limit(20), threshold=0.0, max_rows=None
        ).count()
        > 0
    )


def test_ivf_persisted_index_prunes_partitions(spark, tmp_path):
    """Persisted IVF: query-time scan reads only the probed centroid
    partitions (PartitionFilters in the plan), and recall vs brute
    force holds."""
    from pyspark.sql import functions as F

    from hadoop__spark.operators import similarity

    embs = load_tables(spark, SF_DIR)["embeddings"]
    path = str(tmp_path / "ivf_index")
    similarity.ivf_write_index(embs, path, nlist=8)
    queries = embs.where(F.col("vec_id") < 10)
    got = similarity.ivf_read_topk(spark, path, queries, k=10, nprobe=4)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan
    brute = similarity.cosine_topk(embs, queries, k=10)
    b = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    a = {(r.query_id, r.neighbor_id) for r in got.collect()}
    assert len(a & b) / len(b) >= 0.5


def test_salted_join_rejects_build_outer(spark):
    """right/full would duplicate unmatched build rows salt times —
    rejected, not silently wrong."""
    probe = spark.range(10).withColumnRenamed("id", "k")
    build = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "full", "right_outer", "fullouter"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(probe, build, on="k", how=how)


def test_bucketed_dedup_plan_is_bucket_local(spark):
    """The pair join must be an equi-join on centroid_id — a cartesian
    product would mean the bucketing silently degraded to brute force
    (only the centroid assignment cross-joins, against the broadcast
    nlist-row centroid table)."""
    embs = load_tables(spark, SF_DIR)["embeddings"]
    out = dedup.embedding_dedup_pairs_bucketed(
        embs, threshold=0.4, nlist=8, n_assign=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "centroid_id" in plan
    joins = [
        ln for ln in plan.splitlines()
        if "CartesianProduct" in ln or "BroadcastNestedLoopJoin" in ln
    ]
    # the only allowed non-equi join is the broadcast against the tiny
    # centroid table (BroadcastNestedLoopJoin over nlist rows)
    assert all("BroadcastNestedLoop" in ln for ln in joins), joins


def test_salted_join_rejects_degenerate_salt(spark):
    """salt=0 used to make the probe-side salt expression x % 0 (NULL
    per row in non-ANSI mode) while the build side replicated into
    sequence(0, -1) = [0, -1]: an inner join silently returned ZERO
    rows.  Refuse upfront like the bad-'how' guard."""
    import pytest as _pytest

    df = spark.range(5).withColumnRenamed("id", "k")
    with _pytest.raises(ValueError, match="salt"):
        salted_join(df, df, on="k", salt=0)
    with _pytest.raises(ValueError, match="salt"):
        salted_join(df, df, on="k", salt=-3)
