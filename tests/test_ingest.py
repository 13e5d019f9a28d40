"""End-to-end incremental ingest loop: a two-batch ingest must equal
the from-scratch dedup of the union — the composition claim each
incremental primitive (fingerprint_filter_new, minhash_lsh_pairs_between,
embedding_pairs_against_index, ivf_append_index) makes individually."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop__spark.operators import dedup, similarity
from hadoop__spark.operators.ingest import _table_exists, ingest_batch
from hadoop__spark.session import load_tables
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_tables(spark, SF_DIR)["documents"]


@pytest.fixture(scope="module")
def embs(spark):
    return load_tables(spark, SF_DIR)["embeddings"]


def test_two_batch_ingest_equals_from_scratch_text(spark, docs, tmp_path):
    """Split the fixture corpus by id into two arrival batches (ids
    ascend across batches, so first-arrival == min-id): batch-1
    survivors ∪ batch-2 survivors must equal dedup_corpus of the
    union, and the state tables must cover exactly the survivors."""
    state = str(tmp_path / "state")
    cut = 250
    b1 = docs.where(F.col("doc_id") < cut)
    b2 = docs.where(F.col("doc_id") >= cut)

    s1 = {r.doc_id for r in ingest_batch(spark, state, b1, "b1").collect()}
    s2 = {r.doc_id for r in ingest_batch(spark, state, b2, "b2").collect()}
    assert s1 and s2 and not (s1 & s2)

    want = {
        r.doc_id
        for r in dedup.dedup_corpus(docs, method="minhash").collect()
    }
    assert s1 | s2 == want

    # state covers exactly the survivors: one signature row per
    # survivor, and the fingerprint table knows every survivor's text
    sig_ids = {
        r._id
        for r in spark.read.parquet(f"{state}/signatures").collect()
    }
    assert sig_ids == want
    # idempotence: re-ingesting the whole corpus survives NOTHING —
    # exact copies die on the fingerprint plane, near-dup-dropped docs
    # (distinct texts, so unknown fingerprints) die on the MinHash
    # probe against their indexed keepers
    again = ingest_batch(spark, state, docs, "b3")
    assert again.count() == 0
    # a reused batch name must refuse (silent double-append guard)
    with pytest.raises(ValueError, match="already ingested"):
        ingest_batch(spark, state, docs, "b1")


def test_minhash_append_num_perm_mismatch_refused(spark, docs, tmp_path):
    """Appending signatures with a different num_perm would mix file
    schemas in one table (silent read corruption) — must refuse."""
    path = str(tmp_path / "mh")
    dedup.minhash_write_signatures(docs.limit(20), path, num_perm=64)
    with pytest.raises(ValueError, match="num_perm"):
        dedup.minhash_write_signatures(
            docs.limit(20), path, num_perm=32, mode="append"
        )


def test_simhash_pairs_between_matches_full_run(spark, docs, tmp_path):
    """The SimHash incremental probe equals the cross-corpus slice of
    a full self-pairing over corpus ∪ batch (same exactness contract
    as the MinHash probe)."""
    path = str(tmp_path / "sh")
    corpus_df = docs.where(F.col("doc_id") < 250)
    batch = docs.where(F.col("doc_id") >= 250)
    dedup.simhash_write_signatures(corpus_df, path)
    got = {
        (r.id_new, r.id_old, r.hamming)
        for r in dedup.simhash_pairs_between(
            spark, path, batch, max_hamming=3
        ).collect()
    }
    corpus_ids = {r.doc_id for r in corpus_df.select("doc_id").collect()}
    full = dedup.simhash_pairs(docs, max_hamming=3)
    want = set()
    for r in full.collect():
        if (r.id_a in corpus_ids) != (r.id_b in corpus_ids):
            new, old = (
                (r.id_b, r.id_a) if r.id_a in corpus_ids else (r.id_a, r.id_b)
            )
            want.add((new, old, r.hamming))
    assert got == want and got


def test_ngram_pairs_between_matches_full_run(spark, docs, tmp_path):
    """The exact n-gram Jaccard probe equals the cross-corpus slice of
    a full prefix-filtered self-join over corpus ∪ batch, at the write
    threshold AND at a stricter probe threshold; a looser probe
    threshold refuses (stored prefixes would be too short)."""
    path = str(tmp_path / "ng")
    corpus_df = docs.where(F.col("doc_id") < 250)
    batch = docs.where(F.col("doc_id") >= 250)
    dedup.ngram_write_index(corpus_df, path, threshold=0.7)
    corpus_ids = {r.doc_id for r in corpus_df.select("doc_id").collect()}

    for t in (0.7, 0.9):
        got = {
            (r.id_new, r.id_old, round(r.jaccard, 9))
            for r in dedup.ngram_jaccard_pairs_between(
                spark, path, batch, threshold=t
            ).collect()
        }
        want = set()
        for r in dedup.ngram_jaccard_pairs(docs, threshold=t).collect():
            if (r.id_a in corpus_ids) != (r.id_b in corpus_ids):
                new, old = (
                    (r.id_b, r.id_a)
                    if r.id_a in corpus_ids
                    else (r.id_a, r.id_b)
                )
                want.add((new, old, round(r.jaccard, 9)))
        assert got == want and got, f"threshold {t}"

    with pytest.raises(ValueError, match="write threshold"):
        dedup.ngram_jaccard_pairs_between(spark, path, batch, threshold=0.5)


def test_second_batch_probe_is_pruned(spark, docs, tmp_path):
    """The batch-2 near-dup probe must join the batch's band table
    against the STORED signature table (a column-pruned parquet scan),
    not re-pair the corpus: the pair plan reads mh_* columns from the
    signatures table and the batch side only."""
    state = str(tmp_path / "state")
    b1 = docs.where(F.col("doc_id") < 250)
    ingest_batch(spark, state, b1, "b1")
    pairs = dedup.minhash_lsh_pairs_between(
        spark, state, docs.where(F.col("doc_id") >= 250)
    )
    files = pairs.inputFiles()
    assert any("/signatures/" in f for f in files), files
    assert any("/shingles/" in f for f in files), files


def test_ingest_short_text_exact_dupes_and_dup_scores(spark, tmp_path):
    """Review findings: (1) exact copies of texts SHORTER than the
    shingle order have zero shingles, so minhash alone cannot pair
    them — the within-batch fingerprint pass must catch them (and the
    published corpus must match the fingerprint table one-to-one);
    (2) duplicate score rows must not starve a capped group."""
    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [
            (1, "hello world", "g"),
            (2, "hello world", "g"),  # exact dup, 2 tokens < n=3
            (3, "a genuinely long and unique body of text", "g"),
        ],
        "doc_id LONG, text STRING, src STRING",
    )
    surv1 = {
        r.doc_id for r in ingest_batch(spark, state, b1, "b1").collect()
    }
    assert surv1 == {1, 3}, "short-text exact dup caught in-batch"
    # a later arrival of the same short text dies on the stored
    # fingerprint plane
    b2 = spark.createDataFrame(
        [(10, "hello world", "g")], "doc_id LONG, text STRING, src STRING"
    )
    assert ingest_batch(spark, state, b2, "b2").count() == 0
    # duplicate score rows collapse before the cap rank join: both
    # remaining docs fit a k=4 cap even when doc 20's score appears
    # twice
    b3 = spark.createDataFrame(
        [
            (20, "wave three first novel body", "g"),
            (21, "wave three second novel body", "g"),
        ],
        "doc_id LONG, text STRING, src STRING",
    )
    dup_scores = spark.createDataFrame(
        [(20, 1.0), (20, 0.9), (21, 0.7)],
        "doc_id LONG, quality_score DOUBLE",
    )
    surv3 = {
        r.doc_id
        for r in ingest_batch(
            spark, state, b3, "b3", scores=dup_scores,
            group_cap=("src", 2), allow_policy_change=True,
        ).collect()
    }
    # un-collapsed, doc 20's two rows would occupy ranks 1 AND 2 and
    # starve doc 21 out of the second slot
    assert surv3 == {20, 21}


def test_quality_gated_ingest(spark, tmp_path):
    """keep_frac inside the ingest loop: the bootstrap batch gates
    against its own score distribution, later batches against the
    CORPUS-SO-FAR's retained distribution (KLL state, historical
    scores never rescanned); the survivors' sketch is appended."""
    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(i, f"one unique document body number {i}") for i in range(1, 21)],
        "doc_id LONG, text STRING",
    )
    s1 = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 21)],
        "doc_id LONG, quality_score DOUBLE",
    )
    surv1 = {
        r.doc_id
        for r in ingest_batch(
            spark, state, b1, "b1", scores=s1, keep_frac=0.25
        ).collect()
    }
    # own-distribution cutoff: 0.75-quantile of 1..20 = 15
    assert surv1 == {15, 16, 17, 18, 19, 20}
    # batch 2 scores 1..5 — every row is below the RETAINED corpus
    # distribution's cutoff (15..20), so nothing survives even though
    # 0.25 of the batch would pass a batch-local gate
    b2 = spark.createDataFrame(
        [(100 + i, f"second wave body number {i}") for i in range(1, 6)],
        "doc_id LONG, text STRING",
    )
    s2 = spark.createDataFrame(
        [(100 + i, float(i)) for i in range(1, 6)],
        "doc_id LONG, quality_score DOUBLE",
    )
    surv2 = ingest_batch(
        spark, state, b2, "b2", scores=s2, keep_frac=0.25
    )
    assert surv2.count() == 0
    # an unscored doc passes under unscored='keep'
    b3 = spark.createDataFrame(
        [(200, "third wave wholly novel body")], "doc_id LONG, text STRING"
    )
    s3 = spark.createDataFrame([], "doc_id LONG, quality_score DOUBLE")
    surv3 = ingest_batch(
        spark, state, b3, "b3", scores=s3, keep_frac=0.25,
        unscored="keep",
    )
    assert surv3.count() == 1
    # state holds one survivors-sketch row per gated batch
    assert spark.read.parquet(f"{state}/score_sketches").count() == 3
    with pytest.raises(ValueError, match="scores"):
        ingest_batch(spark, state, b3, "b4", keep_frac=0.5)


def test_group_capped_and_decontaminated_ingest(spark, tmp_path):
    """group_cap inside the loop is a CORPUS-wide cap: a batch can
    only fill each group's remaining slots (best-scored first), with
    admitted counts persisted per batch; benchmark decontamination
    filters the batch before any state is touched."""
    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [
            (1, "alpha first body wholly unique", "g"),
            (2, "beta second body wholly unique", "g"),
            (3, "gamma third body wholly unique", "h"),
        ],
        "doc_id LONG, text STRING, src STRING",
    )
    surv1 = ingest_batch(spark, state, b1, "b1", group_cap=("src", 3))
    assert surv1.count() == 3
    # batch 2: five g-docs compete for the ONE remaining g slot —
    # best score wins; the h-doc is a benchmark contaminant and dies
    # before any accounting
    b2 = spark.createDataFrame(
        [(10 + i, f"wave two candidate number {i} body", "g") for i in range(1, 6)]
        + [(20, "leaked eval question text here", "h")],
        "doc_id LONG, text STRING, src STRING",
    )
    scores = spark.createDataFrame(
        [(10 + i, float(i)) for i in range(1, 6)],
        "doc_id LONG, quality_score DOUBLE",
    )
    bench = spark.createDataFrame(
        [(1, "leaked eval question text here")], "doc_id LONG, text STRING"
    )
    surv2 = {
        r.doc_id
        for r in ingest_batch(
            spark, state, b2, "b2", scores=scores,
            group_cap=("src", 3), benchmark=bench,
        ).collect()
    }
    assert surv2 == {15}, "one slot left in g, best score fills it"
    used = {
        r.src: r.n
        for r in spark.read.parquet(f"{state}/group_counts")
        .groupBy("src").agg(F.sum("n_admitted").alias("n")).collect()
    }
    assert used == {"g": 3, "h": 1}
    # a full group admits nothing more
    b3 = spark.createDataFrame(
        [(30, "wave three wholly novel body", "g")],
        "doc_id LONG, text STRING, src STRING",
    )
    assert ingest_batch(
        spark, state, b3, "b3", group_cap=("src", 3)
    ).count() == 0


def test_streaming_ingest_loop_equals_batch(spark, docs, tmp_path):
    """The daily ingest loop as a STREAM: arrival files drain through
    ingest_batch inside foreachBatch (one checkpoint, availableNow
    rounds — the restart-resume shape of a real feed), and the union
    of the per-micro-batch survivor tables equals the from-scratch
    dedup of the whole corpus."""
    import glob
    import shutil

    src_dir = tmp_path / "docs_in"
    src_dir.mkdir()
    state = str(tmp_path / "state")
    slim = docs.select("doc_id", "text")

    def ing(batch_df, batch_id):
        if batch_df.count():
            ingest_batch(spark, state, batch_df, f"mb{batch_id}")

    halves = (
        slim.where(F.col("doc_id") < 250),
        slim.where(F.col("doc_id") >= 250),
    )
    for i, half in enumerate(halves):
        d = tmp_path / f"half{i}"
        half.coalesce(1).write.parquet(str(d))
        shutil.copy(
            glob.glob(str(d / "part-*.parquet"))[0],
            src_dir / f"f{i}.parquet",
        )
        stream = spark.readStream.schema(slim.schema).parquet(str(src_dir))
        q = (
            stream.writeStream.foreachBatch(ing)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    got = {
        r.doc_id
        for r in spark.read.parquet(f"{state}/batches/*").collect()
    }
    want = {
        r.doc_id
        for r in dedup.dedup_corpus(slim, method="minhash").collect()
    }
    assert got == want and got


def test_two_batch_ingest_with_embeddings(spark, docs, embs, tmp_path):
    """Full three-plane ingest: text + semantic.  Planted exact-copy
    embeddings across batches must be caught by the frozen-centroid
    index probe; the IVF index ends up holding exactly the surviving
    vectors (append mode, partition-pruned reads)."""
    state = str(tmp_path / "state")
    demb = embs.select(F.col("vec_id").alias("doc_id"), "embedding")
    cut = 250
    b1, e1 = (
        docs.where(F.col("doc_id") < cut),
        demb.where(F.col("doc_id") < cut),
    )
    # batch 2 embeddings: its own vectors PLUS exact copies of three
    # batch-1 vectors planted under batch-2 ids -> semantic plane must
    # drop those three batch-2 docs even though their TEXT is unique
    b2 = docs.where(F.col("doc_id") >= cut)
    planted_src = [5, 6, 7]
    planted_dst = [9901, 9902, 9903]
    copies = (
        demb.where(F.col("doc_id").isin(planted_src))
        .withColumn(
            "doc_id",
            F.col("doc_id") + F.lit(planted_dst[0] - planted_src[0]),
        )
    )
    # the planted docs' TEXT is entirely novel (so no text plane can
    # drop them) — only the semantic plane sees the copied vectors
    b2 = b2.unionByName(
        docs.where(F.col("doc_id").isin(planted_src)).withColumn(
            "doc_id",
            F.col("doc_id") + F.lit(planted_dst[0] - planted_src[0]),
        ).withColumn(
            "text",
            F.concat(
                F.lit("wholly novel planted body number "),
                F.col("doc_id").cast("string"),
            ),
        )
    )
    e2 = demb.where(F.col("doc_id") >= cut).unionByName(copies)

    s1 = {
        r.doc_id
        for r in ingest_batch(
            spark, state, b1, "b1", embeddings=e1, semantic_threshold=0.999
        ).collect()
    }
    s2 = {
        r.doc_id
        for r in ingest_batch(
            spark, state, b2, "b2", embeddings=e2, semantic_threshold=0.999
        ).collect()
    }
    surviving_planted = {d for d in planted_dst if d in s2}
    kept_src = {d for d in planted_src if d in s1}
    # every planted copy whose source survived batch 1 must be dropped
    # by the index probe (exact copies always co-bucket)
    assert not (surviving_planted & {d + planted_dst[0] - planted_src[0] for d in kept_src})
    assert _table_exists(spark, f"{state}/ivf/centroids")
    idx_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{state}/ivf/assigned").collect()
    }
    emb_ids = {r.doc_id for r in e1.unionByName(e2).collect()}
    assert idx_ids == (s1 | s2) & emb_ids, (
        "IVF index holds exactly the surviving embedded docs"
    )


@pytest.mark.parametrize(
    "method,kwargs",
    [
        ("simhash", {"max_hamming": 3}),
        ("ngram", {"threshold": 0.8}),
    ],
)
def test_two_batch_ingest_other_text_methods(
    spark, docs, tmp_path, method, kwargs
):
    """text_method routing (r7 verdict #2): the two-batch ingest on
    the simhash and exact-ngram planes equals the from-scratch
    dedup_corpus of the union, exactly as the minhash plane does —
    same ascending-id/first-arrival argument.  A later call with a
    different text_method must refuse (the state holds no such
    plane)."""
    state = str(tmp_path / f"state_{method}")
    cut = 250
    b1 = docs.where(F.col("doc_id") < cut)
    b2 = docs.where(F.col("doc_id") >= cut)
    s1 = {
        r.doc_id
        for r in ingest_batch(
            spark, state, b1, "b1", text_method=method, **kwargs
        ).collect()
    }
    s2 = {
        r.doc_id
        for r in ingest_batch(
            spark, state, b2, "b2", text_method=method, **kwargs
        ).collect()
    }
    assert s1 and s2 and not (s1 & s2)
    want = {
        r.doc_id
        for r in dedup.dedup_corpus(docs, method=method, **kwargs).collect()
    }
    assert s1 | s2 == want
    # idempotence: re-ingesting the corpus survives nothing (exact
    # copies die on fingerprints, near-dups on the plane probe)
    assert ingest_batch(
        spark, state, docs, "b3", text_method=method, **kwargs
    ).count() == 0
    # plane mismatch refused — the state was built under `method`
    other = "minhash" if method != "minhash" else "simhash"
    with pytest.raises(ValueError, match="different text_method"):
        ingest_batch(spark, state, docs, "b4", text_method=other)
    if method == "ngram":
        # parameter drift refused BEFORE any state append commits
        with pytest.raises(ValueError, match="match the stored"):
            ingest_batch(
                spark, state, docs, "b5", text_method="ngram",
                threshold=0.9,
            )


def test_ngram_append_probe_stays_exact(spark, docs, tmp_path):
    """The frozen-df append argument: after ngram_append_index, a
    probe against the two-generation index still equals the exact
    cross-corpus slice of a full self-pairing — the appended prefixes
    share the bootstrap's total (df, shingle) order, so the WWW'07
    bound holds across generations."""
    path = str(tmp_path / "ng")
    gen1 = docs.where(F.col("doc_id") < 150)
    gen2 = docs.where((F.col("doc_id") >= 150) & (F.col("doc_id") < 300))
    batch = docs.where(F.col("doc_id") >= 300)
    dedup.ngram_write_index(gen1, path, threshold=0.8)
    dedup.ngram_append_index(spark, path, gen2)
    got = {
        (r.id_new, r.id_old, round(r.jaccard, 9))
        for r in dedup.ngram_jaccard_pairs_between(spark, path, batch).collect()
    }
    corpus_ids = {
        r.doc_id for r in docs.where(F.col("doc_id") < 300).collect()
    }
    want = set()
    for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect():
        if (r.id_a in corpus_ids) != (r.id_b in corpus_ids):
            new, old = (
                (r.id_b, r.id_a) if r.id_a in corpus_ids else (r.id_a, r.id_b)
            )
            want.add((new, old, round(r.jaccard, 9)))
    assert got == want and got
    # append guards: wrong threshold / n / missing index all refuse
    with pytest.raises(ValueError, match="threshold"):
        dedup.ngram_append_index(spark, path, batch, threshold=0.9)
    with pytest.raises(ValueError, match="n=4"):
        dedup.ngram_append_index(spark, path, batch, n=4)
    with pytest.raises(ValueError, match="bootstrap"):
        dedup.ngram_append_index(spark, str(tmp_path / "nowhere"), batch)


def test_rebuild_state_after_crash(spark, docs, tmp_path, monkeypatch):
    """Chaos test (r7 verdict #3): crash between the fingerprint and
    signature appends, rebuild from the batch snapshots, and the state
    must equal a crash-free run's row-for-row; a subsequent ingest
    then agrees with the crash-free timeline.  A partial snapshot
    (no _SUCCESS) is deleted and excluded."""
    from hadoop__spark.operators import ingest as ingest_mod

    slim = docs.select("doc_id", "text")
    b1 = slim.where(F.col("doc_id") < 200)
    b2 = slim.where((F.col("doc_id") >= 200) & (F.col("doc_id") < 400))
    b3 = slim.where(F.col("doc_id") >= 400)

    clean, crashed = str(tmp_path / "clean"), str(tmp_path / "crashed")
    ingest_batch(spark, clean, b1, "b1")
    ingest_batch(spark, clean, b2, "b2")

    ingest_batch(spark, crashed, b1, "b1")
    # the ingest loop appends the text plane through the staged-frames
    # writer (minhash_write_signatures_frames) — crash THAT name; the
    # other plane writers run (concurrently) to completion, so the
    # planes land at different frontiers below
    real_writer = ingest_mod.minhash_write_signatures_frames

    def boom(*a, **k):
        raise RuntimeError("simulated crash between state appends")

    monkeypatch.setattr(
        ingest_mod, "minhash_write_signatures_frames", boom
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        ingest_batch(spark, crashed, b2, "b2")
    monkeypatch.setattr(
        ingest_mod, "minhash_write_signatures_frames", real_writer
    )
    # the crash left the planes at different frontiers: fingerprints
    # saw b2, signatures did not
    fp_n = spark.read.parquet(f"{crashed}/fingerprints").count()
    sig_n = spark.read.parquet(f"{crashed}/signatures").count()
    assert fp_n > sig_n

    # a partial snapshot dir (no _SUCCESS) must be swept, not unioned
    ghost = tmp_path / "crashed" / "batches" / "ghost"
    ghost.mkdir(parents=True)
    (ghost / "part-00000.parquet.tmp").write_bytes(b"partial")

    from hadoop__spark.operators.ingest import rebuild_state

    rebuilt = rebuild_state(spark, crashed)
    assert not ghost.exists()

    def rows(path, cols):
        return {
            tuple(getattr(r, c) for c in cols)
            for r in spark.read.parquet(path).select(*cols).collect()
        }

    for tbl, cols in [
        ("fingerprints", ["fp", "keep_id", "n_copies"]),
        ("signatures", ["_id", "mh_0", "mh_63"]),
        ("shingles", ["_id"]),
    ]:
        assert rows(f"{crashed}/{tbl}", cols) == rows(
            f"{clean}/{tbl}", cols
        ), tbl
    assert {r.doc_id for r in rebuilt.collect()} == {
        r.doc_id
        for r in spark.read.parquet(f"{clean}/batches/*").collect()
    }
    # the timelines stay in agreement after the next ingest
    s_clean = {
        r.doc_id for r in ingest_batch(spark, clean, b3, "b3").collect()
    }
    s_rebuilt = {
        r.doc_id for r in ingest_batch(spark, crashed, b3, "b3").collect()
    }
    assert s_clean == s_rebuilt


def test_ingest_tmp_staging_cleaned(spark, docs, embs, tmp_path):
    """ADVICE r7: the text-survivors staging table written for the
    semantic stage must not outlive its batch — the tmp dir is empty
    after every ingest."""
    import os

    state = str(tmp_path / "state")
    demb = embs.select(F.col("vec_id").alias("doc_id"), "embedding")
    for name, pred in [("b1", F.col("doc_id") < 250), ("b2", F.col("doc_id") >= 250)]:
        ingest_batch(
            spark, state, docs.where(pred), name,
            embeddings=demb.where(pred),
        )
        tmp = os.path.join(state, "tmp")
        assert not os.path.isdir(tmp) or not os.listdir(tmp), name


@pytest.mark.parametrize("method", ["simhash", "ngram"])
def test_rebuild_state_other_planes(spark, docs, tmp_path, method):
    """rebuild_state routes per text_method: rebuilding a simhash/
    ngram corpus from its snapshots leaves a state a further ingest
    composes with exactly as the un-rebuilt timeline would."""
    from hadoop__spark.operators.ingest import rebuild_state

    kwargs = {"max_hamming": 3} if method == "simhash" else {}
    slim = docs.select("doc_id", "text")
    b1 = slim.where(F.col("doc_id") < 250)
    b2 = slim.where(F.col("doc_id") >= 250)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for state in (a, b):
        ingest_batch(spark, state, b1, "b1", text_method=method, **kwargs)
    rebuild_state(spark, b, text_method=method)
    s_a = {
        r.doc_id
        for r in ingest_batch(
            spark, a, b2, "b2", text_method=method, **kwargs
        ).collect()
    }
    s_b = {
        r.doc_id
        for r in ingest_batch(
            spark, b, b2, "b2", text_method=method, **kwargs
        ).collect()
    }
    assert s_a == s_b and s_a


def test_rebuild_state_policy_tables(spark, tmp_path):
    """rebuild_state reconsolidates the policy states when given their
    inputs: group_counts totals equal the incremental state's, and the
    rebuilt score sketch's quantiles equal the incrementally-appended
    state's in the exact regime."""
    from hadoop__spark.operators import corpus
    from hadoop__spark.operators.ingest import rebuild_state

    b1 = spark.createDataFrame(
        [(i, f"wholly unique body number {i}", "g" if i % 2 else "h")
         for i in range(1, 21)],
        "doc_id LONG, text STRING, src STRING",
    )
    b2 = spark.createDataFrame(
        [(100 + i, f"second wave body number {i}", "g") for i in range(1, 11)],
        "doc_id LONG, text STRING, src STRING",
    )
    scores = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(1, 21)]
        + [(100 + i, float(i)) for i in range(1, 11)],
        "doc_id LONG, quality_score DOUBLE",
    )
    state = str(tmp_path / "state")
    for name, b in [("b1", b1), ("b2", b2)]:
        ingest_batch(
            spark, state, b, name, scores=scores, keep_frac=0.5,
            group_cap=("src", 8),
        )
    counts_before = {
        r.src: r.n
        for r in spark.read.parquet(f"{state}/group_counts")
        .groupBy("src").agg(F.sum("n_admitted").alias("n")).collect()
    }
    q_before = corpus.score_quantiles(
        corpus.merge_score_sketches(
            spark.read.parquet(f"{state}/score_sketches")
        ),
        from_sketches=True,
    ).first()
    rebuild_state(
        spark, state, scores=scores, group_cap_col="src",
    )
    counts_after = {
        r.src: r.n
        for r in spark.read.parquet(f"{state}/group_counts")
        .groupBy("src").agg(F.sum("n_admitted").alias("n")).collect()
    }
    q_after = corpus.score_quantiles(
        corpus.merge_score_sketches(
            spark.read.parquet(f"{state}/score_sketches")
        ),
        from_sketches=True,
    ).first()
    assert counts_after == counts_before
    assert q_after.n_scores == q_before.n_scores
    # exact regime (n << k=200): merged-incremental == consolidated
    assert q_after.q_0_5 == q_before.q_0_5
    assert q_after.q_0_99 == q_before.q_0_99


def test_ngram_plane_composes_with_embeddings(spark, tmp_path):
    """The text_method routing is orthogonal to the embedding plane:
    an ngram-plane ingest still drops a batch-2 doc whose TEXT is
    novel but whose embedding exactly copies an indexed batch-1
    vector (the frozen-centroid probe), while the ngram probe drops
    the near-dup texts."""
    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy sleeping dog in the warm morning sun today"),
            (2, "an entirely different second document body here now"),
        ],
        "doc_id LONG, text STRING",
    )
    e1 = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
        "doc_id LONG, embedding ARRAY<DOUBLE>",
    )
    s1 = ingest_batch(
        spark, state, b1, "b1", text_method="ngram", embeddings=e1,
        semantic_threshold=0.999,
    )
    assert {r.doc_id for r in s1.collect()} == {1, 2}
    b2 = spark.createDataFrame(
        [
            # near-dup TEXT of doc 1 (one token changed) -> ngram probe
            (10, "the quick brown fox jumps over the lazy sleeping dog in the warm morning sun tonight"),
            # novel text, EXACT COPY of doc 2's vector -> semantic probe
            (11, "wholly novel planted text that matches nothing else"),
            # novel text, novel vector -> survives
            (12, "a fresh survivor document with its own content"),
        ],
        "doc_id LONG, text STRING",
    )
    e2 = spark.createDataFrame(
        [(10, [0.5, 0.5, 0.0]), (11, [0.0, 1.0, 0.0]), (12, [0.0, 0.0, 1.0])],
        "doc_id LONG, embedding ARRAY<DOUBLE>",
    )
    s2 = ingest_batch(
        spark, state, b2, "b2", text_method="ngram", embeddings=e2,
        semantic_threshold=0.999,
    )
    assert {r.doc_id for r in s2.collect()} == {12}


def test_rebuild_state_refuses_wrong_plane_or_params(spark, docs, tmp_path):
    """Round-8 review finding: rebuilding the WRONG plane (or the
    right plane at the wrong num_perm/meta) would leave the corpus's
    real state stale — every later ingest would probe it and silently
    admit near-dups.  rebuild_state must detect the surviving layout
    and refuse."""
    from hadoop__spark.operators.ingest import rebuild_state

    slim = docs.select("doc_id", "text").where(F.col("doc_id") < 100)
    st_mh = str(tmp_path / "mh")
    ingest_batch(spark, st_mh, slim, "b1")
    with pytest.raises(ValueError, match="contradicts the stored"):
        rebuild_state(spark, st_mh, text_method="simhash")
    with pytest.raises(ValueError, match="num_perm=128"):
        rebuild_state(spark, st_mh, num_perm=128)
    # a LEGACY state (no policy table) still refuses via the layout
    # markers — delete the policy and the guard must come from the
    # surviving state tables themselves
    import shutil

    shutil.rmtree(f"{st_mh}/policy")
    with pytest.raises(ValueError, match="holds a 'minhash' plane"):
        rebuild_state(spark, st_mh, text_method="simhash")

    st_ng = str(tmp_path / "ng")
    ingest_batch(spark, st_ng, slim, "b1", text_method="ngram")
    with pytest.raises(ValueError, match="contradicts the stored"):
        rebuild_state(spark, st_ng, text_method="ngram", threshold=0.9)


def test_ingest_accounting_state(spark, docs, tmp_path):
    """accounting_col: each batch appends its survivors' HLL/theta
    sketch rows; the merged state must equal a single accounting pass
    over the retained corpus EXACTLY (HLL union is per-register max,
    theta union a set union — merge == single-pass at fixture
    cardinalities), and rebuild_state reconsolidates identically."""
    from hadoop__spark.operators import corpus
    from hadoop__spark.operators.ingest import rebuild_state

    slim = docs.select(
        "doc_id", "text",
        F.concat(F.lit("s"), (F.col("doc_id") % 3).cast("string")).alias(
            "src"
        ),
    )
    state = str(tmp_path / "state")
    for name, pred in [
        ("b1", F.col("doc_id") < 250),
        ("b2", F.col("doc_id") >= 250),
    ]:
        ingest_batch(
            spark, state, slim.where(pred), name, accounting_col="src"
        )

    retained = spark.read.parquet(f"{state}/batches/*")

    def stats_of(source, from_sketches):
        return {
            r.src: (r.n_docs, r.n_tokens, r.distinct_content_est, r.vocab_est)
            for r in corpus.corpus_stats(
                source, group_cols=["src"], from_sketches=from_sketches
            ).collect()
        }

    def overlap_of(source, from_sketches):
        return {
            (r.group_a, r.group_b): (r.distinct_a, r.overlap_est)
            for r in corpus.corpus_overlap(
                source, group_col="src", from_sketches=from_sketches
            ).collect()
        }

    want_stats = stats_of(retained, False)
    want_overlap = overlap_of(retained, False)

    def read_state():
        st = corpus.merge_corpus_stats(
            spark.read.parquet(f"{state}/accounting/stats"),
            group_cols=["src"],
        )
        ov = corpus.merge_overlap_sketches(
            spark.read.parquet(f"{state}/accounting/overlap"),
            group_col="src",
        )
        return stats_of(st, True), overlap_of(ov, True)

    got_stats, got_overlap = read_state()
    assert got_stats == want_stats and len(want_stats) == 3
    assert got_overlap == want_overlap and len(want_overlap) == 3

    rebuild_state(spark, state, accounting_col="src")
    got_stats, got_overlap = read_state()
    assert got_stats == want_stats
    assert got_overlap == want_overlap
    # consolidated: one row per group after the rebuild
    assert spark.read.parquet(f"{state}/accounting/stats").count() == 3


def test_bootstrap_from_prepared_corpus_is_lossless(spark, docs, tmp_path):
    """The README recipe: feeding prepare_corpus's survivors to the
    first ingest_batch call bootstraps the incremental state without
    losing a document — the self-dedup is a no-op on an
    already-deduped corpus (same method and threshold)."""
    from hadoop__spark.operators import corpus
    from tests.conftest import SF_DIR  # noqa: F401  (fixture parity)

    prepped = corpus.prepare_corpus(
        docs.select("doc_id", "text"),
        redact=False,
        dedup_method="minhash",
    )
    state = str(tmp_path / "state")
    surv = ingest_batch(spark, state, prepped, "bootstrap")
    assert {r.doc_id for r in surv.collect()} == {
        r.doc_id for r in prepped.collect()
    }


def test_streaming_quality_gated_ingest(spark, tmp_path):
    """The KLL quality gate inside the STREAMING ingest loop: each
    micro-batch gates against the corpus-so-far's retained score
    distribution read from the persisted sketch state — the second
    arrival file's low scores all die against the first file's
    cutoff, exactly as the batch loop pins."""
    import glob
    import shutil

    src_dir = tmp_path / "docs_in"
    src_dir.mkdir()
    state = str(tmp_path / "state")
    scores = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 21)]
        + [(100 + i, float(i)) for i in range(1, 6)],
        "doc_id LONG, quality_score DOUBLE",
    )

    def ing(batch_df, batch_id):
        if batch_df.count():
            ingest_batch(
                spark, state, batch_df, f"mb{batch_id}", scores=scores,
                keep_frac=0.25,
            )

    waves = (
        spark.createDataFrame(
            [(i, f"one unique document body number {i}") for i in range(1, 21)],
            "doc_id LONG, text STRING",
        ),
        spark.createDataFrame(
            [(100 + i, f"second wave body number {i}") for i in range(1, 6)],
            "doc_id LONG, text STRING",
        ),
    )
    for i, wave in enumerate(waves):
        d = tmp_path / f"wave{i}"
        wave.coalesce(1).write.parquet(str(d))
        shutil.copy(
            glob.glob(str(d / "part-*.parquet"))[0],
            src_dir / f"f{i}.parquet",
        )
        stream = spark.readStream.schema(waves[0].schema).parquet(
            str(src_dir)
        )
        q = (
            stream.writeStream.foreachBatch(ing)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    got = {
        r.doc_id
        for r in spark.read.parquet(f"{state}/batches/*").collect()
    }
    # wave 1 gates against its own distribution (cutoff 15); wave 2's
    # scores 1..5 are all below the RETAINED cutoff -> nothing admitted
    assert got == {15, 16, 17, 18, 19, 20}


def test_retract_documents_takedown_semantics(spark, tmp_path):
    """Takedown: retracted ids vanish from every state table AND the
    snapshots (the rebuild source of truth), untouched snapshots are
    not rewritten, and a LATER arrival of the retracted text is
    admitted again — nothing in the corpus duplicates it anymore."""
    from hadoop__spark.operators.ingest import retract_documents

    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [
            (1, "the first unique document body lives here"),
            (2, "a second wholly distinct body of text"),
        ],
        "doc_id LONG, text STRING",
    )
    b2 = spark.createDataFrame(
        [
            (10, "third body unlike either predecessor entirely"),
            # exact copy of doc 1 -> dropped on the fingerprint plane
            (11, "the first unique document body lives here"),
        ],
        "doc_id LONG, text STRING",
    )
    ingest_batch(spark, state, b1, "b1")
    s2 = ingest_batch(spark, state, b2, "b2")
    assert {r.doc_id for r in s2.collect()} == {10}

    import os

    b2_mtime = os.path.getmtime(f"{state}/batches/b2/_SUCCESS")
    retract = spark.createDataFrame(
        [(1,), (999,)], "doc_id LONG"  # 999: retracting a ghost is a no-op
    )
    remaining = retract_documents(spark, state, retract)
    assert {r.doc_id for r in remaining.collect()} == {2, 10}
    # untouched snapshot not rewritten; hit snapshot rewritten
    assert os.path.getmtime(f"{state}/batches/b2/_SUCCESS") == b2_mtime
    assert {r.doc_id for r in spark.read.parquet(f"{state}/batches/b1").collect()} == {2}
    assert {
        r._id for r in spark.read.parquet(f"{state}/signatures").collect()
    } == {2, 10}
    assert 1 not in {
        r.keep_id
        for r in spark.read.parquet(f"{state}/fingerprints").collect()
    }
    # the retracted text re-enters with the next arrival
    b3 = spark.createDataFrame(
        [(20, "the first unique document body lives here")],
        "doc_id LONG, text STRING",
    )
    s3 = ingest_batch(spark, state, b3, "b3")
    assert {r.doc_id for r in s3.collect()} == {20}


def test_compact_state_preserves_probes(spark, tmp_path):
    """Maintenance compaction: after several append-grown batches the
    state tables collapse to right-sized files with identical row
    content — the next ingest still dedups against them exactly."""
    import glob

    from hadoop__spark.operators.ingest import compact_state

    state = str(tmp_path / "state")
    for i in range(3):
        b = spark.createDataFrame(
            [
                (10 * i + j, f"wave {i} unique body number {j} here")
                for j in range(3)
            ],
            "doc_id LONG, text STRING",
        )
        ingest_batch(spark, state, b, f"b{i}")
    frag = len(glob.glob(f"{state}/fingerprints/*.parquet"))
    assert frag >= 3, "appends fragment the table"
    before = {
        r.keep_id
        for r in spark.read.parquet(f"{state}/fingerprints").collect()
    }
    done = compact_state(spark, state)
    assert done["fingerprints"] == 1 and "signatures" in done
    assert len(glob.glob(f"{state}/fingerprints/*.parquet")) == 1
    after = {
        r.keep_id
        for r in spark.read.parquet(f"{state}/fingerprints").collect()
    }
    assert after == before
    # the compacted state still dedups: an exact copy dies, novelty
    # survives, and the append-after-compact composes
    b = spark.createDataFrame(
        [
            (100, "wave 0 unique body number 0 here"),
            (101, "an entirely new survivor body"),
        ],
        "doc_id LONG, text STRING",
    )
    s = ingest_batch(spark, state, b, "b_post")
    assert {r.doc_id for r in s.collect()} == {101}


def test_on_existing_skip_exactly_once(spark, tmp_path, monkeypatch):
    """foreachBatch retries replay the SAME batch_id: with
    on_existing="skip" a COMMITTED batch no-ops (stored survivors
    returned, state untouched), a mid-append crash still refuses
    (replay would double-append), and rebuild_state restores the
    marker so the retry then no-ops."""
    from hadoop__spark.operators import ingest as ingest_mod
    from hadoop__spark.operators.ingest import rebuild_state

    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(1, "first unique body of text here"),
         (2, "second wholly distinct body there")],
        "doc_id LONG, text STRING",
    )
    ingest_batch(spark, state, b1, "b1")
    sig_n = spark.read.parquet(f"{state}/signatures").count()
    replay = ingest_batch(spark, state, b1, "b1", on_existing="skip")
    assert {r.doc_id for r in replay.collect()} == {1, 2}
    assert spark.read.parquet(f"{state}/signatures").count() == sig_n
    # default mode still refuses, and suggests the skip knob
    with pytest.raises(ValueError, match="on_existing='skip'"):
        ingest_batch(spark, state, b1, "b1")

    # crash batch 2 between appends -> snapshot exists, marker doesn't
    b2 = spark.createDataFrame(
        [(10, "third novel body appears now")], "doc_id LONG, text STRING"
    )
    real = ingest_mod.minhash_write_signatures_frames

    def boom(*a, **k):
        raise RuntimeError("simulated crash")

    monkeypatch.setattr(
        ingest_mod, "minhash_write_signatures_frames", boom
    )
    with pytest.raises(RuntimeError):
        ingest_batch(spark, state, b2, "b2")
    monkeypatch.setattr(
        ingest_mod, "minhash_write_signatures_frames", real
    )
    with pytest.raises(ValueError, match="crashed mid-append"):
        ingest_batch(spark, state, b2, "b2", on_existing="skip")
    rebuild_state(spark, state)
    replay2 = ingest_batch(spark, state, b2, "b2", on_existing="skip")
    assert {r.doc_id for r in replay2.collect()} == {10}
    assert {
        r._id for r in spark.read.parquet(f"{state}/signatures").collect()
    } == {1, 2, 10}


def test_state_summary_reports_crash(spark, tmp_path, monkeypatch):
    """state_summary names the plane, counts the tables, and flags a
    complete-but-uncommitted snapshot as needing a rebuild."""
    from hadoop__spark.operators import ingest as ingest_mod
    from hadoop__spark.operators.ingest import rebuild_state, state_summary

    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(1, "first unique body here"), (2, "second distinct body there")],
        "doc_id LONG, text STRING",
    )
    ingest_batch(spark, state, b1, "b1")
    s = state_summary(spark, state)
    assert s["text_method"] == "minhash"
    assert s["tables"]["fingerprints"] == 2
    assert s["batches"] == [
        {
            "name": "b1",
            "rows": 2,
            "committed": True,
            "covered": ["fingerprints", "text"],
        }
    ]
    assert not s["needs_rebuild"]

    def boom(*a, **k):
        raise RuntimeError("simulated crash")

    real = ingest_mod.minhash_write_signatures_frames
    monkeypatch.setattr(
        ingest_mod, "minhash_write_signatures_frames", boom
    )
    with pytest.raises(RuntimeError):
        ingest_batch(
            spark, state,
            spark.createDataFrame(
                [(10, "third novel body appears")], "doc_id LONG, text STRING"
            ),
            "b2",
        )
    monkeypatch.setattr(
        ingest_mod, "minhash_write_signatures_frames", real
    )
    s = state_summary(spark, state)
    assert s["needs_rebuild"]
    rebuild_state(spark, state)
    s = state_summary(spark, state)
    assert not s["needs_rebuild"] and len(s["batches"]) == 2


def test_maintenance_lock_excludes_ingest(spark, tmp_path):
    """The advisory maintenance lock: an ingest refuses while
    compact/retract hold it, a second maintenance run refuses too,
    and the lock is released afterwards (including on failure)."""
    from hadoop__spark.operators.ingest import (
        _MAINT_LOCK,
        compact_state,
        retract_documents,
    )
    from hadoop__spark.operators.util import touch_file

    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(1, "first unique body here"), (2, "second distinct body there")],
        "doc_id LONG, text STRING",
    )
    ingest_batch(spark, state, b1, "b1")
    # simulate a concurrent maintenance run
    touch_file(spark, f"{state}/{_MAINT_LOCK}")
    b2 = spark.createDataFrame(
        [(10, "third novel body now")], "doc_id LONG, text STRING"
    )
    with pytest.raises(RuntimeError, match="under maintenance"):
        ingest_batch(spark, state, b2, "b2")
    with pytest.raises(RuntimeError, match="lock .* is held"):
        compact_state(spark, state)
    import os

    os.remove(f"{state}/{_MAINT_LOCK}")
    # lock released after a successful maintenance run: both compose
    compact_state(spark, state)
    retract_documents(
        spark, state, spark.createDataFrame([(1,)], "doc_id LONG")
    )
    assert not os.path.exists(f"{state}/{_MAINT_LOCK}")
    s = ingest_batch(spark, state, b2, "b2")
    assert {r.doc_id for r in s.collect()} == {10}


def test_concurrent_writer_failures_all_surface(spark, tmp_path, monkeypatch):
    """When several concurrent state-plane writers fail together (e.g.
    a filesystem outage hitting every table), the raised error must be
    the FIRST plane's exception with every other failed plane attached
    as a note (advice r12) — not just the list-order first with the
    rest silently discarded."""
    import hadoop__spark.operators.ingest as ing

    surv = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id LONG, text STRING",
    )

    def boom_fp(*a, **k):
        raise IOError("fingerprints plane down")

    def boom_mh(*a, **k):
        raise IOError("text plane down")

    monkeypatch.setattr(ing, "fingerprint_write", boom_fp)
    monkeypatch.setattr(ing, "minhash_write_signatures", boom_mh)
    with pytest.raises(IOError) as ei:
        ing._write_state_tables(
            spark, str(tmp_path / "state"), surv, mode="bootstrap",
            text_col="text", id_col="doc_id", text_method="minhash",
            n=3, num_perm=8, threshold=0.8,
        )
    # futures are collected in writer-list order: fingerprints first
    assert "fingerprints plane down" in str(ei.value)
    notes = getattr(ei.value, "__notes__", [])
    assert any(
        "'text'" in n and "text plane down" in n for n in notes
    ), notes


def test_loop_derive_cannot_shadow_replay_contract(spark, tmp_path):
    """The streaming loop owns on_existing on BOTH option channels: a
    derive() returning it used to raise a duplicate-keyword TypeError
    inside foreachBatch and kill the query; now the loop strips it and
    the replay contract (skip on a committed batch id) holds."""
    from hadoop__spark.streaming import ingest_foreach_batch

    state = str(tmp_path / "state")
    cb = ingest_foreach_batch(
        state,
        derive=lambda df: {"on_existing": "fail", "threshold": 0.8},
        maintain="off",
    )
    docs = spark.createDataFrame(
        [(i, f"wholly distinct loop document number {i}") for i in range(1, 8)],
        "doc_id LONG, text STRING",
    )
    cb(docs, 1)
    cb(docs, 1)  # replay of the committed batch id must still no-op
    got = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{state}/batches/*").collect()
    )
    assert got == list(range(1, 8))
