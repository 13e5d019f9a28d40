"""The incremental corpus-ingest loop, end to end.

A 100 TB training-data pipeline does not re-dedup its corpus from
scratch per crawl — it maintains persisted dedup STATE (exact
fingerprints, MinHash signatures, an IVF embedding index) and folds
each new batch against that state:

1. exact:    :func:`~hadoop__spark.operators.dedup.fingerprint_filter_new`
2. near-dup: :func:`~hadoop__spark.operators.dedup.minhash_lsh_pairs_between`
   (or the SimHash / exact-ngram probes, per ``text_method``)
3. semantic: :func:`~hadoop__spark.operators.dedup.embedding_pairs_against_index`
4. within-batch dedup of what remains, then append the survivors to
   every state table (:func:`~hadoop__spark.operators.dedup.fingerprint_write`,
   :func:`~hadoop__spark.operators.dedup.minhash_write_signatures` /
   :func:`~hadoop__spark.operators.dedup.simhash_write_signatures` /
   :func:`~hadoop__spark.operators.dedup.ngram_append_index`,
   :func:`~hadoop__spark.operators.similarity.ivf_append_index`).

A crash between appends is recovered by :func:`rebuild_state` from
the immutable per-batch survivors snapshots.

:func:`ingest_batch` is that loop as one call.  Each primitive's
docstring argues its own composition claim; the end-to-end claim — a
two-batch ingest equals the from-scratch dedup of the union — is
pinned in tests/test_ingest.py.

The reference (a 2015 HiveQL lineage analyzer, /root/reference
README.md) has no ingest surface; this is beyond-reference pipeline
capability built from this package's own tested primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hadoop__spark.operators.dedup import (
    dedup_corpus,
    embedding_pairs_against_index,
    fingerprint_filter_new,
    fingerprint_write,
    minhash_lsh_pairs_between,
    minhash_write_signatures,
    ngram_append_index,
    ngram_jaccard_pairs_between,
    ngram_write_index,
    semantic_dedup,
    simhash_pairs_between,
    simhash_write_signatures,
)
from hadoop__spark.operators.corpus import (
    corpus_stats_sketch,
    decontaminate,
    eligibility_filter,
    overlap_sketch,
    score_sketch,
)
from hadoop__spark.operators.similarity import (
    ivf_append_index,
    ivf_write_index,
)
from hadoop__spark.operators.util import (
    delete_path as _delete_path,
    list_child_dirs as _list_child_dirs,
    table_exists as _table_exists,
    touch_file as _touch_file,
)

# written into a batch snapshot as the LAST step of ingest_batch: its
# presence proves every state append completed for that batch
_COMMIT_MARKER = "_INGEST_COMMITTED"

# advisory maintenance lock at {state_dir}/_MAINTENANCE_LOCK: held by
# compact_state / retract_documents while they delete-and-swap tables
# a concurrent reader may hold open; ingest_batch refuses to start
# while it exists.  Advisory — it turns the race into a loud refusal,
# not a transaction; a crashed maintenance run leaves a stale lock to
# delete by hand (the error message says so).
_MAINT_LOCK = "_MAINTENANCE_LOCK"


class _maintenance_lock:
    """Context manager: exclusively create the state's maintenance
    lock file, refusing when another run holds it; always released."""

    def __init__(self, spark, state_dir: str):
        self.spark = spark
        self.path = f"{state_dir}/{_MAINT_LOCK}"

    def __enter__(self):
        from hadoop__spark.operators.util import create_exclusive

        if not create_exclusive(self.spark, self.path):
            raise RuntimeError(
                f"maintenance lock {self.path} is held — another "
                "compact/retract run is active (or crashed and left it "
                "stale; delete the file after confirming nothing runs)"
            )
        return self

    def __exit__(self, *exc):
        _delete_path(self.spark, self.path)
        return False


def _drop_ids(df: DataFrame, id_col: str, bad_ids: DataFrame) -> DataFrame:
    """Anti-join ``df`` against a one-column frame of ids to remove."""
    return df.join(
        bad_ids.select(F.col(bad_ids.columns[0]).alias("_bad")),
        F.col(id_col) == F.col("_bad"),
        "left_anti",
    )


def ingest_batch(
    spark,
    state_dir: str,
    batch: DataFrame,
    batch_name: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    text_method: str = "minhash",
    threshold: float = 0.8,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket: int = 1000,
    max_hamming: int = 6,
    n_chunks: int = 4,
    scores: DataFrame | None = None,
    score_col: str = "quality_score",
    keep_frac: float | None = None,
    unscored: str = "drop",
    benchmark: DataFrame | None = None,
    group_cap: tuple[str, int] | None = None,
    embeddings: DataFrame | None = None,
    embedding_col: str = "embedding",
    semantic_threshold: float = 0.95,
    nlist: int | None = None,
    n_assign: int = 2,
    assign: str = "jvm",
    seed: int = 42,
    checkpoint_dir: str | None = None,
    accounting_col: str | None = None,
    on_existing: str = "fail",
) -> DataFrame:
    """Ingest one document batch against the persisted dedup state
    under ``state_dir``, returning the batch's SURVIVING rows (already
    appended to the state and materialized at
    ``{state_dir}/batches/{batch_name}``).

    The first call bootstraps: no state exists, so the batch is
    self-deduped and becomes the initial state
    (:func:`~hadoop__spark.operators.dedup.fingerprint_write` +
    :func:`~hadoop__spark.operators.dedup.minhash_write_signatures`,
    plus :func:`~hadoop__spark.operators.similarity.ivf_write_index`
    when ``embeddings`` is given).  Every later call runs the
    three-plane incremental filter — exact fingerprints, MinHash
    near-dups, IVF semantic near-dups, each O(batch) against the
    state, never O(corpus²) — then self-dedups the remainder and
    APPENDS its survivors to each state table.

    Keeper policy: first arrival wins ACROSS batches — a new document
    that duplicates anything already ingested is dropped, because the
    indexed copy is already published downstream and cannot be
    recalled.  ``scores`` therefore only arbitrates WITHIN a batch
    (routed to the quality-aware keepers of
    :func:`~hadoop__spark.operators.dedup.dedup_corpus` /
    :func:`~hadoop__spark.operators.dedup.semantic_dedup`).

    ``keep_frac`` (requires ``scores``) adds the incremental quality
    gate: the batch is filtered against the ``(1 - keep_frac)``
    quantile of the CORPUS-SO-FAR's retained score distribution, read
    from the KLL state at ``{state_dir}/score_sketches``
    (:func:`~hadoop__spark.operators.corpus.keep_top_fraction_from_sketch`
    — historical scores are never rescanned; the bootstrap batch
    gates against its own distribution).  ``unscored`` sets the
    policy for batch documents with no score row (``"drop"``
    default / ``"keep"``), mirroring
    :func:`~hadoop__spark.operators.corpus.prepare_corpus`.  The
    SURVIVORS' score sketch is appended to the state, so the gate
    always reflects what the corpus actually retains.

    ``benchmark`` decontaminates the batch first
    (:func:`~hadoop__spark.operators.corpus.decontaminate` —
    stateless, the eval set broadcasts).  ``group_cap=(col, k)``
    enforces ``k`` documents per ``col`` value across the WHOLE
    retained corpus: per-group admitted counts persist at
    ``{state_dir}/group_counts``, and a batch may only fill each
    group's remaining slots (best-scored first when ``scores`` is
    given, ascending id otherwise — first-arrival priority across
    batches, same as the dedup planes).  The cap runs before the
    within-batch dedup, mirroring
    :func:`~hadoop__spark.operators.corpus.prepare_corpus`'s stage
    order, so a group may end under-filled when cap survivors turn
    out to be duplicates — the cap bounds volume, it does not
    guarantee fill.  Both gate states (score sketches, group counts)
    accrue ONLY on calls that pass the corresponding option — use the
    same ``keep_frac``/``group_cap`` policy on every batch of a
    corpus, or the state under-counts what was admitted.  With
    ascending ids across batches this matches the from-scratch
    min-id keeper exactly (tested); with out-of-order ids the
    surviving SET differs only by which clique member represents
    each duplicate group.

    Scale shape: the batch is the small side everywhere — the exact
    filter is one anti-join on a 16-byte digest, the MinHash probe
    joins the batch's band table against the stored one (cost ∝ batch
    bucket memberships), the semantic probe partition-prunes the IVF
    index to the batch's bucket set, and the survivors are written to
    ``{state_dir}/batches/{batch_name}`` BEFORE the state appends, so
    the appends and the returned frame all scan that table instead of
    re-deriving the filter chain (and no state table is ever read and
    appended in the same job).  Within-batch semantic dedup fits its
    own centroids on the (small) batch; cross-batch probing always
    uses the index's frozen centroids.

    ``text_method`` picks the near-dup TEXT plane: ``"minhash"``
    (default — LSH-banded Jaccard at ``threshold``), ``"simhash"``
    (Hamming ≤ ``max_hamming`` over ``n_chunks`` chunk buckets,
    :func:`~hadoop__spark.operators.dedup.simhash_pairs_between`), or
    ``"ngram"`` (EXACT prefix-filtered Jaccard at ``threshold``,
    :func:`~hadoop__spark.operators.dedup.ngram_jaccard_pairs_between`
    against a frozen-df index that appends per batch).  The method is
    fixed at the corpus's bootstrap — each plane keeps its own state
    layout (minhash at the state root, ``{state_dir}/simhash``,
    ``{state_dir}/ngram``) and a later call with a different method is
    refused rather than silently probing a plane that holds none of
    the corpus.  The exact-fingerprint plane and the optional
    embedding plane run regardless of the choice.

    ``n``/``num_perm`` must match the stored MinHash state across
    calls (a ``num_perm`` mismatch is refused at the append; ``n`` is
    the caller's contract; the ngram plane cross-checks ``n`` AND
    ``threshold`` against its stored meta); ``nlist`` sizes the
    bootstrap IVF fit
    (default: the faiss ``max(16, 4√N)`` rule via
    :func:`~hadoop__spark.operators.dedup.semantic_dedup`'s sizing).

    ``accounting_col`` keeps the corpus-accounting state current
    without ever rescanning retained text: each batch appends its
    SURVIVORS' per-group sketch rows —
    :func:`~hadoop__spark.operators.corpus.corpus_stats_sketch` (HLL
    content/vocab) at ``{state_dir}/accounting/stats`` and
    :func:`~hadoop__spark.operators.corpus.overlap_sketch` (theta) at
    ``{state_dir}/accounting/overlap``.  Read them back through the
    standard mergers
    (:func:`~hadoop__spark.operators.corpus.merge_corpus_stats` →
    :func:`~hadoop__spark.operators.corpus.corpus_stats`;
    :func:`~hadoop__spark.operators.corpus.merge_overlap_sketches` →
    :func:`~hadoop__spark.operators.corpus.corpus_overlap`) — merged
    shard estimates equal the single-pass estimate exactly, so the
    dashboard numbers match a from-scratch scan of the retained
    corpus (tested).  Like the other policy states, the accounting
    accrues only on calls that pass the option — use it on every
    batch of a corpus or the state under-counts.

    ``on_existing`` governs a replayed ``batch_name`` (default
    ``"fail"`` — loud).  ``"skip"`` is the foreachBatch exactly-once
    mode: a retried micro-batch re-runs with the SAME batch_id, and a
    batch whose commit marker exists (written as the loop's last
    step, after every state append) returns its stored survivors
    without touching state; a snapshot WITHOUT the marker crashed
    mid-append and still refuses — :func:`rebuild_state` restores the
    markers it re-covers.

    Durability note: each state append is atomic per table (parquet
    commit protocol), but the appends are NOT atomic as a group — a
    crash between them leaves the state tables at different batch
    frontiers.  Recovery is :func:`rebuild_state`: every
    ``{state_dir}/batches/*`` is an immutable survivors snapshot
    (written BEFORE any state append, so the snapshot always covers
    at least what the state tables saw), and the writers re-run over
    their union with ``mode="overwrite"`` (chaos-tested in
    tests/test_ingest.py).  At 100 TB wrap the appends in the
    lakehouse transaction layer of the deployment instead.
    """
    if on_existing not in ("fail", "skip"):
        raise ValueError(
            f"on_existing must be 'fail' or 'skip', got {on_existing!r}"
        )
    if _table_exists(spark, f"{state_dir}/{_MAINT_LOCK}"):
        # a compact/retract run is deleting-and-swapping the tables
        # this ingest would read and append — refuse loudly instead of
        # racing the swap (advisory; see _MAINT_LOCK)
        raise RuntimeError(
            f"state at {state_dir} is under maintenance "
            f"({_MAINT_LOCK} present) — retry after it completes, or "
            "delete a stale lock by hand"
        )
    batch_path = f"{state_dir}/batches/{batch_name}"
    if _table_exists(spark, batch_path):
        # fail FAST (before any dedup compute): a reused name would
        # overwrite this staging table while the earlier run's state
        # appends remain — a silent double-append.  With
        # on_existing="skip" a COMMITTED batch (marker present = every
        # state append finished) is returned as-is — the idempotent
        # no-op a foreachBatch retry needs; a snapshot WITHOUT the
        # marker crashed mid-append and still refuses (replaying it
        # would double-append — run rebuild_state first).
        if on_existing == "skip" and _table_exists(
            spark, f"{batch_path}/{_COMMIT_MARKER}"
        ):
            return spark.read.parquet(batch_path)
        raise ValueError(
            f"batch {batch_name!r} was already ingested into "
            f"{state_dir} (staging table exists"
            + (
                " without a commit marker — it crashed mid-append; "
                "rebuild_state, then re-ingest under a new name)"
                if on_existing == "skip"
                else "); pick a new name, or pass on_existing='skip' "
                "for idempotent stream replays"
            )
        )
    if text_method not in ("minhash", "simhash", "ngram"):
        raise ValueError(
            "text_method must be 'minhash', 'simhash' or 'ngram', "
            f"got {text_method!r}"
        )
    # the near-dup plane's state location per method; minhash keeps
    # its original layout at the state root, the later planes nest
    plane_state = {
        "minhash": (state_dir, f"{state_dir}/signatures"),
        "simhash": (f"{state_dir}/simhash", f"{state_dir}/simhash/signatures"),
        "ngram": (f"{state_dir}/ngram", f"{state_dir}/ngram/meta"),
    }
    plane_path, plane_marker = plane_state[text_method]
    bootstrap = not _table_exists(spark, f"{state_dir}/fingerprints")
    if not bootstrap and not _table_exists(spark, plane_marker):
        # the corpus was bootstrapped under a DIFFERENT text_method —
        # probing the wrong plane would silently admit near-dups of
        # everything already ingested
        raise ValueError(
            f"state at {state_dir} has no {text_method!r} plane: it was "
            "built with a different text_method; use the original "
            "method or rebuild the state"
        )
    if not bootstrap and text_method == "ngram":
        # fail FAST on a parameter drift the end-of-batch append would
        # refuse anyway — by then the fingerprint/gate appends would
        # already have committed, stranding the state mid-batch
        meta = spark.read.parquet(f"{plane_path}/meta").first()
        if n != meta.n or abs(threshold - meta.threshold) > 1e-12:
            raise ValueError(
                f"ngram ingest with n={n}, threshold={threshold} onto a "
                f"plane written with n={meta.n}, "
                f"threshold={meta.threshold} — match the stored "
                "parameters or rebuild the state"
            )
    if scores is not None:
        # one row per id (same collapse as prepare_corpus): duplicate
        # score rows would fan out the group-cap rank join — a doc
        # occupying several rank slots starves its group — and
        # double-count in the persisted score sketch
        scores = scores.groupBy(id_col).agg(
            F.max(score_col).alias(score_col)
        )
    fresh = batch
    if benchmark is not None:
        fresh = decontaminate(fresh, benchmark, text_col, id_col)
    if not bootstrap:
        # plane 1: exact copies of anything already ingested
        fresh = fingerprint_filter_new(
            spark, state_dir, fresh, text_col, id_col
        )
        # plane 2: near-dups of the indexed corpus, probed on the
        # state's text plane (each probe's exactness claim — equal to
        # the cross-corpus slice of a full self-pairing — is its own
        # docstring's and test's)
        if text_method == "minhash":
            cross = minhash_lsh_pairs_between(
                spark,
                plane_path,
                fresh,
                text_col,
                id_col,
                n=n,
                bands=bands,
                threshold=threshold,
                max_bucket=max_bucket,
            )
        elif text_method == "simhash":
            cross = simhash_pairs_between(
                spark,
                plane_path,
                fresh,
                text_col,
                id_col,
                n=n,
                max_hamming=max_hamming,
                n_chunks=n_chunks,
            )
        else:
            cross = ngram_jaccard_pairs_between(
                spark, plane_path, fresh, text_col, id_col,
                threshold=threshold,
            )
        fresh = _drop_ids(fresh, id_col, cross.select("id_new").distinct())

    sketch_path = f"{state_dir}/score_sketches"
    counts_path = f"{state_dir}/group_counts"
    if keep_frac is not None or group_cap is not None:
        state_sk = None
        if keep_frac is not None:
            if scores is None:
                raise ValueError("keep_frac needs a scores frame")
            # gate against the corpus-so-far's retained distribution;
            # the bootstrap batch (no state yet) gates against its
            # own — the scores of its ELIGIBLE rows (semi-joined to
            # the decontaminated batch, not the whole caller-supplied
            # frame, which may span the corpus or score-correlated
            # dropped docs)
            state_sk = (
                spark.read.parquet(sketch_path)
                if _table_exists(spark, sketch_path)
                else score_sketch(
                    scores.select(id_col, score_col).join(
                        fresh.select(id_col), id_col, "left_semi"
                    ),
                    score_col=score_col,
                )
            )
        # the shared eligibility stage (KLL-state cutoff,
        # remaining-slots cap against the persisted admitted counts)
        fresh = eligibility_filter(
            fresh,
            id_col,
            scores,
            score_col,
            keep_frac=keep_frac,
            unscored=unscored,
            gate_sketches=state_sk,
            group_cap=group_cap,
            used_counts=(
                spark.read.parquet(counts_path)
                if group_cap is not None and _table_exists(spark, counts_path)
                else None
            ),
        )

    # within-batch dedup: exact FIRST (minhash pairs do NOT subsume
    # exact copies of texts shorter than the shingle order — zero-
    # shingle rows never enter the LSH — and a capped hot bucket can
    # drop identical-text pairs), then near-dup on the exact
    # survivors.  The published corpus and the fingerprint table stay
    # one-row-per-text consistent.
    surv = dedup_corpus(fresh, text_col, id_col, method="fingerprint")
    if text_method == "minhash":
        method_kwargs = dict(
            threshold=threshold, n=n, num_perm=num_perm, bands=bands,
            max_bucket=max_bucket,
        )
    elif text_method == "simhash":
        method_kwargs = dict(
            n=n, max_hamming=max_hamming, n_chunks=n_chunks,
        )
    else:
        method_kwargs = dict(threshold=threshold, n=n)
    surv = dedup_corpus(
        surv,
        text_col,
        id_col,
        method=text_method,
        scores=scores,
        score_col=score_col,
        checkpoint_dir=checkpoint_dir,
        **method_kwargs,
    )

    ivf_path = f"{state_dir}/ivf"
    text_surv_path = None
    if embeddings is not None:
        # materialize the text-plane survivors BEFORE the semantic
        # stage: semantic_dedup runs several independent actions
        # (sizing count, centroid-fit sample, assignment, pairing),
        # each of which would otherwise re-derive the whole lazy
        # filter chain — including the minhash self-join
        text_surv_path = f"{state_dir}/tmp/{batch_name}_text_survivors"
        surv.write.mode("overwrite").parquet(text_surv_path)
        surv = spark.read.parquet(text_surv_path)
        emb = embeddings.select(
            F.col(id_col).alias("_eid"), F.col(embedding_col)
        ).join(
            surv.select(F.col(id_col).alias("_eid")), "_eid", "left_semi"
        ).select(F.col("_eid").alias(id_col), embedding_col)
        if _table_exists(spark, f"{ivf_path}/centroids"):
            # plane 3: semantic near-dups of the indexed corpus
            # (frozen-centroid assignment, partition-pruned probe)
            cross_e = embedding_pairs_against_index(
                spark,
                ivf_path,
                emb,
                embedding_col,
                id_col,
                threshold=semantic_threshold,
                n_assign=n_assign,
                assign=assign,
            )
            dup_e = cross_e.select("id_new").distinct()
            surv = _drop_ids(surv, id_col, dup_e)
            emb = _drop_ids(emb, id_col, dup_e)
        # within-batch semantic dedup (fits its own centroids on the
        # small batch; scores arbitrate keepers as in dedup_corpus)
        kept_e = semantic_dedup(
            emb,
            vec_col=embedding_col,
            id_col=id_col,
            threshold=semantic_threshold,
            nlist=nlist,
            n_assign=n_assign,
            seed=seed,
            scores=scores,
            score_col=score_col,
            checkpoint_dir=checkpoint_dir,
            assign=assign,
        )
        sem_dropped = emb.select(id_col).join(
            kept_e.select(F.col(id_col).alias("_k")),
            F.col(id_col) == F.col("_k"),
            "left_anti",
        )
        surv = _drop_ids(surv, id_col, sem_dropped.select(id_col))

    # materialize the survivors ONCE; everything below (three state
    # appends + the returned frame) scans this table instead of
    # re-running the filter chain — and the fingerprint append no
    # longer reads the table it writes
    surv.write.mode("overwrite").parquet(batch_path)
    if text_surv_path is not None:
        # the text-survivors staging table fed the semantic stage and
        # the batch_path write above; done with it — without this, the
        # tmp dir accrues one full survivors copy per batch forever
        _delete_path(spark, text_surv_path)
    surv_m = spark.read.parquet(batch_path)

    write_mode = "overwrite" if bootstrap else "append"
    if group_cap is not None:
        # append the survivors' per-group admitted counts — the cap
        # state counts what the corpus retains, not what was offered
        (
            surv_m.groupBy(group_cap[0])
            .agg(F.count("*").cast("bigint").alias("n_admitted"))
            .write.mode(write_mode)
            .parquet(counts_path)
        )
    if keep_frac is not None:
        # append the SURVIVORS' score sketch: the gate state tracks
        # the distribution of what the corpus actually retains
        surv_scores = scores.select(id_col, score_col).join(
            surv_m.select(F.col(id_col).alias("_sid")),
            F.col(id_col) == F.col("_sid"),
            "left_semi",
        )
        score_sketch(surv_scores, score_col=score_col).write.mode(
            write_mode
        ).parquet(sketch_path)
    if accounting_col is not None:
        # append the SURVIVORS' accounting sketches — kilobytes per
        # group, merged at read time; cache=False so a daily loop
        # leaves no CacheManager residency behind (the base frame is
        # batch-sized; tokenizing it twice is cheaper than a leak)
        corpus_stats_sketch(
            surv_m, group_cols=[accounting_col], text_col=text_col,
            id_col=id_col, cache=False,
        ).write.mode(write_mode).parquet(f"{state_dir}/accounting/stats")
        overlap_sketch(
            surv_m, group_col=accounting_col, text_col=text_col
        ).write.mode(write_mode).parquet(f"{state_dir}/accounting/overlap")
    fingerprint_write(surv_m, state_dir, text_col, id_col, mode=write_mode)
    if text_method == "minhash":
        minhash_write_signatures(
            surv_m, plane_path, text_col, id_col, n=n, num_perm=num_perm,
            mode=write_mode,
        )
    elif text_method == "simhash":
        simhash_write_signatures(
            surv_m, plane_path, text_col, id_col, n=n, mode=write_mode
        )
    elif bootstrap:
        ngram_write_index(
            surv_m, plane_path, text_col, id_col, n=n, threshold=threshold
        )
    else:
        # the append cross-checks n/threshold against the stored meta
        ngram_append_index(
            spark, plane_path, surv_m, text_col, id_col, n=n,
            threshold=threshold,
        )
    if embeddings is not None:
        emb_m = embeddings.select(
            F.col(id_col).alias("_eid"), F.col(embedding_col)
        ).join(
            surv_m.select(F.col(id_col).alias("_eid")), "_eid", "left_semi"
        ).select(F.col("_eid").alias(id_col), embedding_col)
        if bootstrap or not _table_exists(spark, f"{ivf_path}/centroids"):
            n_emb = emb_m.count()
            if n_emb == 0:
                # no embedded survivors to fit on — leave the index
                # unwritten; a later batch with embeddings bootstraps
                _touch_file(spark, f"{batch_path}/{_COMMIT_MARKER}")
                return surv_m
            fit_nlist = nlist
            if fit_nlist is None:
                fit_nlist = max(16, int(4 * n_emb**0.5))
            ivf_write_index(
                emb_m, ivf_path, nlist=fit_nlist, vec_col=embedding_col,
                id_col=id_col, seed=seed,
            )
        else:
            ivf_append_index(
                spark, ivf_path, emb_m, vec_col=embedding_col, id_col=id_col
            )
    # LAST step: the batch's commit marker — every state append above
    # completed, so an on_existing="skip" replay may safely no-op
    _touch_file(spark, f"{batch_path}/{_COMMIT_MARKER}")
    return surv_m


def rebuild_state(
    spark,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    text_method: str = "minhash",
    n: int = 3,
    num_perm: int = 64,
    threshold: float = 0.8,
    scores: DataFrame | None = None,
    score_col: str = "quality_score",
    group_cap_col: str | None = None,
    embeddings: DataFrame | None = None,
    embedding_col: str = "embedding",
    nlist: int | None = None,
    seed: int = 42,
    accounting_col: str | None = None,
) -> DataFrame:
    """Rebuild the ingest state under ``state_dir`` from its immutable
    per-batch survivors snapshots (``{state_dir}/batches/*``) — the
    crash-recovery recipe of :func:`ingest_batch`'s durability note,
    as code.

    :func:`ingest_batch` materializes each batch's survivors BEFORE
    any state append, so after a crash between appends the snapshots
    are the single source of truth: this re-runs every writer over
    their union with ``mode="overwrite"``, producing the state a
    crash-free run would hold (signature/fingerprint tables equal
    row-for-row — chaos-tested).  A snapshot directory without a
    parquet ``_SUCCESS`` marker is a batch that crashed DURING its
    own materialization — before any state append ran — so it was
    never ingested: the partial directory is deleted (freeing the
    batch name for a clean re-ingest) and excluded from the rebuild.

    Pass the SAME ``text_method``/``n``/``num_perm``/``threshold`` the
    corpus was ingested with.  The policy states rebuild only when
    their inputs are supplied, since survivors snapshots hold
    documents, not scores: ``scores`` (a corpus-wide ``(id, score)``
    frame) rebuilds ``score_sketches`` — one consolidated sketch row
    whose quantiles equal the incrementally-appended state's (exactly
    below the sketch's exact regime, within rank error above);
    ``group_cap_col`` rebuilds ``group_counts`` (same per-group totals,
    consolidated to one row per group); ``embeddings`` rebuilds the
    IVF index over the surviving vectors — with freshly fitted
    centroids (often better than the bootstrap batch's frozen ones;
    probe exactness needs only internal consistency, so subsequent
    :func:`ingest_batch` calls compose as before);
    ``accounting_col`` rebuilds the accounting sketches (no external
    input needed — the snapshots hold the documents; the consolidated
    rows are merge-equivalent to the per-batch ones).  Omitting an
    input leaves that state table untouched — rebuild it later or
    accept the documented accrual caveat.

    Returns the unioned survivors frame (read back from the
    snapshots).
    """
    if text_method not in ("minhash", "simhash", "ngram"):
        raise ValueError(
            "text_method must be 'minhash', 'simhash' or 'ngram', "
            f"got {text_method!r}"
        )
    # refuse a text_method that contradicts the surviving state layout:
    # rebuilding the WRONG plane would leave the corpus's real plane
    # stale, and every later ingest_batch would probe it and silently
    # admit near-dups of the rebuilt-over batches.  (After a crash the
    # plane tables may be behind, but their layout markers survive —
    # only a state dir with NO recognizable plane skips the check.)
    markers = {
        "minhash": f"{state_dir}/signatures",
        "simhash": f"{state_dir}/simhash/signatures",
        "ngram": f"{state_dir}/ngram/meta",
    }
    present = [m for m, p in markers.items() if _table_exists(spark, p)]
    if present and text_method not in present:
        raise ValueError(
            f"state at {state_dir} holds a {present[0]!r} plane but "
            f"rebuild was asked for {text_method!r} — pass the "
            "text_method the corpus was ingested with"
        )
    if text_method == "minhash" and _table_exists(spark, markers["minhash"]):
        stored_perm = sum(
            c.startswith("mh_")
            for c in spark.read.parquet(markers["minhash"]).columns
        )
        if stored_perm != num_perm:
            raise ValueError(
                f"rebuild with num_perm={num_perm} onto a corpus signed "
                f"with num_perm={stored_perm} — a silent downgrade would "
                "make every later append refuse; pass the stored value"
            )
    if text_method == "ngram" and _table_exists(spark, markers["ngram"]):
        meta = spark.read.parquet(markers["ngram"]).first()
        if n != meta.n or abs(threshold - meta.threshold) > 1e-12:
            raise ValueError(
                f"rebuild with n={n}, threshold={threshold} onto an "
                f"index written with n={meta.n}, "
                f"threshold={meta.threshold} — pass the stored values"
            )
    batch_dirs = _list_child_dirs(spark, f"{state_dir}/batches")
    complete = []
    for b in batch_dirs:
        if _table_exists(spark, f"{b}/_SUCCESS"):
            complete.append(b)
        else:
            _delete_path(spark, b)
    if not complete:
        raise ValueError(
            f"no complete batch snapshots under {state_dir}/batches — "
            "nothing to rebuild from"
        )
    union = spark.read.parquet(complete[0])
    for b in complete[1:]:
        union = union.unionByName(
            spark.read.parquet(b), allowMissingColumns=True
        )
    fingerprint_write(union, state_dir, text_col, id_col, mode="overwrite")
    if text_method == "minhash":
        minhash_write_signatures(
            union, state_dir, text_col, id_col, n=n, num_perm=num_perm,
            mode="overwrite",
        )
    elif text_method == "simhash":
        simhash_write_signatures(
            union, f"{state_dir}/simhash", text_col, id_col, n=n,
            mode="overwrite",
        )
    else:
        ngram_write_index(
            union, f"{state_dir}/ngram", text_col, id_col, n=n,
            threshold=threshold,
        )
    if scores is not None:
        surv_scores = (
            scores.groupBy(id_col)
            .agg(F.max(score_col).alias(score_col))
            .join(
                union.select(F.col(id_col).alias("_sid")),
                F.col(id_col) == F.col("_sid"),
                "left_semi",
            )
        )
        score_sketch(surv_scores, score_col=score_col).write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/score_sketches")
    if group_cap_col is not None:
        (
            union.groupBy(group_cap_col)
            .agg(F.count("*").cast("bigint").alias("n_admitted"))
            .write.mode("overwrite")
            .parquet(f"{state_dir}/group_counts")
        )
    if accounting_col is not None:
        # snapshots hold the documents themselves, so the accounting
        # sketches rebuild without external inputs — consolidated to
        # one row per group (merge-equivalent, tested)
        corpus_stats_sketch(
            union, group_cols=[accounting_col], text_col=text_col,
            id_col=id_col, cache=False,
        ).write.mode("overwrite").parquet(f"{state_dir}/accounting/stats")
        overlap_sketch(
            union, group_col=accounting_col, text_col=text_col
        ).write.mode("overwrite").parquet(
            f"{state_dir}/accounting/overlap"
        )
    if embeddings is not None:
        emb = embeddings.select(
            F.col(id_col).alias("_eid"), F.col(embedding_col)
        ).join(
            union.select(F.col(id_col).alias("_eid")), "_eid", "left_semi"
        ).select(F.col("_eid").alias(id_col), embedding_col)
        n_emb = emb.count()
        if n_emb:
            fit_nlist = nlist or max(16, int(4 * n_emb**0.5))
            ivf_write_index(
                emb, f"{state_dir}/ivf", nlist=fit_nlist,
                vec_col=embedding_col, id_col=id_col, seed=seed,
            )
    # after a rebuild the state covers every complete snapshot by
    # construction, so each one is (re-)marked committed — including
    # snapshots whose original ingest crashed mid-append, and
    # retraction-rewritten snapshots whose marker the swap dropped;
    # on_existing="skip" replays then no-op correctly again
    for b in complete:
        _touch_file(spark, f"{b}/{_COMMIT_MARKER}")
    return union


def retract_documents(
    spark,
    state_dir: str,
    ids: DataFrame,
    id_col: str = "doc_id",
    **rebuild_kwargs,
) -> DataFrame:
    """Remove documents from an ingested corpus — the takedown /
    right-to-be-forgotten operation a long-lived training corpus
    needs.  ``ids`` is a frame with an ``id_col`` column of
    document ids to retract (other columns are ignored).

    The per-batch survivors snapshots are the corpus's source of
    truth (:func:`rebuild_state` rebuilds every state table from
    them), so retraction is: rewrite each snapshot WITHOUT the
    retracted ids (write-new / swap — a parquet table cannot be
    overwritten while it is being read), then rebuild the state from
    the surviving snapshots via :func:`rebuild_state`, forwarding
    ``rebuild_kwargs`` (``text_method``, ``num_perm``, ``scores``,
    ``group_cap_col``, ``embeddings``, ``accounting_col``, … — pass
    the same parameters the corpus was ingested with; the layout
    guards refuse mismatches).  Returns the rebuilt survivors union.

    Retraction semantics are the inverse of first-arrival: once a
    document is retracted, it is GONE from every plane — a later
    arrival of the same text (or vector) is ADMITTED again, because
    nothing in the corpus duplicates it anymore (tested).  Documents
    that were DROPPED as duplicates of a retracted keeper are not
    resurrected — they were never published, and their content
    re-enters with the next arrival.

    Scale shape: one anti-join + rewrite per batch snapshot that
    actually contains a retracted id (checked with a cheap semi-join
    count; untouched snapshots are not rewritten), then the rebuild's
    one pass over the retained corpus.  At 100 TB, prefer a lakehouse
    DELETE on the snapshot tables and the same rebuild.
    """
    retract = ids.select(F.col(id_col).alias("_retract")).distinct()
    batch_dirs = _list_child_dirs(spark, f"{state_dir}/batches")
    if not batch_dirs:
        raise ValueError(f"no batch snapshots under {state_dir}/batches")
    with _maintenance_lock(spark, state_dir):
        for b in batch_dirs:
            if not _table_exists(spark, f"{b}/_SUCCESS"):
                continue  # partial snapshot; rebuild_state sweeps it
            snap = spark.read.parquet(b)
            hit = snap.join(
                retract, F.col(id_col) == F.col("_retract"), "left_semi"
            ).limit(1).count()
            if not hit:
                continue
            kept = snap.join(
                retract, F.col(id_col) == F.col("_retract"), "left_anti"
            )
            tmp = f"{b}__retract_tmp"
            kept.write.mode("overwrite").parquet(tmp)
            _delete_path(spark, b)
            # same-filesystem rename: atomic on HDFS/local,
            # metadata-only; a crash between the delete and the rename
            # leaves the data at {snapshot}__retract_tmp — rename it
            # back by hand before rebuilding
            jvm = spark._jvm
            src = jvm.org.apache.hadoop.fs.Path(tmp)
            dst = jvm.org.apache.hadoop.fs.Path(b)
            fs = src.getFileSystem(spark._jsc.hadoopConfiguration())
            if not fs.rename(src, dst):
                raise IOError(f"rename {tmp} -> {b} failed")
        return rebuild_state(spark, state_dir, id_col=id_col, **rebuild_kwargs)


def compact_state(
    spark,
    state_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict[str, int]:
    """Compact the ingest state's append-grown tables in place — the
    operational counterpart of appending per batch: every
    :func:`ingest_batch` call adds at least one parquet file per
    state table, and after thousands of batches the probes' scan cost
    is task-launch and footer reads, not I/O (the classic small-files
    failure).  Run this periodically from the maintenance window; the
    advisory maintenance lock (``_MAINTENANCE_LOCK`` in the state
    dir, shared with :func:`retract_documents`) makes a concurrent
    :func:`ingest_batch` refuse loudly instead of racing the swap.

    Each table present is rewritten right-sized via
    :func:`~hadoop__spark.sources.io.compact_parquet` (sorted by its
    probe key, so row-group stats cluster) and swapped in
    (write-new / delete / rename).  Row CONTENT is untouched — probes
    read the same state, just from fewer files (tested).  Skipped on
    purpose: ``batches/*`` (immutable snapshots — the rebuild and
    retraction source of truth) and ``ivf/`` (partitioned by
    centroid; compacting would flatten the partition pruning the
    probes rely on).

    Returns ``{table: files_written}`` for the tables that existed.
    """
    from hadoop__spark.sources.io import compact_parquet

    tables = {
        "fingerprints": ["fp"],
        "shingles": ["_id"],
        "signatures": ["_id"],
        "simhash/signatures": ["_id"],
        "ngram/shingle_sets": ["_id"],
        "ngram/prefix": ["_s"],
        "ngram/doc_freq": ["_s"],
        "score_sketches": None,
        "group_counts": None,
        "accounting/stats": None,
        "accounting/overlap": None,
    }
    jvm = spark._jvm
    fs_conf = spark._jsc.hadoopConfiguration()
    done: dict[str, int] = {}
    with _maintenance_lock(spark, state_dir):
        for rel, sort_by in tables.items():
            path = f"{state_dir}/{rel}"
            if not _table_exists(spark, path):
                continue
            tmp = f"{path}__compact_tmp"
            n = compact_parquet(
                spark, path, tmp, target_file_bytes=target_file_bytes,
                sort_by=sort_by,
            )
            _delete_path(spark, path)
            # a crash between this delete and the rename leaves the
            # data at {table}__compact_tmp — rename it back by hand
            src = jvm.org.apache.hadoop.fs.Path(tmp)
            dst = jvm.org.apache.hadoop.fs.Path(path)
            if not src.getFileSystem(fs_conf).rename(src, dst):
                raise IOError(f"rename {tmp} -> {path} failed")
            done[rel] = n
    return done


def state_summary(spark, state_dir: str) -> dict:
    """Operational snapshot of an ingest state dir — what an on-call
    engineer checks before touching it: which text plane the corpus
    uses, per-table row counts, and every batch snapshot with its
    commit status (an uncommitted snapshot means a mid-append crash —
    run :func:`rebuild_state`).

    Driver-side metadata only (listings + parquet count jobs); no
    corpus-scale shuffle.  Returns::

        {"text_method": "minhash" | "simhash" | "ngram" | None,
         "tables": {relpath: row_count, ...},
         "batches": [{"name", "rows", "committed"}, ...],
         "needs_rebuild": bool}   # any complete-but-uncommitted batch
    """
    markers = {
        "minhash": f"{state_dir}/signatures",
        "simhash": f"{state_dir}/simhash/signatures",
        "ngram": f"{state_dir}/ngram/meta",
    }
    method = next(
        (m for m, p in markers.items() if _table_exists(spark, p)), None
    )
    tables = {}
    for rel in (
        "fingerprints", "shingles", "signatures", "simhash/signatures",
        "ngram/shingle_sets", "ngram/prefix", "ngram/doc_freq",
        "score_sketches", "group_counts", "accounting/stats",
        "accounting/overlap", "ivf/assigned",
    ):
        if _table_exists(spark, f"{state_dir}/{rel}"):
            tables[rel] = spark.read.parquet(f"{state_dir}/{rel}").count()
    batches = []
    needs_rebuild = False
    for b in _list_child_dirs(spark, f"{state_dir}/batches"):
        name = b.rstrip("/").rsplit("/", 1)[-1]
        complete = _table_exists(spark, f"{b}/_SUCCESS")
        committed = _table_exists(spark, f"{b}/{_COMMIT_MARKER}")
        batches.append(
            {
                "name": name,
                "rows": spark.read.parquet(b).count() if complete else None,
                "committed": committed,
            }
        )
        if complete and not committed:
            needs_rebuild = True
    return {
        "text_method": method,
        "tables": tables,
        "batches": batches,
        "needs_rebuild": needs_rebuild,
    }
