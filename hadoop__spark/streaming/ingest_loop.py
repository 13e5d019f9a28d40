"""The streaming ingest loop as one production verb: a foreachBatch
callback that folds each micro-batch into the persisted dedup state
(exactly-once via ``on_existing="skip"``) and runs the maintenance
window AUTOMATICALLY when :func:`~hadoop__spark.operators.ingest.
state_summary`'s advice says so — the operational glue a long-lived
stream otherwise re-implements by hand around
:func:`~hadoop__spark.operators.ingest.ingest_batch`.

Why automatic maintenance belongs here and not inside ``ingest_batch``:
foreachBatch invocations are SERIAL per query, so the gap between two
micro-batches is the one moment a maintenance window is guaranteed not
to race an ingest on the same driver — the two-sided advisory lock
still guards against other actors.

The reference (a HiveQL lineage analyzer, /root/reference README.md)
has no streaming surface; this composes this package's own tested
verbs (`ingest_batch`, `state_summary`, `maintain_state`).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from hadoop__spark.operators.ingest import (
    ingest_batch,
    maintain_state,
    state_summary,
)


def ingest_foreach_batch(
    state_dir: str,
    options: dict | None = None,
    derive: Callable[[DataFrame], dict] | None = None,
    maintain: str = "advice",
    keep_recent: int = 8,
    coalesce_after: int = 32,
    compact_after: int = 64,
    check_every: int = 10,
    name_prefix: str = "mb",
    refit: str = "off",
    refit_skew: float | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` callback for a streaming ingest
    loop::

        q = (stream.writeStream
             .foreachBatch(ingest_foreach_batch(state, options=dict(
                 group_cap=("src", 50), accounting_col="src")))
             .option("checkpointLocation", ckpt)
             .start())

    Per micro-batch: a non-empty frame is ingested as
    ``{name_prefix}{batch_id:09d}`` with ``on_existing="skip"`` (a
    foreachBatch RETRY of a committed batch_id no-ops via the commit
    marker — the exactly-once contract), then, on every
    ``check_every``-th batch, the zero-job advice of
    :func:`~hadoop__spark.operators.ingest.state_summary` is consulted
    and :func:`~hadoop__spark.operators.ingest.maintain_state`
    (fsck → coalesce → compact under one lock hold) runs if either
    threshold fired — so neither growth axis (snapshot count, probe-
    table files) is ever unbounded, without an operator cron.  The
    200-batch cadence rehearsal measured this mode flat on both axes
    (NOTES round 11; ``REHEARSAL_MAINTAIN=full``).

    ``options`` are static :func:`ingest_batch` keywords (text_method,
    group_cap, accounting_col, thresholds, …).  ``derive`` builds the
    PER-BATCH keyword dict from the micro-batch frame — the hook for
    inputs that arrive with the documents (e.g. ``lambda df:
    dict(scores=df.select("doc_id", "quality_score"))``); its result
    overrides ``options`` on key collisions.  ``maintain="off"``
    disables the window (run :func:`maintain_state` from a cron
    instead); ``keep_recent`` must stay ≥ the stream's replay horizon
    (a retry of a COALESCED batch name re-runs and re-dedups — corpus-
    safe but not free; see ``coalesce_snapshots``).

    ``refit="advice"`` extends the automatic window to the embedding
    plane: when the advice check sees IVF bucket skew past the
    :func:`state_summary` threshold (``refit_recommended`` — a
    drifting embedding stream concentrating into a hot bucket every
    probe then scans), the maintenance call also re-fits the
    centroids (``maintain_state(refit="advice")``).  Off by default:
    a refit is heavier than coalesce+compact and swaps the index
    layout mid-stream.  ``refit_skew`` overrides the summary's
    default max/mean trigger ratio (8).

    Restart semantics, both directions:

    * **Retry of a COMMITTED batch** (the stream replays offsets the
      sink already folded in): ``on_existing="skip"`` no-ops on the
      commit marker — exactly-once, tested.
    * **Restart after a crash MID-INGEST**: the crashed attempt left
      ``_INGEST_INPROGRESS`` standing, so the foreachBatch retry —
      and every later one — raises "another ingest_batch run is in
      flight" and the query stays down.  That is deliberate (the
      marker cannot distinguish a dead run from a live one on another
      driver); the recovery path is
      :func:`~hadoop__spark.operators.ingest.rebuild_state`, which
      clears the stale marker, repairs every half-appended table from
      the immutable snapshots, and leaves the state ready for the
      stream to restart — the interrupted micro-batch then re-runs
      cleanly from the source's checkpoint.
    """
    if maintain not in ("advice", "off"):
        raise ValueError(
            f"maintain must be 'advice' or 'off', got {maintain!r}"
        )
    if refit not in ("advice", "off"):
        raise ValueError(
            f"refit must be 'advice' or 'off', got {refit!r}"
        )
    if check_every < 1:
        raise ValueError(f"check_every must be >= 1, got {check_every}")
    if keep_recent < 1:
        raise ValueError(
            "keep_recent must be >= 1 in a streaming loop — coalescing "
            "the newest snapshot would turn every foreachBatch retry "
            "into a re-dedup instead of a marker no-op"
        )
    static = dict(options or {})
    static.pop("on_existing", None)  # the loop owns the replay contract
    batches_seen = {"n": 0}

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        per_batch = dict(derive(batch_df)) if derive is not None else {}
        # the loop owns the replay contract on BOTH channels: a derive
        # returning on_existing would otherwise be a duplicate-keyword
        # TypeError that kills the query
        per_batch.pop("on_existing", None)
        ingest_batch(
            spark,
            state_dir,
            batch_df,
            f"{name_prefix}{batch_id:09d}",
            on_existing="skip",
            **{**static, **per_batch},
        )
        batches_seen["n"] += 1
        if maintain == "off" or batches_seen["n"] % check_every:
            return
        advice = state_summary(
            spark,
            state_dir,
            coalesce_after=coalesce_after,
            compact_after=compact_after,
            refit_skew=refit_skew,
        )["advice"]
        if (
            advice["coalesce_recommended"]
            or advice["compact_recommended"]
            or (refit == "advice" and advice["refit_recommended"])
        ):
            maintain_state(
                spark,
                state_dir,
                keep_recent=keep_recent,
                refit=refit,
                refit_skew=refit_skew,
            )

    return _ingest
