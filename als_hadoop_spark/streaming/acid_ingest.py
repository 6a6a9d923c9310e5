"""Exactly-once streaming ingest into a commit-log ACID table — the
fifth incremental maintainer (neardup / sketch / pca / cms rollups →
this), and the one that makes the others' ad-hoc store layouts
optional: a stream lands in a TRANSACTIONAL table that any batch
operator can snapshot-read mid-ingest.

Exactly-once under foreachBatch's at-least-once contract uses the
published Delta idempotent-writes recipe (txnAppId/txnVersion): every
commit carries ``{"txn": {"app": <app_id>, "batch": <n>}}``, and the
writer skips a batch whose number is already committed for its app id.
Unlike the per-batch-subdir overwrite scheme, a replayed batch here
never even stages files — the log remembers.

``app_id`` IDENTIFIES THE CHECKPOINT LINEAGE (batch numbers are
checkpoint-relative): restarting a stream from a fresh checkpoint
against the same table requires a fresh app_id, otherwise restarted
batch 0 is mistaken for a replay of old batch 0 and dropped — the
same rule Delta documents for txnAppId. One live writer per app_id
(a Structured Streaming query is single-driver by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.acid import AcidTable, CommitConflict


def acid_txn_append(
    tbl: AcidTable, batch_df: DataFrame, app_id: str, batch_id: int
) -> int | None:
    """Commit one micro-batch exactly once; None if it was a replay.
    Factored out of the foreachBatch closure so tests can drive the
    replay path without a checkpoint-restore harness."""
    if batch_id <= tbl.last_txn(app_id):
        return None
    return tbl.append(batch_df, txn={"app": app_id, "batch": batch_id})


def acid_append_sink(
    stream: DataFrame,
    table_path: str,
    app_id: str,
    optimize_every: int | None = None,
    target_files: int = 8,
):
    """Attach a stream to an ACID table. Returns the DataStreamWriter —
    caller picks trigger/checkpoint and calls ``.start()``.

    ``optimize_every=N`` folds auto-compaction into the sink (the
    Delta auto-OPTIMIZE pattern): after every N committed batches the
    writer also runs ``optimize(target_files)``, so a long-running
    append stream's per-batch small files are bounded at ~N + target
    instead of growing without limit — snapshot readers never see a
    mix (OPTIMIZE is one commit), and a compaction losing a commit
    race is skipped (data files are immutable; the next trigger
    retries). Replayed batches never trigger compaction (they commit
    nothing)."""
    spark = stream.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        tbl = AcidTable(spark, table_path)
        v = acid_txn_append(tbl, batch_df, app_id, batch_id)
        if (
            v is not None
            and optimize_every is not None
            and (batch_id + 1) % optimize_every == 0
        ):
            try:
                tbl.optimize(target_files)
            except CommitConflict:
                pass  # another writer moved the head; next trigger retries

    return stream.writeStream.foreachBatch(process_batch).outputMode("append")


def acid_merge_sink(
    stream: DataFrame, table_path: str, key: str, apply_fn, app_id: str
):
    """Continuous CDC apply: every micro-batch of changes MERGEs into
    the ACID table as one transaction — copy-on-write touches only the
    files holding the batch's keys, the commit carries the txn stamp,
    and a replayed batch is skipped from the log. This is the
    streaming form of q_acid_merge: a changelog stream keeps a queryable
    upserted table current, with every intermediate state time-
    travelable. ``apply_fn(touched_rows, changes)`` owns the WHEN
    MATCHED/NOT MATCHED semantics, same contract as ``AcidTable.merge``."""
    spark = stream.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        tbl = AcidTable(spark, table_path)
        if batch_id <= tbl.last_txn(app_id):
            return  # replay: this batch's merge is already committed
        tbl.merge(
            batch_df, key, apply_fn, txn={"app": app_id, "batch": batch_id}
        )

    return stream.writeStream.foreachBatch(process_batch).outputMode("update")
