"""Incremental distinct-count rollup maintenance — the streaming ingest
form of ``operators.sketches.q_hll_rollup``.

A 100 TB event pipeline cannot recount distinct users per
(event_type, day) from raw facts on every refresh. With mergeable HLL
sketches the maintenance loop is:

    micro-batch → per-(event_type, day) HLL sketch DELTA →
    append the few-KB delta → any reader merges deltas on read

The store is append-only sketch deltas (one parquet subdir per
micro-batch), so ingest never read-modifies shared state: a replayed
batch overwrites ITS OWN subdir (idempotent under foreachBatch's
at-least-once contract, same scheme as ``streaming.neardup``), and a
reader's ``hll_union_agg`` over whatever deltas exist is always
consistent — HLL union is associative, commutative, and idempotent at
the register level, so duplicate or reordered deltas cannot overcount.
``compact`` folds all deltas into one, keeping the store O(groups)
rather than O(batches × groups); it is safe to run any time because a
compacted store is just another delta layout.

The bit-exactness of merge-on-read (union of per-batch sketches ==
sketch of all rows, register-wise max) is pinned by
``tests/test_streaming.py::test_streaming_hll_rollup_matches_batch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STORE_SCHEMA = "event_type STRING, day DATE, sk BINARY, n_rows LONG"


def _sketch_deltas(batch_df: DataFrame) -> DataFrame:
    return batch_df.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("n_rows"),
    )


def hll_rollup_ingest(events_stream: DataFrame, store_dir: str):
    """Attach the rollup-maintenance stage to an events stream (columns
    ``user_id, event_type, ts``). Returns the DataStreamWriter — caller
    picks trigger/checkpoint and calls ``.start()``."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        _sketch_deltas(batch_df).write.mode("overwrite").parquet(
            f"{store_dir}/batch={batch_id}"
        )

    return events_stream.writeStream.foreachBatch(process_batch).outputMode("append")


def read_rollup(
    spark: SparkSession, store_dir: str, grain: str = "event_type"
) -> DataFrame:
    """Merge-on-read over the sketch deltas: approx distinct users plus
    exact row count per ``grain`` (``event_type`` or ``day`` or both via
    a list) — any rollup coarser than the stored (event_type, day)
    grain, without touching raw facts."""
    keys = [grain] if isinstance(grain, str) else list(grain)
    deltas = spark.read.schema(_STORE_SCHEMA).parquet(f"{store_dir}/batch=*")
    return (
        deltas.groupBy(*keys)
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.sum("n_rows").alias("n_rows"),
        )
        .orderBy(*keys)
    )


def compact(spark: SparkSession, store_dir: str) -> None:
    """Fold every delta into a single batch=compacted layout so the
    store stays O(groups). Readers before/after see identical results
    (HLL union associativity); concurrent ingest keeps appending new
    batch dirs which the next compaction folds in."""
    deltas = spark.read.schema(_STORE_SCHEMA).parquet(f"{store_dir}/batch=*")
    folded = deltas.groupBy("event_type", "day").agg(
        F.hll_union_agg("sk").alias("sk"), F.sum("n_rows").alias("n_rows")
    )
    # materialize before deleting the inputs it reads from
    folded.cache()
    folded.count()
    try:
        import shutil

        shutil.rmtree(store_dir)
        folded.write.mode("overwrite").parquet(f"{store_dir}/batch=compacted")
    finally:
        folded.unpersist()
