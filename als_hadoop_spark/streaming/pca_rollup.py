"""Incremental PCA maintenance — the streaming ingest form of
``operators.pca`` (the same relationship ``sketch_rollup`` has to
``q_hll_rollup``).

PCA's sufficient statistics (n, Σx, XᵀX) are MERGEABLE: partials from
disjoint row sets sum exactly, so the maintenance loop is

    micro-batch → one (n, Σx, XᵀX) delta row (O(d²) bytes) →
    append the delta → any reader sums deltas and eigendecomposes

No raw vector is ever re-read: a 10⁹-row/day embedding feed adds a
few-KB delta per micro-batch, and "today's PCA basis" is a
sum + 64×64 eigh away at ANY moment. The store layout and idempotence
contract are the same as sketch_rollup's: one parquet subdir per
micro-batch, replayed batches overwrite their own subdir
(at-least-once → exactly-once), and summation is associative/
commutative so delta order never matters. Unlike HLL, deltas are NOT
idempotent under duplication (sums double-count) — which is exactly
why the per-batch-subdir overwrite scheme, not an append-log, is the
store contract.

The store is bound to ONE checkpoint lineage: batch ids are
checkpoint-relative, so a stream restarted with a FRESH checkpoint
renumbers from 0 and would overwrite old subdirs with differently-
bounded batches while stale higher-numbered dirs keep double-counting.
Content-digest keying (cms_rollup's answer) is brittle here — the
deltas are float sums, and bit-identical replay is an implementation
detail, not a contract — so the failure is made LOUD instead: batch 0
arriving over a store that already has later-batch history raises
rather than corrupting. Restarting from scratch means a fresh store
dir (the old one remains a valid, readable snapshot).

Merged stats == single-pass batch stats to float addition order
(pinned in tests/test_streaming.py); the eigenbasis follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DELTA_SCHEMA = "n BIGINT, s ARRAY<DOUBLE>, g ARRAY<DOUBLE>"


def _stat_delta(batch_df: DataFrame) -> DataFrame:
    """One (n, Σx, XᵀX) row for the micro-batch — the same
    mapInPandas gemm partials as the batch fit, reduced to a single
    row Spark-side (bounded d + d² key space)."""

    def partials(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            yield pd.DataFrame(
                {
                    "n": [np.int64(X.shape[0])],
                    "s": [X.sum(axis=0)],
                    "g": [(X.T @ X).ravel()],
                }
            )

    part = batch_df.select("embedding").mapInPandas(partials, _DELTA_SCHEMA)
    reduced = (
        part.select(
            "n", F.posexplode(F.concat(F.col("s"), F.col("g"))).alias("pos", "v")
        )
        .groupBy("pos")
        .agg(
            F.sum("v").alias("v"),
            F.sum(F.when(F.col("pos") == 0, F.col("n"))).alias("n"),
        )
    )
    return reduced.select("pos", "v", "n")


def pca_ingest(emb_stream: DataFrame, store_dir: str):
    """Attach PCA-statistics maintenance to an embedding stream
    (column ``embedding``). Returns the DataStreamWriter — caller
    picks trigger/checkpoint and calls ``.start()``."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id == 0:
            import os

            # batch 0 over a store with OTHER batches = a fresh
            # checkpoint pointed at an old store. A same-checkpoint
            # replay of batch 0 can only see batch=0 itself (replay is
            # of the last uncommitted batch), so this never false-fires.
            stale = [
                n
                for n in (
                    os.listdir(store_dir) if os.path.isdir(store_dir) else []
                )
                if n.startswith("batch=") and n != "batch=0"
            ]
            if stale:
                raise ValueError(
                    "pca_ingest: store already holds batches from another "
                    f"checkpoint lineage ({sorted(stale)[:3]}…); batch ids "
                    "are checkpoint-relative and sums double-count — point "
                    "a fresh checkpoint at a fresh store dir"
                )
        _stat_delta(batch_df).write.mode("overwrite").parquet(
            f"{store_dir}/batch={batch_id}"
        )

    return emb_stream.writeStream.foreachBatch(process_batch).outputMode("append")


def read_pca_stats(spark: SparkSession, store_dir: str):
    """Merge-on-read: sum the deltas and return (n, mean, cov) —
    driver memory O(d²), independent of rows or batches ingested."""
    import numpy as np

    merged = (
        spark.read.parquet(store_dir)
        .groupBy("pos")
        .agg(F.sum("v").alias("v"), F.sum("n").alias("n"))
        .collect()
    )
    d = int((-1 + (1 + 4 * len(merged)) ** 0.5) / 2)
    flat = np.zeros(d + d * d)
    n = 0
    for r in merged:
        flat[r["pos"]] = r["v"]
        if r["pos"] == 0:
            n = int(r["n"])
    if n < 2:
        raise ValueError(f"read_pca_stats: need >= 2 ingested vectors (got {n})")
    s, g = flat[:d], flat[d:].reshape(d, d)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    return n, mean, cov
