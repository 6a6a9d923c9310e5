"""Incremental token-frequency maintenance — the streaming ingest form
of ``operators.sketches.q_cms_heavy_hitters`` (completing the pattern:
``sketch_rollup`` ingests HLL, ``pca_rollup`` ingests PCA statistics,
this ingests Count-Min frequency sketches).

A 100 TB document feed cannot recount corpus-wide token frequencies on
every refresh. Count-Min sketches are mergeable by ELEMENT-WISE COUNTER
ADDITION, so the maintenance loop is:

    micro-batch → one CMS delta per source (~109 KB, any vocabulary) →
    append the delta → any reader merges deltas and probes tokens

Store contract follows ``pca_rollup``, NOT ``sketch_rollup``: CMS
merge, like summation and unlike HLL's register-max, is NOT idempotent
under duplication (a replayed delta double-counts) — so exactly-once
comes from the layout: one parquet subdir per micro-batch, a replayed
batch OVERWRITES its own subdir under foreachBatch's at-least-once
contract, and the reader globs whatever subdirs exist.

The merged-deltas == single-sketch-over-all-rows identity (exact, not
approximate: both orders add the same per-row counter increments into
the same seeded grid) is pinned by
``tests/test_streaming.py::test_streaming_cms_rollup_matches_batch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import CMS_CONFIDENCE, CMS_EPS, CMS_SEED

_STORE_SCHEMA = "source STRING, sk BINARY, n_tokens LONG"


def _sketch_deltas(batch_df: DataFrame) -> DataFrame:
    """One CMS delta per source for the micro-batch (columns
    ``source, text``) — same tokenization and sketch parameters as the
    batch operator, so deltas and batch sketches merge freely."""
    toks = batch_df.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    return toks.groupBy("source").agg(
        F.count_min_sketch(
            "token", F.lit(CMS_EPS), F.lit(CMS_CONFIDENCE), F.lit(CMS_SEED)
        ).alias("sk"),
        F.count("*").alias("n_tokens"),
    )


def _compacted_high_watermark(store_dir: str) -> int:
    """Highest micro-batch id already folded into a ``batch=compacted-N``
    subdir, or -1. Compaction encodes its coverage in the dir name so
    a REPLAYED batch (foreachBatch is at-least-once) can detect that
    its counts already live in the compacted blob and skip the
    re-write — without this, a replay after compaction would add its
    delta a second time and CMS's non-idempotent merge would
    double-count it."""
    import os
    import re

    hw = -1
    if os.path.isdir(store_dir):
        for name in os.listdir(store_dir):
            m = re.fullmatch(r"batch=compacted-(\d+)", name)
            if m:
                hw = max(hw, int(m.group(1)))
    return hw


def cms_ingest(docs_stream: DataFrame, store_dir: str):
    """Attach the frequency-maintenance stage to a documents stream
    (columns ``source, text``). Returns the DataStreamWriter — caller
    picks trigger/checkpoint and calls ``.start()``."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _compacted_high_watermark(store_dir):
            return  # replayed batch already folded into the compacted blob
        _sketch_deltas(batch_df).write.mode("overwrite").parquet(
            f"{store_dir}/batch={batch_id}"
        )

    return docs_stream.writeStream.foreachBatch(process_batch).outputMode(
        "append"
    )


def _read_deltas(spark: SparkSession, store_dir: str) -> list:
    """All delta rows in the store; an absent or not-yet-written store
    reads as empty rather than raising (a reader may race the first
    micro-batch)."""
    import os

    if not os.path.isdir(store_dir) or not any(
        name.startswith("batch=") for name in os.listdir(store_dir)
    ):
        return []
    return (
        spark.read.schema(_STORE_SCHEMA)
        .parquet(f"{store_dir}/batch=*")
        .collect()
    )


def read_frequencies(
    spark: SparkSession, store_dir: str, tokens: list[str]
) -> DataFrame:
    """Merge-on-read: estimated corpus-wide count for each probe token
    across every delta in the store. The collect is bounded by
    (#sources × #batches) sketch blobs — compaction keeps that
    O(sources) — and the probe set is caller-bounded; raw documents
    are never re-read. An empty/absent store yields zero estimates."""
    deltas = _read_deltas(spark, store_dir)
    jvm = spark.sparkContext._jvm
    merged = None
    total = 0
    for row in deltas:
        j = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytes(row["sk"])
        )
        total += row["n_tokens"]
        if merged is None:
            merged = j
        else:
            merged.mergeInPlace(j)
    rows = [
        (t, int(merged.estimateCount(t)) if merged else 0, total)
        for t in tokens
    ]
    return spark.createDataFrame(
        rows, "token STRING, est_count BIGINT, n_tokens_total BIGINT"
    )


def compact(spark: SparkSession, store_dir: str) -> None:
    """Fold every delta into one ``batch=compacted-N`` subdir (N = the
    highest micro-batch id folded, the replay high-watermark) so the
    store stays O(sources). CMS merge is associative and commutative,
    so readers before/after see identical estimates; the fold runs
    driver-side over the bounded blob set (there is no JVM-aggregate
    CMS merge function to push it into an executor plan).

    Crash-safe swap: the folded output is fully written into a sibling
    temp dir FIRST, then the old store is moved aside, the new one
    renamed into place, and the old one deleted — at no point is the
    only copy of the counts a partially-written directory."""
    import os
    import re
    import shutil

    deltas = _read_deltas(spark, store_dir)
    if not deltas:
        return
    hw = _compacted_high_watermark(store_dir)
    for name in os.listdir(store_dir):
        m = re.fullmatch(r"batch=(\d+)", name)
        if m:
            hw = max(hw, int(m.group(1)))
    jvm = spark.sparkContext._jvm
    by_source: dict[str, tuple] = {}
    for row in deltas:
        j = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytes(row["sk"])
        )
        if row["source"] in by_source:
            prev_j, prev_n = by_source[row["source"]]
            prev_j.mergeInPlace(j)
            by_source[row["source"]] = (prev_j, prev_n + row["n_tokens"])
        else:
            by_source[row["source"]] = (j, row["n_tokens"])
    out = []
    for source, (j, n) in sorted(by_source.items()):
        bos = jvm.java.io.ByteArrayOutputStream()
        j.writeTo(bos)
        out.append((source, bytearray(bos.toByteArray()), n))
    tmp_dir, old_dir = f"{store_dir}.compact-tmp", f"{store_dir}.compact-old"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(old_dir, ignore_errors=True)
    spark.createDataFrame(out, _STORE_SCHEMA).write.parquet(
        f"{tmp_dir}/batch=compacted-{hw}"
    )
    os.rename(store_dir, old_dir)
    os.rename(tmp_dir, store_dir)
    shutil.rmtree(old_dir)
