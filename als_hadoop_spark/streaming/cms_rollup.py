"""Incremental token-frequency maintenance — the streaming ingest form
of ``operators.sketches.q_cms_heavy_hitters`` (completing the pattern:
``sketch_rollup`` ingests HLL, ``pca_rollup`` ingests PCA statistics,
this ingests Count-Min frequency sketches).

A 100 TB document feed cannot recount corpus-wide token frequencies on
every refresh. Count-Min sketches are mergeable by ELEMENT-WISE COUNTER
ADDITION, so the maintenance loop is:

    micro-batch → one CMS delta per source (~109 KB, any vocabulary) →
    append the delta → any reader merges deltas and probes tokens

Exactly-once under at-least-once replay: CMS merge, like summation and
unlike HLL's register-max, is NOT idempotent under duplication — a
delta merged twice double-counts. The store therefore keys each delta
subdir by a CONTENT DIGEST of the delta rows (``batch=<sha256[:16]>``),
not by the checkpoint-relative micro-batch id:

- a replayed batch (foreachBatch may re-run after failure) reproduces
  the same digest and overwrites its own subdir — idempotent;
- a stream RESTARTED WITH A FRESH CHECKPOINT re-numbers batches from 0,
  which would collide with (and silently drop or double-count) earlier
  ids — content digests don't care about numbering, so re-processed
  data overwrites and genuinely new data lands under new keys;
- after compaction folds a delta away, its digest lives on in the
  compacted blob's ``_folded.json`` manifest, so a late replay of that
  batch is recognized and skipped instead of re-added.

The flip side of content identity: two GENUINELY distinct batches with
byte-identical deltas (same docs re-ingested on purpose) are
indistinguishable from a replay and count once — the semantics a
dedup-oriented ingest wants.

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

#: store-subdir name for a compacted blob; the generation counter only
#: guarantees uniqueness, coverage is tracked by the manifest inside.
_COMPACTED_RE = r"batch=compacted-(\d+)"


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


def _delta_key(rows) -> str:
    """Content digest of a batch's delta rows — the identity under
    which the batch is stored and replay-detected."""
    import hashlib

    h = hashlib.sha256()
    for source, sk, n in sorted(
        (r["source"], bytes(r["sk"]), r["n_tokens"]) for r in rows
    ):
        h.update(source.encode())
        h.update(sk)
        h.update(str(n).encode())
    return h.hexdigest()[:16]


def _folded_keys(store_dir: str) -> set:
    """Delta digests already folded into compacted blobs — read from
    each compacted subdir's ``_folded.json`` (the underscore keeps the
    manifest invisible to Spark's parquet reader)."""
    import json
    import os
    import re

    keys: set = set()
    if os.path.isdir(store_dir):
        for name in os.listdir(store_dir):
            if re.fullmatch(_COMPACTED_RE, name):
                mf = os.path.join(store_dir, name, "_folded.json")
                if os.path.exists(mf):
                    with open(mf) as f:
                        keys.update(json.load(f))
    return keys


def cms_ingest(docs_stream: DataFrame, store_dir: str):
    """Attach the frequency-maintenance stage to a documents stream
    (columns ``source, text``). Returns the DataStreamWriter — caller
    picks trigger/checkpoint and calls ``.start()``.

    The per-batch collect is one delta row per source (kilobyte sketch
    blobs) — bounded by design, never the batch's documents."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = _sketch_deltas(batch_df).collect()
        if not rows:
            return
        key = _delta_key(rows)
        if key in _folded_keys(store_dir):
            return  # this batch's counts already live in a compacted blob
        spark = batch_df.sparkSession
        spark.createDataFrame(rows, _STORE_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{store_dir}/batch={key}")

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
    """Fold every delta into one ``batch=compacted-<gen>`` subdir so
    the store stays O(sources). CMS merge is associative and
    commutative, so readers before/after see identical estimates; the
    fold runs driver-side over the bounded blob set (there is no
    JVM-aggregate CMS merge function to push it into an executor plan).

    The new blob carries a ``_folded.json`` manifest: the digests of
    every delta it absorbed plus everything earlier blobs had absorbed
    — this is what lets ``cms_ingest`` skip a replay that arrives
    AFTER its delta subdir was compacted away.

    Contract: run with the stream paused. The swap is still defended
    in depth: the fold covers an explicit snapshot of subdirs, and any
    delta that lands between the snapshot and the swap is SALVAGED
    into the new store before the old one is deleted — a racing writer
    costs nothing but an un-compacted delta. (A reader racing the
    swap may briefly observe an absent store and read zeros.)"""
    import json
    import os
    import re
    import shutil

    if not os.path.isdir(store_dir):
        return
    # explicit snapshot: the fold covers exactly these subdirs
    folded_names = {n for n in os.listdir(store_dir) if n.startswith("batch=")}
    if not folded_names:
        return
    deltas = (
        spark.read.schema(_STORE_SCHEMA)
        .parquet(*[f"{store_dir}/{n}" for n in sorted(folded_names)])
        .collect()
    )
    gen = 1 + max(
        [-1]
        + [
            int(m.group(1))
            for n in folded_names
            if (m := re.fullmatch(_COMPACTED_RE, n))
        ]
    )
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
    # manifest: prior blobs' coverage + the delta digests folded now
    all_keys = sorted(
        _folded_keys(store_dir)
        | {
            n.split("=", 1)[1]
            for n in folded_names
            if not re.fullmatch(_COMPACTED_RE, n)
        }
    )
    tmp_dir, old_dir = f"{store_dir}.compact-tmp", f"{store_dir}.compact-old"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(old_dir, ignore_errors=True)
    blob = f"batch=compacted-{gen}"
    spark.createDataFrame(out, _STORE_SCHEMA).coalesce(1).write.parquet(
        f"{tmp_dir}/{blob}"
    )
    with open(f"{tmp_dir}/{blob}/_folded.json", "w") as f:
        json.dump(all_keys, f)
    os.rename(store_dir, old_dir)
    os.rename(tmp_dir, store_dir)
    # salvage deltas a racing writer landed after the snapshot
    for name in os.listdir(old_dir):
        if name.startswith("batch=") and name not in folded_names:
            os.rename(
                os.path.join(old_dir, name), os.path.join(store_dir, name)
            )
    shutil.rmtree(old_dir)
