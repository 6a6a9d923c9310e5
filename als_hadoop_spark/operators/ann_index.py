"""Persisted IVF ANN index as an ACID table (r9, VERDICT r8 #3).

Until now every ANN query (q_sim_search_ivf/_pq/_ivfpq) trained its
codebook and re-encoded the corpus per session, holding the "served
index" as a session-cached localCheckpoint — at 100 TB that re-encode
IS the whole cost. This module makes the index DATA:

- ``<path>/codebook`` — an ACID table of the K spherical-k-means
  centers (``cell INT, center ARRAY<DOUBLE>``): the trained model
  artifact, versioned like any other table.
- ``<path>/cells``    — the inverted file: ``cell INT, vec_id LONG,
  embedding ARRAY<FLOAT>``, written through ``format("acid")`` with
  ``partitionBy=cell`` — so each IVF cell is a PARTITION of a
  transactional table, and PROBING IS PARTITION ELIMINATION: a query
  that probes nprobe of K cells plans only those cells' files at
  planning time (sources/acid_format.py ``_push_filters``), reading
  nprobe/K of the corpus without any session-resident state.

Serve path (``serve_topk``) touches ONLY the two index tables: the
codebook (K×d doubles — a bounded driver read, same size as the
broadcast every IVF variant already ships) picks nprobe cells per
query; the cells table is read with ``cell IN (probed)`` + broadcast
probe join + exact cosine re-rank. ZERO corpus access, zero
re-encode — the pytest gate deletes the corpus after the build and
serves anyway.

Incremental maintenance (``ingest_vectors`` / ``stream_ingest``): new
vectors are assigned to EXISTING cells (the Faiss add-to-trained-index
contract — centroids are frozen until a rebuild) and APPENDED to the
cells table; the streaming form rides ``writeStream.format("acid")``
whose txn-stamped commits make at-least-once micro-batches EXACTLY
ONCE (sources/acid_format.py AcidStreamWriter). Compaction of the
accumulating per-batch files is the table service
(``AcidTable.optimize`` — file counts drop, snapshot hash unchanged).

Scale posture: train samples ≤ 100·K vectors and stays a DataFrame
(operators/similarity.py ``_coarse_codebook``); assignment is one
Arrow-batched matmul-argmax pass; nothing corpus-shaped reaches the
driver; the index tables inherit the ACID log's stats + partition
pruning. Reference ancestry: factor-matrix persistence between jobs
(ALS-Hadoop/ALS/ALS.java:236 SequenceFile stages) generalized to a
versioned, incrementally-maintained model table.
"""

# NOTE: no `from __future__ import annotations` — PEP 563 string
# annotations break pandas_udf type inference (similarity.py posture).
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_sim
from ..sources import load
from .similarity import (
    IVF_SAMPLE_PER_CELL,
    N_QUERIES,
    TOP_K,
    _bounded_unit_sample,
    _coarse_codebook,
    _unit_frame,
)

CODEBOOK_DIR = "codebook"
CELLS_DIR = "cells"


def _assign_udf(centers):
    """Arrow-batched cell assignment: one matmul-argmax per batch
    against the (broadcast-by-closure) K×d center matrix."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def assign_cell(u: pd.Series) -> pd.Series:
        import numpy as np  # self-contained closure

        if len(u) == 0:
            return pd.Series([], dtype="int32")
        M = np.stack([np.asarray(v, dtype="float64") for v in u])
        return pd.Series(np.argmax(M @ centers.T, axis=1).astype("int32"))

    return assign_cell


def _assigned_frame(corpus: DataFrame, centers) -> DataFrame:
    """(cell, vec_id, embedding) — the inverted-file rows for a corpus
    slice, cells assigned against the given centers. Clustered by cell
    BEFORE the partitioned write: without the shuffle every write task
    emits one file per cell it happens to see (tasks × K tiny files —
    the smoke run planned 360 files for a 640-row corpus); with it,
    file count tracks K, and a probe's partition elimination plans
    nprobe files, not nprobe × tasks."""
    unit = _unit_frame(corpus)
    assign = _assign_udf(centers)
    return unit.select(
        assign("u").alias("cell"),
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
    ).repartition("cell")


def build_ivf_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    k: int | None = None,
    seed: int = 42,
) -> int:
    """Train the coarse codebook on a bounded sample of ``corpus``
    (``vec_id LONG, embedding ARRAY<FLOAT>``), then OVERWRITE-commit
    both index tables under ``path``. Returns K. The session codebook
    cache is deliberately bypassed: the TABLE is the persisted
    artifact now."""
    import os

    from ..sources.acid_format import register_acid_format

    register_acid_format(spark)
    n = corpus.count()
    if k is None:
        k = max(4, min(256, int(n**0.5)))
    unit = _unit_frame(corpus)
    sample = _bounded_unit_sample(unit, n, IVF_SAMPLE_PER_CELL * k)
    centers = _coarse_codebook(spark, sample, k, cache_key=None, seed=seed)
    codebook = spark.createDataFrame(
        [(i, c.tolist()) for i, c in enumerate(centers)],
        "cell INT, center ARRAY<DOUBLE>",
    )
    (
        codebook.coalesce(1)
        .write.format("acid")
        .mode("overwrite")
        .save(os.path.join(path, CODEBOOK_DIR))
    )
    (
        _assigned_frame(corpus, centers)
        .write.format("acid")
        .mode("overwrite")
        .option("partitionBy", "cell")
        .save(os.path.join(path, CELLS_DIR))
    )
    return len(centers)


def read_codebook(spark: SparkSession, path: str):
    """K×d center matrix from the codebook table — a BOUNDED driver
    read (K ≤ 256 rows), the same size every IVF variant already
    ships to executors as a closure."""
    import os

    import numpy as np

    from ..sources.acid_format import register_acid_format

    register_acid_format(spark)
    rows = (
        spark.read.format("acid")
        .load(os.path.join(path, CODEBOOK_DIR))
        .orderBy("cell")
        .collect()
    )
    return np.stack([np.asarray(r["center"], dtype="float64") for r in rows])


def ingest_vectors(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    txn_app: str | None = None,
    txn_version: int | None = None,
) -> None:
    """Incremental maintenance: assign ``new_vectors`` to the EXISTING
    cells (centroids frozen — the Faiss add-after-train contract) and
    append them to the cells table. Optional txn stamping makes an
    at-least-once caller exactly-once (Delta txnAppId/txnVersion
    recipe)."""
    import os

    centers = read_codebook(spark, path)
    w = (
        _assigned_frame(new_vectors, centers)
        .write.format("acid")
        .mode("append")
        .option("partitionBy", "cell")
    )
    if txn_app is not None and txn_version is not None:
        w = w.option("txnAppId", txn_app).option("txnVersion", txn_version)
    w.save(os.path.join(path, CELLS_DIR))


def stream_ingest(
    spark: SparkSession,
    path: str,
    stream: DataFrame,
    checkpoint: str,
    txn_app: str = "ann_ivf_ingest",
):
    """Streaming maintenance: every micro-batch of
    ``(vec_id, embedding)`` is cell-assigned against the persisted
    codebook and appended through the exactly-once ACID streaming sink
    (txn-stamped commits; a replayed batch is a no-op). Returns the
    started StreamingQuery — callers own its lifecycle."""
    import os

    centers = read_codebook(spark, path)
    assigned = _assigned_frame(stream, centers)
    return (
        assigned.writeStream.format("acid")
        .option("checkpointLocation", checkpoint)
        .option("txnAppId", txn_app)
        .option("partitionBy", "cell")
        .option("path", os.path.join(path, CELLS_DIR))
        .trigger(availableNow=True)
        .start()
    )


def serve_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    top_k: int = TOP_K,
    nprobe: int | None = None,
) -> DataFrame:
    """Top-k cosine ANN from the PERSISTED index only. ``queries`` is
    a bounded frame (``query_id LONG, embedding ARRAY<FLOAT>``) —
    collected to pick probe cells, the same per-query driver step every
    IVF serve does. The cells read carries ``cell IN (probed)``, which
    the acid reader turns into planning-time partition elimination:
    the scan plans nprobe/K of the index's files and nothing else.
    No corpus table is touched and nothing is re-encoded."""
    import os

    import numpy as np

    centers = read_codebook(spark, path)
    k = len(centers)
    if nprobe is None:
        nprobe = max(1, k // 2)
    qrows = queries.collect()
    probes = []
    for r in qrows:
        v = np.asarray(r["embedding"], dtype="float64")
        u = v / max(float(np.linalg.norm(v)), 1e-12)
        for cell in np.argsort(-(centers @ u))[:nprobe]:
            probes.append((r["query_id"], int(cell), list(r["embedding"])))
    probe_df = spark.createDataFrame(
        probes, "query_id LONG, cell INT, qv ARRAY<FLOAT>"
    )
    cells_needed = sorted({c for _, c, _ in probes})
    corpus = (
        spark.read.format("acid")
        .load(os.path.join(path, CELLS_DIR))
        .filter(F.col("cell").isin(cells_needed))  # partition elimination
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return (
        corpus.join(F.broadcast(probe_df), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(cosine_sim("qv", "embedding"), 6).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


#: (applicationId, sf_dir) → index path already built this session.
#: The index is a PERSISTED artifact — build once, serve many — so the
#: registered query builds on first invocation and serves afterwards;
#: the pytest gates build at fresh paths, keeping the cold path hot.
_BUILT: dict = {}


def _index_scratch(spark: SparkSession, sf_dir: str) -> str:
    from .timeseries import _acid_scratch

    return _acid_scratch(spark, sf_dir, "ivfidx")


def q_sim_search_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN served from the PERSISTED index tables (rows-only by
    design, like every ANN variant — banded/IVF recall < 1 has no SQL
    twin; recall ≥ 0.8 and the zero-corpus-read serve are pytest
    gates). First invocation in a session builds the index (train +
    assign + two ACID commits); every later invocation serves straight
    from the tables — the production shape, where build is ingest-time
    work and queries pay only nprobe/K reads."""
    emb = load(spark, sf_dir, "embeddings", spread=True)
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _BUILT.get(key)
    if path is None:
        path = _index_scratch(spark, sf_dir)
        build_ivf_index(spark, emb, path)
        _BUILT[key] = path
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return serve_topk(spark, path, queries)


QUERIES = {"q_sim_search_ivf_indexed": q_sim_search_ivf_indexed}
ORACLES: dict[str, str] = {}
