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
#: atomic generation pointer (r10): rebuilds land in ``gen-N/`` and
#: publish here via tmp+fsync+replace — readers between the two table
#: overwrites of a naive in-place rebuild would mix codebook
#: generations; the pointer swap makes the whole index version atomic.
CURRENT_PTR = "_current"


def _resolve_root(path: str) -> str:
    """The directory holding the CURRENT index generation's tables:
    ``<path>/<pointer target>`` when a rebuild has published
    ``_current``, else ``path`` itself (generation 0 — the original
    ``build_ivf_index`` layout, kept for compatibility)."""
    import os

    ptr = os.path.join(path, CURRENT_PTR)
    try:
        with open(ptr) as f:
            gen = f.read().strip()
    except OSError:
        return path
    return os.path.join(path, gen) if gen else path


def _next_generation(path: str) -> str:
    """Name of the next unused ``gen-N`` directory under ``path``."""
    import os

    gens = [
        d
        for d in os.listdir(path)
        if d.startswith("gen-") and d[4:].isdigit()
    ]
    return f"gen-{(max(int(d[4:]) for d in gens) + 1) if gens else 1:06d}"


def _publish_generation(path: str, gen: str) -> None:
    """Atomically point ``_current`` at ``gen``: tmp + fsync +
    ``os.replace`` — readers see the old or the new generation whole,
    never a mix. The pointer's mtime doubles as the SWAP timestamp the
    cleanup retention guard keys off."""
    import os
    import uuid

    tmp = os.path.join(path, f".{CURRENT_PTR}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as f:
        f.write(gen)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, CURRENT_PTR))


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


def _cell_stats(cells: DataFrame, centers_df: DataFrame) -> DataFrame:
    """Per-cell assignment-fidelity snapshot ``(cell, n, mean_sim)``:
    one JVM-side scan of the cells table joined (broadcast, K rows) to
    the centers — count and mean cosine(vector, own center). This is
    both the build-time baseline stored in the codebook and the
    current-state side of ``index_drift``."""
    return (
        cells.join(F.broadcast(centers_df), "cell")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(
                cosine_sim(
                    F.col("embedding").cast("array<double>"), F.col("center")
                )
            ).alias("mean_sim"),
        )
    )


def _build_tables(
    spark: SparkSession,
    corpus: DataFrame,
    root: str,
    k: int | None,
    seed: int,
) -> int:
    """Train + assign + commit both index tables under ``root``.
    Cells are written FIRST so the build-time per-cell stats (count +
    mean assignment cosine — the drift baseline) are harvested from
    the committed table in one extra JVM-side scan instead of
    recomputing the assignment UDF; the codebook then carries
    ``build_n``/``build_mean_sim`` alongside each center."""
    import os

    from ..sources.acid_format import register_acid_format

    register_acid_format(spark)
    n = corpus.count()
    if k is None:
        k = max(4, min(256, int(n**0.5)))
    unit = _unit_frame(corpus)
    sample = _bounded_unit_sample(unit, n, IVF_SAMPLE_PER_CELL * k)
    centers = _coarse_codebook(spark, sample, k, cache_key=None, seed=seed)
    (
        _assigned_frame(corpus, centers)
        .write.format("acid")
        .mode("overwrite")
        .option("partitionBy", "cell")
        .save(os.path.join(root, CELLS_DIR))
    )
    centers_df = spark.createDataFrame(
        [(i, c.tolist()) for i, c in enumerate(centers)],
        "cell INT, center ARRAY<DOUBLE>",
    )
    cells = spark.read.format("acid").load(os.path.join(root, CELLS_DIR))
    stats = {
        r["cell"]: (r["n"], r["mean_sim"])
        for r in _cell_stats(cells, centers_df).collect()  # ≤ K rows
    }
    codebook = spark.createDataFrame(
        [
            (i, c.tolist(), *stats.get(i, (0, None)))
            for i, c in enumerate(centers)
        ],
        "cell INT, center ARRAY<DOUBLE>, build_n LONG, build_mean_sim DOUBLE",
    )
    (
        codebook.coalesce(1)
        .write.format("acid")
        .mode("overwrite")
        .save(os.path.join(root, CODEBOOK_DIR))
    )
    return len(centers)


def build_ivf_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    k: int | None = None,
    seed: int = 42,
) -> int:
    """Train the coarse codebook on a bounded sample of ``corpus``
    (``vec_id LONG, embedding ARRAY<FLOAT>``), then OVERWRITE-commit
    both index tables under ``path``. Generation 0 lives at the path
    root; once a rebuild has published a ``_current`` pointer, a fresh
    build from a new corpus goes into the NEXT generation and swaps
    the pointer too — building at the root then would be invisible to
    every reader (they resolve the pointer) and swept by the next
    cleanup as "superseded". Returns K. The session codebook cache is
    deliberately bypassed: the TABLE is the persisted artifact now."""
    import os

    if os.path.exists(os.path.join(path, CURRENT_PTR)):
        gen = _next_generation(path)
        new_k = _build_tables(spark, corpus, os.path.join(path, gen), k, seed)
        _publish_generation(path, gen)
        return new_k
    return _build_tables(spark, corpus, path, k, seed)


def index_drift(
    spark: SparkSession,
    path: str,
    sim_drop: float = 0.05,
    imbalance_factor: float = 2.0,
) -> dict:
    """Assignment-drift statistic for the served index (VERDICT r9
    #2): computable from the index tables ALONE — per-cell count
    imbalance (max/mean) and corpus-weighted mean assignment cosine,
    each compared against the build-time baseline the codebook
    carries. After heavy ingest of a shifted distribution the frozen
    centroids stop describing the data: mean assignment cosine falls
    and cell counts skew — both visible here long before recall decay
    is (recall needs ground truth; this needs one bounded scan).

    Returns a dict with both baselines, both current values, and
    ``drifted`` = (mean-sim dropped more than ``sim_drop``) OR
    (imbalance grew more than ``imbalance_factor``×). Trip it →
    ``rebuild_ivf_index``."""
    import os

    from ..sources.acid_format import register_acid_format

    register_acid_format(spark)
    root = _resolve_root(path)
    cb = spark.read.format("acid").load(os.path.join(root, CODEBOOK_DIR))
    if "build_n" not in cb.columns:
        raise ValueError(
            f"{path}: codebook predates drift stats (r10) — rebuild the "
            "index to record the build-time baseline"
        )
    cells = spark.read.format("acid").load(os.path.join(root, CELLS_DIR))
    base = {
        r["cell"]: (r["build_n"], r["build_mean_sim"])
        for r in cb.select("cell", "build_n", "build_mean_sim").collect()
    }
    # materialize EVERY codebook cell in the current side too (empty
    # cells → 0): the groupBy only returns non-empty cells, and a
    # smaller denominator on one arm understates imbalance_ratio
    # exactly when cells are empty
    cur = {cell: (0, None) for cell in base}
    cur.update(
        (r["cell"], (r["n"], r["mean_sim"]))
        for r in _cell_stats(cells, cb.select("cell", "center")).collect()
    )

    def _summary(d: dict) -> tuple[int, float, float]:
        counts = [n for n, _ in d.values() if n]
        total = sum(counts)
        if not total:
            return 0, 1.0, 0.0
        imb = max(counts) / (total / len(d))  # mean over ALL K cells
        wsim = (
            sum(n * s for n, s in d.values() if n and s is not None) / total
        )
        return total, imb, wsim

    n_build, imb_build, sim_build = _summary(base)
    n_now, imb_now, sim_now = _summary(cur)
    ratio = imb_now / imb_build if imb_build else float("inf")
    drop = sim_build - sim_now
    return {
        "k": cb.count(),
        "n_build": n_build,
        "n_now": n_now,
        "imbalance_build": imb_build,
        "imbalance_now": imb_now,
        "imbalance_ratio": ratio,
        "mean_sim_build": sim_build,
        "mean_sim_now": sim_now,
        "sim_drop": drop,
        "drifted": drop > sim_drop or ratio > imbalance_factor,
    }


def rebuild_ivf_index(
    spark: SparkSession,
    path: str,
    k: int | None = None,
    seed: int = 43,
) -> int:
    """Retrain the codebook on the CURRENT index contents (the cells
    table IS the corpus — no external re-read), re-assign every
    vector, and atomically swap generations: the new tables build in
    ``gen-N/`` untouched by readers, then one tmp+fsync+``os.replace``
    publishes the ``_current`` pointer. A reader mid-serve keeps the
    old generation (its codebook and cells stay consistent with each
    other — the property two sequential in-place overwrites cannot
    give); old generations remain on disk for those readers until a
    manual cleanup. Returns the new K."""
    import os

    from ..sources.acid_format import register_acid_format

    register_acid_format(spark)
    root = _resolve_root(path)
    corpus = (
        spark.read.format("acid")
        .load(os.path.join(root, CELLS_DIR))
        .select("vec_id", "embedding")
    )
    nxt = _next_generation(path)
    new_k = _build_tables(spark, corpus, os.path.join(path, nxt), k, seed)
    _publish_generation(path, nxt)
    return new_k


def _read_codebook_at(spark: SparkSession, root: str):
    """Center matrix from an ALREADY-RESOLVED generation root — the
    form every multi-read operation uses so the ``_current`` pointer
    is resolved exactly ONCE per operation (resolving per read races a
    concurrent rebuild swap into a codebook/cells generation mix — the
    exact inconsistency the pointer exists to prevent)."""
    import os

    import numpy as np

    from ..sources.acid_format import register_acid_format

    register_acid_format(spark)
    rows = (
        spark.read.format("acid")
        .load(os.path.join(root, CODEBOOK_DIR))
        .orderBy("cell")
        .collect()
    )
    return np.stack([np.asarray(r["center"], dtype="float64") for r in rows])


def read_codebook(spark: SparkSession, path: str):
    """K×d center matrix from the CURRENT generation's codebook — a
    BOUNDED driver read (K ≤ 256 rows), the same size every IVF
    variant already ships to executors as a closure."""
    return _read_codebook_at(spark, _resolve_root(path))


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

    root = _resolve_root(path)  # ONE resolve: centers and cells must
    centers = _read_codebook_at(spark, root)  # be the same generation
    w = (
        _assigned_frame(new_vectors, centers)
        .write.format("acid")
        .mode("append")
        .option("partitionBy", "cell")
    )
    if txn_app is not None and txn_version is not None:
        w = w.option("txnAppId", txn_app).option("txnVersion", txn_version)
    w.save(os.path.join(root, CELLS_DIR))


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

    root = _resolve_root(path)  # one resolve (see _read_codebook_at)
    centers = _read_codebook_at(spark, root)
    assigned = _assigned_frame(stream, centers)
    return (
        assigned.writeStream.format("acid")
        .option("checkpointLocation", checkpoint)
        .option("txnAppId", txn_app)
        .option("partitionBy", "cell")
        .option("path", os.path.join(root, CELLS_DIR))
        .trigger(availableNow=True)
        .start()
    )


def cleanup_index_generations(
    path: str, retention_hours: float = 24.0
) -> list[str]:
    """Remove index generations the ``_current`` pointer no longer
    references (the VACUUM of the rebuild service, same retention
    posture as ``AcidTable.vacuum``): a superseded generation whose
    newest file is older than ``retention_hours`` is deleted whole —
    young generations survive so a reader that resolved the pointer
    just before a swap can finish its scan. The CURRENT generation and
    the root (generation-0) tables while they ARE current are never
    touched; root tables superseded by a rebuild are swept under the
    same guard. Returns the deleted directory paths."""
    import os
    import shutil
    import time

    root = _resolve_root(path)
    horizon = time.time() - retention_hours * 3600.0
    # retention must run from SUPERSESSION, not build time: an old-but-
    # just-superseded generation still has readers that resolved the
    # pointer a moment before the swap. The pointer's mtime IS the last
    # swap; until that is older than the window, nothing is deletable.
    try:
        swap_ts = os.path.getmtime(os.path.join(path, CURRENT_PTR))
    except OSError:
        return []  # no pointer: nothing is superseded
    if swap_ts > horizon:
        return []
    victims = []
    gens = [
        d
        for d in os.listdir(path)
        if d.startswith("gen-") and d[4:].isdigit()
    ]
    for gen in gens:
        full = os.path.join(path, gen)
        if os.path.abspath(full) == os.path.abspath(root):
            continue
        victims.append(full)
    if os.path.abspath(root) != os.path.abspath(path):
        # a rebuild superseded the root tables — they are a stale
        # generation too
        for d in (CODEBOOK_DIR, CELLS_DIR):
            full = os.path.join(path, d)
            if os.path.isdir(full):
                victims.append(full)
    deleted = []
    for full in victims:
        newest = 0.0
        for r, _dirs, names in os.walk(full):
            for n in names:
                try:
                    newest = max(
                        newest, os.path.getmtime(os.path.join(r, n))
                    )
                except OSError:
                    pass
        if newest <= horizon:
            shutil.rmtree(full, ignore_errors=True)
            deleted.append(full)
    return deleted


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

    root = _resolve_root(path)  # one resolve (see _read_codebook_at)
    centers = _read_codebook_at(spark, root)
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
        .load(os.path.join(root, CELLS_DIR))
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
