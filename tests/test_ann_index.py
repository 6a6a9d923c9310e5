"""Gates for the persisted IVF index (operators/ann_index.py, r9):
recall vs an independent numpy brute force, ZERO corpus access at
serve, exactly-once incremental ingest (batch txn + streaming), and
compaction-compatible maintenance."""

import os
import shutil

import numpy as np
import pytest

from als_hadoop_spark.operators import ann_index


def _corpus_rows(n, d=16, seed=11, start_id=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype("float32")
    return [(start_id + i, [float(x) for x in vecs[i]]) for i in range(n)]


def _corpus_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def _exact_topk(rows, query_ids, k=5):
    """Independent numpy oracle: cosine top-k excluding self."""
    ids = np.array([r[0] for r in rows])
    M = np.stack([np.asarray(r[1], dtype="float64") for r in rows])
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    out = set()
    by_id = {r[0]: i for i, r in enumerate(rows)}
    for q in query_ids:
        sims = Mn @ Mn[by_id[q]]
        order = [
            i for i in np.argsort(-sims) if ids[i] != q
        ][:k]
        out.update((q, int(ids[i])) for i in order)
    return out


def _recall(spark, path, rows, query_ids, k=5):
    qdf = _corpus_df(
        spark, [r for r in rows if r[0] in query_ids]
    ).withColumnRenamed("vec_id", "query_id")
    got = {
        (r.query_id, r.cand_id)
        for r in ann_index.serve_topk(spark, path, qdf, top_k=k).collect()
    }
    exact = _exact_topk(rows, query_ids, k)
    return len(got & exact) / len(exact)


def test_build_and_serve_recall(spark, tmp_path):
    rows = _corpus_rows(240)
    path = str(tmp_path / "idx")
    k = ann_index.build_ivf_index(spark, _corpus_df(spark, rows), path, k=8)
    assert k == 8
    assert _recall(spark, path, rows, query_ids=[0, 1, 2]) >= 0.8


def test_serve_reads_zero_corpus(spark, tmp_path):
    """The serve path must touch ONLY the index tables: build from a
    corpus parquet, DELETE the corpus, serve anyway — and every input
    file of the served plan lives under the index path."""
    rows = _corpus_rows(200)
    corpus_pq = str(tmp_path / "corpus.parquet")
    _corpus_df(spark, rows).write.parquet(corpus_pq)
    path = str(tmp_path / "idx")
    ann_index.build_ivf_index(
        spark, spark.read.parquet(corpus_pq), path, k=8
    )
    shutil.rmtree(corpus_pq)  # corpus gone: serve must not miss it
    qdf = _corpus_df(spark, rows[:2]).withColumnRenamed(
        "vec_id", "query_id"
    )
    served = ann_index.serve_topk(spark, path, qdf)
    assert served.count() == 2 * 5


def test_incremental_ingest_batches_and_idempotence(spark, tmp_path):
    """Ingest the corpus tail in 3 batches; a replayed (txn-stamped)
    batch is a no-op; recall over the FULL corpus stays ≥ 0.8 and a
    planted near-twin ingested last is found at rank 1."""
    from als_hadoop_spark.sources.acid import AcidTable

    rows = _corpus_rows(240)
    base, tail = rows[:120], rows[120:]
    path = str(tmp_path / "idx")
    ann_index.build_ivf_index(spark, _corpus_df(spark, base), path, k=8)
    for i in range(3):
        batch = tail[i * 40 : (i + 1) * 40]
        ann_index.ingest_vectors(
            spark, path, _corpus_df(spark, batch),
            txn_app="t", txn_version=i,
        )
    cells = AcidTable(spark, os.path.join(path, ann_index.CELLS_DIR))
    n_before = cells.snapshot().count()
    assert n_before == 240
    # replay batch 2 with the same txn stamp: exactly-once no-op
    ann_index.ingest_vectors(
        spark, path, _corpus_df(spark, tail[80:]), txn_app="t", txn_version=2
    )
    assert cells.snapshot().count() == n_before
    assert _recall(spark, path, rows, query_ids=[0, 5, 130]) >= 0.8
    # planted twin: a near-copy of vector 0, ingested incrementally
    twin = np.asarray(rows[0][1], dtype="float64")
    twin = twin + 0.01 * np.linalg.norm(twin) * np.random.default_rng(3).standard_normal(len(twin))
    ann_index.ingest_vectors(
        spark, path, _corpus_df(spark, [(9000, [float(x) for x in twin])])
    )
    qdf = _corpus_df(spark, rows[:1]).withColumnRenamed("vec_id", "query_id")
    top = (
        ann_index.serve_topk(spark, path, qdf, top_k=1)
        .collect()
    )
    assert top[0].cand_id == 9000


def test_stream_ingest_exactly_once(spark, tmp_path):
    """Streaming maintenance through the exactly-once ACID sink: an
    availableNow parquet stream ingests new vectors; re-running on the
    SAME checkpoint replays batches as no-ops (txn-stamped commits)."""
    from als_hadoop_spark.sources.acid import AcidTable

    rows = _corpus_rows(160)
    base, tail = rows[:100], rows[100:]
    path = str(tmp_path / "idx")
    ann_index.build_ivf_index(spark, _corpus_df(spark, base), path, k=8)
    stream_dir = str(tmp_path / "incoming")
    _corpus_df(spark, tail).coalesce(2).write.parquet(stream_dir)
    ck = str(tmp_path / "ck")

    def run():
        stream = (
            spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
            .parquet(stream_dir)
        )
        q = ann_index.stream_ingest(spark, path, stream, ck)
        assert q.awaitTermination(120)

    run()
    cells = AcidTable(spark, os.path.join(path, ann_index.CELLS_DIR))
    assert cells.snapshot().count() == 160
    run()  # same checkpoint: nothing new, replay is a no-op
    assert cells.snapshot().count() == 160
    assert _recall(spark, path, rows, query_ids=[0, 110]) >= 0.8


def test_optimize_compacts_index_cells(spark, tmp_path):
    """The table service composes: after N ingests the cells table
    accumulates small files; AcidTable.optimize compacts them with the
    snapshot unchanged, and serve still answers identically."""
    from als_hadoop_spark.sources.acid import AcidTable

    rows = _corpus_rows(200)
    path = str(tmp_path / "idx")
    ann_index.build_ivf_index(spark, _corpus_df(spark, rows[:100]), path, k=4)
    for i in range(4):
        ann_index.ingest_vectors(
            spark, path, _corpus_df(spark, rows[100 + 25 * i : 125 + 25 * i])
        )
    cells = AcidTable(spark, os.path.join(path, ann_index.CELLS_DIR))
    qdf = _corpus_df(spark, rows[:2]).withColumnRenamed("vec_id", "query_id")
    before = sorted(
        map(tuple, ann_index.serve_topk(spark, path, qdf).collect())
    )
    n_files_before = len(cells._replay())
    cells.optimize()
    assert len(cells._replay()) < n_files_before
    after = sorted(
        map(tuple, ann_index.serve_topk(spark, path, qdf).collect())
    )
    assert after == before


def test_serve_plans_only_probed_cells(spark, tmp_path):
    """The serve read's `cell IN (probed)` must reach the acid reader
    as planning-time partition elimination: the planned files are a
    strict subset of the index, all inside probed cell dirs."""
    from pyspark.sql.datasource import In

    from als_hadoop_spark.sources.acid_format import (
        build_acid_format_source,
    )

    rows = _corpus_rows(240)
    path = str(tmp_path / "idx")
    ann_index.build_ivf_index(spark, _corpus_df(spark, rows), path, k=8)
    centers = ann_index.read_codebook(spark, path)
    v = np.asarray(rows[0][1], dtype="float64")
    u = v / np.linalg.norm(v)
    probed = sorted(int(c) for c in np.argsort(-(centers @ u))[:2])
    cells_path = os.path.join(path, ann_index.CELLS_DIR)
    src = build_acid_format_source()(options={"path": cells_path})
    got = spark.read.format("acid").load(cells_path)
    reader = src.reader(got.schema)
    list(reader._push_filters([In(("cell",), tuple(probed))]))
    parts = [p for p in reader.partitions() if p.path]
    import re

    planned_cells = {
        int(re.search(r"cell=(\d+)", pp.path).group(1)) for pp in parts
    }
    assert parts and planned_cells <= set(probed)
    total = spark.read.format("acid").load(cells_path).count()
    assert len(parts) < 8 and total == 240  # strict subset of K cells


def _subspace_rows(n, lo, hi, seed, start_id, d=16):
    """Vectors living (almost) entirely in dims [lo, hi) — two disjoint
    subspaces make a distribution shift the frozen coarse quantizer is
    maximally blind to: cosine(new vector, any old centroid) ≈ 0, so
    assignment degenerates to noise and near neighbors scatter across
    cells."""
    rng = np.random.default_rng(seed)
    vecs = 0.01 * rng.standard_normal((n, d)).astype("float32")
    vecs[:, lo:hi] += rng.standard_normal((n, hi - lo)).astype("float32")
    return [(start_id + i, [float(x) for x in vecs[i]]) for i in range(n)]


def test_drift_detects_shift_and_rebuild_recovers(spark, tmp_path):
    """VERDICT r9 #2 end-to-end: build on subspace A, verify the drift
    statistic is quiet; ingest a shifted distribution (subspace B)
    until it trips; recall over the shifted queries measurably
    degrades; rebuild_ivf_index retrains + atomically swaps
    generations; drift clears and recall recovers ≥ 0.8."""
    base = _subspace_rows(240, lo=0, hi=8, seed=5, start_id=0)
    path = str(tmp_path / "idx")
    ann_index.build_ivf_index(spark, _corpus_df(spark, base), path, k=8)
    d0 = ann_index.index_drift(spark, path)
    assert not d0["drifted"], d0
    assert d0["n_build"] == d0["n_now"] == 240

    shifted = _subspace_rows(480, lo=8, hi=16, seed=7, start_id=10_000)
    ann_index.ingest_vectors(spark, path, _corpus_df(spark, shifted))
    d1 = ann_index.index_drift(spark, path)
    assert d1["drifted"], d1
    assert d1["sim_drop"] > 0.05  # mean assignment cosine collapsed
    rows = base + shifted
    qids = [10_000 + i for i in range(6)]
    degraded = _recall(spark, path, rows, qids)

    new_k = ann_index.rebuild_ivf_index(spark, path, k=8)
    assert new_k == 8
    d2 = ann_index.index_drift(spark, path)
    assert not d2["drifted"], d2
    assert d2["n_build"] == 720  # rebuilt over base + ingested
    recovered = _recall(spark, path, rows, qids)
    assert recovered >= 0.8, (degraded, recovered)
    assert degraded < 0.8 and recovered > degraded, (degraded, recovered)
    # the swap is a generation behind an atomic pointer, not an
    # in-place overwrite: old gen intact for concurrent readers
    assert os.path.isfile(os.path.join(path, ann_index.CURRENT_PTR))
    assert ann_index._resolve_root(path).endswith("gen-000001")
    assert os.path.isdir(os.path.join(path, ann_index.CELLS_DIR))


def test_ingest_and_serve_follow_the_generation_pointer(spark, tmp_path):
    """After a rebuild, ingest/serve/read_codebook all resolve the
    pointer: new vectors land in the NEW generation's cells table and
    are immediately servable; a second rebuild bumps to gen-2."""
    from als_hadoop_spark.sources.acid import AcidTable

    rows = _corpus_rows(160)
    path = str(tmp_path / "idx")
    ann_index.build_ivf_index(spark, _corpus_df(spark, rows), path, k=4)
    ann_index.rebuild_ivf_index(spark, path, k=4)
    root = ann_index._resolve_root(path)
    assert root.endswith("gen-000001")
    extra = _corpus_rows(40, seed=99, start_id=5_000)
    ann_index.ingest_vectors(spark, path, _corpus_df(spark, extra))
    cells = AcidTable(spark, os.path.join(root, ann_index.CELLS_DIR))
    assert cells.snapshot().count() == 200  # ingest hit the new gen
    qdf = _corpus_df(spark, extra[:2]).withColumnRenamed(
        "vec_id", "query_id"
    )
    assert ann_index.serve_topk(spark, path, qdf).count() == 2 * 5
    ann_index.rebuild_ivf_index(spark, path, k=4)
    assert ann_index._resolve_root(path).endswith("gen-000002")
    # gen-2 trained over everything gen-1 held, ingest included
    assert ann_index.index_drift(spark, path)["n_build"] == 200


def test_cleanup_index_generations(spark, tmp_path):
    """The rebuild service's VACUUM: superseded generations (and the
    superseded root tables) sweep under the retention guard; the
    current generation always survives and still serves."""
    rows = _corpus_rows(120)
    path = str(tmp_path / "idx")
    ann_index.build_ivf_index(spark, _corpus_df(spark, rows), path, k=4)
    ann_index.rebuild_ivf_index(spark, path, k=4)
    ann_index.rebuild_ivf_index(spark, path, k=4)
    assert ann_index._resolve_root(path).endswith("gen-000002")
    # young files: the default retention protects every generation
    assert ann_index.cleanup_index_generations(path) == []
    deleted = ann_index.cleanup_index_generations(path, retention_hours=0)
    names = {os.path.basename(d) for d in deleted}
    assert names == {"gen-000001", ann_index.CODEBOOK_DIR, ann_index.CELLS_DIR}
    assert os.path.isdir(os.path.join(path, "gen-000002"))
    qdf = _corpus_df(spark, rows[:2]).withColumnRenamed("vec_id", "query_id")
    assert ann_index.serve_topk(spark, path, qdf).count() == 2 * 5
    # drift stats still readable from the surviving generation
    assert not ann_index.index_drift(spark, path)["drifted"]


def test_fresh_build_after_rebuild_is_visible(spark, tmp_path):
    """r10 review: once a rebuild published the pointer, a NEW
    build_ivf_index from an external corpus must land in the next
    generation and swap the pointer — building at the root would be
    invisible to every reader and swept as 'superseded'."""
    rows = _corpus_rows(120)
    path = str(tmp_path / "idx")
    ann_index.build_ivf_index(spark, _corpus_df(spark, rows), path, k=4)
    ann_index.rebuild_ivf_index(spark, path, k=4)
    fresh = _corpus_rows(80, seed=77, start_id=9_000)
    ann_index.build_ivf_index(spark, _corpus_df(spark, fresh), path, k=4)
    root = ann_index._resolve_root(path)
    assert root.endswith("gen-000002")  # new build = new generation
    # readers see EXACTLY the fresh corpus
    from als_hadoop_spark.sources.acid import AcidTable

    cells = AcidTable(spark, os.path.join(root, ann_index.CELLS_DIR))
    ids = {r["vec_id"] for r in cells.snapshot().select("vec_id").collect()}
    assert ids == {r[0] for r in fresh}
    qdf = _corpus_df(spark, fresh[:2]).withColumnRenamed("vec_id", "query_id")
    assert ann_index.serve_topk(spark, path, qdf).count() == 2 * 5


def test_cleanup_waits_for_swap_retention(spark, tmp_path):
    """r10 review: retention runs from SUPERSESSION (the pointer swap),
    not build time — an old generation superseded a moment ago still
    has readers and must survive a non-zero retention window."""
    import time

    rows = _corpus_rows(80)
    path = str(tmp_path / "idx")
    ann_index.build_ivf_index(spark, _corpus_df(spark, rows), path, k=4)
    ann_index.rebuild_ivf_index(spark, path, k=4)
    # age every FILE far past the window, but the swap just happened
    for r, _d, names in os.walk(path):
        for n in names:
            if n != ann_index.CURRENT_PTR:
                os.utime(os.path.join(r, n), (1, 1))
    assert ann_index.cleanup_index_generations(path, retention_hours=1) == []
    # age the swap too: now the superseded root tables are deletable
    os.utime(os.path.join(path, ann_index.CURRENT_PTR), (1, 1))
    deleted = ann_index.cleanup_index_generations(path, retention_hours=1)
    assert {os.path.basename(d) for d in deleted} == {
        ann_index.CODEBOOK_DIR,
        ann_index.CELLS_DIR,
    }
