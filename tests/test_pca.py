"""Gates for the distributed PCA (q_embed_pca) — rows-only by design,
so correctness is pinned here against an EXACT in-memory numpy PCA of
the same data: the distributed sufficient-statistics pass must
reproduce what numpy computes when it can see every vector at once."""

from __future__ import annotations

import numpy as np

from als_hadoop_spark.operators.pca import (
    PCA_K,
    fit_pca,
    project,
    q_embed_pca,
)
from als_hadoop_spark.sources import load


def _numpy_pca(X: np.ndarray, k: int):
    mean = X.mean(axis=0)
    cov = np.cov(X, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order] / evals.sum()


def test_fit_matches_exact_numpy_pca(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    X = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    n, mean, comps, explained = fit_pca(spark, emb, PCA_K)
    ref_mean, ref_comps, ref_explained = _numpy_pca(X, PCA_K)
    assert n == X.shape[0]
    np.testing.assert_allclose(mean, ref_mean, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(explained, ref_explained, rtol=1e-7)
    # same subspace AND same sign after the convention
    for got, want in zip(comps, ref_comps):
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_components_orthonormal_and_variance_ordered(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    _, _, comps, explained = fit_pca(spark, emb, PCA_K)
    gram = comps @ comps.T
    np.testing.assert_allclose(gram, np.eye(PCA_K), atol=1e-9)
    assert all(explained[i] >= explained[i + 1] for i in range(PCA_K - 1))
    assert 0 < explained.sum() <= 1 + 1e-9


def test_projection_variance_equals_eigenvalue(spark, sf_dir):
    """Var(pc_k) over the corpus must equal the k-th eigenvalue — the
    defining property of PCA, checked end-to-end through the JVM-side
    projection path."""
    emb = load(spark, sf_dir, "embeddings")
    X = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    _, mean, comps, _ = fit_pca(spark, emb, PCA_K)
    scored = project(emb, mean, comps).select("pc1", "pc2").collect()
    P = np.array([[r["pc1"], r["pc2"]] for r in scored])
    cov = np.cov(X, rowvar=False)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:PCA_K]
    np.testing.assert_allclose(P.var(axis=0, ddof=1), evals, rtol=1e-4)
    # scores are centered
    np.testing.assert_allclose(P.mean(axis=0), [0.0, 0.0], atol=1e-6)


def test_q_embed_pca_shape_and_projection_is_jvm(spark, sf_dir):
    df = q_embed_pca(spark, sf_dir)
    rows = df.collect()
    n_labels = load(spark, sf_dir, "embeddings").select("label").distinct().count()
    assert len(rows) == n_labels
    assert df.columns == [
        "label", "n_vecs", "mean_pc1", "mean_pc2", "sd_pc1", "sd_pc2",
        "evr_pc1", "evr_pc2",
    ]
    # the APPLY pass is pure JVM: no Python eval above the aggregate
    # (the only Python stage is the sufficient-statistics fit)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_fit_pca_rejects_degenerate_corpus(spark):
    import pytest

    one = spark.createDataFrame([(1, [1.0, 2.0], 0)], "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")
    with pytest.raises(ValueError, match=">= 2 vectors"):
        fit_pca(spark, one, 1)
