"""Distributed PCA over the embedding corpus — the dimensionality-
reduction / drift-monitoring primitive of an LLM data pipeline
(whitening before clustering, 2-D corpus maps, per-source embedding
drift).

The 100 TB shape is the classic two-phase treeAggregate factored into
DataFrame ops:

1. SUFFICIENT STATISTICS, one corpus pass: every Arrow batch is
   reduced by ONE numpy gemm to a (count, Σx, XᵀX) partial —
   ``mapInPandas`` emits one ~33 KB row per batch, never the vectors.
   Partials are then summed BY SPARK (posexplode → bounded-key hash
   aggregate: d + d² ≤ 4 160 keys), so the driver collects exactly one
   d-vector and one d×d Gram matrix no matter how many executors ran
   — the collect is O(d²), independent of corpus size.
2. EIGH ON THE DRIVER: the covariance C = (G − n·μμᵀ)/(n−1) is d×d
   (64×64 here); ``numpy.linalg.eigh`` on it is microseconds. Top-K
   eigenvectors get a deterministic sign convention (largest-|loading|
   component positive).
3. PROJECTION, second corpus pass: scores are pure JVM —
   score_k = dot(x, v_k) − dot(μ, v_k), with v_k a broadcast literal
   array — no Python in the apply path.

Same build-then-apply pattern as the IVF index (`similarity.py`);
like it, the query is rows-only by design: eigenvectors are
float-identical only up to partial-sum order, so outputs are gated by
pytest against an in-memory numpy PCA (orthonormality, explained-
variance ordering, projection-variance ≈ eigenvalue) instead of a
DuckDB hash.

The reference has no linear algebra beyond the ALS normal equations
it solves per-user on 10-dim blocks (``ALS-Hadoop/ALS/
ALS.java:360-396``); PCA over the corpus is the natural extension of
that "small dense solve on the driver, big sparse pass on the
cluster" split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import dot
from ..sources import load

#: number of principal components the query reports
PCA_K = 2

#: fallback embedding dimensionality if the corpus is empty
PCA_DIM = 64


def fit_pca(spark: SparkSession, emb: DataFrame, k: int = PCA_K):
    """Fit a PCA basis on ``emb.embedding``; returns
    ``(n, mean, components, explained_ratio)`` with ``components``
    shaped (k, d), rows sign-normalized.

    One corpus pass; driver memory O(d²)."""
    import numpy as np

    def _partials(batches):
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
                    "g": [(X.T @ X).ravel()],  # ONE gemm per Arrow batch
                }
            )

    part = emb.select("embedding").mapInPandas(
        _partials, "n bigint, s array<double>, g array<double>"
    )
    # Spark-side reduction of the partials: bounded keys (d + d²), so
    # the driver sees ONE reduced row regardless of executor count.
    reduced = (
        part.select(
            "n", F.posexplode(F.concat(F.col("s"), F.col("g"))).alias("pos", "v")
        )
        .groupBy("pos")
        .agg(F.sum("v").alias("v"), F.sum(F.when(F.col("pos") == 0, F.col("n"))).alias("n"))
    )
    rows = reduced.collect()  # bounded: d + d² rows of (pos, v)
    # dimensionality comes from the reduced key space itself
    # (len = d + d²), not a hardcoded constant
    d = int((-1 + (1 + 4 * len(rows)) ** 0.5) / 2) if rows else PCA_DIM
    flat = np.zeros(d + d * d)
    n = 0
    for r in rows:
        flat[r["pos"]] = r["v"]
        if r["pos"] == 0:
            n = int(r["n"])
    if n < 2:
        raise ValueError(
            f"fit_pca needs >= 2 vectors to form a covariance (got {n})"
        )
    s, g = flat[:d], flat[d:].reshape(d, d)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # sign convention: the largest-|loading| component is positive
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    explained = evals[order] / evals.sum()
    return n, mean, comps, explained


def project(emb: DataFrame, mean, comps) -> DataFrame:
    """Append pc1..pcK score columns — pure JVM: dot against broadcast
    literal arrays minus a precomputed scalar offset."""
    out = emb
    for i, v in enumerate(comps):
        lit_v = F.array(*[F.lit(float(x)) for x in v])
        offset = float(mean @ v)
        out = out.withColumn(f"pc{i + 1}", dot("embedding", lit_v) - F.lit(offset))
    return out


def q_embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label map of the corpus in PCA space: each label's count,
    centroid and spread along the top-2 principal axes, plus the
    global explained-variance ratios (constant columns).

    Rows-only by design (float eigenbasis); gated by
    ``tests/test_pca.py`` against an exact in-memory PCA."""
    emb = load(spark, sf_dir, "embeddings", spread=True)
    n, mean, comps, explained = fit_pca(spark, emb, PCA_K)
    scored = project(emb, mean, comps)
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("pc1"), 4).alias("mean_pc1"),
            F.round(F.avg("pc2"), 4).alias("mean_pc2"),
            F.round(F.stddev("pc1"), 4).alias("sd_pc1"),
            F.round(F.stddev("pc2"), 4).alias("sd_pc2"),
        )
        .withColumn("evr_pc1", F.lit(round(float(explained[0]), 4)))
        .withColumn("evr_pc2", F.lit(round(float(explained[1]), 4)))
        .orderBy("label")
    )


QUERIES = {"q_embed_pca": q_embed_pca}

#: rows-only by design — float eigenbasis; see module docstring
ORACLES: dict[str, str] = {}
