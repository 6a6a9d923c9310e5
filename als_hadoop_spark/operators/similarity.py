"""Similarity search over the ``embeddings`` table (north-star
extension; SURVEY.md §2 Part C q_sim_search).

Two implementations of cosine top-k ANN:

- ``q_sim_search``      : exact brute-force — broadcast the (small)
  query set against the full corpus, per-query top-k via a window.
  This is the semantics baseline and is fully oracle-checkable.
  Scale shape: corpus-side is embarrassingly parallel (queries
  broadcast, corpus partitioned); the window partitions by query id.
- ``q_sim_search_lsh``  : random-hyperplane (SimHash) LSH — signature
  = sign bits of projections onto H seeded pseudo-random hyperplanes,
  banded into B bands; candidates = equi-join on (band, band-bits),
  exact cosine re-rank on candidates only. O(n·B) candidates instead
  of O(n·m). Approximate → rows-only; pytest measures recall vs the
  exact baseline.

The hyperplanes are generated from ``xxhash64`` arithmetic (not
``F.rand``) so they are identical on any partition layout/cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_sim
from ..sources import load

N_QUERIES = 5
TOP_K = 5

# LSH config: 16 hyperplanes → 4 bands × 4 bits
N_PLANES = 16
N_BANDS = 4


def q_sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: the first N_QUERIES vectors are the query
    set (broadcast); every corpus vector scores against each query in
    one partition-parallel pass; per-query top-k via ranking window
    partitioned by query id (scales with #queries × corpus
    partitioning, no global sort)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    corpus = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"))
    scored = (
        corpus.join(F.broadcast(queries), F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine_sim("qv", "cv"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def _signature(vec_col: str, seed: int = 7) -> F.Column:
    """Array of N_PLANES sign bits: bit p = sign(dot(v, h_p)) where
    hyperplane h_p's component d is a deterministic pseudo-uniform in
    [-1, 1) derived from xxhash64(p, d, seed). Computed entirely with
    built-in higher-order functions (JVM codegen)."""
    dims = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)

    def plane_dot(p: int) -> F.Column:
        prods = F.transform(
            dims,
            lambda d: F.element_at(F.col(vec_col), d + 1).cast("double")
            * (
                (
                    F.pmod(F.xxhash64(F.lit(p), d, F.lit(seed)), F.lit(1_000_003)).cast(
                        "double"
                    )
                    / 1_000_003.0
                )
                * 2
                - 1
            ),
        )
        return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)

    return F.array(*[(plane_dot(p) > 0).cast("int") for p in range(N_PLANES)])


def lsh_candidates(emb: DataFrame, seed: int = 7) -> DataFrame:
    """Banded signature join: two vectors are candidates if any band of
    their bit signatures matches exactly. Emits (id_a, id_b) candidate
    pairs from an equi-join on (band_idx, band_bits) — the shuffle key
    is uniformly distributed hash bits, no skew."""
    bits_per_band = N_PLANES // N_BANDS
    sig = emb.select(
        F.col("vec_id"), F.col("embedding"), _signature("embedding", seed).alias("sig")
    )
    bands = sig.select(
        "vec_id",
        "embedding",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "",
                        *[
                            F.element_at("sig", b * bits_per_band + i + 1)
                            for i in range(bits_per_band)
                        ],
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band", "band_bits"),
    )
    a = bands.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "band", "band_bits"
    )
    b = bands.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "band", "band_bits"
    )
    return (
        a.join(b, ["band", "band_bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])
    )


def q_sim_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN at scale: LSH-banded candidate generation + exact cosine
    re-rank, returning candidate pairs with cosine ≥ 0.3. Approximate
    (recall < 1) → rows-only; pytest measures recall against
    q_dedup_embed's exact pairs."""
    emb = load(spark, sf_dir, "embeddings")
    cands = lsh_candidates(emb)
    return (
        cands.select(
            "id_a", "id_b", F.round(cosine_sim("va", "vb"), 6).alias("cosine")
        )
        .filter(F.col("cosine") >= 0.3)
    )


QUERIES = {
    "q_sim_search": q_sim_search,
    "q_sim_search_lsh": q_sim_search_lsh,
}

ORACLES = {
    "q_sim_search": """
        SELECT query_id, cand_id, cosine, rank FROM (
            SELECT query_id, cand_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, cand_id) AS rank
            FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                       ROUND(list_cosine_similarity(
                           list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                           list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 6) AS cosine
                FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
                WHERE q.vec_id < 5
            )
        ) WHERE rank <= 5
    """,
}
