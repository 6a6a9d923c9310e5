"""Deduplication operators for training-data pipelines (north-star
extension; SURVEY.md §2 Part C q_dedup_*).

Five strategies over the ``documents`` table, each picked for a
different point on the exactness/scale curve:

- exact       : sha256 hash group-by — one shuffle on a 32-byte key,
                the only fully-oracle-checkable form.
- minhash LSH : shingle → MinHash signature → banded bucket join —
                O(n·bands) candidate generation instead of O(n²)
                (`ml.feature.MinHashLSH`, seeded).
- simhash     : 64-bit sign-aggregated token hashes; near-dups collide
                on the fingerprint. Pure built-in aggregates.
- n-gram Jaccard: exact Jaccard over 3-word shingles, but candidates
                come from an inverted-index join (docs sharing a
                shingle), never a crossJoin.
- embedding cosine: near-dup pairs above a cosine threshold with
                length-based blocking (see similarity.py for the
                LSH-bucketed ANN variant).

Scale: every strategy generates candidates via an equi-join on a
derived key (hash / band / shingle / bucket) so Spark shuffles only
candidate pairs. The crossJoin form appears nowhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_sim
from ..sources import load

#: tokens per shingle for near-dup candidate keys
SHINGLE_N = 3


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def _shingles(tokens: F.Column, n: int = SHINGLE_N) -> F.Column:
    """All n-word shingles of a token array, via built-in higher-order
    functions (no UDF): shingle i = tokens[i : i+n] joined by space."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(tokens) - n, F.lit(0)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest doc_id
    (deterministic keeper), count the copies. sha256 collisions are
    ignorable; the shuffle key is the 64-hex digest, uniformly
    distributed → no skew at any scale."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.sha2("text", 256).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: shingle set → HashingTF binary vector →
    MinHashLSH banded join (seeded). approxSimilarityJoin's bucket join
    is the O(n·bands) scale path. Approximate + impl-defined hashing →
    no SQL oracle (rows-only); tests assert it finds planted dups."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.array_distinct(_shingles(_tokens())).alias("shingles")
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True)
    feat = tf.transform(sh)
    lsh = MinHashLSH(inputCol="features", outputCol="sig", numHashTables=8, seed=42)
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, 0.8, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: per-token 64-bit hash, per-bit ±1 votes summed per doc,
    fingerprint = sign bits. Near-dups share fingerprints (or low
    Hamming distance — tested in pytest). One explode + one hash
    aggregate with 64 codegen'd sum expressions; no Python in the row
    path. xxhash64 is impl-specific → rows-only."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.array_distinct(_tokens())).alias("tok"))
    h = F.xxhash64("tok")
    # Bit b is tested via shiftright+mask — a literal (1 << 63) would
    # overflow Java long at the py4j boundary (NumberFormatException).
    votes = [
        F.sum(
            F.when(F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    one = F.lit(1).cast("long")
    hi = sum(
        (F.when(F.col(f"b{b + 32}") > 0, F.shiftleft(one, b)).otherwise(0) for b in range(32)),
        start=F.lit(0),
    )
    lo = sum(
        (F.when(F.col(f"b{b}") > 0, F.shiftleft(one, b)).otherwise(0) for b in range(32)),
        start=F.lit(0),
    )
    fp = agg.select(
        "doc_id",
        F.format_string("%08x%08x", hi.cast("long"), lo.cast("long")).alias("simhash"),
    )
    groups = fp.groupBy("simhash").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs")
    )
    return groups


def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup with inverted-index candidate
    generation: docs sharing ≥1 shingle are joined through the shingle
    (posting list), shared-shingle counts aggregated, Jaccard computed
    exactly — deterministic, so fully oracle-checkable. The shingle
    join shuffles only posting-list pairs; hot shingles would be
    AQE-skew-split at scale (or df-capped via a stopword-shingle
    filter)."""
    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(_shingles(_tokens()))).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")), 6
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= 0.2)


def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: exact pairwise cosine ≥ 0.3 over the
    embeddings table. This is the exact/oracle-checkable form — the
    pairwise join is the baseline semantics definition; the scale path
    for the same predicate is the random-hyperplane LSH bucketing in
    similarity.q_sim_search_lsh (candidates from an equi-join on
    signature, never O(n²)). Filter applies to the *rounded* cosine so
    Spark and the oracle agree at threshold boundaries."""
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine_sim("va", "vb"), 6).alias("cosine"))
        .filter(F.col("cosine") >= 0.3)
    )
    return pairs


QUERIES = {
    "q_dedup_exact": q_dedup_exact,
    "q_dedup_minhash": q_dedup_minhash,
    "q_dedup_simhash": q_dedup_simhash,
    "q_dedup_ngram": q_dedup_ngram,
    "q_dedup_embed": q_dedup_embed,
}

ORACLES = {
    "q_dedup_exact": """
        SELECT sha256(text) AS text_hash,
               MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY sha256(text)
    """,
    "q_dedup_ngram": """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id, s
            FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           range(0, greatest(len(t) - 3, 0) + 1),
                           i -> array_to_string(t[i + 1 : i + 3], ' ')
                       )) AS s
                FROM toks
            )
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        ), shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b, jaccard FROM (
            SELECT id_a, id_b,
                   ROUND(CAST(n_shared AS DOUBLE)
                         / (sa.n_sh + sb.n_sh - n_shared), 6) AS jaccard
            FROM shared
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
        ) WHERE jaccard >= 0.2
    """,
    "q_dedup_embed": """
        SELECT id_a, id_b, cosine FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(
                       list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ) WHERE cosine >= 0.3
    """,
}
