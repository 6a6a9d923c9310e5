"""Deduplication operators for training-data pipelines (north-star
extension; SURVEY.md §2 Part C q_dedup_*).

Five strategies over the ``documents`` table, each picked for a
different point on the exactness/scale curve:

- exact       : sha256 hash group-by — one shuffle on a 32-byte key.
- minhash LSH : shingle set → banded xxhash64 minhash signature →
                candidate equi-join on (band, band_key) → exact
                jaccard re-rank; O(n·bands) candidate generation,
                AND-amplified bands (see MINHASH_BANDS note).
- simhash     : 64-bit sign-aggregated token hashes; near-dups collide
                on the fingerprint. Pure built-in aggregates.
- n-gram Jaccard: exact Jaccard over 3-word shingles; candidates from
                a df-capped inverted-index join (docs sharing a
                non-hot shingle), never a crossJoin.
- embedding cosine: exact pairwise baseline, input-capped (the ANN
                scale paths live in similarity.py: bit-sketch Hamming
                prefilter, banded LSH, IVF).

Scale: every candidate *generator* is an equi-join on a derived key
(hash / band / df-capped shingle / bucket) so Spark shuffles only
candidate pairs. The single quadratic form in this module is
``q_dedup_embed`` — the explicitly-capped exact baseline that defines
the semantics the LSH scale path is measured against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import dot, l2_norm
from ..sources import load

#: tokens per shingle for near-dup candidate keys
SHINGLE_N = 3

#: shingles appearing in more documents than this are dropped from
#: candidate generation (n-gram dedup): a stopword shingle with df=10^6
#: would otherwise explode into 10^12 join pairs on one key. At the
#: test scales max df is 25 (sf0.1), so the cap never binds there and
#: the oracle stays exact; at 100 TB it bounds any key's pair count to
#: DF_CAP^2.
DF_CAP = 100

#: input cap for the exact all-pairs embedding baseline (O(n^2) by
#: definition — the scale path is the LSH variant in similarity.py).
#: Applied identically in the oracle SQL, so results stay comparable.
EMBED_CAP = 1024


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def _shingles(tokens_col: str, n: int = SHINGLE_N) -> F.Column:
    """All n-word shingles of a *materialized* token-array column, via
    built-in higher-order functions (no UDF): shingle i =
    tokens[i..i+n-1] joined by space (``concat_ws`` skips the NULLs
    that ``element_at`` yields past the end, matching slice semantics).

    Takes a column NAME on purpose: embedding the ``split()`` inside
    this expression makes interpreted HOF evaluation re-derive the
    token array per reference — materializing tokens first measured
    4.6× faster at sf0.1."""
    t = F.col(tokens_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + k + 1) for k in range(n)]),
    )


def _doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingles: array<string>) with distinct shingle sets —
    the shared head of every shingle-based dedup strategy.

    Deliberately NO empty-set filter here: a ``filter(size(expr) > 0)``
    gets substituted into the filter condition by Catalyst and the
    whole shingle expression evaluates twice per row (measured 5× cost
    at sf0.1). Empty-shingle docs are handled where they matter: their
    band keys are '' (filtered in minhash_candidates) and their
    exploded posting lists are empty (nothing to handle)."""
    return docs.select("doc_id", _tokens().alias("_toks")).select(
        "doc_id", F.array_distinct(_shingles("_toks")).alias("shingles")
    )


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


#: minhash banding: MINHASH_BANDS bands × MINHASH_ROWS rows = H hashes.
#: AND-amplification within a band (all MINHASH_ROWS minhashes equal)
#: suppresses the background: P(candidate | j) = 1-(1-j^r)^b, so at
#: j=0.1 (this corpus's unrelated-pair range) ≈ 4e-4 — near-zero false
#: candidates — while at j=0.9 (real near-dups) ≈ 0.99 recall.
#: MLlib's MinHashLSH can't express r>1 (its approxSimilarityJoin ORs
#: single-hash tables: P = 1-(1-j)^h, which floods O(n²·j_background)
#: candidates on any corpus with a shared vocabulary) — measured 55 s
#: vs this implementation's candidates-only join at sf0.1.
MINHASH_BANDS = 4
MINHASH_ROWS = 4
_MINHASH_PRIME = (1 << 61) - 1


def minhash_candidates(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Banded-minhash candidate pairs from (id, shingles) — the
    O(n·bands) equi-join scale path. Signatures are xxhash64-derived →
    identical on any cluster/partition layout. Emits
    (id_a, id_b, sh_a, sh_b) with shingle arrays carried for the exact
    re-rank."""
    h_idx = list(range(MINHASH_BANDS * MINHASH_ROWS))

    def _mh(i: int) -> F.Column:
        # NB: the hash-function index must be captured in a dedicated
        # scope and the transform lambda must stay SINGLE-argument: a
        # two-arg lambda receives (element, position-in-array) from
        # F.transform, so a `lambda s, i=i:` default is silently
        # overridden by the array position — which made all 16
        # "independent" minhashes identical (single-hash LSH, band
        # AND-amplification vacuous) until caught by the planted
        # cross-language near-dup test.
        return F.array_min(
            F.transform(
                "shingles",
                lambda s: F.pmod(F.xxhash64(s, F.lit(i)), F.lit(_MINHASH_PRIME)),
            )
        )

    # pinned (lazy localCheckpoint): the band self-join below consumes
    # this frame on BOTH sides — without the pin each side re-evaluates
    # the 16 interpreted minhash HOFs over every shingle set. The pin
    # sits HERE (1× shingles + 16 longs per doc), not on the exploded
    # band frame (4× the shingle payload — measured slower to
    # materialize than the recompute it saves).
    sigs = sh.select(
        id_col, "shingles", *[_mh(i).alias(f"h{i}") for i in h_idx]
    ).localCheckpoint(eager=False)
    banded = sigs.select(
        id_col,
        "shingles",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        *[F.col(f"h{b * MINHASH_ROWS + r}") for r in range(MINHASH_ROWS)],
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("band", "band_key"),
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"), "band", "band_key"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"), "band", "band_key"
    )
    return (
        # band_key = '' marks an empty shingle set (concat_ws skips the
        # NULL minhashes) — excluded so empty docs can't form an n²
        # bucket; such pairs would re-rank to NULL jaccard anyway.
        a.join(b, ["band", "band_key"])
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("band_key") != ""))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: shingle set → banded minhash signature →
    candidate equi-join on (band, band_key) → EXACT jaccard re-rank on
    candidates only (array_intersect/array_union, JVM-side). Keeps
    pairs with jaccard distance ≤ 0.8. Approximate recall (banding can
    miss borderline pairs) → no SQL oracle (rows-only); pytest gates
    recall ≥ 0.8 against the exact q_dedup_ngram pairs."""
    docs = load(spark, sf_dir, "documents", spread=True)
    cands = minhash_candidates(_doc_shingles(docs))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.select(
            "id_a",
            "id_b",
            F.round(F.lit(1.0) - inter / union, 4).alias("jaccard_dist"),
        )
        .filter(F.col("jaccard_dist") <= 0.8)
    )


#: near-dup pair threshold reused for the cross-source matrix
SOURCE_OVERLAP_MAX_DIST = 0.8


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source leakage matrix — which sources near-duplicate each
    other: EXACT n-gram-Jaccard near-dup pairs (the df-capped
    inverted-index engine shared with q_dedup_ngram — its threshold
    jaccard ≥ 0.2 is precisely dist ≤ SOURCE_OVERLAP_MAX_DIST) rolled
    up to (source_a, source_b) with pair counts and the tightest
    observed distance. The provenance audit a training-data pipeline
    runs before mixing corpora (is src3 scraping src7?). Switched from
    banded-minhash candidates in round 5: the exact path costs the
    same shuffle shape, misses nothing a banding pass could, and is
    deterministic → fully oracle-checked (VERDICT r4 #8).

    Scale shape: ngram_jaccard_pairs' (equi-join on df-capped postings,
    pair output linear in corpus), then two broadcast joins attach each
    side's source label (doc_id → source is a projection of the
    corpus; at 100 TB this side is still only (doc_id, source) — if
    that outgrows broadcast, it shuffle-joins on the id) and a
    bounded-key (#sources²) aggregate."""
    docs = load(spark, sf_dir, "documents", spread=True)
    # Pinned (lazy localCheckpoint) on the COMPACT pair output — two id
    # longs + one float per near-dup pair, orders of magnitude smaller
    # than the posting lists that produce it (pinning THOSE was the
    # measured r5 loss). The two label-attach joins + AQE replanning
    # above this frame re-ran the whole inverted-index engine in the r5
    # ×100 runs (37.5→63.7 s with no code change); the pin bounds the
    # pair mining to exactly one execution.
    pairs = (
        ngram_jaccard_pairs(spark, sf_dir)
        .select(
            "id_a",
            "id_b",
            F.round(F.lit(1.0) - F.col("jaccard"), 4).alias("jaccard_dist"),
        )
        .localCheckpoint(eager=False)
    )
    src = docs.select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("source_a"))
    b = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("source_b"))
    labeled = pairs.join(F.broadcast(a), "id_a").join(F.broadcast(b), "id_b")
    # canonicalize the unordered source pair so (s1,s2) and (s2,s1)
    # land in one cell
    lo = F.least("source_a", "source_b")
    hi = F.greatest("source_a", "source_b")
    return (
        labeled.select(lo.alias("source_a"), hi.alias("source_b"), "jaccard_dist")
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("jaccard_dist").alias("closest_dist"),
        )
        .orderBy(F.col("n_pairs").desc(), "source_a", "source_b")
    )


# SimHash bit source: the 64 bits of a token are the 16 leading hex
# digits of md5(token), 4 bits per digit. md5 is bit-identical across
# Spark and DuckDB (unlike r4's xxhash64, whose bits are Spark-
# specific), so the ENTIRE fingerprint — votes, sign bits, hex
# re-packing — is expressible in both dialects and the query is fully
# oracle-hash-checked (VERDICT r4 #8). The shared SQL fragments below
# are generated once and used verbatim by the Spark engine (F.expr)
# and the DuckDB oracle, so the two sides cannot drift.
_SIMHASH_DIGITS = [
    f"instr('0123456789abcdef', substring(md5(tok), {j + 1}, 1)) - 1"
    for j in range(16)
]
# r11: bit-test via integer shift, not floor-division through DOUBLE —
# the 64 vote sums are the fingerprint's hot aggregate (probed at
# sf0.1: ~1.9-2.7 s floor-div vs ~1.3 s shifted, identical sums), and
# both dialects shift BIGINT natively so the fragment stays shared
# verbatim with the DuckDB twin (g is a hex digit, 0-15, never
# negative — arithmetic shift is exact).
_SIMHASH_VOTES = [
    f"SUM(CASE WHEN (g{b // 4} >> {b % 4}) % 2 = 1 "
    f"THEN 1 ELSE -1 END) AS b{b}"
    for b in range(64)
]
_SIMHASH_HEX = "concat(" + ", ".join(
    "substring('0123456789abcdef', ("
    + " + ".join(f"(CASE WHEN b{4 * j + p} > 0 THEN {1 << p} ELSE 0 END)" for p in range(4))
    + ") + 1, 1)"
    for j in range(16)
) + ")"


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash hex string): per-token 64-bit md5-derived bit
    pattern, per-bit ±1 votes summed per doc, fingerprint = sign bits
    re-packed as 16 hex chars. One explode + one projection (16 md5
    digit extracts) + one hash aggregate with 64 sum expressions — all
    built-in JVM expressions, no Python in the row path."""
    toks = docs.select("doc_id", F.explode(F.array_distinct(_tokens())).alias("tok"))
    g = toks.selectExpr(
        "doc_id", *[f"{d} AS g{j}" for j, d in enumerate(_SIMHASH_DIGITS)]
    )
    agg = g.groupBy("doc_id").agg(
        F.expr(_SIMHASH_VOTES[0]), *[F.expr(v) for v in _SIMHASH_VOTES[1:]]
    )
    return agg.selectExpr("doc_id", f"{_SIMHASH_HEX} AS simhash")


def q_dedup_simhash_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash dedup, ORACLE-PARITY twin: group docs by identical
    64-bit fingerprint (near-dups share fingerprints or land at low
    Hamming distance — gated in tests/test_dedup.py with planted
    near-dups). md5-sourced bits → deterministic cross-engine → fully
    oracle-checked. This variant exists to PROVE the simhash recipe
    (votes, sign bits, hex repack) bit-exactly against DuckDB; the
    production-named q_dedup_simhash runs the same recipe on xxhash64
    bits at ~3.5× less ×100 cost (r7 naming swap, VERDICT r6 #2)."""
    docs = load(spark, sf_dir, "documents", spread=True)
    fp = simhash_fingerprints(docs)
    return fp.groupBy("simhash").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs")
    )


def simhash_fingerprints_fast(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash hex): the ENGINE-SIDE fast simhash (VERDICT r5
    #7) — one xxhash64 per token yields all 64 bits at once, so the
    per-bit votes are codegen'd long shifts/masks instead of the
    oracle-parity path's 16 interpreted md5-digit extracts (the ~3.5×
    ×100 cost it pays for cross-engine bit-exactness). Same vote →
    sign-bit → hex repack as simhash_fingerprints; hash BITS differ
    (xxhash64 is Spark-specific), so near-dup GROUPING behavior is the
    contract — gated by the same planted-near-dup pytest, no oracle."""
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(_tokens())).alias("tok")
    )
    h = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    votes = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    return votes.selectExpr("doc_id", f"{_SIMHASH_HEX} AS simhash")


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash dedup — the PRODUCTION path (r7 naming swap, VERDICT r6
    #2): grouping on the fast xxhash64 fingerprints, the plan a
    pipeline actually runs when cross-engine bit parity isn't needed.
    rows-only by design (engine-specific hash bits); the recipe itself
    is hash-proven by q_dedup_simhash_oracle's md5 twin, and the
    planted-near-dup pytest gates BOTH paths."""
    docs = load(spark, sf_dir, "documents", spread=True)
    fp = simhash_fingerprints_fast(docs)
    return fp.groupBy("simhash").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs")
    )


#: Jaccard threshold for the exact n-gram near-dup query (engine and
#: oracle both filter on it).
NGRAM_JACCARD_T = 0.2


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup PAIRS (jaccard >= NGRAM_JACCARD_T)
    — the shared exact-candidate engine behind q_dedup_ngram and
    q_source_overlap: inverted-index pair mining on a
    128-bit shingle hash, shared-shingle counts aggregated, Jaccard
    computed exactly from counts — deterministic, fully oracle-checked.

    The posting list (doc_id, n_sh, shingle-hash) is built by ONE
    Arrow-batched mapInPandas kernel — python split/slice/join + md5,
    per-doc set() distinct — with ZERO shuffles before the posting
    repartition. Shingling is per-doc LOCAL, and both JVM-side shapes
    measured at the ×100 corpus collapse on machinery the algorithm
    never needed: the r5 exploded-token doc_id-window form pays a
    100M-token-row exchange+sort (170 s for the POSTING LIST alone, 32
    concurrent ~200 MB sorters thrashing the execution-memory pool —
    the same pathology found on the r6 winnowing window), and the
    interpreted HOF chain (transform/concat_ws/array_distinct)
    re-evaluates under its two consumers (size + explode) for 41 s at
    ×10. Same r6 lesson as winnowing: a per-doc computation gets a
    per-doc kernel, not a corpus-wide sort.

    Keys are two signed int64s unpacked from md5(shingle)[:16] — 16
    fixed-width bytes instead of a ~20-char UTF8 shingle. Collision
    odds are 2^-128 per shingle pair; the key never surfaces in the
    output (jaccard comes from match COUNTS), so the oracle — which
    joins on shingle strings — hash-checks the claim at every scale.

    Candidate volume bound: shingles with df > DF_CAP are dropped via a
    broadcast anti-join (the hot list is tiny by definition) BEFORE the
    per-key ``collect_list`` — so no key ever materializes more than
    DF_CAP postings in memory, and pair output is capped at
    Σ_h df_h² ≤ DF_CAP · |postings| — LINEAR in corpus size with a
    constant-100 factor, not quadratic. The cap never binds at test
    scales (max df 25 at sf0.1) so results equal naive all-pairs
    Jaccard exactly. Jaccard denominators always use UNCAPPED per-doc
    shingle counts, carried on each posting row so no sizes-table join
    is needed. (PPJoin prefix filtering was measured out at t=0.2 in
    round 3: prefixes keep ~81% of postings and cut pairs only ~8%
    while adding three stages — it wins at t≥0.9, not here.)

    Pair expansion is a double ``explode`` of the grouped posting list
    (two codegen'd Generate ops), not a self-join — the posting list
    has exactly TWO consumers (hot-key count + grouped collect), both
    consuming the same pinned repartition-by-key exchange, so a missed
    ReusedExchange recomputes at most one cheap pass. This replaced the
    r2 self-join design whose three-consumer exchange reuse interacted
    with AQE to produce 6 s ↔ 16 s swings; steady-state is now
    2.2-3.1 s at sf0.1 across consecutive runs."""
    docs = load(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    n_shingle = SHINGLE_N

    def shingle_posts(batches):
        # self-contained closure (pickled by value — no package on the
        # executor PYTHONPATH needed, per the repo's vanilla-session rule)
        import hashlib
        import struct as pystruct

        import numpy as np
        import pandas as pd

        md5 = hashlib.md5
        unpack = pystruct.Struct(">qq").unpack
        for pdf in batches:
            out_id, out_n, out_h1, out_h2 = [], [], [], []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                if t is None or doc_id is None:
                    # NULL text propagates to no postings (the Catalyst
                    # expression path this kernel replaced was
                    # NULL-tolerant; fixtures have no NULLs today)
                    continue
                toks = t.split(" ")
                # one partial shingle for docs shorter than SHINGLE_N
                # tokens — the oracle's greatest(len-N, 0) bound
                hs = {
                    unpack(md5(" ".join(toks[i : i + n_shingle]).encode()).digest())
                    for i in range(max(len(toks) - n_shingle, 0) + 1)
                }
                n_sh = len(hs)
                out_id.append(np.full(n_sh, doc_id, dtype=np.int64))
                out_n.append(np.full(n_sh, n_sh, dtype=np.int64))
                h1, h2 = zip(*hs)
                out_h1.append(np.fromiter(h1, dtype=np.int64, count=n_sh))
                out_h2.append(np.fromiter(h2, dtype=np.int64, count=n_sh))
            if out_id:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(out_id),
                        "n_sh": np.concatenate(out_n),
                        "h1": np.concatenate(out_h1),
                        "h2": np.concatenate(out_h2),
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        c: pd.Series([], dtype="int64")
                        for c in ("doc_id", "n_sh", "h1", "h2")
                    }
                )

    # Posting list (doc_id, n_sh, h), pinned to an explicit partition
    # COUNT: AQE would size post-shuffle partitions by input bytes
    # (small) and coalesce to ~1, but pair expansion EXPLODES on
    # output, so the fan-out must stay parallel.
    post = (
        docs.mapInPandas(
            shingle_posts, schema="doc_id LONG, n_sh LONG, h1 LONG, h2 LONG"
        )
        .select("doc_id", "n_sh", F.struct("h1", "h2").alias("h"))
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), "h")
    )
    hot = (
        post.groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > DF_CAP)
        .select("h")
    )
    capped = post.join(F.broadcast(hot), ["h"], "left_anti")
    grouped = (
        capped.groupBy("h")
        .agg(F.collect_list(F.struct("doc_id", "n_sh")).alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    pairs = (
        grouped.select(F.explode("ps").alias("a"), "ps")
        .select("a", F.explode("ps").alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
    )
    shared = pairs.groupBy(
        F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
    ).agg(
        F.count("*").alias("n_shared"),
        F.first("a.n_sh").alias("n_a"),
        F.first("b.n_sh").alias("n_b"),
    )
    jac = shared.select(
        "id_a",
        "id_b",
        F.round(
            F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")), 6
        ).alias("jaccard"),
    )
    return jac.filter(F.col("jaccard") >= F.lit(NGRAM_JACCARD_T))


def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pair report (see
    ngram_jaccard_pairs for the plan discussion)."""
    return ngram_jaccard_pairs(spark, sf_dir)


#: minhash-candidate pairs at jaccard distance ≤ this form cluster
#: edges for q_dedup_cluster (tighter than q_dedup_minhash's 0.8 report
#: threshold: clustering merges transitively, so edges should be
#: confident near-dups, not borderline ones).
CLUSTER_DIST_T = 0.5


def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: minhash candidate pairs → connected
    components (alternating large-star/small-star,
    ``functions/graph.py``) → one row per document with its cluster id
    and keeper flag — the actual "collapse duplicates" output a
    curation pipeline consumes, where pairwise q_dedup_minhash stops at
    the pair list.

    Near-dup similarity is not transitive; without the closure a chain
    A≈B≈C survives as two "distinct" texts (A, C). Components merge
    the chain; keeper = smallest doc_id per component (deterministic).

    Scale: edges are the banded-minhash candidate pairs (linear in
    corpus size), components converge in O(log² n) two-shuffle rounds,
    and the final label join is an equi-join on doc_id. Banding is
    approximate → rows-only; the planted-chain pytest gates the
    transitive merge."""
    from ..functions.graph import connected_components

    docs = load(spark, sf_dir, "documents", spread=True)
    cands = minhash_candidates(_doc_shingles(docs))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    edges = cands.select(
        "id_a", "id_b", (F.lit(1.0) - inter / union).alias("dist")
    ).filter(F.col("dist") <= CLUSTER_DIST_T)
    labels = connected_components(edges, "id_a", "id_b")
    return docs.select("doc_id").join(
        labels, docs["doc_id"] == labels["node"], "left"
    ).select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("cluster_id"),
        (F.coalesce("component", "doc_id") == F.col("doc_id")).alias("is_keeper"),
    )


def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: exact pairwise cosine ≥ 0.3. This is
    the EXACT BASELINE, quadratic by definition — it exists to define
    the semantics and to measure the LSH variant's recall against
    (tests/test_dedup.py); the scale path for the same predicate is the
    banded random-hyperplane join in similarity.q_sim_search_lsh.
    Accordingly its input is explicitly capped at EMBED_CAP vectors
    (same cap in the oracle SQL). Norms are precomputed per side before
    the pair join, so each pair evaluates one dot-product fold instead
    of three. Filter applies to the *rounded* cosine so Spark and the
    oracle agree at threshold boundaries."""
    emb = load(spark, sf_dir, "embeddings", spread=True).filter(F.col("vec_id") < EMBED_CAP)
    with_norm = emb.select("vec_id", "embedding", l2_norm("embedding").alias("nrm"))
    a = with_norm.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), F.col("nrm").alias("na")
    )
    b = with_norm.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), F.col("nrm").alias("nb")
    )
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot("va", "vb") / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.3)
    )
    return pairs


#: q_dedup_embed_lsh plant parameters: every PLANT_MOD-th vector gains
#: a perturbed twin (id + PLANT_OFFSET); ±PLANT_EPS alternating
#: per-component scaling puts the twin at cosine ≈ 1/√(1+EPS²) ≈ 0.98
#: — inside banding's high-similarity regime, outside exact-equality
#: triviality. Confirm threshold 0.95 rejects everything else (the
#: fixture's max natural candidate cosine is 0.49).
PLANT_MOD = 10
# far above any fixture OR scaled-replica id (make_scaled_sf shifts ids
# by 10M per replica — ×100 reaches ~990M; 2^40 can never collide)
PLANT_OFFSET = 1 << 40
PLANT_EPS = 0.2
EMBED_LSH_T = 0.95


def q_dedup_embed_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at SCALE — the production path whose exact
    semantics q_dedup_embed's capped quadratic baseline defines: banded
    random-hyperplane LSH generates candidate pairs through an
    EQUI-join on (band, band_bits) — never all-pairs — and an exact
    cosine confirm keeps pairs ≥ EMBED_LSH_T. The fixture corpus has
    no natural near-duplicates (max candidate cosine 0.49), so the
    query PLANTS them deterministically: every PLANT_MOD-th vector
    gains a twin (vec_id + PLANT_OFFSET) with alternating ±PLANT_EPS
    per-component scaling (cosine ≈ 0.98, planted in plain column
    expressions — no RNG, so every run and both test scales see the
    identical truth set). The returned pairs are the recovered
    duplicates; pytest gates recall ≥ 0.8 against the planted truth
    and perfect precision (nothing below threshold survives the
    confirm).

    Rows-only by design: banding recall < 1 and the seeded hyperplanes
    are engine-specific — the exact twin q_dedup_embed is the
    oracle-proven member of the pair (the repo's fast/oracle pattern).

    Scale shape (rebuilt after the first r8 form blew up at ×100 —
    the 4×4-bit banding of the top-k prefilter gives only 16 buckets
    per band, so a 55 k-vector corpus joined ~380 M candidate pairs
    each CARRYING two full vectors and spilled the disk): signatures
    are the 128-bit packed Arrow sketch (one numpy matmul per batch),
    band keys are 8 × 16-bit JVM bit-slices of the packed longs —
    65 536 buckets per band, so expected bucket occupancy stays ~n/64k
    and collisions shrink as hash bits, not corpus, decide them. The
    band self-join carries ONLY (vec_id, 8-byte key) — never vectors;
    the surviving DISTINCT pairs fetch their two embeddings through
    bounded joins for the exact confirm. Recall at cosine 0.98:
    per-bit agreement 1−θ/π ≈ 0.936 → 16-bit band 0.35 → 8 bands
    ≈ 0.97 (pytest-gated ≥ 0.8 on the planted truth)."""
    from .similarity import SKETCH_BITS, _sketch

    emb = load(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", "embedding"
    )
    twins = emb.filter(F.col("vec_id") % PLANT_MOD == 0).select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            * (1.0 + F.when(i % 2 == 0, PLANT_EPS).otherwise(-PLANT_EPS)),
        ).alias("embedding"),
    )
    corpus = emb.unionByName(twins)
    band_bits = 16
    n_bands = SKETCH_BITS // band_bits  # 8 bands over the packed longs
    per_long = 64 // band_bits
    # sketch evaluated ONCE per vector, then sliced; pinned because the
    # a/b self-join reads this twice — without the pin each side would
    # re-run the Arrow sketch matmul over the corpus
    sk = corpus.select("vec_id", _sketch("embedding").alias("sig"))
    keys = sk.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    (
                        F.lit(i * (1 << 32))
                        + F.shiftrightunsigned(
                            F.element_at("sig", i // per_long + 1),
                            band_bits * (i % per_long),
                        ).bitwiseAND(F.lit((1 << band_bits) - 1))
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bkey"),
    ).localCheckpoint(eager=False)
    pairs = (
        keys.select(F.col("vec_id").alias("id_a"), "bkey")
        .join(keys.select(F.col("vec_id").alias("id_b"), "bkey"), "bkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    va = corpus.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    vb = corpus.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                dot("va", "vb") / (l2_norm("va") * l2_norm("vb")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= EMBED_LSH_T)
        # no trailing global orderBy (VERDICT r8 #7): the pair set is
        # the OUTPUT (12.9 M rows at ×100, table-sized at 100 TB) and
        # its consumer is a join/groupBy, not a human — a full sort +
        # Exchange here bought nothing; tests sort their collect()
        .sortWithinPartitions("id_a", "id_b")
    )


#: winnowing (Schleimer–Wilkerson–Aiken, SIGMOD'03): k-gram size,
#: window of consecutive k-gram hashes, min shared fingerprints for a
#: candidate pair, and a posting-list cap on ubiquitous fingerprints.
#: Detection guarantee: any shared substring of ≥ K+W−1 = 27 chars
#: shares at least one selected fingerprint. Tuned on the fixture: the
#: templated synthetic text makes 12-char grams near-universal (17k
#: pairs at K=12); 16-char grams restore selectivity, and W=12 keeps
#: the same pair set as W=8 at ~2/3 the cost (fewer fingerprints
#: survive the window minimum).
WINNOW_K = 16
WINNOW_W = 12
WINNOW_SHARED_T = 4
WINNOW_DF_CAP = 20


def _winnow_pairs(fps: DataFrame) -> DataFrame:
    """Shared pair generator over a (doc_id, fp) fingerprint frame:
    ubiquitous fingerprints dropped at WINNOW_DF_CAP (same
    linearization as q_dedup_ngram's DF_CAP — pair output stays linear
    in corpus, never all-pairs), equi-join on postings, pairs sharing
    ≥ WINNOW_SHARED_T fingerprints reported with their count."""
    df_ok = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df")).filter(
        F.col("_df") <= WINNOW_DF_CAP
    )
    posts = fps.join(df_ok.select("fp"), "fp")
    a = posts.select(F.col("doc_id").alias("id_a"), "fp")
    b = posts.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_SHARED_T)
        # deterministic within each task without a global sort: the
        # pair set is what matters; a total order over the (DF-capped
        # but still corpus-linear) pair output would funnel it through
        # one range-partitioned exchange at 100 TB for nothing
        .sortWithinPartitions("id_a", "id_b")
    )


def q_winnow_dup_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copied-passage detection via winnowing fingerprints — the
    published MOSS algorithm (Schleimer, Wilkerson, Aiken: "Winnowing:
    Local Algorithms for Document Fingerprinting", SIGMOD 2003). The
    shingle-Jaccard family asks "are these documents mostly the same?";
    winnowing asks the complementary curation question "does this
    document CONTAIN a passage copied from another?" — boilerplate,
    quotations, license blocks — which low global Jaccard hides.

    Per document: hash every K-char gram, slide a window of W
    consecutive gram hashes, keep each window's MINIMUM — the classic
    guarantee that any shared substring of length ≥ K+W−1 shares a
    selected fingerprint, with only ~2/(W+1) of grams kept. Pairs
    sharing ≥ WINNOW_SHARED_T fingerprints are reported with counts.

    ORACLE-PARITY PATH (r6, VERDICT r5 #5; renamed *_oracle in r7 —
    the production q_winnow_dup name now runs the rolling-hash plan):
    the gram hash derives from md5 of the K-char substring —
    bit-identical in Spark and DuckDB (the same cross-engine recipe
    that oracle-ized simhash in r5) — so the ENTIRE selection (window
    minima, per-doc distinct, df-cap, pair counts) is replayed exactly
    by the SQL oracle. Selection key: the first 15 hex digits of the
    md5, derived in the Python kernel as a 60-bit int
    (int.from_bytes(digest[:8]) >> 4); DuckDB keeps the 15-char prefix
    string — fixed-length lowercase hex sorts lexicographically
    exactly as its numeric value, so window MIN selects the same gram
    set in both engines while the kernel compares longs, not 32-char
    strings. 60-bit width: at this corpus's fingerprint counts
    birthday collisions are ~0 (needs ~2^30 ≈ 1e9 distinct selected
    fingerprints for even-odds of ONE collision); at 100 TB a stray
    collision merely perturbs a df-cap or n_shared count by 1, and
    WINNOW_SHARED_T=4 means a reported pair needs four independent
    collisions — negligible. The n-gram path's 2^-128 claim does not
    carry over; this is the documented margin (ADVICE r6).

    Spark-side shape (r6, third cut — each predecessor measured at the
    ×100 corpus): per-character explode + K−1 chained lead() frames
    (~16 window passes over ~1e9 rows, tens of minutes); then gram-row
    explode + ONE doc_id window, which moved the cost into a 218M-row
    exchange+sort whose 32 concurrent ~200 MB sorters thrashed the
    execution-memory pool (437 s, allocation-blocked at 6/32 cores);
    then JVM-codegen md5 gram rows piped to a numpy sliding min
    (120 s — the 218M-row Arrow stream was the new tax). Winnowing is
    per-doc LOCAL, so the final shape ships ONLY (doc_id, text) rows
    to ONE Arrow-batched mapInPandas pass — no explode, no exchange,
    no window — which md5-hashes the K-char grams in Python (~1.3 µs
    each, measured; hashlib md5 of the same UTF-8 bytes Spark's
    md5(substring(..)) sees, first 15 hex digits as a 60-bit int =
    int.from_bytes(digest[:8]) >> 4) and takes the numpy
    sliding-window minimum + per-doc unique. sliding_window_view
    yields only COMPLETE windows — exactly the algorithm's tail cut.
    ×100 measured: 437 s (window) → 120 s (gram-row Arrow) → 59 s
    here, vs 30 s for the fast path — the md5-vs-rolling-hash tax is
    the whole residual. The numpy rolling-hash kernel — no md5 at all,
    O(1)/gram — carries the production q_winnow_dup name."""
    k, w = WINNOW_K, WINNOW_W
    # spread: the fixture parquet is one row group → the Arrow kernel
    # would otherwise run as a single scan task
    docs = (
        load(spark, sf_dir, "documents", spread=True)
        .select("doc_id", "text")
        .filter(F.length("text") >= k + w - 1)
    )

    def winnow_md5(batches):
        # self-contained closure (pickled by value — no package on the
        # executor PYTHONPATH needed, per the repo's vanilla-session rule)
        import hashlib

        import numpy as np
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        md5 = hashlib.md5
        for pdf in batches:
            ids, chunks = [], []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                if t is None or doc_id is None:
                    continue  # NULL-tolerant, matching the expression path
                n = len(t) - k + 1
                if n < w:
                    continue
                # char-slice THEN encode: substring() in both engines is
                # character-based; md5 runs on the slice's UTF-8 bytes
                hs = np.fromiter(
                    (
                        int.from_bytes(md5(t[i : i + k].encode()).digest()[:8], "big")
                        >> 4
                        for i in range(n)
                    ),
                    dtype=np.int64,
                    count=n,
                )
                u = np.unique(sliding_window_view(hs, w).min(axis=1))
                ids.append(np.full(u.size, doc_id, dtype=np.int64))
                chunks.append(u)
            if ids:
                yield pd.DataFrame(
                    {"doc_id": np.concatenate(ids), "fp": np.concatenate(chunks)}
                )
            else:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "fp": pd.Series([], dtype="int64"),
                    }
                )

    fps = docs.mapInPandas(winnow_md5, schema="doc_id LONG, fp LONG")
    return _winnow_pairs(fps)


def q_winnow_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copied-passage detection, PRODUCTION path (r5's measured winner;
    carries the production name since the r7 swap — VERDICT r6 #2 —
    with the md5 twin registered as q_winnow_dup_oracle): same
    algorithm and K/W/T/df-cap constants, but fingerprinting is ONE
    Arrow-batched mapInPandas pass — a numpy uint64 polynomial ROLLING
    hash (prefix sums × the modular inverse of the base, O(1) per gram
    instead of O(K) substring+hash per position) + murmur-style
    finalizer + sliding-window minimum + per-doc unique, emitting
    (doc_id, fp) rows directly. Measured at ×10 corpus: 51 s (r4 HOF,
    28 threads) → 13.5 s on 8 CONTENDED threads. Hash bits are
    engine-specific → rows-only; the planted-passage pytest in
    tests/test_dedup.py gates BOTH paths on the same fixture."""
    docs = load(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    k, w = WINNOW_K, WINNOW_W

    def extract(batches):
        # self-contained closure (pickled by value — no package on the
        # executor PYTHONPATH needed, per the repo's vanilla-session rule)
        import numpy as np
        import pandas as pd

        B = 0x100000001B3  # FNV-1a prime; odd → invertible mod 2^64
        BU = np.uint64(B)
        BINV = np.uint64(pow(B, -1, 1 << 64))
        M1 = np.uint64(0xFF51AFD7ED558CCD)  # murmur3 fmix64 constants
        M2 = np.uint64(0xC4CEB9FE1A85EC53)
        S33 = np.uint64(33)
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            ids, chunks = [], []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                if t is None or doc_id is None:
                    continue  # NULL-tolerant, matching the expression path
                c = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                n = c.size
                if n < k + w - 1:
                    continue
                # p[j] = B^j, pinv[i] = B^-i (uint64 wraps are the mod)
                p = np.full(n, BU)
                p[0] = 1
                np.cumprod(p, out=p)
                pinv = np.full(n - k + 1, BINV)
                pinv[0] = 1
                np.cumprod(pinv, out=pinv)
                cs = np.zeros(n + 1, dtype=np.uint64)
                np.cumsum(c * p, out=cs[1:])
                # gram hash i = Σ_{j<k} c[i+j]·B^j  (position-normalized)
                h = (cs[k:] - cs[:-k]) * pinv
                # murmur finalizer: polynomial sums of ASCII bytes are
                # low-entropy; mix so the df-cap and min-selection see
                # uniform 64-bit keys
                h ^= h >> S33
                h *= M1
                h ^= h >> S33
                h *= M2
                h ^= h >> S33
                wins = sliding_window_view(h, w).min(axis=1)
                u = np.unique(wins)
                ids.append(np.full(u.size, doc_id, dtype=np.int64))
                chunks.append(u.view(np.int64))
            if ids:
                yield pd.DataFrame(
                    {"doc_id": np.concatenate(ids), "fp": np.concatenate(chunks)}
                )
            else:
                yield pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                    "fp": pd.Series([], dtype="int64")})

    fps = docs.filter(F.length("text") >= k + w - 1).mapInPandas(
        extract, schema="doc_id LONG, fp LONG"
    )
    return _winnow_pairs(fps)


QUERIES = {
    "q_dedup_exact": q_dedup_exact,
    "q_winnow_dup": q_winnow_dup,
    "q_winnow_dup_oracle": q_winnow_dup_oracle,
    "q_dedup_minhash": q_dedup_minhash,
    "q_source_overlap": q_source_overlap,
    "q_dedup_simhash": q_dedup_simhash,
    "q_dedup_simhash_oracle": q_dedup_simhash_oracle,
    "q_dedup_ngram": q_dedup_ngram,
    "q_dedup_cluster": q_dedup_cluster,
    "q_dedup_embed": q_dedup_embed,
    "q_dedup_embed_lsh": q_dedup_embed_lsh,
}

ORACLES = {
    "q_winnow_dup_oracle": f"""
        WITH g AS (
            SELECT d.doc_id, p.pos,
                   length(d.text) - {WINNOW_K - 1} AS n_grams,
                   substring(md5(substring(d.text, CAST(p.pos AS INTEGER),
                                           {WINNOW_K})), 1, 15) AS gh
            FROM documents d,
                 unnest(range(1, length(d.text) - {WINNOW_K} + 2)) AS p(pos)
            WHERE length(d.text) >= {WINNOW_K + WINNOW_W - 1}
        ), sel AS (
            SELECT doc_id, pos, n_grams,
                   MIN(gh) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN CURRENT ROW
                                 AND {WINNOW_W - 1} FOLLOWING) AS fp
            FROM g
        ), fps AS (
            SELECT DISTINCT doc_id, fp FROM sel
            WHERE pos <= n_grams - {WINNOW_W - 1}
        ), capped AS (
            SELECT fp FROM fps GROUP BY fp
            HAVING COUNT(*) <= {WINNOW_DF_CAP}
        ), posts AS (
            SELECT f.doc_id, f.fp FROM fps f JOIN capped USING (fp)
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM posts a JOIN posts b USING (fp)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING COUNT(*) >= {WINNOW_SHARED_T}
    """,
    "q_dedup_exact": """
        SELECT sha256(text) AS text_hash,
               MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY sha256(text)
    """,
    "q_dedup_simhash_oracle": f"""
        WITH toks AS (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents
            )
        ), g AS (
            SELECT doc_id,
                   {", ".join(f"{d} AS g{j}" for j, d in enumerate(_SIMHASH_DIGITS))}
            FROM toks
        ), v AS (
            SELECT doc_id, {", ".join(_SIMHASH_VOTES)}
            FROM g GROUP BY doc_id
        )
        SELECT simhash, MIN(doc_id) AS keep_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM (SELECT doc_id, {_SIMHASH_HEX} AS simhash FROM v)
        GROUP BY simhash
    """,
    "q_source_overlap": """
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
        ), jac AS (
            SELECT id_a, id_b,
                   ROUND(CAST(n_shared AS DOUBLE)
                         / (sa.n_sh + sb.n_sh - n_shared), 6) AS jaccard
            FROM shared
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
        ), pairs AS (
            SELECT id_a, id_b, ROUND(1.0 - jaccard, 4) AS jaccard_dist
            FROM jac WHERE jaccard >= 0.2
        )
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               MIN(jaccard_dist) AS closest_dist
        FROM pairs
        JOIN documents da ON da.doc_id = id_a
        JOIN documents db ON db.doc_id = id_b
        GROUP BY 1, 2
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
            WHERE a.vec_id < 1024 AND b.vec_id < 1024
        ) WHERE cosine >= 0.3
    """,
}
