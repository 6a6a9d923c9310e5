"""Quality gates for the approximate dedup/similarity operators
(SURVEY.md §5.1): every approximate candidate generator is measured
against its exact baseline — "rows-only" in the driver gate must never
mean "untested"."""

from __future__ import annotations

from pyspark.sql import functions as F

from als_hadoop_spark.operators import dedup, similarity
from als_hadoop_spark.sources import load

MID_SF = "/root/testdata/sf0.01"


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_minhash_recall_vs_exact_ngram(spark):
    """Banded minhash must recover >= 80% of the exact jaccard>=0.2
    pairs (they are all j>=0.9 planted near-dups in this corpus, where
    banding recall is ~1-(1-j^r)^b ~ 0.99)."""
    exact = _pairs(dedup.q_dedup_ngram(spark, MID_SF))
    approx = _pairs(dedup.q_dedup_minhash(spark, MID_SF))
    assert exact, "exact baseline found no pairs — fixture changed?"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"minhash recall {recall:.2f} < 0.8"


def test_minhash_precision_is_exact(spark):
    """The exact re-rank means every emitted pair truly passes the
    jaccard threshold: precision vs the exact pair set is 1."""
    exact = _pairs(dedup.q_dedup_ngram(spark, MID_SF))
    approx = _pairs(dedup.q_dedup_minhash(spark, MID_SF))
    assert approx <= exact, f"false positives: {sorted(approx - exact)[:5]}"


def test_bitsketch_ann_recall_at_k(spark):
    """Bit-sketch ANN (Hamming prefilter + exact re-rank) must recover
    >= 80% of the exact per-query top-k neighbors."""
    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.q_sim_search(spark, MID_SF).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in similarity.q_sim_search_lsh(spark, MID_SF).collect()
    }
    assert exact
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"ANN recall@k {recall:.2f} < 0.8"


def test_ivf_ann_recall_at_k(spark):
    """IVF (k-means cells + nprobe search) must recover >= 80% of the
    exact per-query top-k neighbors."""
    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.q_sim_search(spark, MID_SF).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in similarity.q_sim_search_ivf(spark, MID_SF).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall@k {recall:.2f} < 0.8"


def test_pq_ann_recall_at_k(spark):
    """Product-quantization ANN (4-bit ADC + exact re-rank of the top
    PQ_CAND) must recover >= 80% of the exact per-query top-k."""
    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.q_sim_search(spark, MID_SF).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in similarity.q_sim_search_pq(spark, MID_SF).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"PQ recall@k {recall:.2f} < 0.8"


def test_ivfpq_ann_recall_at_k(spark):
    """IVF+PQ (coarse probe + residual-ADC + exact re-rank) must
    recover >= 80% of the exact per-query top-k — compute pruning and
    code compression composed may lose no more than either alone's
    gate allows."""
    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.q_sim_search(spark, MID_SF).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in similarity.q_sim_search_ivfpq(spark, MID_SF).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF+PQ recall@k {recall:.2f} < 0.8"


def test_banded_lsh_recall_on_planted_high_cosine(spark):
    """Banded lsh_candidates operates in the high-similarity regime:
    on planted cos>=0.95 duplicate pairs it must recover >= 80%."""
    import random

    rng = random.Random(11)
    rows = []
    n_planted, dim = 20, 32
    for i in range(n_planted):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        noisy = [x + rng.gauss(0, 0.05) for x in base]
        rows.append((2 * i, base))
        rows.append((2 * i + 1, noisy))
    for j in range(200):
        rows.append((1000 + j, [rng.gauss(0, 1) for _ in range(dim)]))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    cands = {
        (r["id_a"], r["id_b"])
        for r in similarity.lsh_candidates(emb).select("id_a", "id_b").collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(n_planted)}
    recall = len(planted & cands) / len(planted)
    assert recall >= 0.8, f"banded recall {recall:.2f} < 0.8"
    # selectivity: candidate set must stay far below the all-pairs count
    n = len(rows)
    assert len(cands) < 0.5 * n * (n - 1) / 2, "banding is not selective"


def test_simhash_planted_near_dups(spark, tmp_path):
    """Planted near-identical docs land within Hamming distance 12 of
    each other; unrelated docs stay far (> 20). Uses a synthetic
    documents table so the planted edit distance is controlled."""
    base = " ".join(f"tok{i}" for i in range(80))
    near = base.replace("tok40", "changed", 1)
    far = " ".join(f"other{i}" for i in range(80))
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id LONG, text STRING"
    )
    fps = {
        r["doc_id"]: int(r["simhash"], 16)
        for r in dedup.simhash_fingerprints(docs).collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(fps[0], fps[1]) <= 12, f"near-dup hamming {ham(fps[0], fps[1])}"
    assert ham(fps[0], fps[2]) > 20, f"unrelated hamming {ham(fps[0], fps[2])}"


def test_ngram_df_cap_drops_hot_shingles(spark):
    """With the cap forced to 0, every shingle is 'hot' (df >= 1), so
    candidate generation must yield zero pairs — proving the anti-join
    guard is live in the plan."""
    original = dedup.DF_CAP
    dedup.DF_CAP = 0
    try:
        assert dedup.q_dedup_ngram(spark, MID_SF).count() == 0
    finally:
        dedup.DF_CAP = original


def test_embed_cap_is_applied(spark):
    """The exact embedding baseline never considers vec_ids beyond
    EMBED_CAP (the documented quadratic-input bound)."""
    pairs = dedup.q_dedup_embed(spark, MID_SF)
    mx = pairs.agg(F.max("id_b")).collect()[0][0]
    assert mx is None or mx < dedup.EMBED_CAP


def test_udf_quantize_matches_builtin(spark, sf_dir):
    """The pandas_udf quantization agrees with the equivalent built-in
    expression — the UDF surface computes what it claims."""
    from als_hadoop_spark.operators.udfs import q_udf_quantize

    got = {r["label"]: r["total_l1"] for r in q_udf_quantize(spark, sf_dir).collect()}
    emb = load(spark, sf_dir, "embeddings")
    l1 = F.aggregate(
        F.transform(
            "embedding",
            lambda x: F.abs(F.floor(x.cast("double") * 127.0 + 0.5)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    want = {
        r["label"]: r["t"]
        for r in emb.select("label", l1.alias("l1"))
        .groupBy("label")
        .agg(F.sum("l1").alias("t"))
        .collect()
    }
    assert got == want


def test_connected_components_star_and_path(spark):
    """large-star/small-star closure on a 31-node path (multi-round
    convergence), a triangle, and a 2-node component — every node must
    label with its component minimum."""
    from als_hadoop_spark.functions.graph import connected_components

    path = [(i, i + 1) for i in range(100, 130)]        # one long chain
    tri = [(1, 2), (2, 3), (3, 1)]                      # cycle
    pair = [(50, 51)]
    edges = spark.createDataFrame(path + tri + pair, "src LONG, dst LONG")
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert {got[i] for i in range(100, 131)} == {100}
    assert {got[i] for i in (1, 2, 3)} == {1}
    assert got[50] == got[51] == 50
    assert len(got) == 31 + 3 + 2


def test_dedup_cluster_merges_transitive_chain(spark, tmp_path):
    """A 13-doc chain where consecutive docs are near-identical
    (jaccard ≈ 0.94) but the ENDPOINTS fall below the edge threshold
    (jaccard < 0.5 — verified directly on the shingle sets, so no
    direct edge is possible): only the transitive closure can merge
    the chain into one cluster. An unrelated doc stays its own
    cluster."""
    from als_hadoop_spark.operators.dedup import (
        CLUSTER_DIST_T,
        SHINGLE_N,
        q_dedup_cluster,
    )

    n_chain = 13
    toks = [f"tok{i}" for i in range(100)]
    docs, cur = [], list(toks)
    for d in range(n_chain):
        docs.append((d, " ".join(cur)))
        cur = list(cur)
        # one token per link, spaced > SHINGLE_N apart so each link
        # destroys 3 DISTINCT shingles (consecutive positions would
        # overlap and keep the endpoints too similar)
        cur[10 + 5 * d] = f"chg{d}"
    docs.append((99, " ".join(f"other{i}" for i in range(100))))

    def shingle_set(text):
        t = text.split(" ")
        return {
            " ".join(t[i : i + SHINGLE_N]) for i in range(len(t) - SHINGLE_N + 1)
        }
    s0, s_end = shingle_set(docs[0][1]), shingle_set(docs[n_chain - 1][1])
    j_endpoints = len(s0 & s_end) / len(s0 | s_end)
    assert 1.0 - j_endpoints > CLUSTER_DIST_T, "fixture: endpoints must not be a direct edge"

    spark.createDataFrame(docs, "doc_id LONG, text STRING").withColumn(
        "lang", F.lit("en")
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: (r["cluster_id"], r["is_keeper"]) for r in q_dedup_cluster(
        spark, str(tmp_path)
    ).collect()}
    assert {out[d][0] for d in range(n_chain)} == {0}, "chain must merge transitively"
    assert out[0][1] is True and all(out[d][1] is False for d in range(1, n_chain))
    assert out[99] == (99, True)


def test_curation_neardup_collapses_planted_dups(spark, tmp_path):
    """q_curation_neardup end-to-end on a controlled corpus: an exact
    duplicate collapses in the sha256 stage, a planted near-dup (one
    token changed out of 100) collapses in the minhash stage even
    across languages, an unrelated doc survives — and the per-lang
    summary reconciles with the expected keeper set."""
    from als_hadoop_spark.operators.text import q_curation_neardup

    base = " ".join(f"tok{i}" for i in range(100))        # quality 1.0
    near = base.replace("tok50", "changed", 1)            # jaccard ~0.94
    far = " ".join(f"other{i}" for i in range(100))
    rows = [
        (0, "en", len(base), base),   # keeper of the near-dup cluster
        (1, "de", len(near), near),   # near-dup of 0 -> dropped (cross-lang)
        (2, "en", len(base), base),   # exact dup of 0 -> dropped
        (3, "fr", len(far), far),     # unrelated -> kept
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, lang STRING, n_chars LONG, text STRING"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["lang"]: r["n_kept"] for r in q_curation_neardup(spark, str(tmp_path)).collect()}
    assert out == {"en": 1, "fr": 1}, out


def test_source_overlap_flags_planted_cross_source_pair(spark, tmp_path):
    """A near-dup planted ACROSS two sources must surface as a
    (source_a, source_b) cell; unrelated sources must not pair. The
    unordered pair is canonicalized (lexicographically smaller source
    first)."""
    import random

    rng = random.Random(7)
    base = " ".join(rng.choice("abcdefgh") * 3 for _ in range(60))
    near = base.rsplit(" ", 1)[0] + " zzz"  # one token differs
    far1 = " ".join(rng.choice("qrstuv") * 4 for _ in range(60))
    far2 = " ".join(rng.choice("klmnop") * 5 for _ in range(60))
    rows = [
        (1, base, "en", "srcB", len(base)),
        (2, near, "en", "srcA", len(near)),   # cross-source near-dup
        (3, far1, "en", "srcC", len(far1)),
        (4, far2, "en", "srcD", len(far2)),
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in dedup.q_source_overlap(spark, str(tmp_path)).collect()
    }
    assert got.get(("srcA", "srcB")) == 1, got
    assert all(k == ("srcA", "srcB") for k in got), got


def test_kmeans_partitions_corpus_and_beats_random_purity(spark):
    """q_embed_kmeans structure gates: the clusters partition the
    corpus exactly (sizes sum to N, ≤ K clusters), per-cluster purity
    is a valid fraction, and WEIGHTED purity beats the 1/K random
    baseline (the fixture's embeddings are only weakly label-separable
    per vector, so the margin is modest by design)."""
    from als_hadoop_spark.operators.similarity import KMEANS_K, q_embed_kmeans
    from als_hadoop_spark.sources import load

    sf = "/root/testdata/sf0.001"
    rows = q_embed_kmeans(spark, sf).collect()
    n = load(spark, sf, "embeddings").count()
    assert 0 < len(rows) <= KMEANS_K
    assert sum(r["n_vectors"] for r in rows) == n
    for r in rows:
        assert 0.0 < r["purity"] <= 1.0
    weighted = sum(r["purity"] * r["n_vectors"] for r in rows) / n
    assert weighted > 1.2 / KMEANS_K, weighted  # ≥20% above random


def test_winnow_detects_planted_copied_passage(spark, tmp_path):
    """Winnowing must flag a pair sharing ONE copied 80-char passage
    inside otherwise-unrelated documents (global jaccard low — the
    case the shingle family misses), and must not pair unrelated
    docs. Drives the registered query through a scratch documents
    table so the planted structure is exact."""
    from als_hadoop_spark.operators.dedup import q_winnow_dup

    passage = "the quick brown fox jumps over the lazy dog near the riverbank at dawn today"
    a = "alpha beta gamma delta epsilon zeta eta theta " * 4 + passage
    b = passage + " iota kappa lambda mu nu xi omicron pi rho sigma " * 4
    c = "one two three four five six seven eight nine ten eleven twelve " * 5
    d = "unrelated entirely different content with no overlap whatsoever here " * 5
    docs = spark.createDataFrame(
        [(1, a, "en", "s", len(a)), (2, b, "en", "s", len(b)),
         (3, c, "en", "s", len(c)), (4, d, "en", "s", len(d))],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    pairs = {(r["id_a"], r["id_b"]): r["n_shared"] for r in q_winnow_dup(spark, sf).collect()}
    assert (1, 2) in pairs, pairs
    assert pairs[(1, 2)] >= 3
    assert all(p == (1, 2) for p in pairs), pairs


def test_winnow_runs_on_fixture_and_is_deterministic(spark, sf_dir):
    from als_hadoop_spark.operators.dedup import q_winnow_dup

    r1 = sorted(tuple(r) for r in q_winnow_dup(spark, sf_dir).collect())
    r2 = sorted(tuple(r) for r in q_winnow_dup(spark, sf_dir).collect())
    assert r1 == r2
    for _, _, n in r1:
        assert n >= 3


def test_simhash_fast_planted_near_dups(spark):
    """The xxhash64 fast path must reproduce the simhash CONTRACT on
    the same planted fixture as the md5 oracle-parity path: near-dups
    within Hamming 12, unrelated docs beyond 20."""
    base = " ".join(f"tok{i}" for i in range(80))
    near = base.replace("tok40", "changed", 1)
    far = " ".join(f"other{i}" for i in range(80))
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id LONG, text STRING"
    )
    fps = {
        r["doc_id"]: int(r["simhash"], 16)
        for r in dedup.simhash_fingerprints_fast(docs).collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(fps[0], fps[1]) <= 12, f"near-dup hamming {ham(fps[0], fps[1])}"
    assert ham(fps[0], fps[2]) > 20, f"unrelated hamming {ham(fps[0], fps[2])}"


def test_winnow_fast_detects_planted_copied_passage(spark, tmp_path):
    """Both winnow paths (the production rolling-hash q_winnow_dup and
    the md5 oracle-parity q_winnow_dup_oracle) must flag the planted copied
    passage and nothing else — the SWA guarantee is hash-agnostic."""
    from als_hadoop_spark.operators.dedup import q_winnow_dup, q_winnow_dup_oracle

    passage = "the quick brown fox jumps over the lazy dog near the riverbank at dawn today"
    a = "alpha beta gamma delta epsilon zeta eta theta " * 4 + passage
    b = passage + " iota kappa lambda mu nu xi omicron pi rho sigma " * 4
    c = "one two three four five six seven eight nine ten eleven twelve " * 5
    d = "unrelated entirely different content with no overlap whatsoever here " * 5
    docs = spark.createDataFrame(
        [(1, a, "en", "s", len(a)), (2, b, "en", "s", len(b)),
         (3, c, "en", "s", len(c)), (4, d, "en", "s", len(d))],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    for fn in (q_winnow_dup, q_winnow_dup_oracle):
        pairs = {(r["id_a"], r["id_b"]): r["n_shared"] for r in fn(spark, sf).collect()}
        assert (1, 2) in pairs, (fn.__name__, pairs)
        assert all(p == (1, 2) for p in pairs), (fn.__name__, pairs)


def test_dedup_embed_lsh_recovers_planted_twins(spark):
    """The registered scale-path embedding dedup (r8): deterministic
    planted twins (cosine ~0.98) must be recovered through the banded
    LSH candidate join + exact confirm with recall >= 0.8, and nothing
    below the confirm threshold can appear (precision is structural)."""
    from pyspark.sql import functions as F

    from als_hadoop_spark.operators import dedup
    from als_hadoop_spark.sources import load

    rows = dedup.q_dedup_embed_lsh(spark, MID_SF).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    ids = [
        r["vec_id"]
        for r in load(spark, MID_SF, "embeddings")
        .filter(F.col("vec_id") % dedup.PLANT_MOD == 0)
        .select("vec_id")
        .collect()
    ]
    planted = {(v, v + dedup.PLANT_OFFSET) for v in ids}
    assert planted
    recall = len(got & planted) / len(planted)
    assert recall >= 0.8, f"planted-twin recall {recall:.2f} < 0.8"
    assert all(r["cosine"] >= dedup.EMBED_LSH_T for r in rows)
