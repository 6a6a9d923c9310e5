"""N-gram corpus operators over ``documents``: language-model counts,
benchmark-contamination detection, and intra-document repetition
scoring (north-star training-data-pipeline surface; SURVEY.md §2
Part C additions).

The reference has no text surface (its only string handling is the CSV
comma-split at ``ALS-Hadoop/ALS/ALS.java:90-93``); these fill the
standard curation steps a 100 TB text pipeline runs between crawl and
tokenizer:

- ``q_ngram_lm``: corpus-wide trigram counts + relative frequency —
  the count-collection pass of an n-gram LM / tokenizer-corpus audit.
- ``q_contamination``: token-8-gram overlap of every corpus document
  against a held-out probe set (stand-in for a benchmark suite) — the
  standard eval-contamination check (e.g. GPT-3's 13-gram and Llama's
  8-gram audits, both public methodology).
- ``q_doc_repetition``: per-document repetition metrics (top-bigram
  fraction, distinct-token ratio) with boolean quality flags — the
  Gopher-style repetition filters (Rae et al. 2021, public).

N-gram generation uses the posexplode + window ``lead`` pattern
(everything stays in whole-stage codegen; measured 3× faster than the
interpreted sequence/transform HOF chain — see
``dedup.q_dedup_ngram``'s module notes). The window shuffles once on
``doc_id``; every downstream aggregate either reuses that partitioning
(per-doc metrics) or map-side-combines into a bounded key space
(n-gram vocabulary).

All three are deterministic, expression-only plans → full DuckDB
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load

#: n-gram order for the LM count pass
LM_N = 3
#: top-k n-grams reported by q_ngram_lm
LM_TOP_K = 20
#: n-gram order for the contamination audit (Llama-style 8-gram)
CONTAM_N = 8
#: probe-set selector: doc_id % CONTAM_PROBE_MOD == 0 is "benchmark"
CONTAM_PROBE_MOD = 20
#: repetition flags: most-frequent bigram above this fraction …
REP_TOP_BIGRAM_T = 0.1
#: … or distinct-token ratio below this → low-quality repetition
REP_DISTINCT_T = 0.3


def lead_ngrams(docs: DataFrame, n: int, out: str = "ngram") -> DataFrame:
    """(doc_id, ngram) rows of all FULL n-token windows of ``text``
    (whitespace tokens; docs shorter than ``n`` contribute none).

    posexplode → one window over (doc_id, pos) with n-1 ``lead``s →
    concat_ws: Generate + Window + Project, all codegen'd, one
    exchange on doc_id."""
    toks = docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "t0"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("t0")] + [
        F.lead("t0", i).over(w).alias(f"t{i}") for i in range(1, n)
    ]
    return (
        toks.select("doc_id", *leads)
        .filter(F.col(f"t{n - 1}").isNotNull())
        .select("doc_id", F.concat_ws(" ", *[f"t{i}" for i in range(n)]).alias(out))
    )


def q_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus trigram table: top-20 trigrams by count (ties broken on
    the trigram string) with their relative frequency — the aggregate
    an n-gram LM or corpus-audit step collects.

    Scale shape: the (ngram → count) aggregate is word-count — map-side
    partial aggregation bounds the shuffle by DISTINCT trigram count,
    not total occurrences; the global total is a sum OVER the pinned
    vocabulary-sized count table (deriving it from the raw gram stream
    would re-run the whole posexplode+window generation a second
    time), arriving via a broadcast one-row cross join (no driver
    collect); top-20 plans as TakeOrderedAndProject (per-partition
    heaps, no global sort)."""
    docs = load(spark, sf_dir, "documents", spread=True)
    grams = lead_ngrams(docs, LM_N)
    counts = grams.groupBy("ngram").agg(
        F.count("*").alias("n_occurrences")
    ).localCheckpoint(eager=False)
    total = counts.agg(F.sum("n_occurrences").alias("n_total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "ngram",
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.col("n_total"), 6).alias("rel_freq"),
        )
        .orderBy(F.col("n_occurrences").desc(), "ngram")
        .limit(LM_TOP_K)
    )


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: for every corpus document, the
    number of distinct token-8-grams it shares with each probe
    document (probe = ``doc_id % 20 == 0``, a stand-in for an eval
    suite), plus the contaminated fraction of the corpus doc's 8-grams.
    Only contaminated pairs (≥1 shared 8-gram) are emitted.

    Scale shape: the probe side is small by definition (benchmarks are
    MBs against a 100 TB corpus), so its distinct-8-gram set is
    broadcast — the corpus side streams map-side through the hash join
    with NO shuffle of corpus n-grams; the only exchange is the final
    (corpus_doc, probe_doc) pair aggregate, bounded by true overlap.
    8-grams are joined as 64-bit xxhash64 keys (8 bytes instead of
    ~45-char strings); corpus-side per-doc totals ride along from the
    n-gram window's doc_id partitioning."""
    return contamination_pairs(load(spark, sf_dir, "documents", spread=True))


def contamination_pairs(docs: DataFrame) -> DataFrame:
    """Core of q_contamination over any (doc_id, text) DataFrame."""
    grams = lead_ngrams(docs, CONTAM_N).select(
        "doc_id", F.xxhash64("ngram").alias("h")
    ).distinct()
    probe = grams.filter(F.col("doc_id") % CONTAM_PROBE_MOD == 0).withColumnRenamed(
        "doc_id", "probe_doc_id"
    )
    corpus = grams.filter(F.col("doc_id") % CONTAM_PROBE_MOD != 0)
    sizes = corpus.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    shared = (
        corpus.join(F.broadcast(probe), "h")
        .groupBy("doc_id", "probe_doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return shared.join(sizes, "doc_id").select(
        F.col("doc_id").alias("corpus_doc_id"),
        "probe_doc_id",
        "n_shared",
        F.round(F.col("n_shared") / F.col("n_grams"), 6).alias("contamination_rate"),
    )


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics + quality flag (Gopher-style
    repetition filters): the fraction of bigram occurrences taken by
    the single most frequent bigram, the distinct-token ratio, and
    ``flagged`` = top-bigram fraction > 0.1 OR distinct ratio < 0.3.
    The reported top bigram breaks count ties on the larger bigram
    string, so the row is fully deterministic.

    Scale shape: both aggregates key on doc_id (+bigram) — maximal-
    cardinality keys, so partitions stay balanced at any corpus size;
    max(struct(cnt, bigram)) picks the per-doc argmax in ONE hash
    aggregate (no window sort); the distinct-token ratio is a pure
    HOF over the token array, fused into the scan."""
    return doc_repetition(load(spark, sf_dir, "documents", spread=True))


def doc_repetition(docs: DataFrame) -> DataFrame:
    """Core of q_doc_repetition over any (doc_id, text) DataFrame."""
    bg = lead_ngrams(docs, 2, out="bigram")
    per_doc = (
        bg.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.max(F.struct(F.col("cnt"), F.col("bigram"))).alias("top"),
            F.sum("cnt").alias("n_bigrams"),
        )
        .select(
            "doc_id",
            F.col("top.bigram").alias("top_bigram"),
            F.round(F.col("top.cnt") / F.col("n_bigrams"), 6).alias("top_bigram_frac"),
            "n_bigrams",
        )
    )
    toks = F.split("text", " ")
    ratios = docs.select(
        "doc_id",
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias(
            "distinct_ratio"
        ),
    )
    return per_doc.join(ratios, "doc_id").select(
        "doc_id",
        "top_bigram",
        "top_bigram_frac",
        "n_bigrams",
        "distinct_ratio",
        (
            (F.col("top_bigram_frac") > REP_TOP_BIGRAM_T)
            | (F.col("distinct_ratio") < REP_DISTINCT_T)
        ).alias("flagged"),
    )


#: PMI: drop bigrams rarer than this (standard noise floor — PMI is
#: unstable at tiny counts)
PMI_MIN_COUNT = 5
#: top-k bigrams reported by q_pmi_bigrams
PMI_TOP_K = 20


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the unigram distribution (nats)
    plus the entropy normalized by ln(distinct tokens) — a standard
    lexical-diversity / quality signal (low entropy ≈ repetitive or
    template text; the information-theoretic sibling of
    q_doc_repetition's count-based flags).

    Scale shape: one (doc_id, token) hash aggregate with map-side
    partials, one (doc_id) re-aggregate — both keyed on maximal-
    cardinality doc_id, no windows, no broadcast, embarrassingly
    parallel at any corpus size. Uses the algebraic form
    H = ln(n) − (Σ c·ln c)/n (expanding −Σ (c/n)·ln(c/n)), so the
    per-doc total never needs a separate pass or window."""
    return token_entropy(load(spark, sf_dir, "documents", spread=True))


def token_entropy(docs: DataFrame) -> DataFrame:
    """Core of q_token_entropy over any (doc_id, lang, text) frame."""
    cnt = (
        docs.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "lang", "tok")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c")
    entropy = F.log(n) - F.sum(F.col("c") * F.log("c")) / n
    return (
        cnt.groupBy("doc_id", "lang")
        .agg(
            n.alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.round(entropy, 6).alias("entropy"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "n_distinct",
            "entropy",
            F.when(
                F.col("n_distinct") > 1,
                F.round(F.col("entropy") / F.log(F.col("n_distinct")), 6),
            ).alias("norm_entropy"),
        )
    )


def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level pointwise mutual information of adjacent token
    pairs: pmi(a,b) = ln( (c_ab / N_bg) / ((c_a/N_uni)·(c_b/N_uni)) ),
    bigrams with count < 5 dropped (PMI is noise at tiny counts),
    top-20 by PMI with deterministic (pmi, a, b) ordering — the
    collocation-mining primitive behind phrase detection and
    tokenizer-merge audits (word2vec-era public methodology).

    Scale shape: token adjacency is INTRA-ROW, so bigram pairs come
    from a per-document arrays_zip(t, slice(t, 2, ..)) — no window, no
    doc-keyed sort shuffle anywhere — and the corpus is exploded
    EXACTLY ONCE (r10): unigram counts are derived, not re-counted —
    every token occurrence is followed by either a successor token or
    the document end, so c(tok) = Σ n_pair over bigrams led by tok
    (a vocabulary-sized aggregate) + the count of documents ENDING in
    tok (substring_index, no split and no explode). The r9 shape
    re-ran the split+explode for a second corpus-wide unigram
    aggregate; at ×100 the derivation measures 5.2 s vs 31.5 s and
    flips the DuckDB ratio to 0.65× (BASELINE.md round-10),
    byte-identical output. The N totals are sums OVER the pinned
    vocabulary-sized aggregates — never a second corpus scan —
    arriving via broadcast one-row cross joins; the two count joins
    key on single tokens — vocabulary-sized build sides that Catalyst
    broadcasts below threshold and AQE handles above; top-20 is
    TakeOrderedAndProject. Everything integer-count based + one ln →
    bit-deterministic across engines."""
    return pmi_bigrams(load(spark, sf_dir, "documents", spread=True))


def pmi_bigrams(docs: DataFrame) -> DataFrame:
    """Core of q_pmi_bigrams over any (doc_id, text) frame."""
    t = F.split("text", " ")
    # one token occurrence per row, paired intra-row with its successor
    # (tok_b NULL at document end — arrays_zip pads the shorter slice)
    adj = docs.select(
        F.explode(
            F.arrays_zip(
                t.alias("tok_a"),
                F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))).alias("tok_b"),
            )
        ).alias("p")
    ).select("p.tok_a", "p.tok_b")
    bg_all = (
        adj.filter(F.col("tok_b").isNotNull())
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_pair"))
        .localCheckpoint(eager=False)
    )
    bg = bg_all
    # unigram counts DERIVED from the bigram aggregate (vocabulary-
    # sized input) + doc-final tokens (no second corpus explode):
    # every occurrence leads a bigram or ends a document, exclusively
    lead = bg_all.groupBy(F.col("tok_a").alias("tok")).agg(
        F.sum("n_pair").alias("c_lead")
    )
    # substring_index, not element_at(split(...), -1): the latter
    # builds the whole token array a second time just to take its
    # tail (measured 2× the whole query at ×100, BASELINE.md r10)
    # NULL text contributes zero occurrences (explode semantics of the
    # bigram scan) — without the filter substring_index(NULL) would
    # surface a spurious NULL token and inflate n_uni
    lasts = (
        docs.filter(F.col("text").isNotNull())
        .select(F.substring_index("text", " ", -1).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c_last"))
    )
    uni = (
        lead.join(lasts, "tok", "full_outer")
        .select(
            "tok",
            (
                F.coalesce("c_lead", F.lit(0)) + F.coalesce("c_last", F.lit(0))
            ).alias("c_tok"),
        )
        .localCheckpoint(eager=False)
    )
    n_uni = uni.agg(F.sum("c_tok").alias("n_uni"))
    n_bg = bg_all.agg(F.sum("n_pair").alias("n_bg"))
    pmi = F.round(
        F.log(
            (F.col("n_pair") / F.col("n_bg"))
            / ((F.col("c_a") / F.col("n_uni")) * (F.col("c_b") / F.col("n_uni")))
        ),
        6,
    )
    return (
        bg.filter(F.col("n_pair") >= PMI_MIN_COUNT)
        .join(uni.select(F.col("tok").alias("tok_a"), F.col("c_tok").alias("c_a")), "tok_a")
        .join(uni.select(F.col("tok").alias("tok_b"), F.col("c_tok").alias("c_b")), "tok_b")
        .join(F.broadcast(n_uni))
        .join(F.broadcast(n_bg))
        .select("tok_a", "tok_b", "n_pair", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "tok_a", "tok_b")
        .limit(PMI_TOP_K)
    )


QUERIES = {
    "q_ngram_lm": q_ngram_lm,
    "q_contamination": q_contamination,
    "q_doc_repetition": q_doc_repetition,
    "q_token_entropy": q_token_entropy,
    "q_pmi_bigrams": q_pmi_bigrams,
}

#: shared DuckDB n-gram generator (full n-token windows only) — DuckDB
#: list slicing is 1-based inclusive: t[i+1 : i+n] is n tokens.
def _duck_ngrams(n: int) -> str:
    return f"""
        SELECT doc_id,
               unnest(list_transform(
                   range(0, greatest(len(t) - {n - 1}, 0)),
                   i -> array_to_string(t[i + 1 : i + {n}], ' ')
               )) AS ngram
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    """


ORACLES = {
    "q_ngram_lm": f"""
        WITH grams AS ({_duck_ngrams(LM_N)}),
        counts AS (
            SELECT ngram, COUNT(*) AS n_occurrences FROM grams GROUP BY ngram
        ),
        total AS (SELECT COUNT(*) AS n_total FROM grams)
        SELECT ngram, n_occurrences,
               ROUND(CAST(n_occurrences AS DOUBLE) / n_total, 6) AS rel_freq
        FROM counts CROSS JOIN total
        ORDER BY n_occurrences DESC, ngram
        LIMIT {LM_TOP_K}
    """,
    "q_contamination": f"""
        WITH grams AS (
            SELECT DISTINCT doc_id, ngram FROM ({_duck_ngrams(CONTAM_N)})
        ),
        probe AS (
            SELECT doc_id AS probe_doc_id, ngram FROM grams
            WHERE doc_id % {CONTAM_PROBE_MOD} = 0
        ),
        corpus AS (
            SELECT * FROM grams WHERE doc_id % {CONTAM_PROBE_MOD} != 0
        ),
        sizes AS (
            SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id
        ),
        shared AS (
            SELECT c.doc_id, p.probe_doc_id, COUNT(*) AS n_shared
            FROM corpus c JOIN probe p USING (ngram)
            GROUP BY c.doc_id, p.probe_doc_id
        )
        SELECT s.doc_id AS corpus_doc_id, probe_doc_id, n_shared,
               ROUND(CAST(n_shared AS DOUBLE) / z.n_grams, 6)
                   AS contamination_rate
        FROM shared s JOIN sizes z ON s.doc_id = z.doc_id
    """,
    "q_doc_repetition": f"""
        WITH bg AS (
            SELECT doc_id, ngram AS bigram FROM ({_duck_ngrams(2)})
        ),
        cnt AS (
            SELECT doc_id, bigram, COUNT(*) AS cnt
            FROM bg GROUP BY doc_id, bigram
        ),
        ranked AS (
            SELECT doc_id, bigram, cnt,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY cnt DESC, bigram DESC
                   ) AS rn,
                   SUM(cnt) OVER (PARTITION BY doc_id) AS n_bigrams
            FROM cnt
        ),
        per_doc AS (
            SELECT doc_id, bigram AS top_bigram,
                   ROUND(CAST(cnt AS DOUBLE) / n_bigrams, 6)
                       AS top_bigram_frac,
                   -- windowed SUM over integers is HUGEINT in DuckDB,
                   -- same driver-hash trap as the aggregate form
                   CAST(n_bigrams AS BIGINT) AS n_bigrams
            FROM ranked WHERE rn = 1
        ),
        ratios AS (
            SELECT doc_id,
                   ROUND(CAST(len(list_distinct(string_split(text, ' ')))
                              AS DOUBLE)
                         / len(string_split(text, ' ')), 6) AS distinct_ratio
            FROM documents
        )
        SELECT p.doc_id, top_bigram, top_bigram_frac, n_bigrams,
               distinct_ratio,
               (top_bigram_frac > {REP_TOP_BIGRAM_T}
                OR distinct_ratio < {REP_DISTINCT_T}) AS flagged
        FROM per_doc p JOIN ratios r ON p.doc_id = r.doc_id
    """,
    # entropy mirrors the engine's algebraic form ln(n) − Σ c·ln(c)/n
    # term for term so both engines round the same double.
    "q_token_entropy": """
        WITH cnt AS (
            SELECT doc_id, lang, tok, COUNT(*) AS c
            FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
                  FROM documents)
            GROUP BY doc_id, lang, tok
        ),
        per AS (
            SELECT doc_id, lang,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   COUNT(*) AS n_distinct,
                   ROUND(LN(SUM(c)) - SUM(c * LN(c)) / SUM(c), 6) AS entropy
            FROM cnt GROUP BY doc_id, lang
        )
        SELECT doc_id, lang, n_tokens, n_distinct, entropy,
               CASE WHEN n_distinct > 1
                    THEN ROUND(entropy / LN(n_distinct), 6) END AS norm_entropy
        FROM per
    """,
}

# Assigned outside the literal: the struct syntax {'a': …} would need
# escaping inside the dict's f-string.
ORACLES["q_pmi_bigrams"] = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    pairs AS (
        SELECT p['a'] AS tok_a, p['b'] AS tok_b FROM (
            SELECT unnest(list_transform(
                range(0, greatest(len(t) - 1, 0)),
                i -> {{'a': t[i + 1], 'b': t[i + 2]}}
            )) AS p FROM toks)
    ),
    uni AS (
        SELECT tok, COUNT(*) AS c_tok
        FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
    ),
    n_uni AS (SELECT COUNT(*) AS n_uni
              FROM (SELECT unnest(t) AS tok FROM toks)),
    bg AS (
        SELECT tok_a, tok_b, COUNT(*) AS n_pair FROM pairs
        GROUP BY tok_a, tok_b HAVING COUNT(*) >= {PMI_MIN_COUNT}
    ),
    n_bg AS (SELECT COUNT(*) AS n_bg FROM pairs)
    SELECT tok_a, tok_b, n_pair,
           ROUND(LN((n_pair / CAST(n_bg AS DOUBLE))
                    / ((ua.c_tok / CAST(n_uni AS DOUBLE))
                       * (ub.c_tok / CAST(n_uni AS DOUBLE)))), 6) AS pmi
    FROM bg
    JOIN uni ua ON ua.tok = bg.tok_a
    JOIN uni ub ON ub.tok = bg.tok_b
    CROSS JOIN n_uni CROSS JOIN n_bg
    ORDER BY pmi DESC, tok_a, tok_b
    LIMIT {PMI_TOP_K}
"""
