"""Text-analysis operators over the ``documents`` table (north-star
extension; SURVEY.md §2 Part C q_text_stats + the training-data-pipeline
text surface: token counting, language ID, quality scoring, document
fingerprinting).

The reference has no text surface at all (its only string handling is
the CSV comma-split at ``ALS-Hadoop/ALS/ALS.java:90-93``); everything
here is a Part-B/north-star gap filled with pure built-in Spark SQL
functions — ``split`` / ``explode`` / ``regexp`` / higher-order
``aggregate`` — so the whole row path stays JVM-side with zero Python.

Scale notes:
- Tokenize→explode multiplies rows ~60× but never shuffles the exploded
  form except grouped by bounded keys (lang, token); the token group-by
  is the classic word-count shape — map-side partial aggregation makes
  the shuffle O(distinct tokens), not O(total tokens).
- Per-doc metrics (quality, fingerprint) are computed with higher-order
  functions directly on the token array — no explode, no shuffle at all:
  embarrassingly parallel over documents.
- Every query here is deterministic → fully DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load

#: tiny English stopword profile for the language-ID heuristic
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

#: rolling-hash parameters (polynomial hash, Horner form)
FP_BASE = 31
FP_MOD = 1_000_000_007

#: top-k size for token frequency
TOP_K_TOKENS = 20


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics: document counts, token totals
    (whitespace tokenization), distinct-token cardinality, average
    tokens/doc and chars/doc. The explode→groupBy(lang) aggregate is
    partial-aggregated map-side; `lang` has bounded cardinality so the
    final shuffle is tiny at any scale."""
    docs = load(spark, sf_dir, "documents", spread=True)
    toks = docs.select("lang", "doc_id", F.explode(_tokens()).alias("tok"))
    tok_stats = toks.groupBy("lang").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct_tokens"),
        F.round(F.avg(F.length("tok")), 4).alias("avg_token_len"),
    )
    doc_stats = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )
    return (
        doc_stats.join(tok_stats, "lang")
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_distinct_tokens",
            F.round(F.col("n_tokens") / F.col("n_docs"), 4).alias("avg_tokens_per_doc"),
            "avg_token_len",
            "avg_chars",
        )
    )


def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (word-count), top-K by global frequency with a
    deterministic token tie-break. Two tokenizations are counted side by
    side: whitespace split and a BPE-ish regex (word pieces + isolated
    non-word marks) — on clean text they agree; on real corpora the
    regex catches punctuation-glued tokens. Both tokenizations ride
    ONE pass over the text: each document emits the concat of its two
    plain-string token arrays through a single posexplode, and the
    POSITION tags the tokenizer (pos < |whitespace tokens| ⇔ branch 1)
    — r6 replaced the r5 transform-into-struct tagged union, whose two
    per-token HOF lambdas were interpreted, with this all-codegen
    shape (measured 0.55→0.46 s warm sf0.1; a two-scan unionAll was
    marginally faster locally but doubles the corpus IO at 100 TB).
    One aggregate sums the tags; no second corpus scan, no full-outer
    count join, one vocabulary-bounded shuffle.
    TakeOrderedAndProject keeps the top-K per partition → no global
    sort."""
    docs = load(spark, sf_dir, "documents", spread=True)
    arrs = docs.select(
        _tokens().alias("_a1"),
        F.regexp_extract_all(
            "text", F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0
        ).alias("_a2"),
    )
    tagged = arrs.select(
        F.size("_a1").alias("_n1"),
        F.posexplode(F.concat("_a1", "_a2")).alias("pos", "tok"),
    )
    return (
        tagged.groupBy("tok")
        .agg(
            F.sum(F.when(F.col("pos") < F.col("_n1"), 1).otherwise(0)).alias(
                "n_ws"
            ),
            F.sum(F.when(F.col("pos") >= F.col("_n1"), 1).otherwise(0)).alias(
                "n_regex"
            ),
        )
        .orderBy(F.col("n_ws").desc(), "tok")
        .limit(TOP_K_TOKENS)
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword-profile n-gram scoring): a doc is
    predicted `en` when its English-stopword token ratio clears 5%.
    Confusion-matrix style output (actual lang × predicted) — on this
    synthetic corpus every lang shares one vocabulary, so the heuristic
    is exercised for plumbing + determinism, not accuracy. All
    expression-level (no UDF), hence fully oracle-checkable."""
    docs = load(spark, sf_dir, "documents", spread=True)
    toks = _tokens()
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    ratio = n_stop / F.size(toks)
    pred = F.when(ratio >= 0.05, "en").otherwise("non_en")
    return (
        docs.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )


def quality_score_col() -> F.Column:
    """The weighted quality score expression over the whitespace token
    array of ``text`` — shared by q_text_quality and the curation
    pipeline so both stages filter on identical semantics."""
    toks = _tokens()
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    n_types = F.size(F.array_distinct(toks))
    stop_ratio = F.round(n_stop / n_tokens, 4)
    ttr = F.round(n_types / n_tokens, 4)
    return F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + ttr * 0.4
        + (F.lit(1.0) - stop_ratio) * 0.2,
        4,
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: token count, mean token length,
    stopword ratio, type-token ratio (lexical diversity), and a weighted
    quality score — the filter-stage features of a training-data
    pipeline. Computed with higher-order functions on the token array:
    no explode, no shuffle, embarrassingly parallel."""
    docs = load(spark, sf_dir, "documents", spread=True)
    toks = _tokens()
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    n_types = F.size(F.array_distinct(toks))
    sum_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    stop_ratio = F.round(n_stop / n_tokens, 4)
    ttr = F.round(n_types / n_tokens, 4)
    avg_len = F.round(sum_len / n_tokens, 4)
    score = quality_score_col()
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("type_token_ratio"),
        score.alias("quality_score"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting via a rolling polynomial hash (Horner
    form) over per-token codes: fp = fold(acc·31 + code(tok)) mod 1e9+7,
    code(tok) = ascii(first)·1000 + len·31 + ascii(last). Pure integer
    arithmetic → engine-independent and oracle-checkable (DuckDB
    list_reduce twin), unlike xxhash64 whose bits are impl-specific.
    Groups by fingerprint to surface exact-duplicate clusters."""
    docs = load(spark, sf_dir, "documents", spread=True)
    toks = _tokens()
    codes = F.transform(
        toks,
        lambda t: (
            F.ascii(t) * 1000
            + F.length(t) * FP_BASE
            + F.ascii(F.substring(t, -1, 1))
        ).cast("long"),
    )
    fp = F.aggregate(
        codes,
        F.lit(7).cast("long"),
        lambda acc, c: F.pmod(acc * FP_BASE + c, F.lit(FP_MOD)),
    )
    fps = docs.select("doc_id", fp.alias("fingerprint"))
    return fps.groupBy("fingerprint").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs")
    )


def q_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation pipeline — the composition the
    individual operators exist for:

        quality filter (score ≥ 0.5) → exact dedup (sha256, keep
        smallest doc_id) → per-language corpus summary

    One lazy plan: the quality filter is a narrow projection+filter
    fused into the scan stage, dedup is one shuffle on the content
    hash, and the summary is a bounded-key aggregate. At 100 TB this
    exact shape is the curation job's skeleton — swap the quality
    threshold and add near-dup stages without touching the plan
    structure."""
    docs = load(spark, sf_dir, "documents", spread=True)
    kept = docs.select(
        "doc_id", "lang", "n_chars", quality_score_col().alias("q"),
        F.sha2("text", 256).alias("h"),
    ).filter(F.col("q") >= 0.5)
    deduped = (
        kept.groupBy("h")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("lang", "doc_id").alias("lang"),
            F.min_by("n_chars", "doc_id").alias("n_chars"),
            F.min_by("q", "doc_id").alias("q"),
        )
    )
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("q"), 4).alias("avg_quality"),
    )


def curate_neardup_docs(docs: DataFrame) -> DataFrame:
    """The reusable curation core: quality filter (score ≥ 0.5) →
    exact dedup (sha256, keep smallest doc_id) → minhash near-dup
    keep-one. Returns the SURVIVOR DOCS (doc_id, lang, n_chars, text,
    q, h) for downstream stages (summaries, mixture sampling, packing,
    export). See q_curation_neardup for the per-stage scale rationale."""
    from .dedup import _doc_shingles, minhash_candidates

    scored = docs.select(
        "doc_id", "lang", "n_chars", "text",
        quality_score_col().alias("q"),
        F.sha2("text", 256).alias("h"),
    ).filter(F.col("q") >= 0.5)
    exact_keep = scored.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    # pinned: TWO consumers (the shingle/minhash stage and the final
    # anti-join) would otherwise each re-run the sha256+quality scan
    # and the exact-dedup semi-join over the whole corpus
    survivors = scored.join(exact_keep, ["h", "doc_id"], "left_semi").localCheckpoint(
        eager=False
    )
    cands = minhash_candidates(_doc_shingles(survivors.select("doc_id", "text")))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    near_drop = (
        cands.select("id_a", "id_b", (inter / union).alias("j"))
        .filter(F.col("j") >= 0.2)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return survivors.join(near_drop, "doc_id", "left_anti")


def q_curation_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL curation pipeline — q_curation extended with the
    near-dup stage a production training-data job runs (VERDICT r2
    "What's missing" #2):

        quality filter (score ≥ 0.5)
        → exact dedup (sha256, keep smallest doc_id)
        → minhash near-dup detection (banded signatures → candidate
          equi-join → exact jaccard re-rank ≥ 0.2)
        → keep-one (drop every doc that has a near-dup with a smaller
          doc_id — greedy deterministic keeper, not transitive-closure
          clustering: a chain a~b~c keeps a and may keep c if c≁a,
          which is the standard one-pass industry rule and needs no
          iterative connected-components)
        → per-language corpus summary

    Near-dup candidates are generated only among exact-dedup SURVIVORS
    (fewer docs shingled), and the drop set is a distinct id list —
    one broadcast-sized anti-join at any scale where near-dups are
    rare relative to the corpus. Banding recall < 1 → rows-only;
    pytest plants cross-language near-dups and asserts they collapse
    while the per-lang totals still reconcile."""
    docs = load(spark, sf_dir, "documents", spread=True)
    final = curate_neardup_docs(docs)
    return final.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("q"), 4).alias("avg_quality"),
    )


#: per-language sampling rates for the training-mixture query — the
#: standard "re-weight the corpus mix" curation step (upsample nothing,
#: downsample over-represented languages). Unlisted langs keep 100%.
MIXTURE_RATES = {"en": 0.5, "zh": 0.8}

#: Knuth multiplicative hash constant (2654435761 = 2^32 / φ) — chosen
#: over xxhash64 because the SAME arithmetic is expressible in ANSI SQL,
#: making hash-based sampling fully oracle-checkable across engines.
#: doc_id is pre-reduced mod 2^31 so the product stays < 2^63 (no ANSI
#: long overflow) for ANY doc_id, including 100 TB-scale id spaces.
_KNUTH = 2654435761
_MOD31 = 1 << 31


def q_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified mixture sampling — the corpus
    re-weighting step of a training-data pipeline (e.g. downsample
    over-represented languages before tokenization). A doc is kept iff
    pmod(doc_id · 2654435761, 2³²) / 2³² < rate(lang): a pure per-row
    arithmetic predicate, so the selection is

    - layout/partitioning/cluster-size INDEPENDENT (unlike
      F.rand(seed) or df.sample, whose streams depend on the task
      split — the same property argued for synth_ratings in als.py),
    - reproducible forever given (doc_id, rates), which is what makes
      a training mixture auditable,
    - pushdown-friendly: the predicate filters at the scan, no
      shuffle at all until the summary aggregate.

    Returns per-lang kept/total counts + the realized rate (rounded;
    deviation from the target rate is the hash's equidistribution
    error, O(1/√n) — visible in the oracle twin identically since both
    engines evaluate the same integer arithmetic)."""
    docs = load(spark, sf_dir, "documents")
    u = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(_MOD31)) * F.lit(_KNUTH), F.lit(_MOD31)
    ) / F.lit(float(_MOD31))
    rate = F.lit(1.0)
    for lang, r in MIXTURE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        docs.select("doc_id", "lang", (u < rate).cast("int").alias("kept"))
        .groupBy("lang")
        .agg(
            F.sum("kept").alias("n_kept"),
            F.count("*").alias("n_total"),
            F.round(F.sum("kept") / F.count("*"), 4).alias("realized_rate"),
        )
    )


#: temperature for q_mixture_temperature — the α of p_l ∝ share_l^α
#: (α<1 flattens the language distribution; 0.7 is the published
#: multilingual-LM convention, e.g. XLM-R's sampling exponent)
MIX_ALPHA = 0.7


def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture resampling — the α-exponent corpus
    reweighting of multilingual LM pipelines (public recipe: sample
    language l with probability p_l ∝ q_l^α where q_l is its corpus
    share; α<1 upsamples rare languages relative to their share).
    Realized here as per-doc acceptance rates
    ``rate_l = q_l^(α−1) / max_l' q_l'^(α−1)`` — the rarest language
    keeps EVERYTHING (rate 1.0) and over-represented ones downsample
    toward the target shares, the data-maximal way to hit p_l.

    Determinism/auditability: same Knuth-hash acceptance predicate as
    q_sample_mixture — layout-independent, reproducible given
    (doc_id, rates); the rates themselves derive from corpus counts in
    the same query (no config drift possible), rounded to 6dp on both
    engines before the comparison so the accept/reject boundary is
    identical cross-engine.

    Scale shape: one count pass (bounded lang key), two 1-row/L-row
    broadcast normalizations, then the acceptance predicate evaluates
    inside the scan stage right after the broadcast rate join (it
    depends on the computed rates, so it cannot reach PushedFilters) —
    no shuffle touches raw documents beyond the two bounded per-lang
    aggregates."""
    docs = load(spark, sf_dir, "documents")
    # pin the L-row count table: four downstream consumers (tot, w,
    # norms, rates) would otherwise each re-derive it — FIVE fact
    # scans in the physical plan; with the pin the corpus is read
    # exactly twice (count pass + acceptance pass), gated in
    # tests/test_plans.py
    counts = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_l"))
        .localCheckpoint(eager=False)
    )
    tot = counts.agg(F.sum("n_l").alias("n_tot"))
    w = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.pow(F.col("n_l") / F.col("n_tot"), F.lit(MIX_ALPHA) - F.lit(1.0)).alias(
            "w_rate"
        ),
        F.pow(F.col("n_l") / F.col("n_tot"), F.lit(MIX_ALPHA)).alias("w_share"),
    )
    norms = w.agg(F.max("w_rate").alias("w_max"), F.sum("w_share").alias("w_sum"))
    rates = w.crossJoin(F.broadcast(norms)).select(
        "lang",
        F.round(F.col("w_rate") / F.col("w_max"), 6).alias("samp_rate"),
        F.round(F.col("w_share") / F.col("w_sum"), 6).alias("target_share"),
    )
    u = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(_MOD31)) * F.lit(_KNUTH), F.lit(_MOD31)
    ) / F.lit(float(_MOD31))
    kept = docs.join(F.broadcast(rates), "lang").select(
        "lang",
        "samp_rate",
        "target_share",
        (u < F.col("samp_rate")).cast("int").alias("kept"),
    )
    return (
        kept.groupBy("lang", "samp_rate", "target_share")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_kept"),
        )
        .select("lang", "n_total", "n_kept", "samp_rate", "target_share")
        .orderBy("lang")
    )


#: exactly this many docs kept per language by q_stratified_k
STRATA_K = 25


def q_stratified_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size stratified sampling: EXACTLY min(K, stratum size)
    documents per language, selected deterministically — the balanced
    eval-set / few-shot-pool builder (q_sample_mixture's Bernoulli
    draw hits a RATE in expectation; an eval set needs an exact
    count). Selection = the K smallest Knuth-hash values per language
    (ties impossible: doc_id is unique and the multiplier is odd, so
    the hash is injective mod 2³¹) — layout-independent, reproducible,
    auditable, like every sampler in this module.

    Scale shape: ONE exchange on the bounded lang key for the
    row_number window; the hash ranking means no global sort and no
    second pass. Per-group top-K via window is the standard plan; K
    and |langs| bound the output."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    h = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(_MOD31)) * F.lit(_KNUTH), F.lit(_MOD31)
    )
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", "source", "n_chars", h.alias("_h"))
        .withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= STRATA_K)
        .select("lang", "pick", "doc_id", "source", "n_chars")
        .orderBy("lang", "pick")
    )


#: top terms kept per document by TF-IDF
TFIDF_TOP_K = 3


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-K TF-IDF terms — the classic keyword-extraction
    / relevance-weighting primitive (smooth idf = ln((1+N)/(1+df)) + 1,
    sklearn's formulation; score = tf · idf).

    Shape at scale: tf is one (doc_id, term) hash aggregate with
    map-side partials, pinned with a lazy localCheckpoint because TWO
    consumers read it (the df aggregate and the scored join) — without
    the pin each consumer re-tokenizes the whole corpus, doubling the
    dominant cost; df is one more aggregate over the (already
    distinct) tf pairs; N arrives via a broadcast one-row cross join
    (never a driver-side .count()); the scored join keys on term —
    df is vocabulary-sized, so AQE turns it into a broadcast join
    when it fits and absorbs the Zipf skew when it must shuffle (no
    hard-coded broadcast hint: vocabulary size is data-dependent).
    The per-doc top-K
    window partitions by doc_id — high-cardinality key, so every
    window partition is ~distinct-terms-per-doc rows: safe at any
    corpus size (contrast the low-cardinality windows q_percentiles
    documents). Ordering ties break on the term string; ranks compare
    the ROUNDED score so both engines rank identical values."""
    docs = load(spark, sf_dir, "documents", spread=True)
    from pyspark.sql import Window

    tf = (
        docs.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    score = F.round(
        F.col("tf")
        * (F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)),
        6,
    )
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(n))
        .select("doc_id", "term", score.alias("tfidf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.select("doc_id", "term", "tfidf", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= TFIDF_TOP_K)
    )


#: blocklist lexicon for the scrub stage — stand-in for a PII/unsafe
#: term list (the synthetic corpus has no real PII, so the lexicon is
#: drawn from its vocabulary to exercise the path with live matches)
SCRUB_LEXICON = ("value", "hash")

#: digit-run pattern (phone/ID-number shaped) — second scrub stage;
#: matches nothing in the synthetic corpus, which pins the zero-path
SCRUB_PATTERN = r"[0-9]{3,}"


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage content scrubbing — the redaction step of a curation
    pipeline: (1) lexicon blocklist over tokens (broadcast-sized term
    list → a per-token CASE, no join), (2) digit-run regex for
    phone/ID-shaped spans. Emits per-doc redaction counts and the
    sha256 of the scrubbed text, so the oracle verifies the exact
    scrubbed BYTES without hauling full text through the compare.

    Purely per-row expressions (higher-order transform + regexp) —
    fused into the scan stage, no shuffle, embarrassingly parallel at
    any scale."""
    docs = load(spark, sf_dir, "documents", spread=True)
    toks = _tokens()
    masked = F.transform(
        toks,
        lambda t: F.when(t.isin(*SCRUB_LEXICON), F.lit("[REDACTED]")).otherwise(t),
    )
    scrubbed = F.regexp_replace(
        F.concat_ws(" ", masked), SCRUB_PATTERN, "[NUM]"
    )
    n_lex = F.size(F.filter(toks, lambda t: t.isin(*SCRUB_LEXICON)))
    n_pat = F.size(F.regexp_extract_all("text", F.lit(SCRUB_PATTERN), 0))
    return docs.select(
        "doc_id",
        "lang",
        n_lex.alias("n_lexicon_hits"),
        n_pat.alias("n_pattern_hits"),
        F.sha2(scrubbed, 256).alias("scrubbed_hash"),
    )


def q_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling by quality: keep each doc with probability
    equal to its quality score (keep iff hash-u < q) — the
    quality-weighted curation knob between "hard threshold" (q_curation
    drops q < 0.5 outright) and "keep everything": low-quality docs
    survive at reduced rate instead of vanishing, preserving
    distributional coverage (the standard soft-filter in web-corpus
    pipelines). Same Knuth-hash u as q_sample_mixture, so the draw is
    deterministic, auditable, layout-independent, and evaluated per-row
    at the scan with no shuffle before the bounded summary. Emits per
    lang: kept/total plus avg quality of kept vs all — the upweighting
    effect made visible (kept average must sit above the population
    average)."""
    docs = load(spark, sf_dir, "documents")
    u = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(_MOD31)) * F.lit(_KNUTH), F.lit(_MOD31)
    ) / F.lit(float(_MOD31))
    scored = docs.select(
        "lang", quality_score_col().alias("q"), (u < quality_score_col()).alias("kept")
    )
    return scored.groupBy("lang").agg(
        F.sum(F.col("kept").cast("int")).alias("n_kept"),
        F.count("*").alias("n_total"),
        F.round(F.avg(F.when(F.col("kept"), F.col("q"))), 4).alias("avg_q_kept"),
        F.round(F.avg("q"), 4).alias("avg_q_all"),
    )


#: sequence-packing config: training-example token budget + packer shards
PACK_CAP = 2048
PACK_SHARDS = 16


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM pipeline: sequence packing — the stage that concatenates
    documents into fixed-token-budget training examples (bins of
    PACK_CAP tokens) so batch padding waste is bounded. Semantics:
    stream-concat packing per shard — docs in doc_id order, each doc
    assigned to the bin its LAST token lands in; deterministic, so
    fully oracle-checkable (same window arithmetic in SQL).

    Scale shape: ONE window partitioned by shard (pmod of doc_id), not
    an unpartitioned global cumsum — packing is embarrassingly parallel
    across shards by design (real packers run per-worker anyway), and
    PACK_SHARDS scales with the cluster; per-shard order is a local
    sort. Docs longer than PACK_CAP pass through arithmetic intact
    (fill_ratio > 1 flags them); chunk them first with q_udf_chunk."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.pmod("doc_id", F.lit(PACK_SHARDS)).cast("int").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.select(
        "shard",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - 1) / PACK_CAP).alias("bin_id"),
    )
    return (
        packed.groupBy("shard", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
            F.round(F.sum("n_tokens") / F.lit(float(PACK_CAP)), 4).alias("fill_ratio"),
        )
        .orderBy("shard", "bin_id")
    )


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (the CCNet/KenLM filtering shape,
    public methodology): every document scored by its mean token
    log-probability under the CORPUS unigram LM — low scores flag
    boilerplate/outlier documents for curation, the statistical
    sibling of q_text_quality's rule-based score.

    Scale shape: the LM "fit" is one vocabulary-bounded hash aggregate
    (token → count) + a 1-row broadcast total; scoring joins tokens to
    the vocabulary via an EXPLICIT broadcast — the unigram model is
    vocabulary-bounded (the KenLM/CCNet posture: the model ships to
    every worker), and leaving the choice to AQE measurably fails
    here: it kept a 27M-row token-stream shuffle onto 3,100
    Zipf-skewed keys (29 s vs 7.5 s at ×100) — then one doc-keyed
    aggregate. Float discipline: ln(c/N) is identical IEEE arithmetic
    in both engines; the per-doc mean is rounded AFTER aggregation."""
    docs = load(spark, sf_dir, "documents", spread=True)
    toks = docs.select("doc_id", "lang", F.explode(_tokens()).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").alias("n"))
    lp = (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "lang", F.log(F.col("c") / F.col("n")).alias("lp"))
    )
    return (
        lp.groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lp"), 4).alias("lm_score"),
        )
        .orderBy("doc_id")
    )


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: the slope of
    ln(freq) over ln(rank) plus Pearson r² — the one-number check that
    a scraped corpus has a natural-language frequency profile (a slope
    far from ≈ −1 or a poor fit flags boilerplate, spam, or synthetic
    text; a standard corpus-health metric, public methodology). The
    metric works as advertised on the driver's fixtures: their
    uniform synthetic token pool yields slope ≈ −0.18 with r² ≈ 0.06
    — correctly flagged as non-natural text.

    Scale shape: one fact pass to the vocabulary-bounded (token,
    freq) table; the rank window and the regr_slope/regr_r2
    aggregates (mergeable built-ins, map-side partials) run on that
    bounded table only. Rank ties break on the token string, so the
    (rank, freq) pairs — and hence the regression inputs — are
    identical in both engines; ln is the same IEEE op, and rounding
    happens once, after the aggregate."""
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(_tokens()).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # Two-stage distributed rank (functions/ids.py:global_ranks): a
    # plain row_number() OVER (ORDER BY freq DESC, tok) would sort the
    # whole vocabulary — 10⁷–10⁸ distinct tokens on a web corpus — in
    # ONE task. global_ranks range-partitions on the same order, so the
    # rank is bit-identical and every task stays O(vocab/partitions).
    from als_hadoop_spark.functions.ids import global_ranks

    ranked = global_ranks(
        vocab, [F.col("freq").desc(), F.col("tok")], rank_col="rank"
    ).select("freq", "rank")
    return ranked.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("freq").alias("n_tokens"),
        F.round(
            F.regr_slope(F.log("freq"), F.log("rank")), 6
        ).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("freq"), F.log("rank")), 6).alias("fit_r2"),
    )


QUERIES = {
    "q_lm_score": q_lm_score,
    "q_zipf_fit": q_zipf_fit,
    "q_stratified_k": q_stratified_k,
    "q_text_stats": q_text_stats,
    "q_sequence_pack": q_sequence_pack,
    "q_curation": q_curation,
    "q_curation_neardup": q_curation_neardup,
    "q_sample_mixture": q_sample_mixture,
    "q_mixture_temperature": q_mixture_temperature,
    "q_quality_sample": q_quality_sample,
    "q_token_topk": q_token_topk,
    "q_lang_id": q_lang_id,
    "q_text_quality": q_text_quality,
    "q_doc_fingerprint": q_doc_fingerprint,
    "q_tfidf": q_tfidf,
    "q_pii_scrub": q_pii_scrub,
}

ORACLES = {
    "q_zipf_fit": """
        WITH vocab AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
            FROM (
                SELECT unnest(string_split(text, ' ')) AS tok
                FROM documents
            )
            WHERE tok <> ''
            GROUP BY tok
        ), ranked AS (
            SELECT freq,
                   row_number() OVER (ORDER BY freq DESC, tok) AS rank
            FROM vocab
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
               CAST(SUM(freq) AS BIGINT) AS n_tokens,
               ROUND(regr_slope(ln(freq), ln(rank)), 6) AS zipf_slope,
               ROUND(regr_r2(ln(freq), ln(rank)), 6) AS fit_r2
        FROM ranked
    """,
    "q_stratified_k": f"""
        SELECT lang, pick, doc_id, source, n_chars
        FROM (
            SELECT lang, doc_id, source, n_chars,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY (doc_id % {_MOD31}) * {_KNUTH} % {_MOD31},
                                doc_id
                   ) AS pick
            FROM documents
        )
        WHERE pick <= {STRATA_K}
        ORDER BY lang, pick
    """,
    "q_lm_score": """
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        v AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM v),
        lp AS (
            SELECT t.doc_id, t.lang,
                   ln(v.c / (SELECT n FROM tot)) AS lp
            FROM toks t JOIN v USING (tok)
        )
        SELECT doc_id, lang,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               ROUND(AVG(lp), 4) AS lm_score
        FROM lp
        GROUP BY doc_id, lang
        ORDER BY doc_id
    """,
    "q_sequence_pack": """
        WITH toks AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   CAST(doc_id % 16 AS INT) AS shard
            FROM documents
        ), packed AS (
            SELECT shard, n_tokens,
                   CAST(FLOOR((SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id) - 1) / 2048.0
                   ) AS BIGINT) AS bin_id
            FROM toks
        )
        SELECT shard, bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens,
               ROUND(SUM(n_tokens) / 2048.0, 4) AS fill_ratio
        FROM packed
        GROUP BY shard, bin_id
        ORDER BY shard, bin_id
    """,
    "q_tfidf": """
        WITH tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents)
            GROUP BY doc_id, term
        ), df AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ), n AS (
            SELECT COUNT(*) AS n_docs FROM documents
        )
        SELECT doc_id, term, tfidf, rnk
        FROM (
            SELECT tf.doc_id, tf.term,
                   ROUND(tf * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0), 6) AS tfidf,
                   CAST(row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY ROUND(tf * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0), 6)
                                DESC, tf.term
                   ) AS INT) AS rnk
            FROM tf JOIN df USING (term) CROSS JOIN n
        ) WHERE rnk <= 3
    """,
    "q_pii_scrub": """
        SELECT doc_id, lang,
               len(list_filter(string_split(text, ' '),
                               t -> t IN ('value', 'hash'))) AS n_lexicon_hits,
               len(regexp_extract_all(text, '[0-9]{3,}')) AS n_pattern_hits,
               sha256(regexp_replace(
                   array_to_string(
                       list_transform(string_split(text, ' '),
                                      t -> CASE WHEN t IN ('value', 'hash')
                                                THEN '[REDACTED]' ELSE t END),
                       ' '),
                   '[0-9]{3,}', '[NUM]', 'g')) AS scrubbed_hash
        FROM documents
    """,
    "q_quality_sample": """
        WITH scored AS (
            SELECT doc_id, lang,
                   ROUND(LEAST(len(t) / 100.0, 1.0) * 0.4
                         + ROUND(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 4) * 0.4
                         + (1.0 - ROUND(CAST(len(list_filter(t,
                               x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                               / len(t), 4)) * 0.2,
                         4) AS q
            FROM (SELECT *, string_split(text, ' ') AS t FROM documents)
        ), drawn AS (
            SELECT lang, q,
                   CAST(((doc_id % 2147483648) * 2654435761)
                        % 2147483648 AS DOUBLE) / 2147483648.0 < q AS kept
            FROM scored
        )
        SELECT lang,
               CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               ROUND(AVG(CASE WHEN kept THEN q END), 4) AS avg_q_kept,
               ROUND(AVG(q), 4) AS avg_q_all
        FROM drawn
        GROUP BY lang
    """,
    "q_sample_mixture": """
        SELECT lang,
               CAST(SUM(kept) AS BIGINT) AS n_kept,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               ROUND(CAST(SUM(kept) AS DOUBLE) / COUNT(*), 4) AS realized_rate
        FROM (
            SELECT lang,
                   CASE WHEN CAST(((doc_id % 2147483648) * 2654435761)
                                 % 2147483648 AS DOUBLE) / 2147483648.0
                        < (CASE lang WHEN 'en' THEN 0.5
                                     WHEN 'zh' THEN 0.8
                                     ELSE 1.0 END)
                        THEN 1 ELSE 0 END AS kept
            FROM documents
        )
        GROUP BY lang
    """,
    "q_mixture_temperature": f"""
        WITH c AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l
            FROM documents GROUP BY lang
        ), t AS (
            SELECT lang, n_l, SUM(n_l) OVER () AS n_tot FROM c
        ), w AS (
            SELECT lang,
                   POW(CAST(n_l AS DOUBLE) / n_tot, {MIX_ALPHA} - 1.0)
                       AS w_rate,
                   POW(CAST(n_l AS DOUBLE) / n_tot, {MIX_ALPHA}) AS w_share
            FROM t
        ), r AS (
            SELECT lang,
                   ROUND(w_rate / MAX(w_rate) OVER (), 6) AS samp_rate,
                   ROUND(w_share / SUM(w_share) OVER (), 6) AS target_share
            FROM w
        ), k AS (
            SELECT d.lang, r.samp_rate, r.target_share,
                   CASE WHEN CAST(((d.doc_id % {_MOD31}) * {_KNUTH})
                                 % {_MOD31} AS DOUBLE) / {_MOD31}.0
                        < r.samp_rate THEN 1 ELSE 0 END AS kept
            FROM documents d JOIN r USING (lang)
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(kept) AS BIGINT) AS n_kept,
               samp_rate, target_share
        FROM k GROUP BY lang, samp_rate, target_share
        ORDER BY lang
    """,
    "q_curation": """
        WITH scored AS (
            SELECT doc_id, lang, n_chars, sha256(text) AS h,
                   ROUND(LEAST(len(t) / 100.0, 1.0) * 0.4
                         + ROUND(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 4) * 0.4
                         + (1.0 - ROUND(CAST(len(list_filter(t,
                               x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                               / len(t), 4)) * 0.2,
                         4) AS q
            FROM (SELECT *, string_split(text, ' ') AS t FROM documents)
        ), kept AS (
            SELECT * FROM scored WHERE q >= 0.5
        ), deduped AS (
            SELECT h,
                   MIN(doc_id) AS doc_id,
                   arg_min(lang, doc_id) AS lang,
                   arg_min(n_chars, doc_id) AS n_chars,
                   arg_min(q, doc_id) AS q
            FROM kept GROUP BY h
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               ROUND(AVG(q), 4) AS avg_quality
        FROM deduped
        GROUP BY lang
    """,
    "q_text_stats": """
        WITH toks AS (
            SELECT lang, doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ), tok_stats AS (
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_tokens,
                   ROUND(AVG(LENGTH(tok)), 4) AS avg_token_len
            FROM toks GROUP BY lang
        ), doc_stats AS (
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   ROUND(AVG(n_chars), 4) AS avg_chars
            FROM documents GROUP BY lang
        )
        SELECT d.lang, d.n_docs, t.n_tokens, t.n_distinct_tokens,
               ROUND(CAST(t.n_tokens AS DOUBLE) / d.n_docs, 4) AS avg_tokens_per_doc,
               t.avg_token_len, d.avg_chars
        FROM doc_stats d JOIN tok_stats t ON d.lang = t.lang
    """,
    "q_token_topk": """
        WITH ws AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_ws FROM (
                SELECT unnest(string_split(text, ' ')) AS tok FROM documents
            ) GROUP BY tok
        ), rx AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_regex FROM (
                SELECT unnest(regexp_extract_all(text,
                    '[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\r]')) AS tok
                FROM documents
            ) GROUP BY tok
        )
        SELECT COALESCE(ws.tok, rx.tok) AS tok,
               COALESCE(n_ws, 0) AS n_ws,
               COALESCE(n_regex, 0) AS n_regex
        FROM ws FULL OUTER JOIN rx ON ws.tok = rx.tok
        ORDER BY n_ws DESC, tok
        LIMIT 20
    """,
    "q_lang_id": """
        SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM (
            SELECT lang,
                   CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                              t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                             / len(string_split(text, ' ')) >= 0.05
                        THEN 'en' ELSE 'non_en' END AS predicted
            FROM documents
        )
        GROUP BY lang, predicted
    """,
    "q_text_quality": """
        SELECT doc_id,
               n_tokens,
               ROUND(CAST(sum_len AS DOUBLE) / n_tokens, 4) AS avg_token_len,
               ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
               ROUND(CAST(n_types AS DOUBLE) / n_tokens, 4) AS type_token_ratio,
               ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.4
                     + ROUND(CAST(n_types AS DOUBLE) / n_tokens, 4) * 0.4
                     + (1.0 - ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 4)) * 0.2,
                     4) AS quality_score
        FROM (
            SELECT doc_id,
                   CAST(len(t) AS INT) AS n_tokens,
                   CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS sum_len,
                   CAST(len(list_filter(t,
                        x -> x IN ('the','a','of','and','to','in','is'))) AS INT) AS n_stop,
                   CAST(len(list_distinct(t)) AS INT) AS n_types
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        )
    """,
    "q_doc_fingerprint": """
        WITH fps AS (
            SELECT doc_id,
                   list_reduce(
                       list_prepend(CAST(7 AS BIGINT),
                           list_transform(string_split(text, ' '),
                               t -> CAST(ascii(t[1]) * 1000 + length(t) * 31
                                         + ascii(t[-1]) AS BIGINT))),
                       (acc, c) -> (acc * 31 + c) % 1000000007
                   ) AS fingerprint
            FROM documents
        )
        SELECT fingerprint,
               MIN(doc_id) AS keep_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM fps
        GROUP BY fingerprint
    """,
}
