"""Mergeable DataSketches aggregates — the pre-aggregation pattern that
makes 100 TB rollups cheap.

The reference's only cardinality machinery is single-process in-memory
sets (ALS-Hadoop/mapid.py:14-15) and its only "metric store" is a
scalar rmse.txt (ALS-Hadoop/ALS/ALS.java:411-419). At 100 TB neither
exact distinct counts nor exact quantiles can be maintained
incrementally: a new day of data forces a full re-scan, because neither
`countDistinct` partials nor sorted quantile state can be combined
across precomputed groups.

Sketches fix the algebra. An HLL or KLL sketch is a small fixed-size
summary with an associative, commutative merge, so the 100 TB shape is:

    per-partition/day sketch  →  store the BINARY sketch  →
    merge-on-read for any coarser rollup (week, month, all-time)

— one scan of the raw data ever, then every rollup is a merge of
kilobyte blobs. Spark 4 ships Apache DataSketches natively
(`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`,
`kll_sketch_agg_double` / `kll_sketch_merge_double` /
`kll_sketch_get_quantile_double`), all JVM-side and map-side-combined,
so the whole pattern is built-in aggregates — no UDAF, no Python.

Both queries here materialize the fine-grained sketch level and then
merge it up IN ONE PLAN, proving the merge algebra the pattern relies
on; `tests/test_sketches.py` pins the invariant exactly (union of
daily sketches == sketch of the union — HLL registers are a
register-wise max, so the equality is bit-exact, not approximate) and
gates estimate error against the exact aggregates.

No oracles: sketch estimates are implementation-defined (DuckDB's HLL
differs from DataSketches), so both queries are rows-only by design
(SURVEY.md §7.3), with the pytest gates above standing in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

#: KLL quantile levels probed by q_kll_quantiles (matches q_percentiles'
#: p50/p90/p99 so the pytest gate can compare like-for-like).
KLL_LEVELS = (0.5, 0.9, 0.99)


def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via merged per-day HLL sketches.

    Stage 1 builds one HLL sketch per (event_type, day) — the
    granularity a production pipeline would PERSIST (a few KB per
    group-day instead of the raw user ids). Stage 2 answers the
    coarser question (distinct users per event_type over all time) by
    merging the daily sketches with `hll_union_agg`, never re-touching
    the fact rows. Both stages are ordinary hash aggregates with
    map-side partials; sketch size is fixed (lgConfigK=12 default,
    4 KB) regardless of cardinality, so the shuffle volume is
    O(groups), not O(distinct ids)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count("*").alias("n_days"),
        )
        .orderBy("event_type")
    )


def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type value quantiles via merged per-day KLL sketches.

    Same two-level shape as q_hll_rollup but for order statistics: KLL
    sketches (Karnin-Lang-Liberty, FOCS 2016) are mergeable quantile
    summaries with a priori rank-error guarantees (~1.65% at the
    default k=200), which GK `percentile_approx` summaries are not —
    Spark's GK merge degrades unboundedly under repeated merging,
    DataSketches KLL does not, making KLL the right persisted-summary
    choice. Emits p50/p90/p99 per event_type from the MERGED daily
    sketches plus the exact row count (deterministic companion
    column)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.kll_sketch_agg_double("value").alias("sk"),
        F.count("*").alias("n"),
    )
    # Spark exposes KLL merge as a BINARY scalar (kll_sketch_merge_double),
    # not an aggregate — so fold the per-group sketch list with the
    # `aggregate` higher-order function, seeded by the first sketch. The
    # collect_list is bounded by days-per-group (the rollup grain), not by
    # data volume, so the row stays small at any corpus size.
    merged = daily.groupBy("event_type").agg(
        F.collect_list("sk").alias("sks"),
        F.sum("n").alias("n_rows"),
    )
    folded = F.aggregate(
        F.slice("sks", 2, F.greatest(F.size("sks") - 1, F.lit(0))),
        F.element_at("sks", 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    ).alias("sk")
    merged = merged.select("event_type", folded, "n_rows")
    qcols = [
        F.round(
            F.kll_sketch_get_quantile_double("sk", F.lit(q)), 6
        ).alias(f"p{int(q * 100)}")
        for q in KLL_LEVELS
    ]
    return merged.select("event_type", *qcols, "n_rows").orderBy("event_type")


#: CMS accuracy knobs: eps bounds the overestimate at eps·N with
#: probability `confidence`; 1e-3 → a ~109 KB sketch (w=⌈e/eps⌉=2719
#: long counters × d=⌈ln(1/(1−conf))⌉=5 rows), fixed regardless of
#: vocabulary size.
CMS_EPS = 1e-3
CMS_CONFIDENCE = 0.99
CMS_SEED = 42
#: deterministic Knuth-hash doc sample used ONLY to nominate
#: candidates (the sketch, not the sample, supplies the counts).
#: Known limitation of sample-based nomination (standard for CMS,
#: which cannot enumerate its keys): a heavy hitter concentrated in
#: the unsampled half of doc_ids would not be nominated and would be
#: missing from the reported top-k even though the sketch holds its
#: count — acceptable for corpus-level tokens (spread across docs by
#: nature), wrong for per-doc-unique keys.
CMS_SAMPLE_MOD = 2  # keep doc_id hash % 2 == 0 → ~50% of docs
CMS_CANDIDATES = 60
CMS_TOPK = 20


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide heavy-hitter tokens via merged per-source Count-Min
    sketches — the frequency member of the mergeable-sketch trio
    (HLL = distinct, KLL = quantiles, CMS = counts).

    The 100 TB problem: "how often does token X appear corpus-wide"
    over a vocabulary too large to keep exact counts per ingest slice.
    CMS (Cormode-Muthukrishnan, J.Alg 2005) is the standard answer: a
    fixed-size counter grid per slice (~109 KB at eps=1e-3) whose
    merge is element-wise addition, with a one-sided guarantee
    (estimate ≥ true, ≤ true + eps·N w.p. confidence). The pipeline
    persists one sketch per source/day; any coarser question is a
    merge of blobs.

    Plan: ONE fact pass (explode tokens → `count_min_sketch` aggregate
    per source, map-side-combined JVM partials — the granularity a
    production pipeline would PERSIST); candidate tokens are nominated
    from a deterministic Knuth-hash half-sample of docs (same
    arithmetic as q_sample_mixture, layout-independent) via an exact
    bounded top-CMS_CANDIDATES aggregate on the sample only. Driver
    merges the |sources| sketches (bounded collect, KBs) through the
    JVM `CountMinSketch.mergeInPlace` and probes the candidates —
    |sources| + CMS_CANDIDATES driver-side items total, independent of
    corpus size. Output: top-CMS_TOPK (token, est_count, n_sources).

    Rows-only by design: CMS estimates are implementation-defined
    (DuckDB has no CMS); `tests/test_sketches.py` gates the one-sided
    guarantee (est ≥ true, est ≤ true + eps·N) per token and that the
    reported top-k matches the exact top-k (deterministic on the
    fixture: 31-token vocabulary vs 2719 counter columns), plus the
    merged-sketch == whole-corpus-sketch identity."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower("text"), " ")).alias("token"),
    ).filter(F.col("token") != "")
    per_source = toks.groupBy("source").agg(
        F.count_min_sketch(
            "token", F.lit(CMS_EPS), F.lit(CMS_CONFIDENCE), F.lit(CMS_SEED)
        ).alias("sk")
    )
    # candidate nomination: exact top tokens of the deterministic
    # half-sample (bounded output; the sample only nominates — the
    # merged sketch supplies the reported counts)
    knuth = F.pmod(
        (F.col("doc_id").cast("bigint") * F.lit(2654435761)),
        F.lit(2**32),
    )
    cand = (
        toks.filter(knuth % CMS_SAMPLE_MOD == 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("_sample_n"))
        .orderBy(F.col("_sample_n").desc(), F.col("token"))
        .limit(CMS_CANDIDATES)
    )
    sketches = per_source.collect()  # bounded: |sources| × ~3 KB
    candidates = [r["token"] for r in cand.collect()]  # bounded
    jvm = spark.sparkContext._jvm
    merged = None
    for row in sketches:
        j = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytes(row["sk"])
        )
        if merged is None:
            merged = j
        else:
            merged.mergeInPlace(j)
    rows = [
        (t, int(merged.estimateCount(t)), len(sketches)) for t in candidates
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        rows[:CMS_TOPK], "token STRING, est_count BIGINT, n_sources INT"
    )


def q_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between every event-type pair via HLL
    inclusion-exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), where
    the union estimate comes from `hll_union` over the SAME persisted
    per-type sketches q_hll_rollup maintains — the pairwise question
    ("how many purchasers also clicked?") answered from kilobyte
    summaries with zero re-scans of the fact table.

    Scale shape: one fact pass builds |types| sketches; the pair
    expansion is a self-join of that BOUNDED sketch table (types²/2
    rows); every estimate is a JVM scalar over broadcast-size blobs.
    Intersection via inclusion-exclusion inherits ~3× the union's
    relative error (standard HLL caveat, worst for small overlaps) —
    the pytest gate bounds it against the exact intersections."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
    )
    a = per_type.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("ska")
    )
    b = per_type.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("skb")
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    est_a = F.hll_sketch_estimate("ska")
    est_b = F.hll_sketch_estimate("skb")
    est_u = F.hll_sketch_estimate(F.hll_union("ska", "skb"))
    return pairs.select(
        "type_a",
        "type_b",
        est_a.alias("users_a"),
        est_b.alias("users_b"),
        F.greatest(est_a + est_b - est_u, F.lit(0)).alias("approx_overlap"),
    ).orderBy("type_a", "type_b")


#: bits per bitmap word — 32 low bits of a BIGINT word, so `1 << bit`
#: never touches the sign bit and the identical shift arithmetic is
#: exact in both engines
BITMAP_BITS = 32


def q_bitmap_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT pairwise audience overlap via bitmap indexes — the
    Roaring/Druid-style companion to q_hll_overlap's sketch estimate:
    each event type's user set becomes a bitmap (`bit_or` of
    `1 << (user_id % 32)` per 32-user bucket), and |A∩B| is
    `sum(bit_count(a & b))` over bucket-aligned words.

    Why this is the exact-set-op scale shape: the fact table collapses
    in ONE pass to |types| × ⌈users/32⌉ bigint words (bit_or has
    map-side partials and is duplication-idempotent, so no distinct
    needed); every later set operation (AND here — OR/XOR the same
    way) is a bucket equi-join over word streams, never a re-scan,
    never a shuffle of raw user ids. Requires a DENSE id space — the
    fixtures' user_id already is; sparse keys chain
    functions.ids.dense_ids first (that composition is the
    production path). All-integer output → full DuckDB oracle, which
    doubles as the exactness check for q_hll_overlap's estimates."""
    ev = load(spark, sf_dir, "events")
    words = (
        ev.select(
            "event_type",
            F.expr(f"user_id div {BITMAP_BITS}").alias("bucket"),
            F.expr(
                f"shiftleft(1L, CAST(user_id % {BITMAP_BITS} AS INT))"
            ).alias("mask"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.bit_or("mask").alias("w"))
    )
    totals = words.groupBy("event_type").agg(
        F.sum(F.bit_count("w")).alias("n_users")
    )
    a = words.select(
        F.col("event_type").alias("type_a"), "bucket", F.col("w").alias("wa")
    )
    b = words.select(
        F.col("event_type").alias("type_b"), "bucket", F.col("w").alias("wb")
    )
    inter = (
        a.join(b, "bucket")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.bit_count(F.col("wa").bitwiseAND(F.col("wb")))).alias(
                "n_overlap"
            )
        )
    )
    ta = totals.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("users_a")
    )
    tb = totals.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("users_b")
    )
    return (
        inter.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select("type_a", "type_b", "users_a", "users_b", "n_overlap")
        .orderBy("type_a", "type_b")
    )


QUERIES = {
    "q_hll_rollup": q_hll_rollup,
    "q_hll_overlap": q_hll_overlap,
    "q_bitmap_overlap": q_bitmap_overlap,
    "q_kll_quantiles": q_kll_quantiles,
    "q_cms_heavy_hitters": q_cms_heavy_hitters,
}

#: sketch estimates are engine-specific (DuckDB's HLL/quantile
#: implementations differ) → those queries are rows-only, accuracy +
#: merge-identity pytest-gated in tests/test_sketches.py. The bitmap
#: overlap is EXACT integer arithmetic → full oracle.
ORACLES: dict[str, str] = {
    "q_bitmap_overlap": f"""
        WITH words AS (
            SELECT event_type,
                   user_id // {BITMAP_BITS} AS bucket,
                   bit_or(1::BIGINT << CAST(user_id % {BITMAP_BITS} AS INT))
                       AS w
            FROM events
            GROUP BY event_type, bucket
        ), totals AS (
            SELECT event_type, CAST(SUM(bit_count(w)) AS BIGINT) AS n_users
            FROM words GROUP BY event_type
        )
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               ta.n_users AS users_a, tb.n_users AS users_b,
               CAST(SUM(bit_count(a.w & b.w)) AS BIGINT) AS n_overlap
        FROM words a
        JOIN words b ON a.bucket = b.bucket AND a.event_type < b.event_type
        JOIN totals ta ON ta.event_type = a.event_type
        JOIN totals tb ON tb.event_type = b.event_type
        GROUP BY type_a, type_b, users_a, users_b
        ORDER BY type_a, type_b
    """,
}
