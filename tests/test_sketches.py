"""Gates for the mergeable-sketch operators (operators/sketches.py).

Sketches are rows-only in the driver contract (estimates are
implementation-defined), so these tests carry the correctness burden:
the merge identity the 100 TB pre-aggregation pattern relies on, and
accuracy bounds against the exact aggregates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from als_hadoop_spark.operators import sketches
from als_hadoop_spark.sources.tables import load

SF_DIR = "/root/testdata/sf0.001"


def test_hll_merge_identity(spark):
    """union(daily sketches) must equal sketch(all rows) BIT-EXACTLY in
    estimate: HLL union is a register-wise max, so merging per-day
    sketches loses nothing vs sketching the union — the property that
    makes persisted daily sketches a lossless substitute for raw ids
    at any coarser rollup."""
    ev = load(spark, SF_DIR, "events")
    daily_then_merge = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    )
    a = {r["event_type"]: r["est"] for r in daily_then_merge.collect()}
    b = {r["event_type"]: r["est"] for r in direct.collect()}
    assert a == b


def test_hll_rollup_error_vs_exact(spark):
    """HLL estimate within 5% of the exact distinct count per group
    (default lgConfigK=12 → ~1.6% standard error; 5% is ~3σ)."""
    out = {
        r["event_type"]: r["approx_users"]
        for r in sketches.q_hll_rollup(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(out) == set(exact)
    for k, est in out.items():
        assert abs(est - exact[k]) <= max(1, 0.05 * exact[k]), (k, est, exact[k])


def test_kll_quantile_rank_error(spark):
    """Each KLL quantile estimate must be an actual data value whose
    TRUE rank is within 5% of the target rank (KLL's guarantee is on
    rank error, not value error — value-space assertions would be
    meaningless for skewed distributions)."""
    rows = sketches.q_kll_quantiles(spark, SF_DIR).collect()
    ev = load(spark, SF_DIR, "events")
    for r in rows:
        et = r["event_type"]
        vals = sorted(
            x["value"]
            for x in ev.filter(F.col("event_type") == et).select("value").collect()
        )
        n = len(vals)
        assert n == r["n_rows"]
        for q in sketches.KLL_LEVELS:
            est = r[f"p{int(q * 100)}"]
            # rank of the estimate in the sorted data (bisect by hand —
            # values are floats rounded to 6dp in the query)
            lo = sum(1 for v in vals if v < est - 5e-7)
            hi = sum(1 for v in vals if v <= est + 5e-7)
            target = q * n
            assert lo - 0.05 * n <= target <= hi + 0.05 * n, (et, q, est)


def test_kll_merge_matches_direct_sketch_ranks(spark):
    """Merged-daily KLL quantiles stay within a rank-error band of the
    directly-sketched (single-level) quantiles — repeated merging must
    not degrade the summary (the property GK summaries lack). Compared
    in RANK space: tail quantiles of skewed data are value-sparse, so a
    value-space bound would be meaningless."""
    ev = load(spark, SF_DIR, "events")
    direct = ev.groupBy("event_type").agg(
        *[
            F.kll_sketch_get_quantile_double(
                F.kll_sketch_agg_double("value"), F.lit(q)
            ).alias(f"p{int(q * 100)}")
            for q in sketches.KLL_LEVELS
        ]
    )
    merged = sketches.q_kll_quantiles(spark, SF_DIR)
    d = {r["event_type"]: r for r in direct.collect()}
    m = {r["event_type"]: r for r in merged.collect()}
    for et in d:
        vals = sorted(
            x["value"]
            for x in ev.filter(F.col("event_type") == et).select("value").collect()
        )
        n = len(vals)
        for q in sketches.KLL_LEVELS:
            col = f"p{int(q * 100)}"
            rank_direct = sum(1 for v in vals if v <= d[et][col] + 5e-7)
            rank_merged = sum(1 for v in vals if v <= m[et][col] + 5e-7)
            # each estimate carries ~1.65% rank error; allow the sum
            assert abs(rank_direct - rank_merged) <= 0.05 * n + 1, (et, col)


def _exact_token_counts(spark):
    docs = load(spark, SF_DIR, "documents")
    return {
        r["token"]: r["n"]
        for r in docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_cms_one_sided_guarantee_and_topk(spark):
    """Every reported estimate must respect the CMS guarantee
    (est ≥ true, est ≤ true + eps·N), and — because the fixture's
    31-token vocabulary is far below the 2719 counter columns — the
    reported top-k must equal the exact top-k with exact counts."""
    truth = _exact_token_counts(spark)
    n_total = sum(truth.values())
    got = sketches.q_cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(got) == sketches.CMS_TOPK
    for r in got:
        t = truth[r["token"]]
        assert r["est_count"] >= t, (r["token"], r["est_count"], t)
        assert r["est_count"] <= t + sketches.CMS_EPS * n_total
    exact_topk = sorted(
        truth.items(), key=lambda kv: (-kv[1], kv[0])
    )[: sketches.CMS_TOPK]
    assert [(r["token"], r["est_count"]) for r in got] == exact_topk


def test_cms_merge_is_addition(spark):
    """Merging the per-source sketches must answer identically to one
    sketch over the whole corpus — the persisted-slice pattern loses
    nothing (CMS merge is element-wise counter addition)."""
    docs = load(spark, SF_DIR, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    whole = toks.agg(
        F.count_min_sketch(
            "token",
            F.lit(sketches.CMS_EPS),
            F.lit(sketches.CMS_CONFIDENCE),
            F.lit(sketches.CMS_SEED),
        ).alias("sk")
    ).collect()[0]["sk"]
    jvm = spark.sparkContext._jvm
    j_whole = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(whole)
    )
    merged_rows = sketches.q_cms_heavy_hitters(spark, SF_DIR).collect()
    for r in merged_rows:
        assert r["est_count"] == j_whole.estimateCount(r["token"])


def test_cms_empty_corpus(spark, tmp_path):
    """No documents → empty heavy-hitter table, no driver crash (the
    merged sketch is None and the candidate set empty)."""
    empty = spark.createDataFrame(
        [], "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    empty.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    assert sketches.q_cms_heavy_hitters(spark, str(tmp_path)).count() == 0


def test_hll_overlap_error_vs_exact(spark):
    """Inclusion-exclusion overlap estimates must land within 10% of
    the exact pairwise intersections (generous vs the ~3× union error
    bound; the fixture's overlaps are large, where the estimate is
    strongest), and the A/B cardinalities must match q_hll_rollup's."""
    ev = load(spark, SF_DIR, "events")
    users = {
        r["event_type"]: set()
        for r in ev.select("event_type").distinct().collect()
    }
    for r in ev.select("event_type", "user_id").distinct().collect():
        users[r["event_type"]].add(r["user_id"])
    got = sketches.q_hll_overlap(spark, SF_DIR).collect()
    assert len(got) == len(users) * (len(users) - 1) // 2
    for r in got:
        exact = len(users[r["type_a"]] & users[r["type_b"]])
        assert abs(r["approx_overlap"] - exact) <= max(0.10 * exact, 5), (
            r["type_a"], r["type_b"], r["approx_overlap"], exact,
        )


def test_bitmap_overlap_is_exact(spark):
    """The bitmap AND overlap must equal brute-force set intersection
    EXACTLY (no estimate here), and agree with q_hll_overlap's
    estimates within that test's tolerance — the exact/approx pair
    answer the same question."""
    ev = load(spark, SF_DIR, "events")
    users: dict = {}
    for r in ev.select("event_type", "user_id").distinct().collect():
        users.setdefault(r["event_type"], set()).add(r["user_id"])
    got = sketches.q_bitmap_overlap(spark, SF_DIR).collect()
    assert len(got) == len(users) * (len(users) - 1) // 2
    for r in got:
        assert r["users_a"] == len(users[r["type_a"]])
        assert r["users_b"] == len(users[r["type_b"]])
        assert r["n_overlap"] == len(users[r["type_a"]] & users[r["type_b"]])
