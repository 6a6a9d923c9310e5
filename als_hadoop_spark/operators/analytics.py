"""Composite multi-join analytics queries (TPC-H Q3/Q5 shapes) — the
workloads that exercise Catalyst's join planning end-to-end: filter
pushdown into every scan, dimension broadcasts, join reordering, AQE
runtime re-plan, and top-k as TakeOrderedAndProject.

The reference has nothing comparable (its only joins are two
broadcast-hash joins inside the ALS solver, ``ALS-Hadoop/ALS/
ALS.java:380-383``); these exist because a query engine claiming the
reference's *data* (TPC-H-ish star schema, TESTDATA.md) must run the
canonical analytics shapes over it, and because they are the best
single-plan showcase of the 100 TB posture: every dimension side
(customer at Q3 scale, region/nation/supplier at Q5 scale) broadcasts,
so the only real shuffle is the orders⋈lineitem fact join + the final
bounded aggregation.

Float determinism note: revenue = Σ extendedprice·(1-discount) is a
float sum whose addition order differs between engines; both engine
and oracle ROUND to 2 decimals AFTER the aggregate, and top-k ties
break on the group key, so the driver's value-hash is stable (same
discipline as q_groupby_sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load

#: Q3 parameters — segment + cutoff date (mid-range of the fixture's
#: 1995-2001 date span so both filter sides are selective)
Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"
Q3_TOPN = 10

#: Q5 parameters
Q5_REGION = "ASIA"
Q5_YEAR_LO = "1997-01-01"
Q5_YEAR_HI = "1999-01-01"

def _revenue() -> F.Column:
    # built lazily — Column construction needs an active SparkContext,
    # which doesn't exist at import time
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def q_order_revenue_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-N unshipped-order revenue for one market
    segment. customer (filtered, broadcast) ⋈ orders (date-filtered)
    ⋈ lineitem (date-filtered) → per-order revenue → top 10.

    Plan shape at any scale: both date filters push into the parquet
    scans; customer broadcasts (a filtered dimension) onto orders
    FIRST, so the segment selectivity (~1/5) cuts the order set
    before the fact join ever runs — lineitem then joins only
    qualifying orders (AQE broadcasts the shrunken order side below
    threshold; above it, the one fact shuffle carries ~10× fewer
    matching rows); the top-10 runs as TakeOrderedAndProject
    (per-partition heaps, no global sort)."""
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_CUTOFF).cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(Q3_CUTOFF).cast("timestamp")
    )
    qualified = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        li.join(qualified, li.l_orderkey == qualified.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(Q3_TOPN)
    )


def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation from LOCAL suppliers (the
    customer's and supplier's nation must match) within one region and
    a one-year-ish date window — a 6-way join.

    Plan shape: the region→nation→customer broadcast chain prunes to
    one region's customers (1/5) and lands on orders BEFORE the fact
    join — combined with the date window, lineitem probes ~3% of
    orders (AQE broadcasts the qualified side below threshold; above
    it the one fact shuffle carries only matching rows); supplier
    broadcasts with the c_nationkey = s_nationkey local-supplier
    condition riding the same join — no extra shuffle; the final
    aggregate has ≤ #nations groups."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION)
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q5_YEAR_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_YEAR_HI).cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    region_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    cust_pruned = cust.join(
        F.broadcast(region_nations), cust.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey", "n_name")
    qualified = orders.join(
        F.broadcast(cust_pruned), orders.o_custkey == F.col("c_custkey")
    ).select("o_orderkey", "c_nationkey", "n_name")
    return (
        li.join(qualified, li.l_orderkey == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


#: histogram bucket width for events.value (range ~0-500 → ~20 buckets)
HIST_WIDTH = 25.0

#: z-score threshold for the outlier query
OUTLIER_Z = 2.0


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of events.value — the profiling primitive
    behind every data-quality dashboard. bucket = floor(value/width):
    a per-row expression fused into the scan, then ONE bounded-key hash
    aggregate (≈ range/width buckets) with map-side partials — the
    whole 100 TB histogram costs one tiny shuffle. Contrast
    `width_bucket`-free engines that sort to bucket; nothing here
    sorts."""
    ev = load(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / F.lit(HIST_WIDTH)).cast("long")
    return (
        ev.select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "bucket",
            (F.col("bucket") * F.lit(HIST_WIDTH)).alias("bucket_lo"),
            "n", "min_value", "max_value", "sum_value",
        )
    )


def q_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score anomaly detection: events whose value sits
    more than OUTLIER_Z sample standard deviations above their
    event_type's mean. Two-pass shape: one bounded-key stats aggregate
    (avg + stddev_samp, map-side partials), broadcast back onto the
    stream, filter per-row — no window, no sort, no second shuffle.
    The per-key window formulation would sort every event within its
    type; this never sorts.

    Float note: avg/stddev differ between engines only in low-order
    bits (~1e-12 relative); values carry 2 decimals so |z - threshold|
    is ≥ ~1e-4 — the unrounded threshold compare is engine-stable, and
    the emitted z rounds to 4."""
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("_mu"), F.stddev_samp("value").alias("_sd")
    )
    z = (F.col("value") - F.col("_mu")) / F.col("_sd")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(z > OUTLIER_Z)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 4).alias("z_score"),
        )
    )


#: how many heavy keys the skew profiler reports
SKEW_TOP_K = 10

#: minimum document length (chars) for the constraint audit
MIN_DOC_CHARS = 100


def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler over orders.o_custkey — the diagnostic
    you run BEFORE a 100 TB fact join to decide between plain shuffle,
    AQE skew-split, and salting (functions.scale.salted_join). Reports
    the top-10 heaviest keys with their row share and multiple-of-
    average-load; `skew_vs_avg` ≫ 1 on the top key is the signal that
    one reducer would drown.

    Shape: one per-key count aggregate (map-side partials), totals via
    a broadcast one-row cross join, top-10 as TakeOrderedAndProject —
    profiling a 100 TB key distribution costs one vocabulary-bounded
    shuffle."""
    orders = load(spark, sf_dir, "orders")
    cnt = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    tot = cnt.agg(
        F.sum("cnt").alias("n_rows"), F.count("*").alias("n_keys")
    )
    return (
        cnt.join(F.broadcast(tot))
        .select(
            "o_custkey",
            "cnt",
            F.round(F.col("cnt") / F.col("n_rows"), 6).alias("share"),
            F.round(
                F.col("cnt") / (F.col("n_rows") / F.col("n_keys")), 4
            ).alias("skew_vs_avg"),
            "n_keys",
        )
        .orderBy(F.col("cnt").desc(), "o_custkey")
        .limit(SKEW_TOP_K)
    )


def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint audit (the dbt-test / Deequ-style gate a
    pipeline runs before publishing a snapshot): referential integrity
    of both fact→dim edges, primary-key uniqueness, a value-range rule,
    and a document minimum-length rule — one (check_name, n_violations)
    row each. The fixtures pass the relational checks (pinning the
    clean path) and fail the length rule for real (pinning the
    violation path).

    Shape at scale: each FK check is a SHUFFLE_HASH anti-join (an
    anti-join probes a hash table; sorting both sides for SMJ buys
    nothing — the q_exists_chain lesson, r7, measured 15.5 → 9.9 s at
    ×100); the PK and range checks are single aggregates with map-side
    partials. The final union is 5 one-row frames — negligible.

    r10 re-measurement at ×100 (BASELINE.md round-10 A/B table)
    REVERSED one r7 call and added one: (a) pre-aggregating lineitem
    to (orderkey, count) before the anti-join was SLOWER than probing
    the raw keys (2.97 s vs 1.63 s — l_orderkey is near-unique at ~4
    rows/key, so the combine shrinks little and adds a full hash-agg
    stage); the check anti-joins raw keys and counts rows. (b) the
    ORDERS side, whose key repeats ~10×, DOES win from the collapse
    (1.21 s → 0.89 s with shuffle_hash): aggregate (o_custkey, count),
    anti-join the ~|customer| distinct keys, sum the counts. Whole
    query: 4.57 → 2.84 s at ×100; the residual vs DuckDB is the two
    unavoidable fact-side shuffles it fuses in-process."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    ev = load(spark, sf_dir, "events")
    docs = load(spark, sf_dir, "documents")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"), F.count("*").alias("n_violations")
        )

    o_keys = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("_n"))
    orders_fk = o_keys.join(
        cust.select("c_custkey").hint("shuffle_hash"),
        o_keys.o_custkey == F.col("c_custkey"),
        "left_anti",
    ).agg(
        F.lit("orders_custkey_fk").alias("check_name"),
        F.coalesce(F.sum("_n"), F.lit(0)).alias("n_violations"),
    )
    li_fk = li.select("l_orderkey").join(
        orders.select("o_orderkey").hint("shuffle_hash"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_anti",
    ).agg(
        F.lit("lineitem_orderkey_fk").alias("check_name"),
        F.count("*").alias("n_violations"),
    )
    pk_dups = (
        cust.groupBy("c_custkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    value_range = ev.filter((F.col("value") < 0) | F.col("value").isNull())
    short_docs = docs.filter(F.col("n_chars") < MIN_DOC_CHARS)

    return (
        orders_fk
        .unionByName(li_fk)
        .unionByName(check("customer_pk_unique", pk_dups))
        .unionByName(check("events_value_nonnegative", value_range))
        .unionByName(check("documents_min_length", short_docs))
    )


#: ordered funnel steps over events.event_type
FUNNEL_STEPS = ("view", "click", "purchase")

#: trailing window length for per-user feature aggregation
TRAIL_WINDOW_US = 3_600_000_000  # 1 hour in microseconds


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): a user
    counts for step N only with an event of that type STRICTLY AFTER
    their step-N−1 time — the product-analytics primitive behind every
    conversion dashboard.

    Scale shape: each step is one filtered min-aggregate keyed on
    user_id (maximal cardinality, map-side partials) joined to the
    previous step's times — no per-user event-sequence sort, no
    window; three user-keyed joins that AQE can plan as broadcasts
    when a step's survivor set collapses. Output is 3 rows."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    step1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    step2 = (
        ev.join(step1, "user_id")
        .filter((F.col("event_type") == FUNNEL_STEPS[1]) & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    step3 = (
        ev.join(step2, "user_id")
        .filter((F.col("event_type") == FUNNEL_STEPS[2]) & (F.col("ts") > F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def count_step(i: int, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(f"{i}_{FUNNEL_STEPS[i - 1]}").alias("funnel_step"),
            F.count("*").alias("n_users"),
        )

    return (
        count_step(1, step1)
        .unionByName(count_step(2, step2))
        .unionByName(count_step(3, step3))
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen day, then
    distinct active users per (cohort_day, days_since_cohort) — the
    standard retention triangle.

    Scale shape: the retention triangle only needs (user, active day)
    PAIRS, so the raw event stream collapses to distinct user-days in
    the very first aggregate (one scan, map-side combine — the wire
    carries ~#users×#days rows, never raw events); the cohort day is
    then a min over the user's few day rows (user-keyed window on the
    collapsed frame — maximal-cardinality key, tiny partitions); the
    final matrix aggregate has (#days)² bounded keys."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    user_days = ev.distinct()
    cohort = F.min("day").over(Window.partitionBy("user_id"))
    return (
        user_days.select(
            cohort.alias("cohort_day"),
            F.datediff(F.col("day"), cohort).alias("days_since"),
        )
        .groupBy("cohort_day", "days_since")
        .agg(F.count("*").alias("n_users"))
    )


def q_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1-hour feature aggregation (sum + count of
    the user's events in the preceding hour, current row inclusive) —
    the time-RANGE window frame (vs q_window_running's ROWS frame),
    i.e. the feature-engineering shape behind rate limits, velocity
    features, and rolling engagement scores.

    Scale shape: one window partitioned by user_id (maximal-
    cardinality key — each partition is one user's events, safe at any
    scale) ordered by event time with a RANGE frame in exact integer
    microseconds; one exchange total."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-TRAIL_WINDOW_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(F.sum("value").over(w), 2).alias("trail_sum"),
        F.count("*").over(w).alias("trail_cnt"),
    )


def q_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group linear trend of events.value over time via the
    BUILT-IN regr_slope/regr_intercept aggregates — drift detection
    per event_type (is the metric trending?). Time is normalized to
    hours since each group's first event, so the intercept is the
    fitted value at group start and the regression stays
    well-conditioned at any time range.

    Scale shape: one bounded-key min-aggregate for the group origin
    (broadcast back), then ONE bounded-key regression aggregate —
    regr_* are mergeable (sum/count/cov partials), so this is
    map-side-combined like any sum. The applyInPandas twin
    (udfs.q_udf_groupfit) computes the same fit in Python — this
    built-in form is the 100 TB path; the UDF form is the extension
    contract for estimators with no closed form."""
    ev = load(spark, sf_dir, "events")
    t0 = ev.groupBy("event_type").agg(
        F.min(F.unix_micros("ts")).alias("_t0")
    )
    th = (F.unix_micros("ts") - F.col("_t0")) / F.lit(3_600_000_000.0)
    return (
        ev.join(F.broadcast(t0), "event_type")
        .select("event_type", th.alias("th"), "value")
        .groupBy("event_type")
        .agg(
            F.round(F.regr_slope("value", "th"), 4).alias("slope_per_hour"),
            F.round(F.regr_intercept("value", "th"), 4).alias("intercept"),
            F.count("*").alias("n_events"),
        )
    )


#: columns profiled by q_column_profile (name → value expression cast
#: to string for the uniform unpivoted output)
PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table column profiler (the Deequ/dbt-docs "profile" shape):
    per column — null count, approx-free distinct count, min and max
    (stringified for a uniform schema) — computed in ONE pass.

    Shape at scale: nulls/min/max for EVERY column come from one pure
    map-side pass (no distinct → no Expand — the aggregate is a few
    scalars per partition); each exact distinct count is its own
    single-distinct aggregate, which Spark plans as a two-level
    partial-distinct WITHOUT the Expand that a combined
    multi-countDistinct pays (Expand multiplies the fact ×(|cols|+1)
    BEFORE the partial aggregate — measured 20.5 s vs 9.0 s at ×100);
    the first distinct count rides the base pass (single-distinct +
    non-distinct aggs still plan Expand-free), the rest each read
    exactly one column off parquet; the 1-row results meet in
    broadcast joins (their stages build concurrently) and the
    unpivot (`stack`) runs on the ONE assembled row. spread=True: the
    fixture's single-row-group file would otherwise run each pass on
    one task; production multi-row-group files parallelize at the
    scan."""
    li = load(spark, sf_dir, "lineitem", spread=True)
    base_aggs = [F.countDistinct(PROFILE_COLS[0]).alias(f"{PROFILE_COLS[0]}__distinct")]
    for c in PROFILE_COLS:
        base_aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = li.agg(*base_aggs)
    for c in PROFILE_COLS[1:]:
        one = one.join(
            F.broadcast(li.agg(F.countDistinct(c).alias(f"{c}__distinct")))
        )
    stack_expr = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(PROFILE_COLS)}, {stack_expr}) AS "
        "(column, n_nulls, n_distinct, min_val, max_val)"
    )


def q_column_profile_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION column profiler (r8, VERDICT r7 #3): same output
    shape as :func:`q_column_profile`, but distinct counts are HLL++
    ``approx_count_distinct(rsd=0.01)`` — which is what a Deequ-style
    profile IS at 100 TB (Deequ's ApproxCountDistinct is the same
    HLL++ sketch).

    Shape at scale: the exact twin needs one extra single-distinct
    aggregation pass PER COLUMN (N+1 table scans — its 27× adjudicated
    ×100 residual); the sketches are ordinary partial-mergeable
    aggregates, so ALL columns profile in ONE map-side pass — one scan,
    one 1-row reduce, no Expand, no shuffle of data rows. The sketch is
    DataSketches HLL (``hll_sketch_agg``, lgConfigK=14 → ≈0.8% standard
    error), pytest-gated ≤2% against the exact twin per column.
    r11 optimization: this was ``approx_count_distinct(rsd=0.01)``
    until profiling caught Spark's HLL++ at high precision costing
    3-30 s WARM for 4 sketches over 600 k rows with run-to-run swings
    tracking concurrent-task count (guide §1 measure-first; A/B table
    in OPTIMIZATION_r11.md) — the DataSketches aggregate computes the
    same ≤1%-error estimate in ~1 s, stably, at every partition count.
    Non-string columns cast to string first (1:1 for the decimal/
    string/date PROFILE_COLS, so their distinct counts are unchanged;
    hll_sketch_agg takes int/long/string/binary). The 1:1 claim is
    column-type dependent — float/double columns would need ±0.0
    normalization before casting (0.0 and -0.0 are one group under
    Spark's aggregate normalization but stringify differently) if
    ever added to PROFILE_COLS.
    Registered rows-only by design: sketch estimates are
    implementation-defined, so no cross-engine hash can exist (the
    exact twin q_column_profile stays the oracle-proven shape — the
    repo's established fast/oracle pattern)."""
    li = load(spark, sf_dir, "lineitem", spread=True)
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col(c).cast("string"), F.lit(14))
            ).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(PROFILE_COLS)}, {stack_expr}) AS "
        "(column, n_nulls, n_distinct, min_val, max_val)"
    )


#: PageRank parameters — fixed iterations so engine and oracle run the
#: IDENTICAL computation (no convergence-threshold ambiguity)
PR_DAMPING = 0.85
PR_ITER = 5
PR_TOPN = 20


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the customer–supplier
    co-occurrence graph (an order's lineitems connect its customer to
    each supplier; edges symmetrized, so no dangling nodes): the
    iterative-graph workload beyond ALS, run as 5 Pregel-style
    join-aggregate rounds (``functions.graph.pagerank``).

    Node encoding keeps both entity types in one long key space
    (customer → 2k, supplier → 2k+1; ``node div 2`` recovers the key).
    Output is the global top-20 by ROUNDED rank — the sort happens on
    the rounded value in BOTH engines, so the cutoff and tie-breaks
    (entity, key) are engine-independent and the full oracle (5
    chained CTE iterations of the same arithmetic) hash-matches
    despite 5 rounds of float accumulation."""
    from ..functions.graph import pagerank

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cn"),
            (F.col("l_suppkey") * 2 + 1).alias("sn"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("cn").alias("src"), F.col("sn").alias("dst")).union(
        pairs.select(F.col("sn").alias("src"), F.col("cn").alias("dst"))
    )
    ranks = pagerank(edges, damping=PR_DAMPING, n_iter=PR_ITER)
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("entity"),
            F.expr("node div 2").alias("entity_key"),
            F.round("rank", 6).alias("rank"),
        )
        .orderBy(F.col("rank").desc(), "entity", "entity_key")
        .limit(PR_TOPN)
    )


def _pagerank_oracle() -> str:
    """The oracle runs the SAME fixed-point arithmetic as 5 chained
    CTEs — generated so iteration count stays in one place."""
    steps = []
    for i in range(1, PR_ITER + 1):
        steps.append(
            f"""r{i} AS (
            SELECT e.dst AS node,
                   (1.0 - {PR_DAMPING}) / (SELECT n FROM nn)
                       + {PR_DAMPING} * SUM(p.rank / d.deg) AS rank
            FROM e
            JOIN deg d ON e.src = d.src
            JOIN r{i - 1} p ON e.src = p.node
            GROUP BY e.dst
        )"""
        )
    chained = ",\n        ".join(steps)
    return f"""
        WITH pairs AS (
            SELECT DISTINCT o_custkey * 2 AS cn, l_suppkey * 2 + 1 AS sn
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        e AS (
            SELECT cn AS src, sn AS dst FROM pairs
            UNION ALL
            SELECT sn AS src, cn AS dst FROM pairs
        ),
        deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        r0 AS (
            SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
        ),
        {chained}
        SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
                   AS entity,
               node // 2 AS entity_key,
               ROUND(rank, 6) AS rank
        FROM r{PR_ITER}
        ORDER BY rank DESC, entity, entity_key
        LIMIT {PR_TOPN}
    """


#: equal-frequency binning: decile boundaries
EQF_QS = [i / 10 for i in range(1, 10)]


def q_equifreq_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global equal-frequency (decile) binning WITHOUT a global sort —
    the feature-bucketization / monotone-binning primitive: exact
    percentile boundaries from ONE aggregate (Spark's `percentile`
    runs as mergeable partial aggregates, no ordering of the table),
    broadcast back as a 1-row cross join, per-row bin = count of
    boundaries strictly below the value, then a bounded (10-key)
    aggregate.

    Boundaries are rounded to 4dp in BOTH engines before binning so
    the interpolation arithmetic of `percentile` vs `quantile_cont`
    cannot flip a knife-edge row across engines."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.percentile("value", F.array(*[F.lit(q) for q in EQF_QS])).alias("bs")
    ).select(F.transform("bs", lambda b: F.round(b, 4)).alias("bs"))
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "value",
            F.size(F.filter("bs", lambda b: F.col("value") > b)).alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("bin")
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (the Markov-chain /
    user-journey primitive behind funnel discovery): for each user's
    time-ordered event sequence, count (from_type → to_type) steps
    and each from-state's outgoing probability.

    Shape at scale: ONE user-keyed window (lead over ts) — a single
    exchange on user_id — then a bounded (#types²) aggregate with
    map-side partials; the probability denominator joins back on the
    bounded from_type key. Ties on ts break on event_id so the
    sequence is a total order in both engines."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        ev.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    outgoing = counts.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return (
        counts.join(F.broadcast(outgoing), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.col("_tot"), 4).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: for users who complete
    view→purchase (first purchase STRICTLY AFTER first view), the
    p50/p90 and mean of the delay — q_event_funnel counts WHO
    converts, this measures HOW LONG conversion takes, the other half
    of every funnel dashboard.

    Scale shape: two filtered min-aggregates keyed on user_id (map-side
    partials) + one user-keyed join, then ONE single-row percentile
    aggregate over the bounded converter set — no per-user sequence
    sort. Delays in exact integer microseconds until the final
    divisions; percentile interpolation is the same linear rule in
    both engines (quantile_cont twin), with the result rounded 4dp."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    first_view = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    first_purchase = (
        ev.join(first_view, "user_id")
        .filter(
            (F.col("event_type") == FUNNEL_STEPS[2])
            & (F.col("ts") > F.col("t_view"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"), F.min("t_view").alias("t_view"))
    )
    delay_us = F.unix_micros("t_buy") - F.unix_micros("t_view")
    return first_purchase.agg(
        F.count(F.lit(1)).alias("n_converters"),
        F.round(F.percentile(delay_us, F.lit(0.5)) / 60e6, 4).alias(
            "p50_minutes"
        ),
        F.round(F.percentile(delay_us, F.lit(0.9)) / 60e6, 4).alias(
            "p90_minutes"
        ),
        F.round(F.avg(delay_us) / 60e6, 4).alias("mean_minutes"),
    )


#: co-supplier edges exist where two suppliers ship HIGH-QUANTITY lines
#: of the same order (the filter keeps the graph sparse — unfiltered,
#: every supplier pair co-occurs and the graph is complete)
TRI_MIN_QTY = 48.0


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the co-supplier graph (suppliers shipping
    high-quantity lines of the same order are connected): node/edge
    counts, triangle count, and the global clustering coefficient
    3·triangles / wedges — the third graph workload next to PageRank
    (iteration) and connected components (convergence): a bounded
    self-join cascade.

    Scale shape — degree-oriented counting (the arboricity bound from
    the compact-forward / Schank-Wagner literature, public): each
    undirected edge is oriented from its LOWER-degree endpoint to the
    higher ((deg, id) lexicographic, a total order), and triangles are
    counted as directed wedges a→b, a→c closed by b→c. Every join is
    an equi-join, and the wedge fan-out per node is bounded by its
    OUT-degree ≤ O(√m) on any graph (vs raw degree — the difference
    between a hub exploding the join and not). The orientation changes
    the plan, not the answer, so the DuckDB oracle counts the same
    census from the simpler node-ordered formulation and must
    hash-match exactly.

    r11: ``edges``, ``deg`` and ``oriented`` are materialized once
    (``localCheckpoint``, the repo's established reuse barrier from
    pagerank/connected-components). Lazily chained, the census's eight
    references to ``edges`` each re-executed the lineitem self-join +
    distinct — the before-plan carried 36 parquet scans and ~19
    exchanges for what is one edge build, one degree aggregate, and
    one orientation join (plans/r11/q_graph_triangles_before/after).
    At 100 TB the duplicated subtree is 8 fact-scale self-joins."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > TRI_MIN_QTY
    ).select("l_orderkey", "l_suppkey")
    r = li.withColumnRenamed("l_suppkey", "_s2")
    edges = (
        li.join(r, "l_orderkey")
        .filter(F.col("l_suppkey") < F.col("_s2"))
        .select(F.col("l_suppkey").alias("a"), F.col("_s2").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .union(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    # orient: lower (deg, id) → higher (deg, id)
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("_db"))
    oriented = (
        edges.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("_da") < F.col("_db"))
                | ((F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
            )
            .otherwise(
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst"))
            )
            .alias("e")
        )
        .select("e.src", "e.dst")
        .localCheckpoint(eager=False)
    )
    w1 = oriented.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    w2 = oriented.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    wedges = w1.join(w2, "x").filter(F.col("y") < F.col("z"))
    closer = oriented.select(
        F.least("src", "dst").alias("y"), F.greatest("src", "dst").alias("z")
    )
    tri = wedges.join(closer, ["y", "z"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    stats = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("deg * (deg - 1) div 2")).alias("n_wedges"),
    )
    return (
        nodes.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("clustering_coeff"),
        )
    )


#: inactivity gap that closes a session, in exact integer microseconds
#: (6 h — the fixture's mean inter-event gap is ~10 h per user, so the
#: threshold yields a real mix of single- and multi-event sessions at
#: every SF instead of degenerating to all-singletons or one-session)
SESSION_GAP_US = 6 * 3600 * 1_000_000


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the gap-based session assignment every
    clickstream pipeline runs before funnel/retention work (the BATCH
    twin of streaming's ``session_window``, which only sees one
    watermark pass): a new session starts where the inactivity gap
    exceeds SESSION_GAP_US, the session id is the running count of
    such starts, then a per-session rollup and a bounded census by
    session length. The reference has no sequence operators at all;
    this is north-star surface like the rest of this module.

    Scale shape: ONE exchange on user_id — the lag() gap flag and the
    running-sum session id share the same (user_id, ts, event_id)
    window, so Catalyst plans a single sort under a single exchange,
    and both follow-up aggregates are map-side-partial hash aggs (the
    per-session rollup re-uses the user_id clustering; the census is
    bounded by the longest session). No per-user array materializes
    anywhere — a power user costs sort time, not memory (the
    collect_list alternative OOMs exactly there). Exact integer
    microseconds end-to-end → byte-stable oracle hash."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), 1)
        .otherwise(0)
        .alias("_new"),
    ).select(
        "user_id",
        "ts",
        F.sum("_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sid"),
    )
    per = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "dur_us"
        ),
    )
    return (
        per.groupBy(F.col("n_ev").alias("session_events"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("dur_us").alias("sum_duration_us"),
        )
        .orderBy("session_events")
    )


QUERIES = {
    "q_graph_pagerank": q_graph_pagerank,
    "q_graph_triangles": q_graph_triangles,
    "q_funnel_latency": q_funnel_latency,
    "q_sessionize": q_sessionize,
    "q_equifreq_bins": q_equifreq_bins,
    "q_event_transitions": q_event_transitions,
    "q_order_revenue_topn": q_order_revenue_topn,
    "q_column_profile": q_column_profile,
    "q_column_profile_fast": q_column_profile_fast,
    "q_nation_volume": q_nation_volume,
    "q_histogram": q_histogram,
    "q_outliers": q_outliers,
    "q_skew_profile": q_skew_profile,
    "q_constraint_audit": q_constraint_audit,
    "q_event_funnel": q_event_funnel,
    "q_cohort_retention": q_cohort_retention,
    "q_trailing_window": q_trailing_window,
    "q_regression": q_regression,
}

ORACLES = {
    "q_graph_pagerank": _pagerank_oracle(),
    # identical window arithmetic: the lag-gap flag and the running sum
    # are exact integer microseconds in both engines
    "q_sessionize": f"""
        WITH seq AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM seq
        ), per AS (
            SELECT user_id, sid, COUNT(*) AS n_ev,
                   epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
            FROM sess GROUP BY user_id, sid
        )
        SELECT n_ev AS session_events,
               COUNT(*) AS n_sessions,
               CAST(SUM(dur_us) AS BIGINT) AS sum_duration_us
        FROM per GROUP BY n_ev ORDER BY session_events
    """,
    "q_funnel_latency": """
        WITH fv AS (
            SELECT user_id, MIN(ts) AS t_view
            FROM events WHERE event_type = 'view'
            GROUP BY user_id
        ), fp AS (
            SELECT e.user_id,
                   MIN(epoch_us(e.ts)) AS t_buy_us,
                   MIN(epoch_us(fv.t_view)) AS t_view_us
            FROM events e
            JOIN fv ON e.user_id = fv.user_id
            WHERE e.event_type = 'purchase' AND e.ts > fv.t_view
            GROUP BY e.user_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_converters,
               ROUND(quantile_cont(t_buy_us - t_view_us, 0.5)
                     / 60000000.0, 4) AS p50_minutes,
               ROUND(quantile_cont(t_buy_us - t_view_us, 0.9)
                     / 60000000.0, 4) AS p90_minutes,
               ROUND(AVG(t_buy_us - t_view_us) / 60000000.0, 4)
                   AS mean_minutes
        FROM fp
    """,
    "q_graph_triangles": f"""
        WITH li AS (
            SELECT l_orderkey, l_suppkey FROM lineitem
            WHERE l_quantity > {TRI_MIN_QTY}
        ), e AS (
            SELECT DISTINCT l1.l_suppkey AS a, l2.l_suppkey AS b
            FROM li l1 JOIN li l2
              ON l1.l_orderkey = l2.l_orderkey
             AND l1.l_suppkey < l2.l_suppkey
        ), deg AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
            FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
            GROUP BY v
        ), tri AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM e e1
            JOIN e e2 ON e1.b = e2.a
            JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
               (SELECT n_triangles FROM tri) AS n_triangles,
               ROUND(3.0 * (SELECT n_triangles FROM tri)
                     / (SELECT SUM(deg * (deg - 1) // 2) FROM deg),
                     6) AS clustering_coeff
    """,
    "q_event_transitions": """
        WITH steps AS (
            SELECT event_type AS from_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_type
            FROM events
        ),
        counts AS (
            SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM steps WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n,
               ROUND(n / CAST(SUM(n) OVER (PARTITION BY from_type)
                              AS DOUBLE), 4) AS p
        FROM counts
        ORDER BY from_type, to_type
    """,
    "q_equifreq_bins": f"""
        WITH bs AS (
            SELECT list_transform(
                       quantile_cont(value, {EQF_QS}),
                       x -> ROUND(x, 4)) AS b
            FROM events
        ),
        binned AS (
            SELECT value,
                   len(list_filter((SELECT b FROM bs), x -> value > x))
                       AS bin
            FROM events
        )
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(MIN(value), 2) AS lo,
               ROUND(MAX(value), 2) AS hi,
               ROUND(SUM(value), 2) AS sum_value
        FROM binned
        GROUP BY bin
        ORDER BY bin
    """,
    "q_column_profile": """
        SELECT 'l_quantity' AS "column",
               CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
               CAST(MIN(l_quantity) AS VARCHAR) AS min_val,
               CAST(MAX(l_quantity) AS VARCHAR) AS max_val
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice',
               CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
               CAST(MIN(l_extendedprice) AS VARCHAR),
               CAST(MAX(l_extendedprice) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag',
               CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
               CAST(MIN(l_returnflag) AS VARCHAR),
               CAST(MAX(l_returnflag) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'l_shipdate',
               CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
               CAST(MIN(l_shipdate) AS VARCHAR),
               CAST(MAX(l_shipdate) AS VARCHAR)
        FROM lineitem
    """,
    "q_event_funnel": f"""
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t1
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT '1_{FUNNEL_STEPS[0]}' AS funnel_step, COUNT(*) AS n_users FROM s1
        UNION ALL
        SELECT '2_{FUNNEL_STEPS[1]}', COUNT(*) FROM s2
        UNION ALL
        SELECT '3_{FUNNEL_STEPS[2]}', COUNT(*) FROM s3
    """,
    "q_cohort_retention": """
        WITH first_seen AS (
            SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT cohort_day, e.user_id,
                   datediff('day', cohort_day, CAST(e.ts AS DATE))
                       AS days_since
            FROM events e JOIN first_seen f ON e.user_id = f.user_id
        )
        SELECT cohort_day, days_since, COUNT(*) AS n_users
        FROM activity GROUP BY cohort_day, days_since
    """,
    "q_trailing_window": """
        SELECT event_id, user_id, ts, value,
               ROUND(SUM(value) OVER w, 2) AS trail_sum,
               COUNT(*) OVER w AS trail_cnt
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL '1 hour' PRECEDING
                           AND CURRENT ROW)
    """,
    "q_regression": """
        WITH t AS (
            SELECT event_type, value,
                   (epoch_us(ts)
                    - MIN(epoch_us(ts)) OVER (PARTITION BY event_type))
                   / 3600000000.0 AS th
            FROM events
        )
        SELECT event_type,
               ROUND(regr_slope(value, th), 4) AS slope_per_hour,
               ROUND(regr_intercept(value, th), 4) AS intercept,
               COUNT(*) AS n_events
        FROM t GROUP BY event_type
    """,
    "q_skew_profile": f"""
        WITH cnt AS (
            SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
        ),
        tot AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
                   COUNT(*) AS n_keys FROM cnt
        )
        SELECT o_custkey, cnt,
               ROUND(cnt / CAST(n_rows AS DOUBLE), 6) AS share,
               ROUND(cnt / (n_rows / CAST(n_keys AS DOUBLE)), 4)
                   AS skew_vs_avg,
               n_keys
        FROM cnt CROSS JOIN tot
        ORDER BY cnt DESC, o_custkey
        LIMIT {SKEW_TOP_K}
    """,
    "q_constraint_audit": f"""
        SELECT 'orders_custkey_fk' AS check_name, COUNT(*) AS n_violations
        FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'lineitem_orderkey_fk', COUNT(*)
        FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'customer_pk_unique', COUNT(*) FROM
            (SELECT c_custkey FROM customer
             GROUP BY c_custkey HAVING COUNT(*) > 1)
        UNION ALL
        SELECT 'events_value_nonnegative', COUNT(*)
        FROM events WHERE value < 0 OR value IS NULL
        UNION ALL
        SELECT 'documents_min_length', COUNT(*)
        FROM documents WHERE n_chars < {MIN_DOC_CHARS}
    """,
    "q_histogram": """
        SELECT bucket,
               CAST(bucket * 25.0 AS DOUBLE) AS bucket_lo,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(MIN(value), 2) AS min_value,
               ROUND(MAX(value), 2) AS max_value,
               ROUND(SUM(value), 2) AS sum_value
        FROM (SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bucket, value
              FROM events)
        GROUP BY bucket
    """,
    "q_outliers": """
        SELECT event_id, event_type, value,
               ROUND((value - _mu) / _sd, 4) AS z_score
        FROM events
        JOIN (SELECT event_type, AVG(value) AS _mu,
                     STDDEV_SAMP(value) AS _sd
              FROM events GROUP BY event_type) USING (event_type)
        WHERE (value - _mu) / _sd > 2.0
    """,
    "q_order_revenue_topn": f"""
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = '{Q3_SEGMENT}'
          AND o_orderdate < TIMESTAMP '{Q3_CUTOFF} 00:00:00'
          AND l_shipdate  > TIMESTAMP '{Q3_CUTOFF} 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT {Q3_TOPN}
    """,
    "q_nation_volume": f"""
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = '{Q5_REGION}'
          AND o_orderdate >= TIMESTAMP '{Q5_YEAR_LO} 00:00:00'
          AND o_orderdate <  TIMESTAMP '{Q5_YEAR_HI} 00:00:00'
        GROUP BY n_name
    """,
}
