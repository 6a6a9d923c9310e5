"""Core relational surface (SURVEY.md §2 Part C, rows q_scan_project …
q_rmse).

Reference ancestry: the reference implements only scan/parse (A1,
``ALS-Hadoop/ALS/ALS.java:88-93``), group-by vector aggregation (A2/A3,
``ALS/ALS.java:82-150,173-196``), per-key averages (A4,
``ALS/ALS.java:152-171``), counts (A5/A6), dictionary encoding (A7,
``ALS-Hadoop/mapid.py:28-38``), random split (A8, ``split.py:5-19``),
broadcast-hash join (A10/A13, ``ALS/ALS.java:435-477``) and an RMSE
aggregate (A14, ``ALS/ALS.java:423-433``). Everything else here fills
the Part-B gaps (filters, shuffle/semi/anti/range joins, windows,
top-k, set ops, rollup/cube, scalar/array/map/json functions) with pure
built-in Spark so Catalyst plans them (predicate pushdown, partial
aggregation, broadcast selection, AQE).

Scale notes (100 TB posture) are in each docstring; the design rule is:
no driver-side materialization, no unpartitioned windows over big data,
broadcast only provably-small sides.

Float discipline for the DuckDB oracle: per-row arithmetic is IEEE
deterministic and left unrounded; multi-row aggregates are rounded
(sums→2dp, avgs/ratios→4dp) because accumulation order differs between
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ids import dense_ids
from ..functions.joins import range_join_buckets
from ..sources import load


# ---------------------------------------------------------------------------
# scans / filters / projections
# ---------------------------------------------------------------------------

def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: scan + project + cast (ALS-Hadoop/ALS/ALS.java:88-93 parses
    csv, keeps 3 columns, casts). Column pruning reaches the parquet
    reader (ReadSchema lists only 5 of 11 lineitem columns)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("qty"),
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 6
        ).alias("net_price"),
        F.col("l_shipdate").cast("timestamp").alias("ship_ts"),
    )


def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: predicates (range + IN + LIKE + conjunction). All
    four predicates are pushed into the parquet scan (PushedFilters)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 25.0)
        & (F.col("l_returnflag").isin("R", "A"))
        & (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_linestatus") == "F")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------

def q_groupby_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A4 analog — TPC-H Q1 shape: hash aggregate with map-side
    partial (the reference hand-codes this as combiner classes,
    ALS-Hadoop/ALS/ALS.java:132-150; Spark's HashAggregateExec does
    partial→final automatically). 6 groups at any SF → the shuffle
    moves only partial-agg rows, O(partitions×groups)."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_avg_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: per-key average (AverageRatingMapper,
    ALS-Hadoop/ALS/ALS.java:152-171 — which funnels all means into ONE
    vector under key 0, a driver-side bottleneck; here it stays a
    distributed 2-column result)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.count("*").alias("n_events"),
    )


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6: count + count distinct (mapid.py:14-15 set-inserts ids in
    one process; here a distributed partial-distinct aggregate)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count("*").alias("n_orders"),
    )


def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: HyperLogLog++ sketch — the 100 TB replacement for A6's
    exact in-memory sets (mapid.py:14-15 holds all ids in RAM; HLL is
    fixed-size per partition and merges associatively). No oracle:
    approximate results don't hash-match; pytest asserts relative error
    vs exact instead."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custs"),
        F.count("*").alias("n_orders"),
    )


def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: grouping sets. CUBE over (returnflag, linestatus)
    = 4 grouping sets in one shuffle (Expand + single hash agg)."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10/A13: broadcast hash join — the reference ships the small side
    to every task via DistributedCache + an in-task hash map
    (ALS-Hadoop/ALS/ALS.java:380-383, SolveExplicitFeedbackMapper.java:
    67-90); Spark's torrent broadcast + BroadcastHashJoinExec is the
    native form. `part` is a dimension (200 rows/SF-step) — always
    broadcast, never shuffled."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(F.col("p_size") <= 25)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_shuffle_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: multi-way equi-join. orders⋈customer shuffles on
    custkey (both sides large at scale → sort-merge/shuffled-hash, AQE
    decides); nation and region stay broadcast. At 100 TB, orders and
    customer would be bucketed on custkey to eliminate this exchange."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join via ``functions.scale.salted_join``.
    ``events.event_type`` has 5 values over the whole table — the
    maximally skewed join key: a plain shuffle join on it lands each
    key's entire row set on ONE reducer, so 5 tasks do all the work no
    matter how many executors exist. Salting rewrites the key to
    (key, hash(row) % 16), spreading every hot key across 16 reducers;
    the small side is replicated 16× (cheap — it is per-key aggregates).
    Result set is IDENTICAL to the unsalted join, so this carries a
    full oracle: events joined to per-type averages, keeping rows above
    their type mean. Use when the skew is too coarse for AQE's
    size-based split (e.g. compute-heavy rows) or the small side is too
    big to broadcast."""
    from als_hadoop_spark.functions.scale import salted_join

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("avg_v"))
    joined = salted_join(ev, dim, on="event_type", n_salts=16)
    return (
        joined.filter(F.col("value") > F.col("avg_v"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_above"),
            F.round(F.sum("value"), 2).alias("sum_above"),
        )
    )


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: semi/anti join (EXISTS / NOT EXISTS). The reference's
    only filter is its join-miss drop (ALS-Hadoop/ALS/ALS.java:460-464)
    — a semi-join in disguise. Left-semi/anti never materialize the
    right side's columns.

    Scale shape: existence tests are insensitive to right-side
    duplicates, so orders collapses to its distinct key set FIRST
    (one aggregate shuffle, ~15× fewer rows at TPC-H multiplicities)
    and is pinned — the semi and the anti probe share that one pass
    instead of each re-shuffling the raw fact, and the shrunken key
    set is small enough for AQE to broadcast both probes (no customer
    shuffle at all below threshold)."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", F.lit("with_orders").alias("grp"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", F.lit("no_orders").alias("grp"))
    )
    return semi.unionAll(anti)


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: non-equi (range) self-join — pairs of events within
    60 s of each other. A naive theta join is BroadcastNestedLoopJoin
    (O(n²), dies at scale); we bucketize ts into 60-s bins and turn it
    into an equi-join on bucket id + residual filter — see
    functions/joins.py. Count pairs per left event_type."""
    ev = load(spark, sf_dir, "events")
    pairs = range_join_buckets(
        ev.select(F.col("ts").alias("ts1"), F.col("event_type")),
        ev.select(F.col("ts").alias("ts2")),
        left_ts="ts1",
        right_ts="ts2",
        window_seconds=60,
    )
    return pairs.groupBy("event_type").agg(F.count("*").alias("n_pairs"))


# ---------------------------------------------------------------------------
# windows / sort / top-k
# ---------------------------------------------------------------------------

def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: ranking windows — top-3 orders per customer. The
    window partitions by o_custkey so it scales horizontally (one
    shuffle on the partition key, no global sort)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: analytic windows with frames — running sum + lag/lead
    per user ordered by time. Partitioned by user_id → scales; ordering
    tie-broken by event_id so results are deterministic."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.round(F.sum("value").over(frame), 4).alias("running_sum"),
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.row_number().over(w).alias("seq"),
    )


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: global top-k (cf. the unused Vectors.topKElements in
    the reference's vendored mahout jar, SURVEY.md §2 Part B). Spark
    plans orderBy+limit as TakeOrderedAndProject — per-partition heap
    of k, no global sort, no full shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: UNION / INTERSECT / EXCEPT over key projections,
    tagged and stacked into one result.

    Scale shape: the three set operators compile naively to three
    independent distinct/join pipelines — six shuffles of the same two
    inputs. Instead, ONE side-tagged aggregate (groupBy key, count per
    side — a single shuffle with map-side partials) computes the
    presence table every operator is a pure filter of: union = every
    key, intersect = present in both, except = in customer only
    (c_custkey is unique, so EXCEPT ALL multiplicity is 1). The
    presence table is pinned (lazy localCheckpoint) so the three
    consumers share the one shuffle instead of re-running it."""
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    presence = (
        c.select("k", F.lit(1).alias("_c"), F.lit(0).alias("_o"))
        .unionAll(o.select("k", F.lit(0).alias("_c"), F.lit(1).alias("_o")))
        .groupBy("k")
        .agg(F.sum("_c").alias("n_c"), F.sum("_o").alias("n_o"))
        .localCheckpoint(eager=False)
    )
    union = presence.select(F.lit("union").alias("op"), "k")
    inter = presence.filter((F.col("n_c") > 0) & (F.col("n_o") > 0)).select(
        F.lit("intersect").alias("op"), "k"
    )
    diff = presence.filter((F.col("n_c") > 0) & (F.col("n_o") == 0)).select(
        F.lit("except").alias("op"), "k"
    )
    return union.unionAll(inter).unionAll(diff)


def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: ordered string aggregation (LISTAGG ... WITHIN GROUP,
    SQL:2016) — per region, the member nations as one ordered
    comma-joined string. Spark 4 ships `listagg` natively; the WITHIN
    GROUP order makes the result deterministic, which a bare
    collect_list is not. Scale note: string aggregation is only sane on
    BOUNDED groups (here ≤ 25 nations/region) — the aggregate buffer
    holds the whole group string; unbounded keys belong in q_token_topk
    style count-aggregates instead. Dimension join is broadcast."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    return (
        joined.groupBy("r_name")
        .agg(
            F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias(
                "nations"
            ),
            F.count("*").alias("n_nations"),
        )
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# scalar / array / map / json functions
# ---------------------------------------------------------------------------

def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: string/date/math scalar functions, all JVM-side
    (whole-stage codegen; zero Python in the row path). spread=True:
    the testdata's single-row-group files make the scan stage one task,
    and 10 expressions × 150k rows is compute-bound — one small shuffle
    buys 32-way evaluation (3.1 s → 0.8 s at sf0.1)."""
    o = load(spark, sf_dir, "orders", spread=True)
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("pri3"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("tag"),
        F.length("o_orderpriority").alias("pri_len"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_2002"),
        F.round(F.sqrt("o_totalprice"), 4).alias("sqrt_price"),
        F.round(F.abs(F.col("o_totalprice") - 1000.0), 6).alias("abs_diff"),
        F.round(F.pow(F.col("o_totalprice") / 10000.0, 2), 6).alias("pow_ratio"),
    )


def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4's VARIANT type: props parses
    once into the binary variant encoding (`parse_json`) and fields
    come out with `variant_get` / `try_variant_get` — the
    schema-on-read path for ragged JSON where `from_json` would force
    one global schema (and where a 100 TB events table wants the
    parse to happen once, at ingest, with cheap typed access after).

    The probe extracts an existing path (typed int), a MISSING path
    through the try_ variant (NULL, not an error — proven by counting
    them), and a type-coerced read of the same field as string; one
    bounded event_type aggregate. All outputs integer-exact, so the
    DuckDB oracle (json_extract twins) hash-matches."""
    ev = load(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    fields = v.select(
        "event_type",
        F.variant_get("v", "$.k", "int").alias("k"),
        F.try_variant_get("v", "$.absent", "int").alias("missing"),
        F.variant_get("v", "$.k", "string").alias("k_str"),
    )
    return (
        fields.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.count("missing").alias("n_absent_hits"),
            F.sum(F.length("k_str")).alias("sum_kstr_len"),
        )
        .orderBy("event_type")
    )


def q_array_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: JSON extraction + map/array construction. props is a
    JSON string; from_json parses it JVM-side (no UDF). Aggregates are
    integer-exact so the oracle hash is stable."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k INT").alias("p"),
    ).select(
        "event_type",
        F.col("p.k").alias("k"),
        F.map_from_arrays(F.array(F.lit("k")), F.array(F.col("p.k"))).alias("m"),
        F.array(F.col("p.k"), F.col("p.k") * 2).alias("arr"),
    )
    return (
        parsed.select(
            "event_type",
            "k",
            F.element_at("m", "k").alias("k_from_map"),
            F.element_at("arr", 2).alias("k_doubled"),
            F.size("arr").alias("arr_len"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k_doubled").alias("max_k2"),
            F.countDistinct("k").alias("n_distinct_k"),
            F.sum("arr_len").alias("sum_len"),
        )
    )


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap + north-star: array math on the embedding column via
    built-in higher-order functions (F.aggregate/F.transform — codegen,
    no Python). Computes L2 norm and mean of each vector."""
    emb = load(spark, sf_dir, "embeddings", spread=True)
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    total = F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        F.round(total / F.size("embedding"), 6).alias("mean_val"),
    )


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: pivot (cross-tab). Pivot values are FIXED, not
    discovered — a dynamic pivot needs a driver-side distinct pass
    before planning, which is the anti-pattern at scale; with pinned
    values the whole thing is one hash aggregate."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnsRenamed({"F": "qty_F", "O": "qty_O"})
    )


#: percentile levels for q_percentiles (shared by engine and oracle)
PCTL_QS = (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: EXACT percentiles (continuous interpolation) per
    group, in the form that survives 100 TB.

    Spark's ``percentile()`` aggregate buffers every group value in the
    aggregation buffer — with 3 order-status groups over 10¹¹ rows
    that is 3 executor-OOM buffers. A low-cardinality window sort has
    the same problem (one task per group). ``grouped_quantiles``
    (functions/quantiles.py) instead range-repartitions once WITHOUT
    sorting, locates each quantile's two bracketing global ranks from
    per-chunk counts, locally sorts ONLY the chunks containing a
    target rank, and interpolates — reproducing
    percentile()/quantile_cont bit-for-bit at a cost of one shuffle
    plus a sort of ~(quantiles × groups × 2) chunks.
    """
    from ..functions.quantiles import grouped_quantiles

    o = load(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    gq = grouped_quantiles(o, ["o_orderstatus"], "o_totalprice", PCTL_QS)
    wide = gq.groupBy("o_orderstatus").agg(
        *[
            F.round(F.max(F.when(F.col("q_name") == name, F.col("value"))), 4).alias(name)
            for name, _ in PCTL_QS
        ],
        F.first("n").alias("n"),
    )
    return wide.select("o_orderstatus", "p50", "p90", "p99", "n")


def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: statistical aggregates — stddev/variance (sample),
    covariance and Pearson correlation between price and quantity per
    return flag. All built-in one-pass distributed aggregates."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev("l_extendedprice"), 2).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("cov_pq"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        F.count("*").alias("n"),
    )


def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-B gap: correlated scalar subquery (TPC-H Q17 shape) —
    lineitems of one brand whose quantity falls below 20% of that
    part's average quantity. The DuckDB oracle twin keeps the
    correlated-subquery text verbatim; r11's decorrelated Spark plan
    (Catalyst's RewriteCorrelatedScalarSubquery → aggregate + join)
    still scanned lineitem TWICE — once joined against the brand
    parts, once fully re-aggregated per part for the threshold.

    r12 single-pass form (guide §2.4, VERDICT r11 #7): ``p_partkey``
    is part's primary key and the brand filter selects WHOLE parts,
    so every lineitem of a selected part survives the equi-join
    exactly once — the per-part AVG over the join output is therefore
    identical to the subquery's per-part AVG over all of lineitem.
    One window (AVG OVER partkey) over the joined-and-filtered rows
    replaces the second scan and its fact-sized aggregate shuffle:
    ONE lineitem scan, one window exchange over the brand's ~1/1000
    slice. Measured at ×100 (interleaved A/B, 10 rounds each): 3.87 s
    median → 1.15 s (3.4×), vs-DuckDB ratio 4.1× → ~1.2×; result
    bit-identical and oracle hash green at every SF."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM (
          SELECT l_extendedprice, l_quantity,
                 0.2 * AVG(l_quantity) OVER (PARTITION BY l_partkey) AS thr
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_brand = 'Brand#2'
        )
        WHERE l_quantity < thr
        """
    )


#: quantile probed by the approx-percentile sketch query
APPROX_PCTL_Q = 0.9
#: relative accuracy knob for percentile_approx (10000 ≈ 0.01% rank error)
APPROX_PCTL_ACC = 10000


def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch percentiles: per-group p90 via percentile_approx
    (Greenwald-Khanna quantile summary) — the ONE-PASS MERGEABLE
    companion to the exact rank-based q_percentiles. The GK summary is
    O(1/ε) memory per group regardless of row count and merges
    associatively map-side, so at 100 TB this runs as a plain hash
    aggregate while the exact form pays a range repartition. Sketch
    contents are engine-specific → rows-only; pytest gates the result
    against the exact interpolated percentile within rank tolerance."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx(
            "o_totalprice", F.lit(APPROX_PCTL_Q), F.lit(APPROX_PCTL_ACC)
        ).alias("p90_approx"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# dictionary encoding / split / metric
# ---------------------------------------------------------------------------

def q_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: dictionary-encode raw keys to dense 0..n-1 ints
    (ALS-Hadoop/mapid.py:28-38 enumerates a driver-side set — O(n) RAM
    in one process). Scale-safe re-expression in functions/ids.py:
    range-repartition + per-partition enumeration + offset join; no
    unpartitioned window, no driver set."""
    c = load(spark, sf_dir, "customer")
    mapping = dense_ids(c, "c_custkey")
    return mapping.select(F.col("c_custkey"), F.col("dense_id"))


def q_gen_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-source scan (r7, VERDICT r6 #10): drives the Spark 4
    Python DataSource (sources/generator.py — the engine's "write a
    new source format" extension point) through the DECLARED query
    surface, not just pytest: register, scan with a user_id predicate
    that pushFilters prunes to ONE generated shard at planning time
    (user_id < USERS_PER_SHARD: shard 0 of 4), and aggregate per user.

    ``sf_dir`` is unused — the source IS the data (deterministic
    (seed, shard) generation; any run reproduces identical rows, so
    the rows-only driver check sees a stable 250-row frame). No DuckDB
    oracle by nature: the subject under test is the Spark extension
    API itself. Plan gate in tests/test_plans.py asserts the pruning;
    tests/test_sources.py pins determinism and pushdown semantics."""
    from ..sources.generator import USERS_PER_SHARD, register_ratings_gen

    register_ratings_gen(spark)
    df = (
        spark.read.format("ratings_gen")
        .option("n_users", 1000)
        .option("seed", 42)
        .load()
    )
    return (
        df.filter(F.col("user_id") < USERS_PER_SHARD)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_ratings"),
            F.round(F.avg("rating"), 4).alias("avg_rating"),
            F.countDistinct("item_id").alias("n_items"),
        )
        .orderBy("user_id")
    )


def q_transpose_regroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: matrix transpose as regroup (TransposeMapper +
    MergeUserVectorsReducer, ALS-Hadoop/ALS/ALS.java:173-196). The
    reference materializes per-item sparse rows, flat-maps them back
    out, and regroups by user; on a relational engine the SAME
    semantics are two aggregates over the (partkey, suppkey) CELL
    table — transposing a matrix stored as coordinates is free. Dup
    (part,supp) pairs are pre-summed (the reference is inconsistent:
    sum at ALS.java:137,146 vs merge at :191 — we standardize on sum,
    SURVEY.md §7.3.5).

    r7 rewrite (VERDICT r6 #7): rounds 1-6 faithfully materialized the
    MapType row and exploded it back — ~11× DuckDB at ×100 purely from
    building and unpacking corpus-sized maps the algebra never needed.
    The demonstration now lives in the ORACLE text (DuckDB
    map_from_entries → map_keys/map_values roundtrip), so the
    hash-match PROVES the direct plan equals the naive A3 shape — the
    repo's established rewrite-proof-via-oracle pattern (SURVEY §5.6).
    Plan: ONE composite-key hash aggregate (partial→final) builds the
    cells, one bounded regroup on suppkey — two exchanges, no map, no
    explode."""
    li = load(spark, sf_dir, "lineitem")
    cells = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    return cells.groupBy("l_suppkey").agg(
        F.round(F.sum("qty"), 2).alias("sum_qty"),
        F.count("*").alias("n_parts"),
    )


# Deterministic-split bucket: integer from the first 8 hex digits of
# md5(orderkey) — the fragment is dialect-shared (Spark F.expr and
# DuckDB run the identical string), so the split is bit-reproducible
# across engines, retries, and partition layouts.
_HASH_SPLIT_BUCKET = " + ".join(
    f"CAST(instr('0123456789abcdef', "
    f"substring(md5(CAST(o_orderkey AS STRING)), {j + 1}, 1)) - 1 AS BIGINT)"
    f" * {16 ** (7 - j)}"
    for j in range(8)
)


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8's train/probe split, scale-grade: DETERMINISTIC 80/20
    assignment by content hash of the key (first 8 md5 hex digits mod
    100 < 80 → train) instead of an RNG draw. This is the split a
    100 TB pipeline actually wants — a re-run after a lost executor, a
    different partition layout, or a different engine assigns every
    row identically, where randomSplit's per-partition RNG streams do
    not. Kept alongside q_random_split (reference A8 parity,
    ALS-hadoop/split.py:5-19); cross-engine deterministic → fully
    oracle-checked (VERDICT r4 #8). One scan, one 2-key aggregate."""
    o = load(spark, sf_dir, "orders")
    return (
        o.selectExpr(
            f"CASE WHEN ({_HASH_SPLIT_BUCKET}) % 100 < 80 "
            "THEN 'train' ELSE 'probe' END AS split"
        )
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_random_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: seeded Bernoulli train/probe split (ALS-Hadoop/split.py:5-19,
    p=0.8/0.2 seed 1). Spark's randomSplit has the same per-row
    independent-draw semantics. Engine-nondeterministic across
    engines → no oracle; pytest asserts the partition invariants
    (disjoint, exhaustive, ~80/20)."""
    o = load(spark, sf_dir, "orders")
    train, probe = o.randomSplit([0.8, 0.2], seed=1)
    return spark.createDataFrame(
        [("train", train.count()), ("probe", probe.count())], "split STRING, n LONG"
    )


def q_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: RMSE aggregate (ALS-Hadoop/ALS/ALS.java:423-433 scans error
    files single-threaded in the driver; here one distributed agg).
    Error = o_totalprice vs the global-mean predictor; the mean is
    computed as a 1-row agg and broadcast-cross-joined (NOT a window
    over an unpartitioned frame, which would serialize)."""
    o = load(spark, sf_dir, "orders")
    mean = o.agg(F.avg("o_totalprice").alias("mean_price"))
    err = o.crossJoin(F.broadcast(mean)).select(
        (F.col("o_totalprice") - F.col("mean_price")).alias("err")
    )
    return err.agg(F.round(F.sqrt(F.avg(F.pow("err", F.lit(2)))), 4).alias("rmse"))


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank, cume_dist,
    ntile(4) of each event's value within its user's history
    (completes the window family: ranking = q_window_rank, analytic
    frames = q_window_running / q_trailing_window).

    Partition key is user_id (maximal cardinality — each sort is one
    user's events, balanced at any scale). The ORDER BY carries
    event_id as a tiebreak so ntile's positional assignment is a total
    order — without it, equal values make ntile engine-dependent."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic semantics pinned end to end: a NULLable
    group key (error events → NULL), null-skipping aggregates
    (count(col) vs count(*), avg over a column nulled below a
    threshold), and coalesce defaulting — the NULL behaviors every
    engine must agree on exactly (and the classic porting bug source).
    All derivation is per-row CASE logic fused into the scan; one
    bounded-key aggregate."""
    ev = load(spark, sf_dir, "events")
    grp = F.when(F.col("event_type") != "error", F.col("event_type"))
    nval = F.when(F.col("value") >= 50.0, F.col("value"))
    return (
        ev.select(grp.alias("grp"), nval.alias("nval"))
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("nval").alias("n_nonnull"),
            F.round(F.avg("nval"), 4).alias("avg_nonnull"),
            F.round(F.sum(F.coalesce("nval", F.lit(0.0))), 2).alias(
                "sum_defaulted"
            ),
        )
    )


def q_safe_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant expression surface: ``try_cast`` on a
    JSON-extracted field and ``try_divide`` with a data-dependent zero
    denominator — the TRY-function family that keeps a 100 TB batch
    alive when one malformed row would otherwise kill the stage (under
    ANSI mode a plain CAST/division throws). NULL-on-failure semantics
    are pinned against the oracle's explicit NULLIF/CASE rewrites.
    Per-row expressions fused into the scan; one bounded aggregate."""
    ev = load(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') AS INT)")
    return (
        ev.select("event_type", "value", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum(F.when(F.col("k") == 0, 1).otherwise(0)).alias("n_zero_k"),
            F.round(F.avg(F.expr("try_divide(value, k)")), 4).alias("avg_ratio"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "q_window_distribution": q_window_distribution,
    "q_null_semantics": q_null_semantics,
    "q_safe_casts": q_safe_casts,
    "q_scan_project": q_scan_project,
    "q_filter": q_filter,
    "q_groupby_sum": q_groupby_sum,
    "q_avg_per_key": q_avg_per_key,
    "q_count_distinct": q_count_distinct,
    "q_approx_count_distinct": q_approx_count_distinct,
    "q_rollup_cube": q_rollup_cube,
    "q_broadcast_join": q_broadcast_join,
    "q_shuffle_join": q_shuffle_join,
    "q_salted_join": q_salted_join,
    "q_semi_anti_join": q_semi_anti_join,
    "q_range_join": q_range_join,
    "q_window_rank": q_window_rank,
    "q_window_running": q_window_running,
    "q_topk": q_topk,
    "q_set_ops": q_set_ops,
    "q_listagg": q_listagg,
    "q_scalar_funcs": q_scalar_funcs,
    "q_array_map_json": q_array_map_json,
    "q_variant_json": q_variant_json,
    "q_array_funcs": q_array_funcs,
    "q_pivot": q_pivot,
    "q_percentiles": q_percentiles,
    "q_stats_agg": q_stats_agg,
    "q_dense_ids": q_dense_ids,
    "q_transpose_regroup": q_transpose_regroup,
    "q_gen_scan": q_gen_scan,
    "q_hash_split": q_hash_split,
    "q_random_split": q_random_split,
    "q_rmse": q_rmse,
    "q_correlated_subquery": q_correlated_subquery,
    "q_approx_percentile": q_approx_percentile,
}

ORACLES = {
    "q_hash_split": f"""
        SELECT split, CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT CASE WHEN ({_HASH_SPLIT_BUCKET}) % 100 < 80
                   THEN 'train' ELSE 'probe' END AS split
            FROM orders
        ) GROUP BY split
    """,
    "q_variant_json": """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT))
                    AS BIGINT) AS sum_k,
               CAST(COUNT(CAST(json_extract_string(props, '$.absent') AS INT))
                    AS BIGINT) AS n_absent_hits,
               CAST(SUM(LENGTH(json_extract_string(props, '$.k')))
                    AS BIGINT) AS sum_kstr_len
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q_window_distribution": """
        SELECT event_id, user_id, value,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cume,
               ntile(4) OVER w AS quartile
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
    "q_safe_casts": """
        WITH t AS (
            SELECT event_type, value,
                   TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               CAST(SUM(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero_k,
               ROUND(AVG(value / NULLIF(k, 0)), 4) AS avg_ratio
        FROM t
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q_null_semantics": """
        SELECT grp,
               COUNT(*) AS n_rows,
               COUNT(nval) AS n_nonnull,
               ROUND(AVG(nval), 4) AS avg_nonnull,
               ROUND(SUM(COALESCE(nval, 0.0)), 2) AS sum_defaulted
        FROM (
            SELECT CASE WHEN event_type != 'error' THEN event_type END AS grp,
                   CASE WHEN value >= 50.0 THEN value END AS nval
            FROM events
        )
        GROUP BY grp
    """,
    "q_correlated_subquery": """
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#2'
          AND l_quantity < (
              SELECT 0.2 * AVG(l2.l_quantity)
              FROM lineitem l2 WHERE l2.l_partkey = p_partkey
          )
    """,
    "q_scan_project": """
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS DOUBLE) AS qty,
               ROUND(l_extendedprice * (1.0 - l_discount), 6) AS net_price,
               CAST(l_shipdate AS TIMESTAMP) AS ship_ts
        FROM lineitem
    """,
    "q_filter": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
        FROM lineitem
        WHERE l_quantity >= 25.0
          AND l_returnflag IN ('R', 'A')
          AND l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_linestatus = 'F'
    """,
    "q_groupby_sum": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_avg_per_key": """
        SELECT event_type,
               ROUND(AVG(value), 4) AS avg_value,
               ROUND(SUM(value), 2) AS sum_value,
               COUNT(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
    "q_count_distinct": """
        SELECT COUNT(DISTINCT o_custkey) AS n_custs,
               COUNT(DISTINCT o_orderstatus) AS n_statuses,
               COUNT(*) AS n_orders
        FROM orders
    """,
    "q_rollup_cube": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q_broadcast_join": """
        SELECT p_brand,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size <= 25
        GROUP BY p_brand
    """,
    "q_shuffle_join": """
        SELECT r_name, n_name,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "q_salted_join": """
        WITH dim AS (
            SELECT event_type, AVG(value) AS avg_v
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               COUNT(*) AS n_above,
               ROUND(SUM(e.value), 2) AS sum_above
        FROM events e JOIN dim d ON e.event_type = d.event_type
        WHERE e.value > d.avg_v
        GROUP BY e.event_type
    """,
    "q_semi_anti_join": """
        SELECT c_custkey, c_name, 'with_orders' AS grp
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT c_custkey, c_name, 'no_orders' AS grp
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "q_range_join": """
        SELECT e1.event_type, COUNT(*) AS n_pairs
        FROM events e1
        JOIN events e2
          ON e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 60 SECOND
        GROUP BY e1.event_type
    """,
    "q_window_rank": """
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER w AS rn,
                   RANK() OVER w AS rnk,
                   DENSE_RANK() OVER w AS drnk
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        ) WHERE rn <= 3
    """,
    "q_window_running": """
        SELECT event_id, user_id, value,
               ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum,
               LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
               LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
        FROM events
    """,
    "q_topk": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 10
    """,
    "q_set_ops": """
        SELECT 'union' AS op, k FROM (
            SELECT c_custkey AS k FROM customer UNION SELECT o_custkey FROM orders)
        UNION ALL
        SELECT 'intersect' AS op, k FROM (
            SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)
        UNION ALL
        SELECT 'except' AS op, k FROM (
            SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
    """,
    "q_listagg": """
        SELECT r_name,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               CAST(COUNT(*) AS BIGINT) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name
    """,
    "q_scalar_funcs": """
        SELECT o_orderkey,
               UPPER(SUBSTRING(o_orderpriority, 1, 3)) AS pri3,
               CONCAT(o_orderstatus, '-', o_orderpriority) AS tag,
               LENGTH(o_orderpriority) AS pri_len,
               EXTRACT(YEAR FROM o_orderdate) AS o_year,
               EXTRACT(MONTH FROM o_orderdate) AS o_month,
               DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
               ROUND(SQRT(o_totalprice), 4) AS sqrt_price,
               ROUND(ABS(o_totalprice - 1000.0), 6) AS abs_diff,
               ROUND(POW(o_totalprice / 10000.0, 2), 6) AS pow_ratio
        FROM orders
    """,
    "q_array_map_json": """
        -- DuckDB SUM(int) returns HUGEINT (int128); Spark returns BIGINT.
        -- Explicit casts so a type-tagged value hash matches (VERDICT r1 #2).
        SELECT event_type,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               CAST(MAX(k * 2) AS INT) AS max_k2,
               CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k,
               CAST(SUM(2) AS BIGINT) AS sum_len
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS INT) AS k
              FROM events)
        GROUP BY event_type
    """,
    "q_array_funcs": """
        SELECT vec_id, label,
               len(embedding) AS dim,
               ROUND(SQRT(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
               ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
                     / len(embedding), 6) AS mean_val
        FROM embeddings
    """,
    "q_pivot": """
        SELECT l_returnflag,
               ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F,
               ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "q_percentiles": """
        SELECT o_orderstatus,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        GROUP BY o_orderstatus
    """,
    "q_stats_agg": """
        SELECT l_returnflag,
               ROUND(stddev_samp(l_extendedprice), 2) AS sd_price,
               ROUND(var_samp(l_quantity), 4) AS var_qty,
               ROUND(covar_samp(l_extendedprice, l_quantity), 2) AS cov_pq,
               ROUND(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "q_dense_ids": """
        SELECT c_custkey,
               CAST(DENSE_RANK() OVER (ORDER BY c_custkey) - 1 AS BIGINT) AS dense_id
        FROM (SELECT DISTINCT c_custkey FROM customer)
    """,
    "q_transpose_regroup": """
        -- the NAIVE A3 shape on purpose: build per-partkey sparse rows
        -- {suppkey: qty} as a real MAP, unpack them back out, regroup.
        -- The Spark engine runs the direct two-aggregate rewrite; the
        -- hash-match against this text proves the rewrite exact.
        WITH cells AS (
            SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ), rows_ AS (
            SELECT l_partkey,
                   map_from_entries(list(struct_pack(k := l_suppkey,
                                                     v := qty))) AS row
            FROM cells GROUP BY l_partkey
        ), back AS (
            SELECT l_partkey,
                   unnest(map_keys(row)) AS l_suppkey,
                   unnest(map_values(row)) AS qty
            FROM rows_
        )
        SELECT l_suppkey,
               ROUND(SUM(qty), 2) AS sum_qty,
               COUNT(*) AS n_parts
        FROM back GROUP BY l_suppkey
    """,
    "q_rmse": """
        SELECT ROUND(SQRT(AVG(POW(o_totalprice -
                   (SELECT AVG(o_totalprice) FROM orders), 2))), 4) AS rmse
        FROM orders
    """,
}
