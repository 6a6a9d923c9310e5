"""Physical-plan regression gates (SURVEY.md §4, 100 TB posture): the
plan Spark picks must stay the plan each operator was designed for —
pushdown reaching the scan, broadcasts staying broadcasts, top-k
staying a heap, no quadratic join sneaking into a scale path."""

from __future__ import annotations

import pytest

from als_hadoop_spark.operators import dedup, relational, similarity
from als_hadoop_spark.plans import (
    assert_broadcast_join,
    assert_no_quadratic_join,
    assert_pushed_filters,
    assert_take_ordered,
    count_shuffles,
    explain_str,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = relational.q_filter(spark, sf_dir)
    assert_pushed_filters(df, "l_quantity", "l_returnflag", "l_linestatus")


def test_scan_project_prunes_columns(spark, sf_dir):
    plan = explain_str(relational.q_scan_project(spark, sf_dir))
    line = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    # 5 of lineitem's 16 columns — pruning reached the parquet reader
    assert "l_comment" not in line and "l_suppkey" not in line


def test_broadcast_join_is_broadcast(spark, sf_dir):
    assert_broadcast_join(relational.q_broadcast_join(spark, sf_dir))


def test_shuffle_join_broadcasts_dims(spark, sf_dir):
    # nation + region broadcast; orders-customer is the only real shuffle
    assert_broadcast_join(relational.q_shuffle_join(spark, sf_dir), n_min=2)


def test_topk_plans_as_heap(spark, sf_dir):
    assert_take_ordered(relational.q_topk(spark, sf_dir))


@pytest.mark.parametrize(
    "build",
    [
        relational.q_range_join,       # bucketized, must never be BNLJ
        dedup.q_dedup_minhash,         # banded equi-join
        dedup.q_dedup_ngram,           # posting-list equi-join
    ],
    ids=["range_join", "minhash", "ngram"],
)
def test_scale_paths_have_no_quadratic_join(spark, sf_dir, build):
    """Pair-MINING scale paths must have no O(n²) join. (The top-k ANN
    searches — q_sim_search/_lsh — broadcast a bounded query set
    against the corpus, a deliberate #queries × n scan, so they are
    out of scope here.)"""
    assert_no_quadratic_join(build(spark, sf_dir))


def test_contamination_broadcasts_probe_grams(spark, sf_dir):
    """The contamination audit must stream the corpus side through a
    broadcast hash join on the probe's 8-gram hashes (the probe set is
    benchmark-sized by definition) — never shuffle corpus n-grams to
    meet the probe, and never degrade to a nested loop."""
    from als_hadoop_spark.operators import ngrams

    df = ngrams.q_contamination(spark, sf_dir)
    assert_broadcast_join(df)
    assert_no_quadratic_join(df)


def test_ngram_lm_topk_is_heap(spark, sf_dir):
    from als_hadoop_spark.operators import ngrams

    assert_take_ordered(ngrams.q_ngram_lm(spark, sf_dir))


def test_trailing_window_single_exchange(spark, sf_dir):
    """The RANGE-frame feature window partitions by user_id — exactly
    one shuffle, and never a quadratic self-join formulation."""
    from als_hadoop_spark.operators import analytics

    df = analytics.q_trailing_window(spark, sf_dir)
    assert count_shuffles(df) <= 1, "trailing window must be one exchange"
    assert_no_quadratic_join(df)


def test_event_funnel_no_window_no_quadratic(spark, sf_dir):
    """The funnel is min-aggregates + user-keyed joins: no per-user
    sequence sort (Window) and no quadratic join may appear."""
    from als_hadoop_spark.operators import analytics

    plan = explain_str(analytics.q_event_funnel(spark, sf_dir))
    assert "Window" not in plan, "funnel must not sort per-user sequences"
    assert_no_quadratic_join(analytics.q_event_funnel(spark, sf_dir))


def test_scd2_single_exchange(spark, sf_dir):
    """Both SCD2 windows share the user_id partitioning — the plan
    must carry exactly one exchange (lag + lead reuse one sort)."""
    from als_hadoop_spark.operators import timeseries

    n = count_shuffles(timeseries.q_scd2_history(spark, sf_dir))
    assert n <= 1, f"scd2 plans {n} shuffles"


def test_banded_candidates_have_no_quadratic_join(spark, sf_dir):
    from als_hadoop_spark.sources import load

    emb = load(spark, sf_dir, "embeddings")
    assert_no_quadratic_join(similarity.lsh_candidates(emb))


def test_transpose_shuffle_budget(spark, sf_dir):
    """The A3 transpose runs in <= 2 exchanges: the composite-key cell
    aggregate + the final suppkey regroup (r7: no MapType roundtrip —
    the naive shape lives in the oracle text, proven by hash-match)."""
    n = count_shuffles(relational.q_transpose_regroup(spark, sf_dir))
    assert n <= 2, f"transpose plans {n} shuffles"


def test_asof_join_is_single_shuffle(spark, sf_dir):
    """The as-of join plans as ONE exchange on the equi-key (union +
    ordered window scan) — never a range/nested-loop join."""
    from als_hadoop_spark.operators import timeseries

    df = timeseries.q_asof_join(spark, sf_dir)
    assert_no_quadratic_join(df)
    # clicks pre-aggregation shuffles on (user_id, ts); the window
    # shuffles on user_id: 2 exchanges total, none quadratic
    assert count_shuffles(df) <= 2, f"asof plans {count_shuffles(df)} shuffles"


def test_time_rollup_is_single_pass(spark, sf_dir):
    """GROUPING SETS rollup: one Expand + one aggregation shuffle, not
    three scans of events."""
    from als_hadoop_spark.operators import timeseries

    import re

    plan = explain_str(timeseries.q_time_rollup(spark, sf_dir))
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.MULTILINE))
    assert n_scans == 1, f"rollup reads events {n_scans} times"
    assert "Expand" in plan


def test_dense_ids_is_pure_jvm(spark, sf_dir):
    """No Python evaluation nodes in the dense-id plan (the round-1
    mapInPandas implementation is gone)."""
    plan = explain_str(relational.q_dense_ids(spark, sf_dir))
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert node not in plan, f"python node {node} in dense_ids plan"


def test_q3_topn_plan_shape(spark, sf_dir):
    """TPC-H Q3 shape: date filters reach the scans, the filtered
    customer dimension broadcasts, and the top-10 is a heap
    (TakeOrderedAndProject), not a global sort."""
    from als_hadoop_spark.operators import analytics

    df = analytics.q_order_revenue_topn(spark, sf_dir)
    assert_pushed_filters(df, "o_orderdate", "l_shipdate", "c_mktsegment")
    assert_broadcast_join(df)
    assert_take_ordered(df)
    assert_no_quadratic_join(df)


def test_q5_volume_plan_shape(spark, sf_dir):
    """TPC-H Q5 shape: all four dimension sides broadcast — the only
    shuffles are the orders⋈lineitem fact join and the bounded final
    aggregate."""
    from als_hadoop_spark.operators import analytics

    df = analytics.q_nation_volume(spark, sf_dir)
    assert_broadcast_join(df, n_min=4)
    assert_no_quadratic_join(df)
    n = count_shuffles(df)
    assert n <= 3, f"q5 plans {n} shuffles"


def test_salted_join_key_carries_salt(spark, sf_dir):
    """The skew-mitigation query must actually join on (key, _salt) —
    if a refactor drops the salt from the join condition the query
    still returns correct rows (it degenerates to the plain join), so
    only the plan can prove the skew split is live."""
    df = relational.q_salted_join(spark, sf_dir)
    plan = explain_str(df)
    assert "_salt" in plan, "salt column missing from physical plan"
    assert_no_quadratic_join(df)


def test_round3_additions_plan_shapes(spark, sf_dir):
    """Plan gates for the round-3 operators: broadcasts where designed,
    bounded shuffle budgets, no quadratic joins."""
    from als_hadoop_spark import streaming
    from als_hadoop_spark.operators import similarity, text, timeseries

    # stream-static enrichment: the dimension side must broadcast
    df = streaming.q_stream_enrich(spark, sf_dir)
    assert_broadcast_join(df)
    assert_no_quadratic_join(df)

    # centroid: exactly the designed exchanges — deliberate spread
    # repartition + ONE per-(label,dim) agg + bounded-output sort — and
    # no more (r6 dropped the per-label array re-assembly from the query
    # output; the array form lives in embed_centroids)
    df = similarity.q_embed_centroid(spark, sf_dir)
    n = count_shuffles(df)
    assert n <= 3, f"centroid plans {n} shuffles"
    assert "Join" not in explain_str(df)
    # the driver hasher can't take nested output — keep the query scalar
    from pyspark.sql import types as T

    assert not any(
        isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        for f in df.schema.fields
    ), "q_embed_centroid output must stay scalar (driver hasher)"

    # nearest-centroid: the K-prototype cross join must ride a
    # BROADCAST nested loop (K×dim doubles shipped to every task — the
    # designed shape; a shuffle-side cartesian would be the regression)
    df = similarity.q_nearest_centroid(spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan

    # gap fill: grid-sized join (spine ⋈ hourly) — no quadratic shape;
    # the fact table feeds exactly one aggregation exchange, everything
    # after runs on the bounded grid
    df = timeseries.q_gap_fill(spark, sf_dir)
    assert_no_quadratic_join(df)

    # sequence packing: ONE data exchange (shard window) that the bin
    # aggregate REUSES (shard ⊂ (shard, bin_id) clustering), plus only
    # the bin-grid output sort — never a second data-sized shuffle
    df = text.q_sequence_pack(spark, sf_dir)
    n = count_shuffles(df)
    assert n <= 2, f"sequence_pack plans {n} shuffles"
    plan = explain_str(df)
    assert "Window" in plan and "Join" not in plan, plan


def test_merge_upsert_compacts_before_join(spark, sf_dir):
    """MERGE changelog apply: BOTH inputs of the full-outer join must
    already be aggregated (one row per key crosses the join) — in the
    logical plan every Join input subtree contains an Aggregate, and
    no quadratic node exists."""
    from als_hadoop_spark.operators import timeseries

    df = timeseries.q_merge_upsert(spark, sf_dir)
    assert_no_quadratic_join(df)
    plan = explain_str(df, "extended")
    phys = plan[plan.find("== Physical Plan ==") :]
    join_pos = phys.find("SortMergeJoin")
    if join_pos == -1:
        join_pos = phys.find("ShuffledHashJoin")
    assert join_pos != -1, phys
    # physical plan prints children after the join node: both sides
    # must show an aggregate below it (struct-max compiles to
    # SortAggregate; Hash/ObjectHash would equally satisfy the shape)
    tree = phys[join_pos : phys.find("(1) Scan")]
    assert tree.count("Aggregate") >= 4, tree  # 2 sides × partial+final


def test_forward_fill_window_runs_on_grid(spark, sf_dir):
    """LOCF: the fact table feeds exactly one aggregation; the
    carry-forward Window sits ABOVE the spine join (grid-sized input),
    and the plan has no quadratic node."""
    from als_hadoop_spark.operators import timeseries

    df = timeseries.q_forward_fill(spark, sf_dir)
    assert_no_quadratic_join(df)
    plan = explain_str(df)
    # both fact scans (spans branch + values branch) feed an immediate
    # aggregate; no third touch of the fact table exists
    assert plan.count("events.parquet") <= 2, plan
    # the Window consumes the joined GRID, not raw facts — in the
    # formatted tree the Window node sits above the spine Join
    assert "Window" in plan and "Join" in plan
    assert plan.find("Window") < plan.find("Join"), plan


def test_zipf_rank_is_distributed(spark, sf_dir):
    """q_zipf_fit must not rank the vocabulary in one task. After the
    round-4 global_ranks rewrite the only Window in the plan is the
    offsets cumsum over the ≤num_partitions-row per-partition counts
    (ordered by _pid); a vocabulary-wide rank window (ordered by
    freq/tok) must never reappear.

    Two layers: (a) the helper's pre-pin plan (pin=False) exposes the
    range exchange that replaces the global sort; (b) the production
    query pins its enumerated frame in a localCheckpoint (both
    consumers read ONE materialization — the layout-consistency
    guarantee), so its plan shows shared ExistingRDD scans instead."""
    from als_hadoop_spark.functions.ids import global_ranks
    from als_hadoop_spark.operators import text
    from pyspark.sql import functions as F

    vocab = spark.createDataFrame(
        [("a", 3), ("b", 2), ("c", 2)], "tok STRING, freq LONG"
    )
    helper_plan = explain_str(
        global_ranks(vocab, [F.col("freq").desc(), F.col("tok")], pin=False)
    )
    assert "rangepartitioning" in helper_plan.lower(), "distributed sort missing"

    plan = explain_str(text.q_zipf_fit(spark, sf_dir))
    assert "localCheckpoint" in plan, "layout pin missing from zipf plan"
    window_lines = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert window_lines, "offsets window vanished — check global_ranks"
    for ln in window_lines:
        assert "_pid" in ln, f"unbounded window not over partition counts: {ln}"
        assert "freq" not in ln and "tok" not in ln, f"vocab-wide window: {ln}"


def test_mixture_temperature_reads_corpus_twice(spark, sf_dir):
    """q_mixture_temperature's rate derivation must not multiply fact
    scans: the pinned L-row count table leaves exactly ONE parquet scan
    in the final plan (the acceptance pass — the count pass lives
    inside the checkpointed lineage), the rates join is a broadcast,
    and no SortMergeJoin appears anywhere."""
    import re

    from als_hadoop_spark.operators import text

    plan = explain_str(text.q_mixture_temperature(spark, sf_dir))
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.MULTILINE))
    assert n_scans == 1, f"fact scan fan-out: {n_scans}"
    assert "localCheckpoint" in plan, "count-table pin missing"
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_winnow_has_no_global_sort(spark, sf_dir):
    """q_winnow_dup's pair output is deterministic per-partition
    (sortWithinPartitions), never range-exchanged into a total order —
    a global sort over a corpus-linear pair set is pure overhead at
    scale (VERDICT r4 #7)."""
    from als_hadoop_spark.operators.dedup import q_winnow_dup
    from als_hadoop_spark.plans import explain_str

    plan = explain_str(q_winnow_dup(spark, sf_dir))
    assert "rangepartitioning" not in plan.lower(), plan


def test_gen_scan_prunes_to_one_shard(spark, sf_dir):
    """q_gen_scan's pushed user_id predicate must prune the custom
    DataSource to ONE planned shard (planning-time pushFilters), and
    the result must be the deterministic 250-user frame."""
    df = relational.q_gen_scan(spark, sf_dir)
    from als_hadoop_spark.sources.generator import USERS_PER_SHARD, register_ratings_gen

    register_ratings_gen(spark)
    pruned = (
        spark.read.format("ratings_gen").option("n_users", 1000).load()
        .filter(f"user_id < {USERS_PER_SHARD}")
    )
    assert pruned.rdd.getNumPartitions() == 1
    rows = df.collect()
    assert len(rows) == USERS_PER_SHARD
    assert all(r["n_ratings"] == 20 for r in rows)


def test_dedup_embed_lsh_has_no_global_sort(spark, sf_dir):
    """q_dedup_embed_lsh's confirmed-pair output is per-partition
    ordered only (VERDICT r8 #7): the pair set is output-sized (12.9 M
    at x100), its consumer is a join, and a total order costs a full
    range Exchange for nothing."""
    from als_hadoop_spark.operators.dedup import q_dedup_embed_lsh
    from als_hadoop_spark.plans import explain_str

    plan = explain_str(q_dedup_embed_lsh(spark, sf_dir))
    assert "rangepartitioning" not in plan.lower(), plan


def test_dv_read_plan_shape(spark, tmp_path):
    """Deletion-vector reads (r11): the predicate still pushes to the
    parquet scan UNDER the DV anti-join, the anti-join is the plan's
    only join (bounded, sidecar-sided), and a table with no masks pays
    NOTHING — its snapshot plan has no join at all."""
    from als_hadoop_spark.plans import (
        assert_no_quadratic_join,
        assert_pushed_filters,
        explain_str,
    )
    from als_hadoop_spark.sources.acid import AcidTable

    t = AcidTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(100)], "k LONG, v STRING"
        ).coalesce(2)
    )
    # unmasked: zero read-side cost — no join node in the plan
    clean = t.snapshot().filter("k >= 50")
    assert "Join" not in explain_str(clean)
    assert_pushed_filters(clean, "k")
    t.set_property("deletionVectors", "true")
    t.delete("k % 10 = 3")
    df = t.snapshot().filter("k >= 50")
    plan = explain_str(df)
    # the mask applies as ONE broadcast anti-join (sidecar side built)
    # — never a shuffle: a sort-merge anti would shuffle the DATA side
    # on (file, position), the exact write-amplification-in-read-
    # clothing DVs exist to avoid
    assert "BroadcastHashJoin LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert_no_quadratic_join(df)
    # pushdown reaches the DATA scan through the anti-join
    assert_pushed_filters(df, "k")
    assert sorted(r["k"] for r in df.collect()) == [
        k for k in range(50, 100) if k % 10 != 3
    ]
