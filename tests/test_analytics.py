"""Invariant + plan gates for the round-3 profiling/compaction surface
(q_latest_by_key, q_histogram, q_outliers, q_tfidf, q_pii_scrub) —
value-level correctness is gated by the DuckDB oracle harness; these
tests pin semantics the oracle can't see (tie-breaks on synthetic
input, plan shapes, the zero-match regex path)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from als_hadoop_spark.operators.analytics import q_histogram, q_outliers
from als_hadoop_spark.operators.text import (
    SCRUB_LEXICON,
    TFIDF_TOP_K,
    q_pii_scrub,
    q_tfidf,
)
from als_hadoop_spark.operators.timeseries import q_latest_by_key
from als_hadoop_spark.plans import assert_broadcast_join, count_shuffles, explain_str
from als_hadoop_spark.sources import load


def test_latest_by_key_tie_break(spark, tmp_path):
    """Equal timestamps resolve to the larger event_id — the struct-max
    aggregate must order (ts, event_id) exactly like the documented
    ORDER BY ts DESC, event_id DESC."""
    rows = [
        (1, "2024-01-01 10:00:00", 7, "a", 1.0),
        (2, "2024-01-01 10:00:00", 7, "b", 2.0),   # same ts, higher id wins
        (3, "2024-01-01 09:00:00", 7, "c", 3.0),
        (4, "2024-01-01 09:00:00", 8, "d", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["user_id"]: (r["event_id"], r["event_type"])
        for r in q_latest_by_key(spark, str(tmp_path)).collect()
    }
    assert got == {7: (2, "b"), 8: (4, "d")}


def test_latest_by_key_is_one_agg_no_window(spark, sf_dir):
    """The compaction must plan as a single partial+final hash
    aggregate — exactly one shuffle, no Window sort anywhere."""
    df = q_latest_by_key(spark, sf_dir)
    assert count_shuffles(df) == 1
    assert "Window" not in explain_str(df)


def test_histogram_partitions_the_data(spark, sf_dir):
    """Buckets tile the value range: counts sum to the table total and
    every row's min/max sit inside [bucket_lo, bucket_lo + width)."""
    rows = q_histogram(spark, sf_dir).collect()
    total = load(spark, sf_dir, "events").count()
    assert sum(r["n"] for r in rows) == total
    for r in rows:
        assert r["bucket_lo"] <= r["min_value"] <= r["max_value"] < r["bucket_lo"] + 25.0


def test_outliers_broadcast_and_threshold(spark, sf_dir):
    df = q_outliers(spark, sf_dir)
    assert_broadcast_join(df)
    assert df.filter(F.col("z_score") <= 2.0).count() == 0


def test_tfidf_topk_shape(spark, sf_dir):
    """Per-doc groups emit ≤ K rows with dense ranks 1..K and
    non-increasing scores within each doc."""
    rows = q_tfidf(spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append((r["rnk"], r["tfidf"]))
    assert per_doc
    for doc, rs in per_doc.items():
        rs.sort()
        assert [rk for rk, _ in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TFIDF_TOP_K
        scores = [s for _, s in rs]
        assert scores == sorted(scores, reverse=True)


def test_approx_percentile_within_rank_tolerance(spark, sf_dir):
    """The GK sketch's p90 must land within the exact p89..p91 value
    band per group — the sketch's documented rank-error contract, at
    far tighter accuracy than the 1/ACC bound requires."""
    from als_hadoop_spark.operators.relational import q_approx_percentile

    got = {
        r["o_orderstatus"]: r["p90_approx"]
        for r in q_approx_percentile(spark, sf_dir).collect()
    }
    o = load(spark, sf_dir, "orders")
    band = {
        r["o_orderstatus"]: (r["lo"], r["hi"])
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, 0.89)").alias("lo"),
            F.expr("percentile(o_totalprice, 0.91)").alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(band)
    for k, v in got.items():
        lo, hi = band[k]
        assert lo <= v <= hi, (k, v, lo, hi)


def test_correlated_subquery_decorrelates(spark, sf_dir):
    """Catalyst must rewrite the scalar subquery into an aggregate +
    join — the physical plan may not contain a per-row subquery node."""
    from als_hadoop_spark.operators.relational import q_correlated_subquery
    from als_hadoop_spark.plans import explain_str

    plan = explain_str(q_correlated_subquery(spark, sf_dir))
    assert "Subquery" not in plan, "subquery survived into the physical plan"
    assert "HashAggregate" in plan


def test_pii_scrub_bytes_and_zero_pattern(spark, sf_dir):
    """The scrubbed-text sha256 equals a Python re-scrub of the same
    doc (the hash really is over the redacted bytes), and the digit-run
    pattern matches nothing in the synthetic corpus (zero-path pin)."""
    docs = {r["doc_id"]: r["text"] for r in load(spark, sf_dir, "documents").limit(50).collect()}
    out = {r["doc_id"]: r for r in q_pii_scrub(spark, sf_dir).collect()}
    assert all(r["n_pattern_hits"] == 0 for r in out.values())
    assert any(r["n_lexicon_hits"] > 0 for r in out.values())
    for doc_id, text in docs.items():
        toks = text.split(" ")
        scrubbed = " ".join("[REDACTED]" if t in SCRUB_LEXICON else t for t in toks)
        want = hashlib.sha256(scrubbed.encode()).hexdigest()
        assert out[doc_id]["scrubbed_hash"] == want
        assert out[doc_id]["n_lexicon_hits"] == sum(t in SCRUB_LEXICON for t in toks)


def test_skew_profile_shares_and_order(spark, sf_dir):
    from als_hadoop_spark.operators import analytics

    rows = analytics.q_skew_profile(spark, sf_dir).collect()
    assert len(rows) == analytics.SKEW_TOP_K
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    # share and skew_vs_avg are consistent transformations of cnt
    assert all(0 < r["share"] < 1 for r in rows)
    assert all(r["skew_vs_avg"] >= 1.0 for r in rows)  # top keys ≥ avg


def test_constraint_audit_clean_and_violation_paths(spark, sf_dir):
    from als_hadoop_spark.operators import analytics
    from als_hadoop_spark.sources import load

    got = {
        r["check_name"]: r["n_violations"]
        for r in analytics.q_constraint_audit(spark, sf_dir).collect()
    }
    # relational integrity of the fixtures is clean — pins the 0 path
    assert got["orders_custkey_fk"] == 0
    assert got["lineitem_orderkey_fk"] == 0
    assert got["customer_pk_unique"] == 0
    assert got["events_value_nonnegative"] == 0
    # the length rule genuinely fires — pins the violation path
    expect = (
        load(spark, sf_dir, "documents")
        .filter(f"n_chars < {analytics.MIN_DOC_CHARS}")
        .count()
    )
    assert got["documents_min_length"] == expect > 0


def test_event_funnel_is_monotone(spark, sf_dir):
    from als_hadoop_spark.operators import analytics

    got = {
        r["funnel_step"]: r["n_users"]
        for r in analytics.q_event_funnel(spark, sf_dir).collect()
    }
    s1, s2, s3 = (got[f"{i}_{t}"] for i, t in enumerate(analytics.FUNNEL_STEPS, 1))
    assert s1 >= s2 >= s3 > 0  # each step only loses users; data converts


def test_cohort_day0_equals_cohort_size(spark, sf_dir):
    from als_hadoop_spark.operators import analytics
    from als_hadoop_spark.sources import load

    rows = analytics.q_cohort_retention(spark, sf_dir).collect()
    day0 = {r["cohort_day"]: r["n_users"] for r in rows if r["days_since"] == 0}
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import functions as F

    sizes = {
        r["cohort_day"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.to_date(F.min("ts")).alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # every user is active on their own first day → day-0 row equals
    # the cohort's size exactly
    assert day0 == sizes
    assert all(r["days_since"] >= 0 for r in rows)


def test_trailing_window_bounds(spark, sf_dir):
    from als_hadoop_spark.operators import analytics

    rows = analytics.q_trailing_window(spark, sf_dir).collect()
    assert all(r["trail_cnt"] >= 1 for r in rows)
    # values are positive → the trailing sum dominates the own value,
    # and a singleton window equals it exactly
    assert all(r["trail_sum"] >= round(r["value"], 2) - 0.01 for r in rows)
    singles = [r for r in rows if r["trail_cnt"] == 1]
    assert singles and all(
        abs(r["trail_sum"] - r["value"]) < 0.01 for r in singles
    )


def test_regression_builtin_equals_udf_twin(spark, sf_dir):
    """The applyInPandas numpy fit and the built-in regr_slope path
    must agree exactly at the rounded precision — the UDF surface gets
    the same answer as the closed form."""
    from als_hadoop_spark.operators import analytics, udfs

    a = {
        r["event_type"]: (r["slope_per_hour"], r["intercept"], r["n_events"])
        for r in analytics.q_regression(spark, sf_dir).collect()
    }
    b = {
        r["event_type"]: (r["slope_per_hour"], r["intercept"], r["n_events"])
        for r in udfs.q_udf_groupfit(spark, sf_dir).collect()
    }
    assert a == b


def test_scd2_intervals_contiguous_and_current(spark, sf_dir):
    """SCD2 invariants: per user the intervals chain exactly
    (valid_to == next valid_from), exactly one open interval, no
    self-transition rows, and the open interval's state equals
    q_latest_by_key's current state."""
    from als_hadoop_spark.operators import timeseries

    rows = timeseries.q_scd2_history(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    latest = {
        r["user_id"]: r["event_type"]
        for r in timeseries.q_latest_by_key(spark, sf_dir).collect()
    }
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from"])
        opens = [r for r in ivs if r["is_current"]]
        assert len(opens) == 1 and opens[-1] is ivs[-1]
        assert ivs[-1]["state"] == latest[uid]
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["state"] != b["state"]  # rows only on change


def test_gap_fill_spine_is_contiguous_and_zero_filled(spark, sf_dir):
    """Per event_type: hours form a contiguous hourly spine from first
    to last, originally-missing hours carry exactly (0, 0.0), and
    aggregates on present hours match a direct groupBy."""
    from als_hadoop_spark.operators.timeseries import q_gap_fill

    out = q_gap_fill(spark, sf_dir).collect()
    by_type: dict = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    ev = load(spark, sf_dir, "events")
    direct = {
        (r["event_type"], r["hour"]): (r["n"], r["s"])
        for r in ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    assert by_type, "no output"
    for et, rows in by_type.items():
        rows.sort(key=lambda r: r["hour"])
        hours = [r["hour"] for r in rows]
        for a, b in zip(hours, hours[1:]):
            assert (b - a).total_seconds() == 3600, (et, a, b)
        for r in rows:
            key = (et, r["hour"])
            if key in direct:
                assert (r["n_events"], r["sum_value"]) == direct[key], key
            else:
                assert (r["n_events"], r["sum_value"]) == (0, 0.0), key
        # the fixture's event stream is sparse enough to have real gaps
    assert any(
        (r["event_type"], r["hour"]) not in direct
        for rows in by_type.values()
        for r in rows
    ), "fixture produced no gaps — test is vacuous"


def test_interval_merge_islands_disjoint_one_exchange(spark, sf_dir):
    """Merged islands per user must be pairwise disjoint with a real
    gap between consecutive ones (else they would have merged), each
    island at least one span long — and the whole query plans exactly
    ONE exchange (both windows and the final aggregate reuse the
    user_id partitioning)."""
    from als_hadoop_spark.operators.timeseries import q_interval_merge

    df = q_interval_merge(spark, sf_dir)
    assert count_shuffles(df) == 1, explain_str(df)

    by_user: dict = {}
    for r in df.collect():
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    span = 300.0  # MERGE_SPAN_MIN
    saw_multi = False
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: r["island_start"])
        for r in rows:
            assert (
                r["island_end"] - r["island_start"]
            ).total_seconds() >= span, (uid, r)
        for a, b in zip(rows, rows[1:]):
            saw_multi = True
            assert b["island_start"] > a["island_end"], (uid, a, b)
    assert saw_multi, "every user had one island — gap test is vacuous"


def test_pagerank_mass_and_numpy_parity(spark, sf_dir):
    """Fixed-iteration PageRank: total mass stays 1 (symmetric edges →
    no dangling leak), and the distributed result matches the same
    power iteration run in numpy on the collected edge set."""
    import numpy as np

    from als_hadoop_spark.functions.graph import pagerank
    from als_hadoop_spark.operators.analytics import PR_DAMPING, PR_ITER
    from als_hadoop_spark.sources import load
    from pyspark.sql import functions as F

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
    got = {r["node"]: r["rank"] for r in pagerank(edges, PR_DAMPING, PR_ITER).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9

    es = [(r["src"], r["dst"]) for r in edges.collect()]
    nodes = sorted({u for u, _ in es})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in es:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(PR_ITER):
        nxt = np.full(n, (1.0 - PR_DAMPING) / n)
        contrib = r / deg
        for u, v in es:
            nxt[idx[v]] += PR_DAMPING * contrib[idx[u]]
        r = nxt
    for u in nodes:
        assert abs(got[u] - r[idx[u]]) < 1e-9, u


def test_pagerank_empty_graph_returns_empty(spark):
    from als_hadoop_spark.functions.graph import pagerank

    empty = spark.createDataFrame([], "src LONG, dst LONG")
    out = pagerank(empty)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_equifreq_bins_are_balanced_and_ordered(spark, sf_dir):
    """Equal-frequency deciles: bins tile the table (counts sum to
    total), each bin holds ~10% of rows, and bin value ranges are
    non-overlapping and ordered."""
    from als_hadoop_spark.operators.analytics import q_equifreq_bins
    from als_hadoop_spark.sources import load

    rows = q_equifreq_bins(spark, sf_dir).collect()
    total = load(spark, sf_dir, "events").count()
    assert sum(r["n"] for r in rows) == total
    assert len(rows) == 10
    for r in rows:
        assert abs(r["n"] - total / 10) <= total * 0.02 + 2, r
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"] + 0.01  # boundaries split cleanly


def test_forward_fill_carries_last_observation(spark, sf_dir):
    """LOCF semantics on the real fixture: every originally-missing
    hour carries EXACTLY the most recent observed hour's value, no row
    is NULL (spans start at an observed hour), and observed hours match
    a direct aggregate."""
    from als_hadoop_spark.operators.timeseries import q_forward_fill

    out = q_forward_fill(spark, sf_dir).collect()
    direct = {
        (r["event_type"], r["hour"]): r["v"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.round(F.avg("value"), 4).alias("v"))
        .collect()
    }
    by_type: dict = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    n_filled = 0
    for et, rows in by_type.items():
        rows.sort(key=lambda r: r["hour"])
        last_observed = None
        for r in rows:
            assert r["avg_value"] is not None, (et, r["hour"])
            key = (et, r["hour"])
            if r["is_observed"]:
                assert key in direct and r["avg_value"] == direct[key]
                last_observed = r["avg_value"]
            else:
                assert key not in direct
                assert r["avg_value"] == last_observed, (et, r["hour"])
                n_filled += 1
    assert n_filled > 0, "fixture has no gaps — test is vacuous"


def test_merge_upsert_semantics(spark, tmp_path):
    """All four MERGE outcomes on a planted changelog: matched-update,
    matched-delete (absent from output), not-matched-insert,
    not-matched-delete (no-op), and snapshot-only rows kept. User ids
    are searched per op class from the same Knuth-hash arithmetic the
    operator uses, so the scenario is stable by construction."""
    from als_hadoop_spark.operators.timeseries import (
        MERGE_DELETE_MOD,
        q_merge_upsert,
    )

    def op_of(uid: int) -> str:
        return "D" if ((uid * 2654435761) % 2**32) % MERGE_DELETE_MOD == 0 else "U"

    # find small uids per op class so the test is hash-stable by
    # construction rather than by luck
    del_uid = next(u for u in range(1, 100) if op_of(u) == "D")
    upd_uid = next(u for u in range(1, 100) if op_of(u) == "U")
    ins_uid = next(u for u in range(1, 100) if u not in (del_uid, upd_uid) and op_of(u) == "U")
    noop_del_uid = next(u for u in range(del_uid + 1, 200) if op_of(u) == "D")
    kept_uid = max(del_uid, upd_uid, ins_uid, noop_del_uid) + 1

    before, after = "2024-01-20 00:00:00", "2024-01-26 00:00:00"
    rows = [
        # snapshot rows (before cutoff)
        (1, before, del_uid, "view", 1.0, "{}"),
        (2, before, upd_uid, "view", 2.0, "{}"),
        (3, before, kept_uid, "view", 3.0, "{}"),
        # changelog rows (after cutoff)
        (4, after, del_uid, "purchase", 9.0, "{}"),   # matched delete
        (5, after, upd_uid, "click", 8.0, "{}"),      # matched update
        (6, after, ins_uid, "click", 7.0, "{}"),      # insert
        (7, after, noop_del_uid, "click", 6.0, "{}"), # not-matched delete → no-op
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id LONG, ts STRING, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    ).withColumn("ts", F.to_timestamp("ts"))
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {r["user_id"]: r for r in q_merge_upsert(spark, str(tmp_path)).collect()}
    assert del_uid not in got and noop_del_uid not in got
    assert got[upd_uid]["state"] == "click" and got[upd_uid]["action"] == "updated"
    assert got[ins_uid]["state"] == "click" and got[ins_uid]["action"] == "inserted"
    assert got[kept_uid]["state"] == "view" and got[kept_uid]["action"] == "kept"
    assert set(got) == {upd_uid, ins_uid, kept_uid}


def test_graph_triangles_matches_bruteforce(spark, tmp_path):
    """Planted graph (a K4 plus a pendant edge, built from orders whose
    high-quantity lines define co-supplier edges): the degree-oriented
    count must equal the brute-force triangle census — K4 has 4
    triangles, the pendant adds wedges but none."""
    from itertools import combinations

    from als_hadoop_spark.operators.analytics import (
        TRI_MIN_QTY,
        q_graph_triangles,
    )

    # orders: each row below is one order's supplier set; every pair
    # within an order becomes an edge
    orders = [
        (1, [1, 2]), (2, [1, 3]), (3, [1, 4]), (4, [2, 3]),
        (5, [2, 4]), (6, [3, 4]),          # K4 over suppliers 1-4
        (7, [4, 9]),                        # pendant edge
        (8, [7]),                           # isolated supplier: no edge
    ]
    rows = []
    eid = 0
    for okey, supps in orders:
        for s in supps:
            eid += 1
            rows.append((okey, 1, s, eid, TRI_MIN_QTY + 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"))
    li = spark.createDataFrame(
        rows,
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber LONG, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, "
        "l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, l_shipdate STRING",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    edges = set()
    for _, supps in orders:
        for x, y in combinations(sorted(supps), 2):
            edges.add((x, y))
    nodes = sorted({v for e in edges for v in e})
    tri = sum(
        1
        for x, y, z in combinations(nodes, 3)
        if {(x, y), (x, z), (y, z)} <= edges
    )
    deg = {v: sum(1 for e in edges if v in e) for v in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())

    got = q_graph_triangles(spark, str(tmp_path)).collect()[0]
    assert got["n_nodes"] == len(nodes) == 5
    assert got["n_edges"] == len(edges) == 7
    assert got["n_triangles"] == tri == 4
    assert got["clustering_coeff"] == round(3.0 * tri / wedges, 6)


def test_column_profile_fast_error_bound_and_plan(spark, sf_dir):
    """The production profiler (r8, VERDICT r7 #3): every approx
    distinct count within 2% of the exact twin (rsd=0.01 HLL++),
    nulls/min/max EXACTLY equal, and the plan is ONE pass — a single
    Expand-free aggregation, no per-column extra scans (the exact
    twin's N+1-scan residual is the thing this path removes)."""
    from als_hadoop_spark.operators.analytics import (
        q_column_profile,
        q_column_profile_fast,
    )

    exact = {r["column"]: r for r in q_column_profile(spark, sf_dir).collect()}
    fast_df = q_column_profile_fast(spark, sf_dir)
    fast = {r["column"]: r for r in fast_df.collect()}
    assert set(fast) == set(exact)
    for c, e in exact.items():
        f = fast[c]
        assert (f["n_nulls"], f["min_val"], f["max_val"]) == (
            e["n_nulls"], e["min_val"], e["max_val"],
        )
        assert abs(f["n_distinct"] - e["n_distinct"]) <= max(
            0.02 * e["n_distinct"], 1
        ), f"{c}: approx {f['n_distinct']} vs exact {e['n_distinct']}"

    import re

    plan = explain_str(fast_df)
    assert "Expand" not in plan  # no multi-distinct blow-up
    final = plan.split("Initial Plan")[0]  # AQE repeats the pre-plan
    assert final.count("Scan parquet") == 1  # ONE table pass
    # at most the spread repartition + the 1-row final reduce — never a
    # data-row shuffle per column like the exact twin's extra passes
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange\b", final, re.M))
    assert n_exchanges <= 2, final


def test_sessionize_gap_boundary_and_census(spark, tmp_path):
    """A gap of EXACTLY SESSION_GAP_US stays in-session (the split is
    strictly-greater); one microsecond more starts a new session; the
    census aggregates sessions by length with exact-µs durations."""
    from als_hadoop_spark.operators.analytics import SESSION_GAP_US, q_sessionize

    base = 1_700_000_000_000_000  # µs epoch, away from any DST edge
    gap = SESSION_GAP_US
    rows = [
        # user 7: consecutive gaps == threshold → ONE session of 3
        (1, base, 7), (2, base + gap, 7), (3, base + 2 * gap, 7),
        # user 8: gap == threshold + 1 µs → TWO singleton sessions
        (4, base, 8), (5, base + gap + 1, 8),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, us LONG, user_id LONG"
    ).select(
        "event_id",
        F.timestamp_micros("us").alias("ts"),
        "user_id",
        F.lit("view").alias("event_type"),
        F.lit(0.0).alias("value"),
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["session_events"]: (r["n_sessions"], r["sum_duration_us"])
        for r in q_sessionize(spark, str(tmp_path)).collect()
    }
    assert got == {1: (2, 0), 3: (1, 2 * gap)}


def test_sessionize_single_exchange_for_both_windows(spark, sf_dir):
    """The lag-gap flag and the running-sum session id share ONE
    (user_id, ts, event_id) sort under ONE user_id exchange, and the
    per-session rollup reuses that clustering (user_id ⊆ (user_id,
    sid) satisfies the aggregate's distribution) — only the bounded
    census and the final 5-row order add exchanges."""
    import re

    from als_hadoop_spark.operators.analytics import q_sessionize

    plan = explain_str(q_sessionize(spark, sf_dir))
    final = plan.split("Initial Plan")[0]
    # both window functions planned into ≤2 Window nodes over one sort
    assert len(re.findall(r"^\(\d+\) Window\b", final, re.M)) <= 2, final
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange\b", final, re.M))
    # user_id exchange + census hash + final rangepartitioning
    assert n_exchanges <= 3, final
    assert len(re.findall(r"^\(\d+\) Sort\b", final, re.M)) <= 2, final
