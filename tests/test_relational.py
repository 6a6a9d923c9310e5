"""Unit tests for the relational surface (SURVEY.md §5.3-5.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from als_hadoop_spark.functions.ids import dense_ids
from als_hadoop_spark.operators import relational
from als_hadoop_spark.sources import load


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_all_queries_run_and_nonempty(spark, sf_dir):
    """Every declared query runs at sf0.001 with a stable schema."""
    import __spark_entry__ as e

    for name, fn in e.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()  # plan executes


def test_groupby_sum_matches_manual(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    got = {
        (r["l_returnflag"], r["l_linestatus"]): r["count_order"]
        for r in relational.q_groupby_sum(spark, sf_dir).collect()
    }
    expected = {
        (r["l_returnflag"], r["l_linestatus"]): r["n"]
        for r in li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == expected


def test_filter_predicates_hold(spark, sf_dir):
    rows = relational.q_filter(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["l_quantity"] >= 25.0
        assert r["l_returnflag"] in ("R", "A")


def test_dense_ids_bijective(spark, sf_dir):
    """A7 property: dense ids are a bijection onto 0..n-1 in key order."""
    c = load(spark, sf_dir, "customer")
    mapping = dense_ids(c, "c_custkey", num_partitions=5).collect()
    n = len(mapping)
    ids = sorted(r["dense_id"] for r in mapping)
    assert ids == list(range(n))
    by_key = sorted(mapping, key=lambda r: r["c_custkey"])
    assert [r["dense_id"] for r in by_key] == list(range(n))


def test_random_split_invariants(spark, sf_dir):
    """A8 property: splits are disjoint, exhaustive, roughly 80/20."""
    o = load(spark, sf_dir, "orders")
    train, probe = o.randomSplit([0.8, 0.2], seed=1)
    n, nt, np_ = o.count(), train.count(), probe.count()
    assert nt + np_ == n
    assert train.join(probe, "o_orderkey", "inner").count() == 0
    assert 0.6 * n < nt < 0.95 * n


def test_transpose_preserves_total(spark, sf_dir):
    """A3 property: transpose round-trip preserves the grand total."""
    li = load(spark, sf_dir, "lineitem")
    total = li.agg(F.sum("l_quantity")).collect()[0][0]
    re = relational.q_transpose_regroup(spark, sf_dir)
    got = re.agg(F.sum("sum_qty")).collect()[0][0]
    assert abs(got - total) < 1e-2


def test_approx_count_distinct_close(spark, sf_dir):
    exact = load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    approx = relational.q_approx_count_distinct(spark, sf_dir).collect()[0]["approx_custs"]
    assert abs(approx - exact) / exact < 0.1


def test_range_join_matches_naive(spark, sf_dir):
    """Bucketized range join ≡ naive theta join on small data."""
    ev = load(spark, sf_dir, "events").select("event_id", "ts").limit(300)
    from als_hadoop_spark.functions.joins import range_join_buckets

    left = ev.select(F.col("event_id").alias("id1"), F.col("ts").alias("ts1"))
    right = ev.select(F.col("event_id").alias("id2"), F.col("ts").alias("ts2"))
    fast = range_join_buckets(left, right, "ts1", "ts2", 120).count()
    naive = left.crossJoin(right).filter(
        (F.col("ts2") > F.col("ts1"))
        & (F.unix_micros("ts2") <= F.unix_micros("ts1") + 120 * 1_000_000)
    ).count()
    assert fast == naive


def test_topk_is_sorted_desc(spark, sf_dir):
    rows = relational.q_topk(spark, sf_dir).collect()
    prices = [r["l_extendedprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)
    assert len(rows) == 10


def test_null_semantics_null_group_present(spark, sf_dir):
    from als_hadoop_spark.operators import relational

    rows = {r["grp"]: r for r in relational.q_null_semantics(spark, sf_dir).collect()}
    assert None in rows  # error events grouped under the NULL key
    r = rows[None]
    assert r["n_nonnull"] <= r["n_rows"]
    # avg skips nulls, so it can only see values >= the null threshold
    assert r["avg_nonnull"] >= 50.0


def test_window_distribution_bounds(spark, sf_dir):
    from als_hadoop_spark.operators import relational

    rows = relational.q_window_distribution(spark, sf_dir).collect()
    assert all(0.0 <= r["pct_rank"] <= 1.0 for r in rows)
    assert all(0.0 < r["cume"] <= 1.0 for r in rows)
    assert all(1 <= r["quartile"] <= 4 for r in rows)
