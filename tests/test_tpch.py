"""Semantic + plan gates for the TPC-H hard shapes (Q13/Q15/Q18/Q21/
Q22) — value-level correctness is gated by the DuckDB oracle harness;
these tests pin the behaviors the oracle data can't force (zero-group
preservation, aggregate ties, the Q21 uniqueness predicate) on planted
synthetic inputs, plus the plan shapes that make each query scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from als_hadoop_spark.operators.tpch import (
    Q21_LATE_DAYS,
    q_agg_of_agg,
    q_exists_chain,
    q_having_semijoin,
    q_outer_join_count,
    q_scalar_threshold_anti,
)
from als_hadoop_spark.plans import (
    assert_broadcast_join,
    assert_no_quadratic_join,
    assert_pushed_filters,
    assert_take_ordered,
    count_shuffles,
    explain_str,
)


def _write(df, tmp_path, name):
    df.write.mode("overwrite").parquet(str(tmp_path / f"{name}.parquet"))


def test_outer_join_count_preserves_zero_group(spark, tmp_path):
    """A customer with no (post-filter) orders must appear in the
    n_orders = 0 bucket — the LEFT join may not drop it, and the
    priority filter must apply to the ORDERS side, not the join."""
    cust = spark.createDataFrame(
        [(1, "a", 0, 0.0, "s"), (2, "b", 0, 0.0, "s"), (3, "c", 0, 0.0, "s")],
        "c_custkey LONG, c_name STRING, c_nationkey LONG, c_acctbal DOUBLE, c_mktsegment STRING",
    )
    orders = spark.createDataFrame(
        [
            # cust 1: two counted orders; cust 2: only an excluded one
            (10, 1, "O", 1.0, "2024-01-01 00:00:00", "1-URGENT"),
            (11, 1, "O", 1.0, "2024-01-01 00:00:00", "2-HIGH"),
            (12, 2, "O", 1.0, "2024-01-01 00:00:00", "5-LOW"),
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, o_totalprice DOUBLE, "
        "o_orderdate STRING, o_orderpriority STRING",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    _write(cust, tmp_path, "customer")
    _write(orders, tmp_path, "orders")
    got = {r["n_orders"]: r["n_customers"] for r in q_outer_join_count(spark, str(tmp_path)).collect()}
    assert got == {0: 2, 2: 1}  # cust 2 and 3 land in the zero bucket


def test_outer_join_count_preaggregates_before_join(spark, sf_dir):
    """The scalable shape: orders collapse to per-customer counts
    BEFORE the left join, so the plan has an Aggregate below the Join
    and only bounded rows cross it — and no quadratic node."""
    df = q_outer_join_count(spark, sf_dir)
    plan = explain_str(df, "extended")
    assert_no_quadratic_join(df)
    # logical plan: the Join's right input must contain an Aggregate
    join_pos = plan.find("Join LeftOuter")
    agg_pos = plan.find("Aggregate", join_pos)
    assert join_pos != -1 and agg_pos != -1


def test_agg_of_agg_keeps_ties(spark, tmp_path):
    """Two suppliers with bit-identical windowed revenue must BOTH
    survive the rev = max(rev) equality — the integer-cents arithmetic
    makes the tie exact, not float luck."""
    li = spark.createDataFrame(
        [
            (1, 1, 1, 1, 2.0, 100.00, 0.10, 0.0, "N", "O", "1998-02-01 00:00:00"),
            (2, 1, 2, 1, 2.0, 50.00, 0.10, 0.0, "N", "O", "1998-02-01 00:00:00"),
            (3, 1, 2, 2, 2.0, 50.00, 0.10, 0.0, "N", "O", "1998-02-01 00:00:00"),
            # supplier 3: outside the date window, would otherwise win
            (4, 1, 3, 1, 2.0, 999.00, 0.00, 0.0, "N", "O", "2001-01-01 00:00:00"),
        ],
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber LONG, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
        "l_returnflag STRING, l_linestatus STRING, l_shipdate STRING",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    supp = spark.createDataFrame(
        [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0), (3, "s3", 0, 0.0)],
        "s_suppkey LONG, s_name STRING, s_nationkey LONG, s_acctbal DOUBLE",
    )
    _write(li, tmp_path, "lineitem")
    _write(supp, tmp_path, "supplier")
    rows = q_agg_of_agg(spark, str(tmp_path)).collect()
    assert [(r["s_suppkey"], r["total_revenue"]) for r in rows] == [
        (1, 90.0),
        (2, 90.0),
    ]


def test_having_semijoin_plan(spark, sf_dir):
    """Customer broadcasts; the top-N is TakeOrderedAndProject (no
    global sort); the HAVING aggregate sits below the orders join."""
    df = q_having_semijoin(spark, sf_dir)
    assert_broadcast_join(df)
    assert_take_ordered(df)
    assert_no_quadratic_join(df)


def test_exists_chain_uniqueness_predicate(spark, tmp_path):
    """Planted Q21 scenarios: (A) two suppliers, one late → that
    supplier counted; (B) two suppliers, both late → nobody (NOT
    EXISTS side); (C) one supplier, late → nobody (EXISTS side)."""
    base = "2024-01-01 00:00:00"
    late = "2030-01-01 00:00:00"  # >> Q21_LATE_DAYS past base
    assert Q21_LATE_DAYS < 2000
    li = spark.createDataFrame(
        [
            (1, 1, 101, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),   # A: late
            (1, 1, 102, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", base),   # A: on time
            (2, 1, 101, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),   # B: late
            (2, 1, 102, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", late),   # B: late
            (3, 1, 103, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),   # C: solo
        ],
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber LONG, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
        "l_returnflag STRING, l_linestatus STRING, l_shipdate STRING",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    orders = spark.createDataFrame(
        [(k, 1, "O", 1.0, base, "1-URGENT") for k in (1, 2, 3)],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, o_totalprice DOUBLE, "
        "o_orderdate STRING, o_orderpriority STRING",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    supp = spark.createDataFrame(
        [(s, f"s{s}", 0, 0.0) for s in (101, 102, 103)],
        "s_suppkey LONG, s_name STRING, s_nationkey LONG, s_acctbal DOUBLE",
    )
    _write(li, tmp_path, "lineitem")
    _write(orders, tmp_path, "orders")
    _write(supp, tmp_path, "supplier")
    rows = q_exists_chain(spark, str(tmp_path)).collect()
    assert [(r["s_name"], r["numwait"]) for r in rows] == [("s101", 1)]


def test_exists_chain_single_fact_shuffle(spark, sf_dir):
    """The aggregate rewrite's payoff: the whole query runs with ≤ 3
    exchanges (fact join + per-order agg + bounded supplier agg) and
    no self-join of lineitem — the literal EXISTS/NOT-EXISTS plan
    would probe the fact table three times."""
    df = q_exists_chain(spark, sf_dir)
    assert count_shuffles(df) <= 4
    assert_no_quadratic_join(df)
    # lineitem is scanned exactly once
    plan = explain_str(df)
    assert plan.count("lineitem.parquet") == 1


def test_scalar_threshold_anti_plan(spark, sf_dir):
    """The priority filter reaches the orders scan (anti-join probes a
    pruned input) and the threshold rides a broadcast, not a collect."""
    df = q_scalar_threshold_anti(spark, sf_dir)
    assert_pushed_filters(df, "o_orderpriority")
    assert "Broadcast" in explain_str(df)


def test_scalar_threshold_anti_boundary_is_exact(spark, tmp_path):
    """A customer whose balance in cents EQUALS the integer-cents
    average must be excluded (strict >) — deterministic in both
    engines because the threshold is exact integer division."""
    cust = spark.createDataFrame(
        # positive balances: 100.00, 200.00 → avg = 150.00 exactly
        [(1, "a", 0, 100.0, "s"), (2, "b", 0, 200.0, "s"), (3, "c", 1, 150.0, "s")],
        "c_custkey LONG, c_name STRING, c_nationkey LONG, c_acctbal DOUBLE, c_mktsegment STRING",
    )
    orders = spark.createDataFrame(
        [], "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, o_totalprice DOUBLE, "
        "o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    _write(cust, tmp_path, "customer")
    _write(orders, tmp_path, "orders")
    rows = q_scalar_threshold_anti(spark, str(tmp_path)).collect()
    # only cust 2 (200 > 150); cust 3 at exactly 150 is out
    assert [(r["c_nationkey"], r["n_customers"], r["total_acctbal"]) for r in rows] == [
        (0, 1, 200.0)
    ]
