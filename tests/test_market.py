"""Plan + semantic gates for the Q6/Q7/Q8/Q10/Q14 family
(``operators/market.py``) — value-level correctness is gated by the
DuckDB oracle harness; these tests pin the plan shapes that make each
query scale and the one semantic the oracle data can't force (Q8's
zero-share year when the tracked nation supplies nothing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from als_hadoop_spark.operators.market import (
    q_forecast_revenue,
    q_market_share,
    q_promo_revenue,
    q_returned_items,
    q_volume_shipping,
)
from als_hadoop_spark.plans import (
    assert_broadcast_join,
    assert_no_quadratic_join,
    assert_pushed_filters,
    assert_take_ordered,
    count_shuffles,
    explain_str,
)


def test_forecast_revenue_minimal_plan(spark, sf_dir):
    """Q6 is the pushdown yardstick: the quantity predicate reaches
    the parquet reader, the scan reads only the four touched columns,
    and the whole query is scan → partial agg → final agg with ONE
    exchange (the single-row final aggregate)."""
    df = q_forecast_revenue(spark, sf_dir)
    assert_pushed_filters(df, "l_quantity")
    plan = explain_str(df)
    read = plan[plan.find("ReadSchema") :].splitlines()[0]
    for col in ("l_shipdate", "l_quantity", "l_extendedprice", "l_discount"):
        assert col in read
    for col in ("l_orderkey", "l_partkey", "l_returnflag"):
        assert col not in read
    assert count_shuffles(df) == 1


def test_volume_shipping_broadcasts_both_dimension_chains(spark, sf_dir):
    """Q7: both nation chains ride broadcasts; the fact pays ONE join
    shuffle (lineitem ⋈ region-pruned orders on the order key — both
    sides exchange statically; at fixture scale AQE later demotes the
    tiny order side to a broadcast, but the static plan keeps the
    exchange because the join-output size estimate exceeds the
    threshold), plus the bounded-key aggregate and the final sort."""
    df = q_volume_shipping(spark, sf_dir)
    assert_no_quadratic_join(df)
    assert_broadcast_join(df, 2)
    assert count_shuffles(df) <= 4


def test_market_share_single_fact_pass(spark, sf_dir):
    """Q8: numerator (CASE-filtered) and denominator come out of ONE
    aggregate over ONE scan of lineitem — a two-scan formulation would
    show two lineitem reads in the plan."""
    df = q_market_share(spark, sf_dir)
    plan = explain_str(df)
    assert plan.count("lineitem.parquet") == 1
    assert_no_quadratic_join(df)
    assert_broadcast_join(df, 2)


def test_market_share_zero_share_year(spark, tmp_path):
    """A year where the tracked nation supplied nothing must emit a
    0.0 share row, not disappear — the CASE's ELSE keeps the
    denominator while zeroing the numerator."""
    nation = spark.createDataFrame(
        [(8, "NATION_8", 3), (12, "NATION_12", 2)],
        "n_nationkey LONG, n_name STRING, n_regionkey LONG",
    )
    region = spark.createDataFrame(
        [(3, "EUROPE"), (2, "ASIA")], "r_regionkey LONG, r_name STRING"
    )
    supplier = spark.createDataFrame(
        [(1, "s1", 8, 0.0), (2, "s2", 12, 0.0)],
        "s_suppkey LONG, s_name STRING, s_nationkey LONG, s_acctbal DOUBLE",
    )
    part = spark.createDataFrame(
        [(1, "p", "Brand#1", "PROMO", 1, 1.0)],
        "p_partkey LONG, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size LONG, p_retailprice DOUBLE",
    )
    customer = spark.createDataFrame(
        [(1, "c", 8, 0.0, "S")],
        "c_custkey LONG, c_name STRING, c_nationkey LONG, c_acctbal DOUBLE, "
        "c_mktsegment STRING",
    )
    orders = spark.createDataFrame(
        [
            # 1996: only the non-tracked nation (supp 2) sells
            (10, 1, "O", 1.0, "1996-06-01 00:00:00", "2-HIGH"),
            # 1997: only the tracked NATION_8 (supp 1) sells
            (11, 1, "O", 1.0, "1997-06-01 00:00:00", "2-HIGH"),
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate STRING, o_orderpriority STRING",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    li = spark.createDataFrame(
        [
            (10, 1, 2, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", "1996-06-02 00:00:00"),
            (11, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", "1997-06-02 00:00:00"),
        ],
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber LONG, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, "
        "l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, "
        "l_shipdate STRING",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    for name, df in [
        ("nation", nation), ("region", region), ("supplier", supplier),
        ("part", part), ("customer", customer), ("orders", orders),
        ("lineitem", li),
    ]:
        df.write.mode("overwrite").parquet(str(tmp_path / f"{name}.parquet"))
    got = {r["o_year"]: r["mkt_share"] for r in q_market_share(spark, str(tmp_path)).collect()}
    assert got == {1996: 0.0, 1997: 1.0}


def test_returned_items_take_ordered(spark, sf_dir):
    """Q10: the top-N compiles to TakeOrderedAndProject (no global
    sort), the returnflag filter reaches the fact scan, and nation is
    a broadcast."""
    df = q_returned_items(spark, sf_dir)
    assert_take_ordered(df)
    assert_pushed_filters(df, "l_returnflag")
    assert_broadcast_join(df, 1)


def test_promo_revenue_zero_extra_shuffles(spark, sf_dir):
    """Q14: a broadcast probe into the date-pruned fact scan, then one
    single-row aggregate — the only exchange in the plan is the final
    1-row gather."""
    df = q_promo_revenue(spark, sf_dir)
    assert_broadcast_join(df, 1)
    assert count_shuffles(df) == 1
    row = df.collect()[0]
    assert 0.0 <= row["promo_share"] <= 100.0
