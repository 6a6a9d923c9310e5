"""Plan + correctness tests for the 100 TB scale helpers (bucketed
co-located joins, skew salting)."""

from __future__ import annotations

from pyspark.sql import functions as F

from als_hadoop_spark.functions.scale import bucketed_join, salted_join, write_bucketed
from als_hadoop_spark.plans import count_shuffles, explain_str
from als_hadoop_spark.sources import load


def test_bucketed_join_has_zero_shuffles(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key join with NO Exchange —
    the co-location story for the q_shuffle_join docstring."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "k"), "t_orders_b", "k", 8,
        path=str(tmp_path / "t_orders_b"),
    )
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "k"), "t_cust_b", "k", 8,
        path=str(tmp_path / "t_cust_b"),
    )
    joined = bucketed_join(spark, "t_orders_b", "t_cust_b", "k")
    assert count_shuffles(joined) == 0, explain_str(joined)
    # correctness: same row count as the plain shuffle join
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
    assert joined.count() == plain.count()


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must not change join semantics: same (key, payload)
    multiset as the unsalted join, with the hot key split across
    salt subkeys."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value").limit(2000)
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 2.0), ("error", 3.0), ("purchase", 4.0), ("scroll", 5.0)],
        "event_type STRING, weight DOUBLE",
    )
    salted = salted_join(ev, dim, "event_type", n_salts=8)
    plain = ev.join(dim, "event_type")
    a = sorted((r["event_id"], r["weight"]) for r in salted.collect())
    b = sorted((r["event_id"], r["weight"]) for r in plain.collect())
    assert a == b


def test_salted_join_splits_hot_key(spark):
    """A 100%-skewed key spreads across all salt partitions."""
    hot = spark.range(10_000).select(F.lit("hot").alias("k"), F.col("id"))
    dim = spark.createDataFrame([("hot", 42)], "k STRING, v INT")
    joined = salted_join(hot, dim, "k", n_salts=8)
    # re-derive the salt distribution the join used
    salt = F.pmod(F.xxhash64("k", "id"), F.lit(8)).cast("int")
    n_distinct = hot.select(salt.alias("s")).distinct().count()
    assert n_distinct == 8
    assert joined.count() == 10_000
