"""Scale helpers: bucketed co-located joins and skew salting.

These are the two knobs the engine's docstrings point at for 100 TB
joins (e.g. ``relational.q_shuffle_join``: "at 100 TB, orders and
customer would be bucketed on custkey to eliminate this exchange").
Tests prove the plans: a bucketed equi-join runs with ZERO Exchange
nodes, and a salted join splits a hot key across `salt` subkeys.

The reference has no analog — its only join strategy is shipping the
whole small side to every task (``ALS-Hadoop/ALS/ALS.java:380-383``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table. Two
    tables bucketed on their join key with the same bucket count join
    WITHOUT a shuffle — the exchange is paid once at write time instead
    of on every query. ``path`` makes it an external table (bucketing
    metadata still lives in the catalog, which is what the planner
    consults)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with
    no Exchange (verified in tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: the (skewed) left side gets a random
    salt in [0, n_salts); the right side is replicated n_salts times;
    the join key becomes (key, salt), splitting any hot key's rows
    across n_salts reducers. Use when a handful of keys dominate and
    AQE's size-based skew split isn't enough (e.g. the skew is in
    compute, not bytes). Salt is derived from a hash of the left row's
    full tuple — deterministic, layout-independent."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lt = left.withColumn("_salt", salt.cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    rt = right.withColumn("_salt", salts)
    return lt.join(rt, [on, "_salt"]).drop("_salt")
