"""Range-join via bucketization.

Spark plans a pure non-equi join as BroadcastNestedLoopJoin — O(n·m)
comparisons and a broadcast of a potentially huge side; it dies at
scale. For the bounded-window predicate

    right_ts > left_ts AND right_ts <= left_ts + W

we instead bucketize time into W-sized bins. Any right row matching a
left row must land in the left row's bin b or bin b+1, so exploding the
left side into its two candidate bins turns the theta-join into a plain
hash equi-join on the bin id plus a residual filter — shuffle-partition
friendly, AQE-skew-splittable, and linear in the number of true
candidate pairs. This is the standard interval-bucketing technique used
by time-series engines for as-of/range joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Inner-join ``left`` × ``right`` on
    ``right_ts ∈ (left_ts, left_ts + window_seconds]``."""
    w_us = int(window_seconds) * 1_000_000
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    bucketed_right = right.withColumn("_bucket", F.floor(r_us / w_us))
    left_bin = F.floor(l_us / w_us)
    exploded_left = left.withColumn(
        "_cand", F.explode(F.array(left_bin, left_bin + 1))
    )

    joined = exploded_left.join(
        bucketed_right, exploded_left["_cand"] == bucketed_right["_bucket"]
    ).filter((r_us > l_us) & (r_us <= l_us + F.lit(w_us)))
    return joined.drop("_cand", "_bucket")
