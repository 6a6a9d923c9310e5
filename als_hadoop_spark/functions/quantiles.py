"""Exact distributed quantiles WITHOUT a full sort.

``percentile()`` buffers every group value in one aggregation buffer
(OOM on low-cardinality groups at scale); a per-group window sorts each
group in a single task (same failure); and ranking every row
(functions/ids.grouped_ranks) range-sorts the whole table twice when
the two consumers of its shuffle can't reuse the exchange (its
monotonically_increasing_id is nondeterministic, which blocks
Catalyst's ReusedExchange).

This module locates the quantile rows instead of ranking everything:

1. range-repartition by (group, value) — ONE shuffle, NO sort; the
   partition id is now a coarse global order,
2. per-(partition, group) chunk counts — a tiny aggregate over unsorted
   data — give each chunk its global-rank interval via a cumulative sum
   over the (partitions × groups)-bounded chunk table,
3. each quantile needs global ranks ⌊(n-1)q⌋+1 and +2; those ranks are
   located to (partition, group, local-rank) targets by interval
   lookup — a broadcast-sized table,
4. ONLY the chunks containing a target rank are locally sorted (a
   window over ≤ |quantiles|·|groups|·2 chunks of ~n/P rows), and the
   matched values interpolate v_lo + frac·(v_hi − v_lo) — bit-for-bit
   quantile_cont / numpy-linear semantics.

The shuffled layout is consumed by steps 2 and 4, so it is pinned once
with ``localCheckpoint``: both consumers read the SAME materialization
(no double range-sampling, and the chunk counts can never disagree
with the chunk contents).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    qs: Sequence[tuple[str, float]],
    num_partitions: int | None = None,
) -> DataFrame:
    """Long-form exact quantiles: one row per (group, quantile-name)
    with columns ``(*group_cols, q_name, value, n)``. ``qs`` is a list
    of (name, fraction) pairs, fraction in [0, 1]."""
    spark = df.sparkSession
    g = list(group_cols)
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    d = (
        df.repartitionByRange(num_partitions, *g, value_col)
        .select(*g, value_col, F.spark_partition_id().alias("_pid"))
        .localCheckpoint(eager=False)
    )

    pg = d.groupBy("_pid", *g).agg(F.count("*").alias("_c"))
    wcum = (
        Window.partitionBy(*g).orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    pg = pg.select(
        "_pid", *g, "_c", F.coalesce(F.sum("_c").over(wcum), F.lit(0)).alias("_cum")
    )
    n = pg.groupBy(*g).agg(F.sum("_c").alias("_n"))

    # Target global ranks: the lo bracket always; the hi bracket only
    # when the interpolation fraction is non-zero (when pos is integral
    # the hi rank may not even exist — q=1.0 needs rank n alone).
    tgts = []
    for name, q in qs:
        pos = (F.col("_n") - 1) * F.lit(float(q))
        lo = (F.floor(pos) + 1).cast("long")
        frac = pos - F.floor(pos)
        tgts.append(
            F.struct(
                F.lit(name).alias("_q"), lo.alias("_grank"),
                F.lit("lo").alias("_w"), frac.alias("_frac"),
            )
        )
        tgts.append(
            F.struct(
                F.lit(name).alias("_q"), (lo + 1).alias("_grank"),
                F.lit("hi").alias("_w"), frac.alias("_frac"),
            )
        )
    targets = (
        n.select(*g, "_n", F.explode(F.array(*tgts)).alias("_t"))
        .select(*g, "_n", "_t._q", "_t._grank", "_t._w", "_t._frac")
        .filter((F.col("_w") == "lo") | (F.col("_frac") > 0))
    )

    # Interval lookup: which chunk holds each target rank, and at what
    # local offset. targets × chunks is (groups·quantiles·2) × (P·groups)
    # — broadcast-sized on both sides at any data scale.
    loc = (
        targets.join(pg, g)
        .filter(
            (F.col("_grank") > F.col("_cum"))
            & (F.col("_grank") <= F.col("_cum") + F.col("_c"))
        )
        .select(
            *g, "_pid", (F.col("_grank") - F.col("_cum")).alias("_lrank"),
            "_q", "_w", "_frac", "_n",
        )
    )

    hot = loc.select("_pid", *g).distinct()
    sub = d.join(F.broadcast(hot), ["_pid", *g], "left_semi")
    wv = Window.partitionBy("_pid", *g).orderBy(value_col)
    ranked = sub.select(
        "_pid", *g, F.col(value_col).alias("_v"), F.row_number().over(wv).alias("_lrank")
    )
    vals = ranked.join(F.broadcast(loc), ["_pid", *g, "_lrank"])

    per_q = vals.groupBy(*g, "_q").agg(
        F.max(F.when(F.col("_w") == "lo", F.col("_v"))).alias("_vlo"),
        F.max(F.when(F.col("_w") == "hi", F.col("_v"))).alias("_vhi"),
        F.first("_frac").alias("_frac"),
        F.first("_n").alias("_n"),
    )
    value = F.when(F.col("_frac") == 0, F.col("_vlo")).otherwise(
        F.col("_vlo") + F.col("_frac") * (F.col("_vhi") - F.col("_vlo"))
    )
    return per_q.select(
        *g, F.col("_q").alias("q_name"), value.alias("value"), F.col("_n").alias("n")
    )
