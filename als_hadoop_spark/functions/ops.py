"""Operational utilities for production pipelines: observed writes
(in-flight data-quality metrics without a second scan) and small-file
compaction — the two chores every 100 TB parquet lake runs daily.

The reference has no operational surface at all (its jobs are fired
by ``ALS.main`` and inspected by reading HDFS paths by hand,
``ALS-Hadoop/README.txt:31-43``); these fill the gap Spark-natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def observed_write(
    df: DataFrame,
    path: str,
    *,
    name: str = "write_metrics",
    max_null_fraction: float | None = None,
    null_check_col: str | None = None,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` to parquet while collecting row-level quality
    metrics IN the write pass via ``df.observe`` — no second scan, no
    extra job, which at 100 TB is the difference between "metrics" and
    "double the bill". Returns the observed metrics dict.

    When ``max_null_fraction`` is set for ``null_check_col``, acts as
    a data-quality circuit breaker: the write itself still happens
    (Spark observes during the action), but a ``ValueError`` is raised
    AFTER it so orchestration can quarantine the output — the
    dbt-test/Deequ-check pattern as one Spark action."""
    cols = [F.count(F.lit(1)).alias("n_rows")]
    if null_check_col is not None:
        cols.append(
            F.sum(F.col(null_check_col).isNull().cast("long")).alias("n_nulls")
        )
    obs = Observation(name)
    df.observe(obs, *cols).write.mode(mode).parquet(path)
    metrics = dict(obs.get)
    if max_null_fraction is not None and null_check_col is not None:
        n = metrics["n_rows"] or 1
        frac = metrics["n_nulls"] / n
        metrics["null_fraction"] = frac
        if frac > max_null_fraction:
            raise ValueError(
                f"observed_write: {null_check_col} null fraction {frac:.4f} "
                f"exceeds {max_null_fraction} (output at {path} should be "
                "quarantined)"
            )
    return metrics


#: default compaction target per output file
COMPACT_TARGET_BYTES = 128 * 1024 * 1024


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = COMPACT_TARGET_BYTES,
) -> tuple[int, int]:
    """Rewrite a many-small-files parquet directory into
    ``ceil(total_bytes / target_bytes)`` files — the daily compaction
    job that keeps scan task counts sane (a 100 TB table left at
    streaming-sink granularity plans millions of splits).

    Returns (n_input_files, n_output_files). Uses coalesce (narrow —
    no shuffle) since compaction only merges, never redistributes;
    write to a NEW directory then swap, the atomic-publish pattern."""
    import math
    import os

    # local-filesystem sizing; an HDFS/S3 deployment swaps this walk
    # for the Hadoop FileSystem listing API — the plan is unchanged
    sizes = []
    for root, _, names in os.walk(src):
        for fn in names:
            if fn.endswith(".parquet"):
                sizes.append(os.path.getsize(os.path.join(root, fn)))
    total = sum(sizes)
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src).coalesce(n_out).write.mode("overwrite").parquet(dst)
    return len(sizes), n_out
