"""Gates for the operational utilities (functions/ops.py): observed
writes measure in the write pass and trip the quality breaker; the
compactor reduces file counts without changing data."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from als_hadoop_spark.functions.ops import compact_parquet, observed_write
from als_hadoop_spark.sources import load


def test_observed_write_reports_metrics_in_write_pass(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events")
    out = str(tmp_path / "ev_out")
    m = observed_write(ev, out, null_check_col="value")
    assert m["n_rows"] == ev.count()
    assert m["n_nulls"] == 0
    # the write really happened
    assert spark.read.parquet(out).count() == m["n_rows"]


def test_observed_write_trips_quality_breaker(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, 1.0), (4, 2.0)], "id LONG, v DOUBLE"
    )
    out = str(tmp_path / "bad_out")
    with pytest.raises(ValueError, match="null fraction 0.5"):
        observed_write(df, out, null_check_col="v", max_null_fraction=0.25)
    # circuit breaker fires AFTER the write — output exists for quarantine
    assert spark.read.parquet(out).count() == 4


def test_compact_parquet_merges_small_files(spark, sf_dir, tmp_path):
    src = str(tmp_path / "shattered")
    dst = str(tmp_path / "compacted")
    ev = load(spark, sf_dir, "events")
    ev.repartition(16).write.parquet(src)  # 16 tiny files
    n_in, n_out = compact_parquet(spark, src, dst, target_bytes=1 << 30)
    assert n_in == 16 and n_out == 1
    got = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert got == 1
    # same rows, nothing lost
    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert a == b
    # the compacted scan plans far fewer input splits
    assert spark.read.parquet(dst).rdd.getNumPartitions() <= 2
