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


def test_mixture_temperature_flattens_toward_target(spark, sf_dir):
    """α-temperature resampling: the rarest language keeps everything
    (rate 1.0 — the data-maximal normalization), target shares sum to
    1, and the realized kept-distribution is strictly FLATTER than the
    raw corpus distribution (that is the whole point of α<1)."""
    from als_hadoop_spark.operators.text import q_mixture_temperature

    rows = q_mixture_temperature(spark, sf_dir).collect()
    assert len(rows) >= 2
    by_lang = {r["lang"]: r for r in rows}
    rarest = min(rows, key=lambda r: r["n_total"])
    assert rarest["samp_rate"] == 1.0
    assert abs(sum(r["target_share"] for r in rows) - 1.0) < 1e-4
    # flatter: max/min share ratio shrinks vs the raw corpus
    tot_all = sum(r["n_total"] for r in rows)
    kept_all = sum(r["n_kept"] for r in rows)
    raw = [r["n_total"] / tot_all for r in rows]
    new = [r["n_kept"] / kept_all for r in rows]
    assert max(new) / min(new) < max(raw) / min(raw)
    # every kept count within the acceptance rate's sampling noise
    for r in rows:
        assert 0 < r["n_kept"] <= r["n_total"]
        expect = r["samp_rate"] * r["n_total"]
        assert abs(r["n_kept"] - expect) < 6 * (expect ** 0.5) + 3
