"""ALS end-to-end metric tests (SURVEY.md §5.2 — mirrors the
reference's own held-out-RMSE gate, ALS-Hadoop/ALS/ALS.java:392-433)."""

from __future__ import annotations

from als_hadoop_spark.operators.als import als_pipeline, synth_ratings


def test_synth_ratings_deterministic_and_bounded(spark):
    r1 = synth_ratings(spark, n_users=100, n_items=50, n_ratings=2000)
    r2 = synth_ratings(spark, n_users=100, n_items=50, n_ratings=2000)
    rows1 = sorted(map(tuple, r1.collect()))
    rows2 = sorted(map(tuple, r2.collect()))
    assert rows1 == rows2
    assert all(1.0 <= r[2] <= 5.0 for r in rows1)
    # no duplicate (user, item) pairs — SURVEY.md §7.3.5
    assert len({(u, i) for u, i, _ in rows1}) == len(rows1)


def test_als_beats_global_mean(spark):
    """The reference's quality gate: held-out RMSE below threshold and
    better than the trivial predictor (BASELINE.md operational gate)."""
    ratings = synth_ratings(spark)
    preds, rmse, base_rmse = als_pipeline(ratings, max_iter=10)
    assert preds.count() > 0
    assert rmse < 1.0, f"rmse={rmse}"
    assert rmse < base_rmse, f"rmse={rmse} vs global-mean={base_rmse}"


def test_cold_start_rows_dropped(spark):
    """ALS/ALS.java:460-464 semantics: probe rows whose user/item is
    unseen in training are dropped, not NaN-predicted."""
    ratings = synth_ratings(spark, n_users=100, n_items=50, n_ratings=1500)
    preds, _, _ = als_pipeline(ratings, max_iter=2)
    assert preds.filter("prediction != prediction").count() == 0  # no NaN
