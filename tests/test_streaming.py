"""True Structured Streaming tests (SURVEY.md §5.5): the SAME
transformation functions registered as batch twins are executed as real
streams (file source → watermark → stateful agg → memory sink,
Trigger.AvailableNow) and must produce the batch answer — the
batch/stream unification contract."""

from __future__ import annotations

import pytest

from als_hadoop_spark import streaming
from als_hadoop_spark.sources import load


def _run_stream(spark, transform, events_batch, src_dir, name):
    events_batch.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(events_batch.schema).parquet(src_dir)
    assert stream.isStreaming
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish in time"
    finally:
        q.stop()
    return spark.table(name)


def _canon(df):
    return sorted(tuple(str(v) for v in row) for row in df.collect())


@pytest.mark.parametrize(
    "transform,name",
    [(streaming.tumbling_counts, "t_tumble"), (streaming.session_stats, "t_session")],
    ids=["tumbling", "session"],
)
def test_stream_equals_batch(spark, sf_dir, tmp_path, transform, name):
    events = load(spark, sf_dir, "events")
    got = _run_stream(spark, transform, events, str(tmp_path / "ev_src"), name)
    want = transform(events)
    assert _canon(got) == _canon(want)


def test_watermark_is_applied_in_stream_plan(spark, sf_dir, tmp_path):
    """The streaming plan carries the watermark node (late-data
    eviction); the batch twin does not (exact answer)."""
    events = load(spark, sf_dir, "events")
    events.write.mode("overwrite").parquet(str(tmp_path / "ev_wm"))
    stream = spark.readStream.schema(events.schema).parquet(str(tmp_path / "ev_wm"))
    plan = streaming.tumbling_counts(stream)._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan
    batch_plan = (
        streaming.tumbling_counts(events)._jdf.queryExecution().analyzed().toString()
    )
    assert "EventTimeWatermark" not in batch_plan
