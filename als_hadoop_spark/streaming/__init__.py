"""Structured Streaming surface (north-star; SURVEY.md §2 Part C
q_stream_tumbling / q_stream_session, §7.1 M4).

The reference is batch-only MapReduce — no watermarks, windows, state,
or late-data handling exist there (SURVEY.md §2 Part B). This module
gives the engine the streaming capability a training-data pipeline
needs, with ONE transformation function per operator applied to both
execution modes:

- **batch twin** (registered in ``queries()``): the same
  ``window()`` / ``session_window()`` aggregation over the ``events``
  table — deterministic, DuckDB-oracle-checkable (``time_bucket`` /
  gaps-and-islands twins).
- **true streaming** (pytest ``tests/test_streaming.py``): the
  identical function over ``readStream`` input with a watermark,
  executed with ``Trigger.AvailableNow`` into a memory sink and
  asserted equal to the batch twin — the batch/stream unification
  Structured Streaming is built on.

Scale notes: tumbling windows shuffle on (window, key) — bounded state,
watermark evicts closed windows; session windows keep per-key session
state whose size is bounded by the gap × event rate per key. Both are
the standard Spark state-store shapes; nothing custom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load

#: tumbling-window width for q_stream_tumbling
TUMBLE = "5 minutes"
#: session gap for q_stream_session
SESSION_GAP = "30 minutes"
#: watermark delay for late data (streaming mode only)
WATERMARK = "10 minutes"


def _maybe_watermark(events: DataFrame) -> DataFrame:
    """Watermark applies only on streaming plans; batch mode computes
    the complete exact answer (the oracle twin)."""
    return events.withWatermark("ts", WATERMARK) if events.isStreaming else events


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Tumbling 5-minute window × event_type: count + value sum. Works
    identically on a batch DataFrame and a watermarked stream."""
    return (
        _maybe_watermark(events)
        .groupBy(F.window("ts", TUMBLE).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


#: sliding-window config for q_stream_sliding: 10-minute windows every
#: 5 minutes — each event lands in exactly WIDTH/SLIDE = 2 windows
SLIDE_WIDTH = "10 minutes"
SLIDE_STEP = "5 minutes"


def sliding_counts(events: DataFrame) -> DataFrame:
    """Sliding 10-minute window every 5 minutes × event_type: count +
    value sum. Spark's window(ts, width, slide) replicates each row
    into width/slide windows BEFORE the aggregation shuffle (an Expand
    node), so state per window stays one aggregate row — the standard
    overlapping-window shape. Works identically on batch and
    watermarked streams."""
    return (
        _maybe_watermark(events)
        .groupBy(F.window("ts", SLIDE_WIDTH, SLIDE_STEP).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_stats(events: DataFrame) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap:
    session bounds + event count + value sum. Spark's session_window
    end = last event ts + gap; sessions merge while events arrive
    within the gap."""
    return (
        _maybe_watermark(events)
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
            "sum_value",
        )
    )


def click_attribution(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: every non-click event attributed to
    any click by the same user in the preceding 30 minutes. On streams
    both sides carry watermarks and the time-range predicate bounds the
    join state (rows age out once the watermark passes the interval) —
    the canonical stream-stream join shape. On batch frames the same
    expression is a plain interval join, giving the oracle twin.

    Scale: state is O(events within the watermark+interval horizon) per
    user shard; the equi-key (user_id) shards the state store."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    rest = events.filter(F.col("event_type") != "click").select(
        "event_id", "user_id", "ts", "event_type"
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", WATERMARK)
        rest = rest.withWatermark("ts", WATERMARK)
    cond = (
        (rest.user_id == clicks.c_user)
        & (rest.ts > clicks.click_ts)
        & (rest.ts <= clicks.click_ts + F.expr("INTERVAL 30 MINUTES"))
    )
    return rest.join(clicks, cond).select(
        "event_id", "user_id", "event_type", "click_id", "click_ts"
    )


def attribution_outer(events: DataFrame) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click paired with
    the purchases by the same user in the following 30 minutes — or a
    NULL purchase if none arrive. The outer side is the part the inner
    join (click_attribution) can't express: on a stream, Spark holds
    each click in state until the watermark passes the end of its
    30-minute match window, and only then emits the NULL row — so
    "no conversion" is a statement the engine can prove, not just the
    absence of output.

    Scale: state per click is bounded by watermark + interval horizon,
    sharded by user_id; NULL emission is driven by the global watermark
    (min over both sides). On batch frames the same expression is a
    plain LEFT JOIN with the interval predicate — the oracle twin."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    conv = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", WATERMARK)
        conv = conv.withWatermark("conv_ts", WATERMARK)
    cond = (
        (clicks.c_user == conv.user_id)
        & (conv.conv_ts > clicks.click_ts)
        & (conv.conv_ts <= clicks.click_ts + F.expr("INTERVAL 30 MINUTES"))
    )
    return clicks.join(conv, cond, "left_outer").select(
        "click_id",
        F.col("c_user").alias("user_id"),
        "click_ts",
        "conv_id",
        "conv_ts",
    )


def dedup_events(events: DataFrame) -> DataFrame:
    """Streaming exact dedup: first occurrence of each (user_id, props)
    payload wins; duplicates arriving later are dropped. On a stream,
    dropDuplicates keeps per-key state bounded by the watermark (a
    duplicate can only be recognized within the watermark horizon —
    exactly the contract a streaming ingest dedup wants); on a batch
    frame the same call is a plain exact dedup. This is the streaming
    face of operators/dedup.q_dedup_exact."""
    keys = ["user_id", "props"]
    if events.isStreaming:
        return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def enrich_events(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static enrichment join — the dimension-lookup shape every
    event pipeline runs: each (possibly streaming) event gains its
    user's market segment from the static customer table, UNKNOWN when
    the user has no customer row.

    Scale/streaming notes: the static side BROADCASTS (a dimension), so
    the join is stateless — no watermark, no state store; Structured
    Streaming re-plans the static side per micro-batch, so a refreshed
    dimension snapshot is picked up at batch boundaries. Same single
    transform serves batch (oracle twin) and stream (pytest equal)."""
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        events.select("event_id", "user_id", "event_type", "value")
        .join(F.broadcast(dim), "user_id", "left")
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
        )
    )


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment: enriched events
    aggregated per (segment, event_type). The true streaming form
    (row-level, append mode) is pytest-verified equal."""
    enriched = enrich_events(
        load(spark, sf_dir, "events"), load(spark, sf_dir, "customer")
    )
    return enriched.groupBy("segment", "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the tumbling-window stream (SURVEY §7.1 M4)."""
    return tumbling_counts(load(spark, sf_dir, "events"))


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the session-window stream (SURVEY §7.1 M4)."""
    return session_stats(load(spark, sf_dir, "events"))


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the sliding-window stream. Oracle: every event
    belongs to exactly 2 windows (w = bucket(ts, 5min) - k·5min for
    k ∈ {0,1}), expressed as an unnest cross join in DuckDB."""
    return sliding_counts(load(spark, sf_dir, "events"))


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join (click
    attribution); the true streaming form is pytest-verified equal
    (tests/test_streaming.py)."""
    return click_attribution(load(spark, sf_dir, "events"))


def q_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream LEFT OUTER interval join; the
    true streaming form (NULL rows emitted on watermark passage) is
    pytest-verified (tests/test_streaming.py)."""
    return attribution_outer(load(spark, sf_dir, "events"))


QUERIES = {
    "q_stream_outer_join": q_stream_outer_join,
    "q_stream_tumbling": q_stream_tumbling,
    "q_stream_session": q_stream_session,
    "q_stream_sliding": q_stream_sliding,
    "q_stream_join": q_stream_join,
    "q_stream_enrich": q_stream_enrich,
}

ORACLES = {
    "q_stream_outer_join": """
        SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
               p.event_id AS conv_id, p.ts AS conv_ts
        FROM events c
        LEFT JOIN events p
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase'
         AND p.ts >  c.ts
         AND p.ts <= c.ts + INTERVAL 30 MINUTE
        WHERE c.event_type = 'click'
    """,
    "q_stream_enrich": """
        WITH enriched AS (
            SELECT e.event_id, e.event_type, e.value,
                   COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment
            FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        )
        SELECT segment, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM enriched
        GROUP BY segment, event_type
    """,
    "q_stream_tumbling": """
        SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS w_start,
               time_bucket(INTERVAL 5 MINUTE, ts) + INTERVAL 5 MINUTE AS w_end,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2, 3
    """,
    "q_stream_sliding": """
        SELECT time_bucket(INTERVAL 5 MINUTE, ts) - k * INTERVAL 5 MINUTE AS w_start,
               time_bucket(INTERVAL 5 MINUTE, ts) - k * INTERVAL 5 MINUTE
                   + INTERVAL 10 MINUTE AS w_end,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events, LATERAL unnest([0, 1]) AS u(k)
        GROUP BY 1, 2, 3
    """,
    "q_stream_join": """
        SELECT r.event_id, r.user_id, r.event_type,
               c.event_id AS click_id, c.ts AS click_ts
        FROM (SELECT * FROM events WHERE event_type != 'click') r
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON r.user_id = c.user_id
         AND r.ts > c.ts
         AND r.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    "q_stream_session": """
        WITH marked AS (
            SELECT user_id, ts, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sessioned AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM marked
        )
        SELECT user_id,
               MIN(ts) AS w_start,
               MAX(ts) + INTERVAL 30 MINUTE AS w_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM sessioned
        GROUP BY user_id, sid
    """,
}
