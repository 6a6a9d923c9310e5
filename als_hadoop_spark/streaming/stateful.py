"""Custom stateful streaming operator via ``applyInPandasWithState``
(north-star: the extension point for stateful semantics Spark's
built-in ``window``/``session_window`` cannot express).

``stateful_sessionize`` re-implements per-user session windows with
EXPLICIT state and event-time timeouts, demonstrating the full
contract a bespoke operator (per-entity CDC merge, anomaly run-length
tracking, trajectory stitching) needs:

- arbitrary per-key state carried across micro-batches,
- **buffer-until-watermark finalization**: micro-batches deliver a
  key's events out of event-time order, so open-session events stay
  buffered in state and a session is emitted only once the watermark
  proves no future event can join it (wm > last_event + gap) — the
  same closure rule the built-in session_window's state store applies,
- watermark-driven timeouts flushing idle keys,
- Arrow-batched Python with a self-contained closure (executors never
  import this package).

Scale: buffered state per key is bounded by the watermark horizon ×
event rate (events older than wm - gap always finalize), sharded by
group key across the state store — the same growth bound as the
built-in session aggregation.

Output rows match ``streaming.session_stats`` (user_id, w_start,
w_end, n_events, sum_value) so pytest checks every emitted session
against the batch twin.
"""

from pyspark.sql import DataFrame

#: session inactivity gap (must match streaming.SESSION_GAP for the
#: batch-twin comparison)
GAP_MS = 30 * 60 * 1000

_OUTPUT_SCHEMA = (
    "user_id LONG, w_start TIMESTAMP, w_end TIMESTAMP, n_events LONG, sum_value DOUBLE"
)
_STATE_SCHEMA = "ts_us ARRAY<LONG>, vals ARRAY<DOUBLE>"


def stateful_sessionize(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """events stream (event-time column ``ts``) → closed-session rows.

    A session is emitted exactly when the event-time watermark passes
    its last event + gap; still-open sessions at end-of-stream remain
    in state (append-mode semantics, like the built-in
    session_window)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = GAP_MS

    def sessionize(key, pdfs, state):
        import pandas as pd

        user_id = key[0]
        gap_us = gap_ms * 1000

        def finalize(buf_ts, buf_vals):
            """Split the sorted buffer into sessions; emit every
            session the watermark has closed; return the still-open
            remainder."""
            wm_us = state.getCurrentWatermarkMs() * 1000
            order = sorted(range(len(buf_ts)), key=buf_ts.__getitem__)
            ts = [buf_ts[i] for i in order]
            vals = [buf_vals[i] for i in order]
            sessions, s = [], None
            for t, v in zip(ts, vals):
                if s is None or t - s["last"] > gap_us:
                    if s is not None:
                        sessions.append(s)
                    s = {"start": t, "last": t, "n": 1, "sv": float(v), "ev": [(t, v)]}
                else:
                    s["last"], s["n"], s["sv"] = t, s["n"] + 1, s["sv"] + float(v)
                    s["ev"].append((t, v))
            if s is not None:
                sessions.append(s)
            emit, keep = [], []
            for s in sessions:
                if s["last"] + gap_us < wm_us:
                    emit.append(s)
                else:
                    keep.extend(s["ev"])
            return emit, keep

        def to_frame(emit):
            return pd.DataFrame(
                {
                    "user_id": [user_id] * len(emit),
                    "w_start": [pd.Timestamp(s["start"], unit="us") for s in emit],
                    "w_end": [pd.Timestamp(s["last"] + gap_us, unit="us") for s in emit],
                    "n_events": [s["n"] for s in emit],
                    "sum_value": [round(s["sv"], 2) for s in emit],
                }
            )

        buf_ts, buf_vals = [], []
        if state.exists:
            st_ts, st_vals = state.get
            buf_ts, buf_vals = list(st_ts), list(st_vals)
        if not state.hasTimedOut:
            for pdf in pdfs:
                us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
                buf_ts.extend(int(t) for t in us)
                buf_vals.extend(float(v) for v in pdf["value"])

        emit, keep = finalize(buf_ts, buf_vals)
        if keep:
            state.update(([t for t, _ in keep], [v for _, v in keep]))
            last_open = max(t for t, _ in keep)
            # a timeout behind the current watermark is rejected by
            # Spark — clamp forward so expired sessions flush next batch
            state.setTimeoutTimestamp(
                max(last_open // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()
        if emit:
            yield to_frame(emit)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
