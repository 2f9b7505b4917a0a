"""Custom stateful streaming operator: incremental sessionization with
`applyInPandasWithState`, tolerant of cross-batch late data.

The batch engine sessionizes with a lag-window (plans/queries.py
events_sessionize). This operator maintains the same 30-minute-gap semantics
INCREMENTALLY across micro-batches with WATERMARK-BOUNDED buffering:

  - per-user state holds the raw event-time buffer of every event that could
    still be affected by late arrivals;
  - a session is emitted (and its events dropped from the buffer) only once
    `session_end <= watermark - gap`: by the watermark guarantee no future
    event can be early enough to join or split it, so emission is FINAL and
    exactly-once in append mode;
  - events may arrive out of order both within a batch and ACROSS batches,
    as long as they are no later than the configured watermark delay —
    the same contract as Spark's windowed aggregations;
  - event-time timeouts flush users that stop receiving events once the
    watermark passes their last session's close point.

This is the `applyInPandasWithState` pattern for custom stateful operators
(the reference engine is batch-only, SURVEY §2.10)."""

from __future__ import annotations

import pandas as pd

SESSION_GAP_S = 1800
GAP_US = SESSION_GAP_S * 1_000_000
WATERMARK_DELAY = "30 minutes"

OUTPUT_SCHEMA = ("user_id long, session_start timestamp, session_end timestamp, "
                 "n_events long, closed boolean")
STATE_SCHEMA = "buf array<long>"


def _sessions_of(ts_sorted: list[int]):
    """Sorted event times (us) -> [(start, last, n)] under the gap rule."""
    sessions = []
    start = last = None
    n = 0
    for t in ts_sorted:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > GAP_US:
            sessions.append((start, last, n))
            start, last, n = t, t, 1
        else:
            last = t
            n += 1
    if start is not None:
        sessions.append((start, last, n))
    return sessions


def _sessionize_group(key, pdfs, state):
    """Merge this micro-batch's events (possibly late/out-of-order) into the
    user's watermark-bounded buffer; emit every session that the watermark
    has made FINAL, keep the rest buffered."""
    (user_id,) = key
    wm_us = state.getCurrentWatermarkMs() * 1000
    cutoff = wm_us - GAP_US

    new_ts: list[int] = []
    for pdf in pdfs:
        new_ts.extend(pdf["ts"].astype("int64").floordiv(1_000).tolist())
    buf = list(state.get[0]) if state.exists else []
    ts = sorted(buf + new_ts)
    if not ts:
        if state.exists:
            state.remove()
        return

    sessions = _sessions_of(ts)
    # STRICT inequality: a session whose last event sits exactly at
    # cutoff (= watermark - gap) can still be extended by an on-time event
    # at ts == watermark, since the split rule merges t - last == GAP_US;
    # emitting it would duplicate/split the session in append mode
    closed = [s for s in sessions if s[1] < cutoff]
    kept = [s for s in sessions if s[1] >= cutoff]

    if kept:
        import bisect
        state.update((ts[bisect.bisect_left(ts, kept[0][0]):],))
        # flush when the watermark reaches the EARLIEST kept session's close
        # point — arming at the latest would strand intermediate sessions
        # that become final while the user receives no new events (each
        # firing emits everything final so far and re-arms for the next).
        # Firing marginally early is harmless: the handler re-evaluates the
        # cutoff and re-arms.
        timeout_ms = max(kept[0][1] // 1000 + SESSION_GAP_S * 1000,
                         wm_us // 1000 + 1)
        state.setTimeoutTimestamp(timeout_ms)
    elif state.exists:
        state.remove()

    if closed:
        yield pd.DataFrame({
            "user_id": [user_id] * len(closed),
            "session_start": [pd.Timestamp(s[0], unit="us") for s in closed],
            "session_end": [pd.Timestamp(s[1], unit="us") for s in closed],
            "n_events": [s[2] for s in closed],
            "closed": [True] * len(closed),
        })


def sessionize_stream(events, watermark_delay: str = WATERMARK_DELAY):
    """events stream -> closed-session stream (append mode). Late events
    within `watermark_delay` are merged into the correct session even when
    they arrive in a LATER micro-batch."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (events
            .select("user_id", "ts")
            .withWatermark("ts", watermark_delay)
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_group,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def flush_open_sessions_batch(spark, events_dir: str):
    """Batch oracle: full sessionization of the same input — closed sessions
    from the stream plus still-open tails must equal this."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    ev = spark.read.parquet(events_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "new_s",
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(F.unix_micros(F.col("ts").cast("timestamp"))
              - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
              > SESSION_GAP_S * 1_000_000, 1).otherwise(0))
    sess = gaps.withColumn("sid", F.sum("new_s").over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)))
    return sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"))
