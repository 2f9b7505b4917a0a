"""Custom stateful streaming operator: incremental sessionization with
`applyInPandasWithState`.

The batch engine sessionizes with a lag-window (plans/queries.py
events_sessionize). This operator maintains the same 30-minute-gap semantics
INCREMENTALLY across micro-batches: per-user open-session state (start, last
event ts, count) lives in the state store; sessions close when a new event
arrives past the gap or the state times out, and closed sessions are emitted
downstream. This is the `applyInPandasWithState` pattern for custom stateful
operators (the reference engine is batch-only, SURVEY §2.10).

Ordering contract: micro-batches must arrive in event-time order ACROSS
batches (the normal shape for ingest directories where files land in time
order); events may be arbitrarily unordered WITHIN a batch (sorted here).
Cross-batch late data would need a watermark-bounded buffer in the state —
out of scope, matching the watermark semantics of windowed aggs in
streaming/events.py."""

from __future__ import annotations

import pandas as pd

SESSION_GAP_S = 1800

OUTPUT_SCHEMA = ("user_id long, session_start timestamp, session_end timestamp, "
                 "n_events long, closed boolean")
STATE_SCHEMA = "start long, last long, n long"


def _sessionize_group(key, pdfs, state):
    """Fold this micro-batch's events for one user into the running session
    state; emit every session CLOSED by a gap, keep the open one in state."""
    (user_id,) = key
    if state.hasTimedOut:
        (start, last, n) = state.get
        state.remove()
        yield pd.DataFrame({
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start, unit="us")],
            "session_end": [pd.Timestamp(last, unit="us")],
            "n_events": [n], "closed": [True],
        })
        return

    ts = []  # microseconds: exact round-trip of Spark timestamps
    for pdf in pdfs:
        ts.extend(pdf["ts"].astype("int64").floordiv(1_000).tolist())
    ts.sort()
    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0
    out = {k: [] for k in ("user_id", "session_start", "session_end",
                           "n_events", "closed")}
    for t in ts:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > SESSION_GAP_S * 1_000_000:
            out["user_id"].append(user_id)
            out["session_start"].append(pd.Timestamp(start, unit="us"))
            out["session_end"].append(pd.Timestamp(last, unit="us"))
            out["n_events"].append(n)
            out["closed"].append(True)
            start, last, n = t, t, 1
        else:
            last = t
            n += 1
    state.update((start, last, n))
    state.setTimeoutDuration(SESSION_GAP_S * 1000)
    if out["user_id"]:
        yield pd.DataFrame(out)


def sessionize_stream(events):
    """events stream -> closed-session stream (append mode)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (events
            .select("user_id", "ts")
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_group,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


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
