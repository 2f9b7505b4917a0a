"""Custom stateful streaming operator tests: applyInPandasWithState
sessionization drained over micro-batches == batch sessionization
(closed sessions + open tails)."""

import pytest

from planetiler_spark.streaming import events as se
from planetiler_spark.streaming import sessions as ss

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Time-ranged files landing in ingest order -> several micro-batches;
    per-user sessions span file boundaries so state must carry across."""
    import time
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("sev") / "events")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    tsu = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = ev.withColumn("_tsu", tsu)
    bounds = ev.selectExpr(
        "percentile(_tsu, array(0.33, 0.66))").collect()[0][0]
    edges = [float("-inf")] + list(bounds) + [float("inf")]
    for i in range(3):
        part = (ev.filter((F.col("_tsu") > edges[i]) &
                          (F.col("_tsu") <= edges[i + 1])).drop("_tsu"))
        part.coalesce(1).write.mode("append").parquet(d)
        time.sleep(1.1)  # distinct mtimes -> deterministic micro-batch order
    return d


@pytest.fixture(scope="module")
def drained(spark, events_dir):
    stream = se.stream_events(spark, events_dir)
    closed = se.run_available_now(ss.sessionize_stream(stream),
                                  "sessions_out", output_mode="append").collect()
    batch = ss.flush_open_sessions_batch(spark, events_dir).collect()
    return closed, batch


def test_stateful_sessions_match_batch(spark, drained):
    closed, batch = drained

    # every closed session emitted by the stream must exist in the batch
    # result with identical bounds and counts
    batch_keys = {(r.user_id, r.session_start, r.session_end, r.n_events)
                  for r in batch}
    for r in closed:
        assert (r.user_id, r.session_start, r.session_end, r.n_events) in batch_keys, r

    # sessions not yet emitted are exactly those the final watermark hasn't
    # made final (session_end > wm - gap); everything earlier MUST be closed
    assert len(closed) <= len(batch)
    if closed:
        import pandas as pd
        wm_us = max(pd.Timestamp(r.session_end).value // 1000 for r in closed)
        for r in batch:
            end_us = pd.Timestamp(r.session_end).value // 1000
            # 1s margin absorbs ms-rounding on the timeout edge
            if end_us <= wm_us - 1_000_000:  # earlier than latest closed -> must close
                assert (r.user_id, r.session_start, r.session_end,
                        r.n_events) in {(c.user_id, c.session_start,
                                         c.session_end, c.n_events)
                                        for c in closed}


def test_cross_batch_late_event(spark, tmp_path_factory):
    """An event arriving one micro-batch LATE (but within the watermark
    delay) must merge into the session it belongs to — the
    watermark-bounded buffer, not the old in-order-across-batches
    contract."""
    import time
    import pandas as pd

    d = str(tmp_path_factory.mktemp("late") / "events")
    base = pd.Timestamp("2024-01-01")
    m = pd.Timedelta("1min")
    batches = [
        # batch 1: session starts [0, 10min]
        pd.DataFrame({"user_id": [1, 1], "event_id": [1, 2],
                      "ts": [base, base + 10 * m]}),
        # batch 2: event at 5min arrives LATE (previous batch already at
        # 10min) + a separate later session at 120min
        pd.DataFrame({"user_id": [1, 1], "event_id": [3, 4],
                      "ts": [base + 5 * m, base + 120 * m]}),
        # batch 3: advances the watermark far enough to finalize [0..10min]
        pd.DataFrame({"user_id": [1], "event_id": [5],
                      "ts": [base + 240 * m]}),
    ]
    for b in batches:
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(d)
        time.sleep(1.1)
    closed = se.run_available_now(
        ss.sessionize_stream(se.stream_events(spark, d)),
        "late_out", output_mode="append").collect()
    got = {(r.user_id, pd.Timestamp(r.session_start),
            pd.Timestamp(r.session_end), r.n_events) for r in closed}
    # the late 5min event merged into the first session -> 3 events
    assert (1, base, base + 10 * m, 3) in got, got


def test_stateful_sessions_event_conservation(spark, events_dir, drained):
    closed, batch = drained
    total = spark.read.parquet(events_dir).count()
    assert sum(r.n_events for r in batch) == total
    open_tail_events = total - sum(r.n_events for r in closed)
    assert 0 <= open_tail_events <= total
