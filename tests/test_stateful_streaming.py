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

    # closed + still-open (per user at most one) == all batch sessions
    n_users_open = len({r.user_id for r in batch}) \
        - 0  # upper bound; the open tail per user may or may not be closed
    assert len(closed) <= len(batch)
    assert len(batch) - len(closed) <= len({r.user_id for r in batch})


def test_stateful_sessions_event_conservation(spark, events_dir, drained):
    closed, batch = drained
    total = spark.read.parquet(events_dir).count()
    assert sum(r.n_events for r in batch) == total
    open_tail_events = total - sum(r.n_events for r in closed)
    assert 0 <= open_tail_events <= total
