"""Structured Streaming surface: availableNow drain must equal the batch
equivalent (the streaming analog of the oracle gate)."""

import shutil

import pytest

from pyspark.sql import functions as F

from planetiler_spark.streaming import events as se

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # copy events into an isolated dir (file-source streams list directories)
    d = str(tmp_path_factory.mktemp("ev") / "events")
    spark.read.parquet(f"{SF}/events.parquet").repartition(4) \
        .write.mode("overwrite").parquet(d)
    return d


def test_windowed_counts_match_batch(spark, events_dir):
    stream = se.stream_events(spark, events_dir)
    got = se.run_available_now(
        se.windowed_event_counts(stream), "win_counts").collect()
    batch = (spark.read.parquet(events_dir)
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count("*").alias("n"),
                  F.approx_count_distinct("user_id").alias("approx_users"))
             .select(F.col("w.start").alias("window_start"), "event_type",
                     "n", "approx_users")
             .collect())
    key = lambda r: (r.window_start, r.event_type)
    assert sorted((key(r), r.n) for r in got) == sorted((key(r), r.n) for r in batch)
    assert len(got) > 0


def test_streaming_tile_counts_match_batch(spark, events_dir):
    from planetiler_spark.functions import exprs as X
    stream = se.stream_events(spark, events_dir)
    got = se.run_available_now(
        se.streaming_tile_counts(stream, zoom=6), "tile_counts").collect()
    tid = X.tile_id_from_key("user_id", 6)
    batch = (spark.read.parquet(events_dir)
             .select(F.expr(tid).alias("tile_id"), "ts")
             .groupBy(F.window("ts", "6 hours").alias("w"), "tile_id")
             .agg(F.count("*").alias("n")).collect())
    assert sorted((r.tile_id, r.n) for r in got) == \
        sorted((r.tile_id, r.n) for r in batch)


def test_incremental_microbatches(spark, events_dir):
    # maxFilesPerTrigger=1 -> multiple micro-batches drain to the same totals
    stream = se.stream_events(spark, events_dir)
    got = se.run_available_now(
        se.windowed_event_counts(stream, window="24 hours"), "win24").collect()
    total = sum(r.n for r in got)
    assert total == spark.read.parquet(events_dir).count()
