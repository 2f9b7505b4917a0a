"""Streaming ingest: file-source micro-batches -> watermarked windowed aggs
and streaming tile-count maintenance.

readStream -> transformations -> writeStream per the Spark structured
streaming model; `Trigger.availableNow` drains whatever input exists and
stops — the testable batch-equivalent mode. Late data is bounded by a
watermark; results are append/complete-mode windowed aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import exprs as X


def stream_events(spark: SparkSession, events_dir: str, schema=None) -> DataFrame:
    """File-source stream over an events parquet directory (micro-batch per
    file group). Schema must be known up-front for streams."""
    if schema is None:
        schema = spark.read.parquet(events_dir).schema
    df = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(events_dir))
    # watermarks require TIMESTAMP (with tz); parquet NTZ casts losslessly
    # under the UTC session timezone
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "30 minutes") -> DataFrame:
    """Event-time tumbling-window counts per event_type with a late-data
    watermark — the canonical streaming aggregate."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.approx_count_distinct("user_id").alias("approx_users"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "approx_users"))


def streaming_tile_counts(events: DataFrame, zoom: int = 8) -> DataFrame:
    """Maintain per-tile event counts as a stream: derive the tile id from
    user_id (same LCG anchor rules as the batch engine) and aggregate —
    streaming shuffle keyed exactly like the batch group-by-tile."""
    tid = X.tile_id_from_key("user_id", zoom)
    return (events
            .withWatermark("ts", "1 hour")
            .select(F.expr(tid).alias("tile_id"), "ts")
            .groupBy(F.window("ts", "6 hours").alias("w"), "tile_id")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "tile_id", "n"))


def run_available_now(stream_df: DataFrame, query_name: str,
                      output_mode: str = "complete") -> DataFrame:
    """Drain all available input through the memory sink and return the result
    table — deterministic, used by tests and the driver correctness gate."""
    spark = stream_df.sparkSession
    q = (stream_df.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    # stateful queries with processing-time timeouts stay pending after the
    # available data drains (waiting for timeout triggers) — poll until no
    # batches are in flight, then stop explicitly
    import time as _t
    deadline = _t.time() + 300
    while _t.time() < deadline:
        if q.awaitTermination(5):
            break
        st = q.status
        if not st["isDataAvailable"] and not st["isTriggerActive"]:
            break  # idle between triggers: safe to stop without aborting work
        prog = q.recentProgress
        if prog and prog[-1]["numInputRows"] == 0 and not st["isTriggerActive"]:
            # drained: last completed epoch saw no input (stateful queries keep
            # isDataAvailable pending on timeouts). The trigger-inactive check
            # matters: stopping while the final timeout-flush batch is still
            # RUNNING commits only part of its output to the memory sink.
            break
    q.stop()
    q.awaitTermination(60)
    return spark.table(query_name)
