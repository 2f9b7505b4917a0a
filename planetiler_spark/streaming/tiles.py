"""Incremental tileset maintenance over a stream of image rows.

The reference is a batch engine: adding inputs means re-running the whole
pipeline (Planetiler.run). This module is the streaming upgrade the graft
calls for — a Structured Streaming job that keeps a materialized tile table
up to date as image rows arrive, re-encoding ONLY the tiles a micro-batch
touches:

  per micro-batch (foreachBatch):
    1. render the new rows' per-(feature, zoom, tile) feature rows
       (tile_pipeline.render_features — the embarrassingly parallel map phase)
    2. append them to a feature log under  out/features/batch=<id>/bucket=K/
       written with mode("overwrite") into the batch's OWN directory, so a
       replayed batch (post-crash) overwrites itself — idempotent, which is
       what makes foreachBatch exactly-once here
    3. re-encode only the affected buckets: read the feature log filtered to
       those buckets (directory-partition pruning — untouched buckets are
       never listed), group-by-tile MVT encode (encode_vector_tiles, the same
       reduce the batch pipeline uses), and dynamic-partition-overwrite the
       tile table at  out/tiles/bucket=K/

Equivalence invariant (tested in test_streaming_tiles): after any sequence of
micro-batches, the tile table equals `tileset()` run over the union of all
inputs — same n_features, same content_hash per tile — because tile encode
always re-runs from the FULL feature set of an affected tile, and the
map-side partial thin retains a superset of every global label-grid top-K
(_partial_thin keeps per-partition top-K, and any global top-K row is top-K
within its own partition regardless of how rows were batched).

Scale shape: work per batch is O(new rows) render + O(features in affected
buckets) re-encode, and buckets are SPATIAL (zoom-4 ancestor cells — see
_bucket), so one point's whole pyramid lives in one bucket and a
geographically-small batch touches few buckets: a city-sized batch rewrites
~city-sized state, never the planet (test: 5 new images touch <= 6 of 64
buckets while the bulk load touches most). Raise n_buckets (and the anchor
zoom) to shrink amplification further at planet scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import tile_pipeline as tp


def _bucket(n_buckets: int):
    """SPATIAL bucket from (tile_id, zoom): tiles at zoom >= 4 bucket by their
    zoom-4 ancestor cell, so ONE point's whole deep pyramid lands in ONE
    bucket and a geographically-small micro-batch touches few buckets (a
    plain pmod(tile_id) would scatter each pyramid across every bucket and
    force a full rewrite per batch). The 85 zoom 0-3 overview tiles share
    bucket 0 — tiny, rewritten every batch by design. Derived from the TMS
    layout tile_id = start(z) + x*2^z + (2^z-1-y); all arithmetic stays well
    under 2^53 so the float divisions are exact."""
    p = "(tile_id - CAST(round((power(4.0, zoom) - 1) / 3) AS BIGINT))"
    x = f"CAST(floor({p} / power(2.0, zoom)) AS BIGINT)"
    iy = f"({p} - {x} * CAST(power(2.0, zoom) AS BIGINT))"
    y = f"(CAST(power(2.0, zoom) AS BIGINT) - 1 - {iy})"
    xa = f"CAST(floor({x} / power(2.0, zoom - 4)) AS BIGINT)"
    ya = f"CAST(floor({y} / power(2.0, zoom - 4)) AS BIGINT)"
    return F.expr(
        f"CASE WHEN zoom < 4 THEN 0 ELSE "
        f"1 + pmod({xa} * 16 + {ya}, {n_buckets - 1}) END").cast("int")


def apply_batch(spark: SparkSession, batch_df: DataFrame, batch_id: int,
                out_dir: str, min_zoom: int = 0, max_zoom: int = 11,
                n_buckets: int = 64, thin_limit: int | None = 64) -> list[int]:
    """Process one micro-batch (the foreachBatch body, callable directly for
    tests / replay). Returns the affected bucket ids."""
    feat_root = os.path.join(out_dir, "features")
    tile_root = os.path.join(out_dir, "tiles")

    feats = (tp.render_features(batch_df, min_zoom, max_zoom,
                                thin_limit=thin_limit)
             .withColumn("bucket", _bucket(n_buckets)))
    # idempotent append: the batch's own directory, overwritten on replay
    (feats.write.partitionBy("bucket").mode("overwrite")
     .parquet(os.path.join(feat_root, f"batch={batch_id}")))

    # affected buckets: read back this batch's tiny directory listing rather
    # than recomputing the render
    batch_feats = spark.read.parquet(os.path.join(feat_root, f"batch={batch_id}"))
    affected = sorted(r.bucket for r in
                      batch_feats.select("bucket").distinct().collect())
    if not affected:
        return affected

    # full feature history for ONLY the affected buckets (partition pruning on
    # both levels: batch=* is listed, bucket filter prunes directories)
    log = (spark.read.option("basePath", feat_root).parquet(feat_root)
           .filter(F.col("bucket").isin([int(b) for b in affected])))
    tiles = tp.encode_vector_tiles(log.drop("batch", "bucket"),
                                   thin_limit=thin_limit)
    tiles = tiles.withColumn("bucket", _bucket(n_buckets))

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (tiles.write.partitionBy("bucket").mode("overwrite").parquet(tile_root))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return affected


def incremental_tileset(images_stream: DataFrame, out_dir: str,
                        min_zoom: int = 0, max_zoom: int = 11,
                        n_buckets: int = 64, thin_limit: int | None = 64,
                        checkpoint: str | None = None):
    """Start the maintenance stream: writeStream.foreachBatch(apply_batch).
    `images_stream` is any streaming DataFrame with the images schema minus
    `bytes` (e.g. spark.readStream.schema(...).parquet(dir))."""
    spark = images_stream.sparkSession

    def process(batch_df: DataFrame, batch_id: int):
        apply_batch(spark, batch_df, batch_id, out_dir, min_zoom, max_zoom,
                    n_buckets, thin_limit)

    return (images_stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation",
                    checkpoint or os.path.join(out_dir, "_checkpoint"))
            .start())


def read_tiles(spark: SparkSession, out_dir: str) -> DataFrame:
    """The maintained tile table (drop the storage bucket column)."""
    return spark.read.parquet(os.path.join(out_dir, "tiles")).drop("bucket")
