"""Run the headline jobs at ONE parallelism level; print one JSON line.

Invoked by tools/bench_scaling.py in a fresh subprocess per level (fresh JVM,
clean thread pool). Input parquet must already exist (same bytes for every
level — the two-cluster-size criterion requires identical input).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--images", required=True, help="images parquet (no bytes)")
    ap.add_argument("--images-raster", required=True, help="images parquet (with bytes)")
    ap.add_argument("--maxzoom", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName(f"scaling_{args.cpus}")
             .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
             .config("spark.sql.adaptive.enabled", "true")
             # do NOT byte-coalesce post-shuffle partitions: our reduce stages
             # are Python-CPU-bound (MVT encode, PNG paste), and AQE's 64MB
             # sizing would collapse them to a handful of tasks
             .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
             .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from planetiler_spark.operators import spatial as sp
    from planetiler_spark.operators import tile_pipeline as tp

    out = {"cpus": args.cpus}
    images = spark.read.parquet(args.images)
    images.count()  # warm FS cache + JVM before timing

    # --- job 1: vector tileset (tiles/sec) ---
    t0 = time.time()
    tiles = tp.tileset(spark, images, 0, args.maxzoom,
                       shuffle_partitions=args.cpus * 2, ordered=False)
    agg = tiles.agg(F.count("*").alias("nt"), F.sum("n_features").alias("nf")).collect()[0]
    dt = time.time() - t0
    out["tileset_wall_s"] = round(dt, 2)
    out["n_tiles"] = int(agg.nt)
    out["n_features"] = int(agg.nf)
    out["tiles_per_s"] = round(agg.nt / dt, 1)
    out["features_per_s"] = round(agg.nf / dt, 1)

    # --- job 2: PIP spatial join (join rows/sec) ---
    t0 = time.time()
    joined = sp.pip_zones(images, within=0.01)
    nj = joined.count()
    dt = time.time() - t0
    out["pip_wall_s"] = round(dt, 2)
    out["pip_rows"] = int(nj)
    out["pip_rows_per_s"] = round(nj / dt, 1)

    # --- job 3: raster patch tiling (patch tiles/sec) ---
    imgs_r = spark.read.parquet(args.images_raster)
    imgs_r.count()
    t0 = time.time()
    rast = tp.raster_tileset(spark, imgs_r)
    nr = rast.count()
    dt = time.time() - t0
    out["raster_wall_s"] = round(dt, 2)
    out["n_raster_tiles"] = int(nr)
    out["raster_tiles_per_s"] = round(nr / dt, 1)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
