"""Polygon-path scale proof (VERDICT r3 #4): run zones_tileset over a
100k-polygon fixture (mixed sizes incl. holes) and report features/s/core,
so the per-feature Python loops in render_zone_features/encode_zone_tiles
are measured at the claimed scale instead of the 520-polygon gate fixture.

Usage: python tools/zones_scale.py [--n-zones 100000] [--maxzoom 10] [--cpus 32]

Single-window absolute measurement (this host's multi-core throughput swings
3-4x between windows — compare only numbers from the same run; the
features/s/core vs point-path comparison uses the SAME window's point rate
when --with-points is given).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-zones", type=int, default=100_000)
    ap.add_argument("--maxzoom", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--with-points", type=int, default=0,
                    help="also run the point tileset over N images in the "
                         "same window for a per-core comparison")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("zones_scale")
             .config("spark.sql.shuffle.partitions", str(args.cpus * 4))
             .config("spark.sql.adaptive.enabled", "false")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from planetiler_spark.operators import tile_pipeline as tp

    out = {"n_zones": args.n_zones, "maxzoom": args.maxzoom, "cpus": args.cpus}

    t0 = time.time()
    tiles = tp.zones_tileset(spark, 0, args.maxzoom, n_zones=args.n_zones,
                             shuffle_partitions=args.cpus * 4)
    agg = tiles.agg(F.count("*").alias("nt"),
                    F.sum("n_features").alias("nf")).collect()[0]
    wall = time.time() - t0
    out.update(zones_wall_s=round(wall, 1), n_tiles=int(agg.nt),
               n_features=int(agg.nf),
               zones_features_per_s=round(agg.nf / wall, 1),
               zones_features_per_s_per_core=round(agg.nf / wall / args.cpus, 1))

    if args.with_points:
        from planetiler_spark.sources import images as src
        imgs = src.images_df(spark, args.with_points,
                             partitions=args.cpus * 2, with_bytes=False)
        t0 = time.time()
        pts = tp.tileset(spark, imgs, 0, args.maxzoom,
                         shuffle_partitions=args.cpus * 4)
        pagg = pts.agg(F.count("*").alias("nt"),
                       F.sum("n_features").alias("nf")).collect()[0]
        pwall = time.time() - t0
        out.update(points_wall_s=round(pwall, 1), points_n_features=int(pagg.nf),
                   points_features_per_s_per_core=round(
                       pagg.nf / pwall / args.cpus, 1))
        out["zones_vs_points_per_core"] = round(
            out["points_features_per_s_per_core"]
            / out["zones_features_per_s_per_core"], 2)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
