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


def bw_probe(n: int = 16_777_216, iters: int = 5) -> float:
    """Fixed single-thread STREAM-triad-style memory-bandwidth probe: window
    health as a NUMBER logged per run (VERDICT r4 #1). Two numpy passes over
    128 MB arrays (far beyond L3): a = 0.5*c then a += b — traffic 40 B/elem
    (multiply: read c + write a; add: read a + read b + write a). Returns the
    best GB/s over `iters`; arrays are identical every call so readings are
    comparable across runs, levels, and rounds."""
    import numpy as np
    a = np.zeros(n)
    b = np.ones(n)
    c = np.full(n, 2.0)
    np.multiply(c, 0.5, out=a)
    a += b  # warm-up touch of all three
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.multiply(c, 0.5, out=a)
        a += b
        best = min(best, time.perf_counter() - t0)
    return round(40.0 * n / best / 1e9, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--images", required=True, help="images parquet (no bytes)")
    ap.add_argument("--images-raster", required=True, help="images parquet (with bytes)")
    ap.add_argument("--maxzoom", type=int, default=10)
    # fixed across levels: the PLAN must be identical at N and 4N cores
    # (only resources change); 128 spreads hot-tile partitions + amortizes
    # per-task overhead (measured: 64 parts -> 141s, 128 -> 71s at 32 cores).
    # r5: 256 for the 3v12 pairing — halves the last-wave ramp of the tile
    # reduce (tail90 3.9s -> 3.3s, occ 93.6% -> 97.3% at 12 cores, event-log
    # profile) while per-task overhead stays immaterial at both levels.
    ap.add_argument("--shuffle-partitions", type=int, default=256)
    ap.add_argument("--reps", type=int, default=1,
                    help="run each job this many times; report all walls")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName(f"scaling_{args.cpus}")
             .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
             # static plan for benchmarking: AQE buys nothing here (fixed
             # partition counts, no joins to re-plan) and its shuffle-stage
             # materialization adds ~15% wall; NEVER enable its byte-based
             # partition coalescing on Python-CPU-bound reduce stages
             .config("spark.sql.adaptive.enabled", "false")
             # big Arrow batches: per-batch fixed overhead in mapInPandas
             # stages dominates at the default 10k (measured 2.7x slower).
             # 65536 is the sweet spot: a 262144 ablation scored WORSE on
             # every job (raster 0.86->0.64 efficiency — 120k rows / 262144
             # leaves sub-batch-per-core granularity at 16 cores; bigger
             # working sets also raise bandwidth pressure)
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
             .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             # identical fine-grained input splits at EVERY core count: the
             # default split size is totalBytes/defaultParallelism, so N and
             # 4N levels got DIFFERENT physical scans — at 12 cores the 3M-row
             # render scan bin-packed to 11 lumpy tasks (one idle core, no
             # wave balancing, 83.8% stage occupancy) and the raster decode to
             # 12 tasks = exactly one wave (86.3%). Pinning 2m/1m yields the
             # same ~64-split scan at both levels and 94-96% occupancy
             # (event-log profiles, BENCH/runs_r5). On a real cluster this is
             # the same tune: split inputs finer than cores-per-wave so every
             # executor rides multiple waves.
             .config("spark.sql.files.maxPartitionBytes", "2m")
             .config("spark.sql.files.openCostInBytes", "1m")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from planetiler_spark.operators import spatial as sp
    from planetiler_spark.operators import tile_pipeline as tp

    out = {"cpus": args.cpus}
    out["bw_gbs_start"] = bw_probe()
    images = spark.read.parquet(args.images)
    images.count()  # warm FS cache + JVM before timing

    # The scaling runner measures the PACKED transport by default (the path
    # whose N-vs-4N record is being built); SPARK_GRAFT_PACKED=0 forces the
    # row-shaped transport for PAIRED control runs that separate host-window
    # noise from code effects. NOTE: the library default is the ROW path
    # (tile_pipeline._packed_default — round-4 transport policy).
    packed = os.environ.get("SPARK_GRAFT_PACKED", "1") != "0"

    # fixture generation + index build are INPUT PREP, not the measured job
    # (the images parquet is likewise prepared untimed): zones_pdf's Python
    # hull synthesis + the slab build take ~20s of DRIVER time, identical at
    # both levels, and a level-independent constant only blurs the N-vs-4N
    # ratio. lru_cache makes pip_zones reuse this build.
    from planetiler_spark.sources import images as src
    src.zones_index(16384)
    imgs_r = spark.read.parquet(args.images_raster)
    imgs_r.count()  # warm, untimed

    # --- job 1: vector tileset (tiles/sec) ---
    def run_tileset():
        t0 = time.time()
        tiles = tp.tileset(spark, images, 0, args.maxzoom,
                           shuffle_partitions=args.shuffle_partitions,
                           ordered=False, packed=packed)
        agg = tiles.agg(F.count("*").alias("nt"),
                        F.sum("n_features").alias("nf")).collect()[0]
        return time.time() - t0, {"n_tiles": int(agg.nt),
                                  "n_features": int(agg.nf)}

    # --- job 2: PIP spatial join (join rows/sec) ---
    # probe 4x the input (self-union) against a planet-scale 16384-zone table
    # so per-row index compute (not the scan) dominates. With lighter zone
    # tables the vectorized probe drops to ~3us/row and the job rides this
    # host's ~4M rows/s memory-bandwidth ceiling instead of CPU — real zone
    # tables (hundreds of vertices per polygon) are compute-dense like this.
    def run_pip():
        probe = images
        for _ in range(2):
            probe = probe.unionAll(probe)
        t0 = time.time()
        # aggregate=True: per-batch partial counts (the join→aggregate 100TB
        # shape). Raw-row variants measured this HOST's ~4M rows/s Arrow
        # materialization ceiling — constant across core counts and zone-table
        # sizes — instead of the spatial-join compute.
        joined = sp.pip_zones(probe, within=0.01, n_zones=16384, aggregate=True)
        nj = int(joined.agg(F.sum("n")).collect()[0][0])
        return time.time() - t0, {"pip_rows": nj}

    # --- job 3: raster patch tiling (patch tiles/sec) ---
    def run_raster():
        t0 = time.time()
        nr = tp.raster_tileset(spark, imgs_r).count()
        return time.time() - t0, {"n_raster_tiles": int(nr)}

    jobs = {"tileset": run_tileset, "pip": run_pip, "raster": run_raster}
    walls: dict[str, list[float]] = {k: [] for k in jobs}
    # reps are interleaved ROUND-ROBIN (tileset, pip, raster, tileset, ...)
    # so same-job reps never share one bad host window (bench.py r4 lesson)
    for _ in range(max(1, args.reps)):
        for name, fn in jobs.items():
            dt, info = fn()
            walls[name].append(round(dt, 2))
            out.update(info)

    # *_wall_s = MIN over in-process reps (host noise on this box is strictly
    # additive — noisy-neighbor contention — so min estimates the level's
    # noise-floor runtime); every rep wall ships in *_rep_walls_level for
    # transparency and for median-policy aggregation upstream.
    for name in jobs:
        out[f"{name}_wall_s"] = min(walls[name])
        out[f"{name}_rep_walls_level"] = walls[name]
    out["tiles_per_s"] = round(out["n_tiles"] / out["tileset_wall_s"], 1)
    out["features_per_s"] = round(out["n_features"] / out["tileset_wall_s"], 1)
    out["pip_rows_per_s"] = round(out["pip_rows"] / out["pip_wall_s"], 1)
    out["raster_tiles_per_s"] = round(out["n_raster_tiles"] / out["raster_wall_s"], 1)

    out["bw_gbs_end"] = bw_probe()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
