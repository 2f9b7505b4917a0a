"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8 at N vs 4N).

No real cluster exists in this sandbox, so per the sandbox protocol
(BASELINE.md) we run the identical jobs on the identical parquet input at
local[N] and local[4N] (default N=8) in fresh subprocesses, and report
throughput at both plus efficiency = (T_N / T_4N) / 4 into BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [--n 200000] [--n-raster 20000] [--base-cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ensure_input(n: int, n_raster: int, work: str) -> tuple[str, str]:
    meta = os.path.join(work, f"images_meta_{n}")
    rast = os.path.join(work, f"images_bytes_{n_raster}")
    if os.path.exists(os.path.join(meta, "_SUCCESS")) and \
       os.path.exists(os.path.join(rast, "_SUCCESS")):
        return meta, rast
    from pyspark.sql import SparkSession
    from planetiler_spark.sources import images as src
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "32g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    src.images_df(spark, n, partitions=64, with_bytes=False) \
        .write.mode("overwrite").parquet(meta)
    src.images_df(spark, n_raster, partitions=64, with_bytes=True) \
        .write.mode("overwrite").parquet(rast)
    spark.stop()
    return meta, rast


def run_level(cpus: int, meta: str, rast: str, maxzoom: int,
              pin: bool = True) -> dict:
    """Run one level in a fresh subprocess. pin=True confines the WHOLE
    process tree (JVM + every Python worker) to `cpus` physical cores via
    taskset — without it, a local[N] "cluster" free-rides on idle host cores
    (N JVM task threads + N Python workers ≈ 2N cores) and the N-vs-4N
    comparison measures nothing."""
    t0 = time.time()
    cmd = [sys.executable, os.path.join(REPO, "tools", "scaling_runner.py"),
           "--cpus", str(cpus), "--images", meta, "--images-raster", rast,
           "--maxzoom", str(maxzoom)]
    if pin:
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    if proc.returncode != 0:
        print(proc.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"level {cpus} failed")
    line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    out["total_wall_s"] = round(time.time() - t0, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--n-raster", type=int, default=20_000)
    ap.add_argument("--base-cpus", type=int, default=8)
    ap.add_argument("--maxzoom", type=int, default=10)
    ap.add_argument("--work", default="/tmp/planetiler_scaling")
    args = ap.parse_args()
    os.makedirs(args.work, exist_ok=True)

    meta, rast = ensure_input(args.n, args.n_raster, args.work)
    lo = run_level(args.base_cpus, meta, rast, args.maxzoom)
    hi = run_level(args.base_cpus * 4, meta, rast, args.maxzoom)

    def eff(key):
        return round(lo[key] / hi[key] / 4, 3)

    report = {
        "n_images": args.n, "n_images_raster": args.n_raster,
        "maxzoom": args.maxzoom,
        "levels": [lo, hi],
        "efficiency": {
            "tileset": eff("tileset_wall_s"),
            "pip_join": eff("pip_wall_s"),
            "raster": eff("raster_wall_s"),
        },
    }
    print(json.dumps(report, indent=2))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(render_md(args, lo, hi, report["efficiency"]))
    print(f"wrote {path}")


def render_md(args, lo, hi, eff) -> str:
    n, n4 = args.base_cpus, args.base_cpus * 4
    return f"""# BENCH/BASELINE — two-cluster-size scaling evidence (north_rule)

Sandbox protocol (no real cluster): the IDENTICAL jobs on the IDENTICAL
parquet input at `local[{n}]` (N) and `local[{n4}]` (4N), fresh JVM per level.
Efficiency = (T_N / T_4N) / 4; north_rule threshold >= 0.8.
Reference evidence at real scale: 8->64 cores = 0.93 (BASELINE.md).

Input: images table, {args.n:,} rows (metadata) / {args.n_raster:,} rows (with
image bytes), deterministic seed=42, 20% city-hotspot skew.

| job | metric | local[{n}] | local[{n4}] | speedup | efficiency |
|---|---|---|---|---|---|
| vector tileset z0-{args.maxzoom} | wall s | {lo['tileset_wall_s']} | {hi['tileset_wall_s']} | {lo['tileset_wall_s']/hi['tileset_wall_s']:.2f}x | **{eff['tileset']}** |
| | tiles/s | {lo['tiles_per_s']:,} | {hi['tiles_per_s']:,} | | |
| | features/s | {lo['features_per_s']:,} | {hi['features_per_s']:,} | | |
| PIP broadcast join | wall s | {lo['pip_wall_s']} | {hi['pip_wall_s']} | {lo['pip_wall_s']/hi['pip_wall_s']:.2f}x | **{eff['pip_join']}** |
| | join rows/s | {lo['pip_rows_per_s']:,} | {hi['pip_rows_per_s']:,} | | |
| raster patch tiling z14 | wall s | {lo['raster_wall_s']} | {hi['raster_wall_s']} | {lo['raster_wall_s']/hi['raster_wall_s']:.2f}x | **{eff['raster']}** |
| | raster tiles/s | {lo['raster_tiles_per_s']:,} | {hi['raster_tiles_per_s']:,} | | |

Totals: {lo['n_tiles']:,} vector tiles / {lo['n_features']:,} features;
{lo['pip_rows']:,} join rows; {lo['n_raster_tiles']:,} raster tiles.
Row counts identical at both levels (same input -> same output).

Reproduce: `python tools/bench_scaling.py --n {args.n} --n-raster {args.n_raster} --base-cpus {args.base_cpus}`
"""


if __name__ == "__main__":
    main()
