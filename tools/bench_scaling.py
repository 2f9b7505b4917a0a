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


def _level_cmd(cpus: int, cpuset: str, meta: str, rast: str, maxzoom: int):
    return ["taskset", "-c", cpuset,
            sys.executable, os.path.join(REPO, "tools", "scaling_runner.py"),
            "--cpus", str(cpus), "--images", meta, "--images-raster", rast,
            "--maxzoom", str(maxzoom)]


def _parse_out(proc, label):
    if proc.returncode != 0:
        print(proc.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"level {label} failed")
    line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def run_level(cpus: int, meta: str, rast: str, maxzoom: int) -> dict:
    """Sequential mode: one level at a time, process tree confined to `cpus`
    cores via taskset — without pinning, a local[N] "cluster" free-rides on
    idle host cores (N JVM task threads + N Python workers ≈ 2N cores)."""
    t0 = time.time()
    proc = subprocess.run(_level_cmd(cpus, f"0-{cpus - 1}", meta, rast, maxzoom),
                          capture_output=True, text=True, timeout=3600)
    out = _parse_out(proc, cpus)
    out["total_wall_s"] = round(time.time() - t0, 1)
    return out


def run_concurrent(base: int, meta: str, rast: str, maxzoom: int) -> tuple[dict, dict]:
    """Concurrent mode: N-core and 4N-core levels run AT THE SAME TIME on
    disjoint cpusets (cores 0..N-1 and N..5N-1). This sandbox host shows
    3-4x multi-core throughput swings over minutes (single-core stable —
    noisy-neighbor bandwidth contention), so only a same-instant comparison
    yields a meaningful N-vs-4N ratio. The 4N level finishes ~4x sooner and
    immediately RE-RUNS until the N level completes, keeping total host load
    constant for the whole window; the 4N result is the min over its reps.
    Requires 5N <= host cores."""
    lo_cmd = _level_cmd(base, f"0-{base - 1}", meta, rast, maxzoom)
    hi_cmd = _level_cmd(base * 4, f"{base}-{5 * base - 1}", meta, rast, maxzoom)
    p_lo = subprocess.Popen(lo_cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    hi_runs: list[dict] = []
    while True:
        p_hi = subprocess.Popen(hi_cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        hi_out, hi_err = p_hi.communicate(timeout=3600)
        hi_runs.append(_parse_out(
            type("P", (), {"returncode": p_hi.returncode, "stdout": hi_out,
                           "stderr": hi_err}), base * 4))
        if p_lo.poll() is not None:
            break
    lo_out, lo_err = p_lo.communicate(timeout=3600)
    lo = _parse_out(type("P", (), {"returncode": p_lo.returncode,
                                   "stdout": lo_out, "stderr": lo_err}), base)
    import statistics
    hi = dict(hi_runs[0])
    for k in ("tileset", "pip", "raster"):
        walls = [r[f"{k}_wall_s"] for r in hi_runs]
        hi[f"{k}_wall_s"] = round(statistics.median(walls), 2)
        hi[f"{k}_rep_walls"] = walls  # noise transparency
    hi["tiles_per_s"] = round(hi["n_tiles"] / hi["tileset_wall_s"], 1)
    hi["features_per_s"] = round(hi["n_features"] / hi["tileset_wall_s"], 1)
    hi["pip_rows_per_s"] = round(hi["pip_rows"] / hi["pip_wall_s"], 1)
    hi["raster_tiles_per_s"] = round(hi["n_raster_tiles"] / hi["raster_wall_s"], 1)
    hi["n_reps"] = len(hi_runs)
    hi["bw_probes"] = [(r.get("bw_gbs_start"), r.get("bw_gbs_end"))
                       for r in hi_runs]
    return lo, hi


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--n-raster", type=int, default=20_000)
    ap.add_argument("--base-cpus", type=int, default=6)
    ap.add_argument("--maxzoom", type=int, default=10)
    ap.add_argument("--mode", choices=["concurrent", "sequential"], default="concurrent")
    ap.add_argument("--work", default="/tmp/planetiler_scaling")
    args = ap.parse_args()
    os.makedirs(args.work, exist_ok=True)

    meta, rast = ensure_input(args.n, args.n_raster, args.work)

    if args.mode == "concurrent":
        lo, hi = run_concurrent(args.base_cpus, meta, rast, args.maxzoom)
    else:
        def best_of(cpus: int, reps: int = 2) -> dict:
            runs = [run_level(cpus, meta, rast, args.maxzoom) for _ in range(reps)]
            best = dict(runs[0])
            for r in runs[1:]:
                for k in ("tileset", "pip", "raster"):
                    best[f"{k}_wall_s"] = min(best[f"{k}_wall_s"], r[f"{k}_wall_s"])
            best["tiles_per_s"] = round(best["n_tiles"] / best["tileset_wall_s"], 1)
            best["features_per_s"] = round(best["n_features"] / best["tileset_wall_s"], 1)
            best["pip_rows_per_s"] = round(best["pip_rows"] / best["pip_wall_s"], 1)
            best["raster_tiles_per_s"] = round(best["n_raster_tiles"] / best["raster_wall_s"], 1)
            return best
        lo = best_of(args.base_cpus)
        hi = best_of(args.base_cpus * 4)

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
    # LAST_RUN.md, not BASELINE.md: the curated multi-round evidence document
    # lives at BENCH/BASELINE.md and is merged by hand from these run reports
    path = os.path.join(REPO, "BENCH", "LAST_RUN.md")
    with open(path, "w") as f:
        f.write(render_md(args, lo, hi, report["efficiency"]))
    print(f"wrote {path}")


def render_md(args, lo, hi, eff) -> str:
    n, n4 = args.base_cpus, args.base_cpus * 4
    mode_note = (
        f"**Concurrent protocol**: both levels run AT THE SAME TIME on disjoint "
        f"cpusets (`taskset 0-{n - 1}` vs `{n}-{5 * n - 1}`), because this sandbox "
        f"host exhibits 3-4x multi-core throughput swings over minutes "
        f"(single-core stable — noisy-neighbor memory-bandwidth contention; "
        f"measured: the identical 32-core tileset ranged 71s..262s across the "
        f"session). A same-instant comparison is the only meaningful N-vs-4N "
        f"ratio here; the 4N level re-runs until the N level finishes "
        f"({hi.get('n_reps', 1)} reps, MEDIAN taken; per-rep walls in the "
        f"JSON) so host load stays constant for the whole window."
        if args.mode == "concurrent" else
        "Sequential protocol: one pinned level at a time, best of 2 reps.")
    return f"""# BENCH/BASELINE — two-cluster-size scaling evidence (north_rule)

Sandbox protocol (no real cluster): the IDENTICAL jobs on the IDENTICAL
parquet input at `local[{n}]` (N) and `local[{n4}]` (4N), fresh JVM per level,
whole process tree (JVM + Python workers) pinned with taskset.
Efficiency = (T_N / T_4N) / 4; north_rule threshold >= 0.8.
Reference evidence at real scale: 8->64 cores = 0.93 (BASELINE.md).

{mode_note}

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

In-window single-thread memory-bandwidth probe (fixed 128 MB numpy triad,
GB/s; start/end of each level's run): local[{n}] {lo.get('bw_gbs_start')}/
{lo.get('bw_gbs_end')}; local[{n4}] reps {hi.get('bw_probes', [(hi.get('bw_gbs_start'), hi.get('bw_gbs_end'))])}.

Reproduce: `python tools/bench_scaling.py --n {args.n} --n-raster {args.n_raster} --base-cpus {args.base_cpus}`
"""


if __name__ == "__main__":
    main()
