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


def _level_cmd(cpus: int, cpuset: str, meta: str, rast: str, maxzoom: int,
               reps: int = 1):
    return ["taskset", "-c", cpuset,
            sys.executable, os.path.join(REPO, "tools", "scaling_runner.py"),
            "--cpus", str(cpus), "--images", meta, "--images-raster", rast,
            "--maxzoom", str(maxzoom), "--reps", str(reps)]


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


def run_concurrent(base: int, meta: str, rast: str, maxzoom: int,
                   lo_reps: int = 2) -> tuple[dict, dict]:
    """Concurrent mode: N-core and 4N-core levels run AT THE SAME TIME on
    disjoint cpusets (cores 0..N-1 and N..5N-1). This sandbox host shows
    3-4x multi-core throughput swings over minutes (single-core stable —
    noisy-neighbor bandwidth contention; an IDENTICAL solo 12-core tileset
    measured 77s then 47s twenty minutes apart), so only a same-instant
    comparison yields a meaningful N-vs-4N ratio.

    SYMMETRIC reps (r5): the N level reps each job `lo_reps` times
    (round-robin inside one process); the 4N level re-invokes until the N
    level completes, keeping total host load constant for the whole window.
    BOTH levels aggregate the same way — min over reps (headline: host noise
    here is strictly additive, so min estimates each level's noise-floor
    runtime) and median (reported alongside; r4's protocol medianed hi reps
    against a single un-repped lo run, which let one bad window segment set
    either side). All raw walls ship in the JSON. Requires 5N <= host cores."""
    lo_cmd = _level_cmd(base, f"0-{base - 1}", meta, rast, maxzoom, reps=lo_reps)
    hi_cmd = _level_cmd(base * 4, f"{base}-{5 * base - 1}", meta, rast, maxzoom)
    p_lo = subprocess.Popen(lo_cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    # DRAIN the lo pipes continuously: Popen(PIPE) without a reader deadlocks
    # the child once 64 KB of stderr accumulates (the fine-split configs emit
    # more task-level log lines — a full run2 hung 79 min exactly this way,
    # JVM blocked in write(2) with FIONREAD=64287 on the stderr pipe).
    import threading
    lo_bufs = {"out": [], "err": []}
    def _drain(stream, key):
        for ln in stream:
            lo_bufs[key].append(ln)
    t_out = threading.Thread(target=_drain, args=(p_lo.stdout, "out"), daemon=True)
    t_err = threading.Thread(target=_drain, args=(p_lo.stderr, "err"), daemon=True)
    t_out.start(); t_err.start()
    hi_runs: list[dict] = []
    while True:
        p_hi = subprocess.Popen(hi_cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        hi_out, hi_err = p_hi.communicate(timeout=3600)
        hi_runs.append(_parse_out(
            type("P", (), {"returncode": p_hi.returncode, "stdout": hi_out,
                           "stderr": hi_err}), base * 4))
        if p_lo.poll() is not None:
            break
    p_lo.wait(timeout=3600)
    t_out.join(timeout=60); t_err.join(timeout=60)
    lo_out, lo_err = "".join(lo_bufs["out"]), "".join(lo_bufs["err"])
    lo = _parse_out(type("P", (), {"returncode": p_lo.returncode,
                                   "stdout": lo_out, "stderr": lo_err}), base)
    import statistics
    for k in ("tileset", "pip", "raster"):
        walls = lo.get(f"{k}_rep_walls_level", [lo[f"{k}_wall_s"]])
        lo[f"{k}_rep_walls"] = walls
        lo[f"{k}_wall_s"] = min(walls)
        lo[f"{k}_wall_median_s"] = round(statistics.median(walls), 2)
    hi = dict(hi_runs[0])
    for k in ("tileset", "pip", "raster"):
        walls = [w for r in hi_runs
                 for w in r.get(f"{k}_rep_walls_level", [r[f"{k}_wall_s"]])]
        hi[f"{k}_wall_s"] = min(walls)
        hi[f"{k}_wall_median_s"] = round(statistics.median(walls), 2)
        hi[f"{k}_rep_walls"] = walls  # noise transparency
    for lvl in (lo, hi):
        lvl["tiles_per_s"] = round(lvl["n_tiles"] / lvl["tileset_wall_s"], 1)
        lvl["features_per_s"] = round(lvl["n_features"] / lvl["tileset_wall_s"], 1)
        lvl["pip_rows_per_s"] = round(lvl["pip_rows"] / lvl["pip_wall_s"], 1)
        lvl["raster_tiles_per_s"] = round(lvl["n_raster_tiles"] / lvl["raster_wall_s"], 1)
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
    ap.add_argument("--lo-reps", type=int, default=2,
                    help="in-process reps of each job at the N level")
    ap.add_argument("--work", default="/tmp/planetiler_scaling")
    args = ap.parse_args()
    os.makedirs(args.work, exist_ok=True)

    meta, rast = ensure_input(args.n, args.n_raster, args.work)

    if args.mode == "concurrent":
        lo, hi = run_concurrent(args.base_cpus, meta, rast, args.maxzoom,
                                lo_reps=args.lo_reps)
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
    if args.mode == "concurrent":
        report["efficiency_median"] = {
            "tileset": eff("tileset_wall_median_s"),
            "pip_join": eff("pip_wall_median_s"),
            "raster": eff("raster_wall_median_s"),
        }
    print(json.dumps(report, indent=2))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # LAST_RUN.md, not BASELINE.md: the curated multi-round evidence document
    # lives at BENCH/BASELINE.md and is merged by hand from these run reports
    path = os.path.join(REPO, "BENCH", "LAST_RUN.md")
    with open(path, "w") as f:
        f.write(render_md(args, lo, hi, report["efficiency"],
                          report.get("efficiency_median")))
    print(f"wrote {path}")


def render_md(args, lo, hi, eff, eff_med=None) -> str:
    n, n4 = args.base_cpus, args.base_cpus * 4
    mode_note = (
        f"**Concurrent protocol**: both levels run AT THE SAME TIME on disjoint "
        f"cpusets (`taskset 0-{n - 1}` vs `{n}-{5 * n - 1}`), because this sandbox "
        f"host exhibits 3-4x multi-core throughput swings over minutes "
        f"(single-core stable — noisy-neighbor memory-bandwidth contention; "
        f"measured: an IDENTICAL solo 12-core tileset read 77s then 47s "
        f"twenty minutes apart). A same-instant comparison is the only "
        f"meaningful N-vs-4N ratio here. SYMMETRIC reps: the N level reps "
        f"each job {args.lo_reps}x round-robin in-process; the 4N level "
        f"re-invokes until the N level finishes ({hi.get('n_reps', 1)} "
        f"invocations) so host load stays constant for the whole window. "
        f"Both levels take the MIN over their reps (noise on this host is "
        f"strictly additive — contention only ever slows a run — so min "
        f"estimates each level's noise-floor runtime symmetrically); the "
        f"median-policy efficiencies are reported below and every raw rep "
        f"wall ships in the run JSON."
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

{"Median-policy efficiencies (same raw walls, median over reps per level): "
 f"tileset {eff_med['tileset']}, pip {eff_med['pip_join']}, raster "
 f"{eff_med['raster']}. Rep walls: tileset lo {lo.get('tileset_rep_walls')} "
 f"hi {hi.get('tileset_rep_walls')}; raster lo {lo.get('raster_rep_walls')} "
 f"hi {hi.get('raster_rep_walls')}; pip lo {lo.get('pip_rep_walls')} "
 f"hi {hi.get('pip_rep_walls')}." if eff_med else ""}

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
