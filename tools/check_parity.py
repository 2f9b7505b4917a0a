"""Local replica of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet dir; compare row
count, sorted column names, and an order-insensitive value hash.

Usage: python tools/check_parity.py [--sf sf0.01] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def value_hash(rows, cols) -> str:
    """Order-insensitive: sort columns by name, render values canonically,
    sort rendered rows, sha256."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rendered = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                vals.append(repr(v))
            elif isinstance(v, bool):
                vals.append(str(int(v)))
            else:
                vals.append(str(v))
        rendered.append("\x1f".join(vals))
    rendered.sort()
    return hashlib.sha256("\x1e".join(rendered).encode()).hexdigest()[:16]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--cpus", default="8")
    args = ap.parse_args()
    sf_dir = f"/root/testdata/{args.sf}"

    from pyspark.sql import SparkSession
    import __spark_entry__ as entry_mod

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("check_parity")
             .config("spark.sql.shuffle.partitions", args.cpus)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = list(qs) if not args.only else args.only.split(",")
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:24s} spark error: {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok    {name:24s} rows-only: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            orows = res.fetchall()
            ocols = [d[0] for d in res.description]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:24s} duckdb error: {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        sh = value_hash(srows, scols)
        oh = value_hash(orows, ocols)
        ok = (len(srows) == len(orows)) and (sorted(scols) == sorted(ocols)) and (sh == oh)
        status = "ok   " if ok else "FAIL "
        print(f"{status} {name:24s} spark={len(srows)} duck={len(orows)} "
              f"hash {'=' if sh == oh else '!='} cols {'=' if sorted(scols) == sorted(ocols) else '!='} "
              f"({time.time()-t0:.1f}s)")
        if not ok:
            failures.append(name)
            if sorted(scols) != sorted(ocols):
                print(f"      spark cols: {sorted(scols)}\n      duck  cols: {sorted(ocols)}")
            if sh != oh and len(srows) and len(orows):
                print(f"      spark sample: {sorted(srows)[:2]}")
                print(f"      duck  sample: {sorted(orows)[:2]}")
    print(f"\n{len(names) - len(failures)}/{len(names)} queries match; failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
