"""Driver-hash risk probe: run every registry query in Spark AND DuckDB at
a small sf and flag any column whose pandas dtype KIND differs (int vs
float vs object vs datetime). The driver's value hash is dtype-sensitive:
DuckDB sum(BIGINT) returns HUGEINT which pandas renders as float64, so an
oracle `6.0` hash-mismatches Spark's int64 `6` even though `==` passes.

Usage: python scratch/dtype_probe.py [--sf DIR] [--only SUBSTR]
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

import duckdb


def kind(dtype) -> str:
    s = str(dtype)
    if s.startswith("datetime64"):
        return "datetime"
    return dtype.kind  # i/u -> int-ish, f, O, b


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from openeo_odc_driver_spark.session import get_spark
    from openeo_odc_driver_spark.registry import QUERIES, ORACLE

    spark = get_spark("dtype-probe", cpus="16")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    flagged, errs = [], []
    names = [n for n in QUERIES if args.only is None or args.only in n]
    for name in names:
        if name not in ORACLE:
            continue
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, args.sf).toPandas()
            ddf = con.execute(ORACLE[name]).df()
        except Exception:
            errs.append(name)
            print(f"ERR   {name}: {traceback.format_exc(limit=1).splitlines()[-1]}")
            continue
        problems = []
        for c in sorted(set(sdf.columns) & set(ddf.columns)):
            ks, kd = kind(sdf[c].dtype), kind(ddf[c].dtype)
            # unify signed/unsigned int and bool-as-int is NOT ok either:
            # the hash sees the rendered value, so require exact kind class
            if ks in ("i", "u") and kd in ("i", "u"):
                continue
            if ks != kd:
                problems.append(f"{c}: spark={sdf[c].dtype} duck={ddf[c].dtype}")
        if problems:
            flagged.append(name)
            print(f"FLAG  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            print(f"ok    {name} [{time.time()-t0:.1f}s]")
    print(f"\n=== {len(flagged)} flagged, {len(errs)} errors of {len(names)} ===")
    if flagged:
        print("flagged:", flagged)
    return 1 if flagged or errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
