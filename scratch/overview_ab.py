"""Round-15: overview-pyramid A/B at sf100 — the r14 policy note
priced the missing overview tier ("stored pushdown read full-res
tiles: best 10.5 s vs 2.6 s for the generator's free in-scan
coarsening"). Round-15 finding while reproducing that bar: the repo's
actual no-store path does NOT coarsen in-scan — the synthetic scan
generates every full-res row (crossjoin SQL) and snaps afterwards, so
the r14 "2.6 s scan" can only have been an IDEALIZED coarse-emitting
generator (or fixture-scale), i.e. the stand-in for a source with its
own overview-reading loader. This A/B therefore runs three legs in ONE
session (alternating, System.gc between, best-of-N):

  ov     stored load + pushed-down resample served from the PROVEN
         overview level (select_overview_level) — the new path
  base   same store, overview selection disabled (the r14 behavior:
         full-res tiles + covering-downscale snap) — value-asserted
         equal to ov
  ideal  the overview-bearing-source stand-in: a coarse-resolution
         synthetic collection loaded directly (values differ — formula
         at coarse indexes, not a snap of fine; wall-only reference,
         the VERDICT's "within ~2x of the generator scan path" bar)

Usage: python scratch/overview_ab.py [resolution] [legs]
"""
import json
import sys
import time
from dataclasses import replace as dc_replace

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")

from pyspark.sql import functions as F

import scale_probe as sp


def graph(collection, resolution):
    g = {"process_graph": {
        "load": {"process_id": "load_collection",
                 "arguments": {"id": collection,
                               "bands": ["B04", "B08"]}},
    }}
    if resolution is None:
        g["process_graph"]["load"]["result"] = True
    else:
        g["process_graph"]["rs"] = {
            "process_id": "resample_spatial",
            "arguments": {"data": {"from_node": "load"},
                          "resolution": resolution},
            "result": True,
        }
    return g


def main():
    res = float(sys.argv[1]) if len(sys.argv) > 1 else 600.0
    legs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = sp.get_spark_ui()
    spark.sparkContext.setLogLevel("WARN")

    from openeo_odc_driver_spark.core import tiled as tl
    from openeo_odc_driver_spark.plans import catalog as cat
    from openeo_odc_driver_spark.plans.graph import ProcessGraph

    spec = sp.spec_for("synthetic", 100)
    n_coarse = int(spec.nx * spec.resx // res) + 1
    cat.COLLECTION_SPECS = dict(
        cat.COLLECTION_SPECS,
        # the idealized coarse-emitting source: same formula constants,
        # coarse lattice (NOT value-comparable to a snap of the fine
        # scene — wall-only reference)
        synthetic_ideal=dc_replace(spec, ny=n_coarse, nx=n_coarse,
                                   resx=res, resy=res),
    )
    root = sp.build_stores(spark, 100)
    t0 = time.time()
    levels = tl.ensure_overviews(spark, f"{root}/synthetic", (2, 4, 8))
    build_s = round(time.time() - t0, 1)
    print(f"overview levels {levels} ready in {build_s}s", flush=True)

    real_select = tl.select_overview_level
    walls = {"ov": [], "base": [], "ideal": []}
    served = {}

    def run(leg):
        tl.select_overview_level = (
            real_select if leg == "ov" else (lambda *a, **k: None)
        )
        try:
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            if leg == "ideal":
                pg = ProcessGraph(graph("synthetic_ideal", None),
                                  save_dir="/tmp/r15_ov_ab", tiled=True,
                                  tile=sp.TILE)
            else:
                pg = ProcessGraph(graph("synthetic", res),
                                  save_dir="/tmp/r15_ov_ab", tiled=True,
                                  tile=sp.TILE, tiled_store_dir=root)
            out = pg.execute(spark)
            row = out.df.agg(
                F.count(F.lit(1)), F.round(F.sum("value"), 3)
            ).collect()[0]
            walls[leg].append(round(time.time() - t0, 1))
            served[leg] = (pg.tiled_overview_reads, tuple(row))
            print(f"  {leg}: {walls[leg][-1]}s rows={row[0]} "
                  f"sum={row[1]} ov={pg.tiled_overview_reads}",
                  flush=True)
        finally:
            tl.select_overview_level = real_select

    run("ideal")  # warm leg (codegen/page cache), not counted
    walls["ideal"].clear()
    for _ in range(legs):
        for leg in ("ov", "base", "ideal"):
            run(leg)
    assert served["ov"][1] == served["base"][1], \
        f"ov/base disagree: {served}"
    assert served["ov"][0], "ov leg did not read an overview level"
    print(json.dumps({
        "resolution": res,
        "overview_build_s": build_s,
        "walls": walls,
        "best": {k: min(v) for k, v in walls.items()},
        "ov_level": served["ov"][0],
        "agree_ov_base": str(served["ov"][1]),
    }), flush=True)


if __name__ == "__main__":
    main()
