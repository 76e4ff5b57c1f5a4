"""Round-13: the exponent measured the only way this box allows —
alternating SF legs in ONE session (the cross-run probe produced a
physically impossible −0.55 exponent; see PLANS.md). Runs the given
graph at sf10 and sf100 alternately, best-of-N per SF, and reports the
10→100 exponent from the bests plus per-leg walls and heap peaks.

Usage: python scratch/exponent_ab.py [graph] [legs]
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")

from pyspark.sql import functions as F

import scale_probe as sp


def main():
    graph_name = sys.argv[1] if len(sys.argv) > 1 else "ndvi_median"
    legs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    parts = sys.argv[3] if len(sys.argv) > 3 else None
    spark = sp.get_spark_ui()
    spark.sparkContext.setLogLevel("WARN")
    if parts:
        # "deployment sizing" leg: shuffle partitions scaled the way a
        # real cluster run would be (runtime conf; oracle sessions are
        # untouched)
        spark.conf.set("spark.sql.shuffle.partitions", parts)
    from openeo_odc_driver_spark.plans.graph import ProcessGraph

    roots = {sf: sp.build_stores(spark, sf) for sf in (10, 100)}
    walls = {10: [], 100: []}
    peaks = {10: [], 100: []}

    def run(sf):
        g = sp.graphs(sf)[graph_name]
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        pg = ProcessGraph(g, save_dir="/tmp/r13_exp_ab", tiled=True,
                          tile=sp.TILE, tiled_store_dir=roots[sf])
        with sp.HeapSampler(spark) as hs:
            cube = pg.execute(spark)
            cube.df.agg(F.count(F.lit(1)), F.sum("value")).collect()
        walls[sf].append(round(time.time() - t0, 1))
        peaks[sf].append(round(hs.peak / 1e9, 1))
        print(f"  {graph_name}@sf{sf}: {walls[sf][-1]}s "
              f"peak {peaks[sf][-1]}GB", flush=True)

    # warm leg (page cache / codegen) not counted
    run(10)
    walls[10].clear(); peaks[10].clear()
    for _ in range(legs):
        run(10)
        run(100)
    exp = math.log(min(walls[100]) / min(walls[10])) / math.log(10)
    print(json.dumps({
        "graph": graph_name,
        "sf10_walls": walls[10], "sf100_walls": walls[100],
        "sf10_peaks_gb": peaks[10], "sf100_peaks_gb": peaks[100],
        "exponent_10_100": round(exp, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
