"""Round-13 follow-up to the heap finding: ndvi_median at 100x peaks
at 83 GB used heap (90 GB ceiling). Hypothesis: the median exchange's
32 shuffle partitions give each task a ~20 M-cell working set and the
whole stage holds 32 of them plus Arrow buffers; more partitions
shrink the per-task set. Interleaved same-session A/B of
spark.sql.shuffle.partitions = 32 vs 128 on the full graph at the
given SF (wall is weather; PEAK HEAP is the robust readout).

Usage: python scratch/ndvi_heap_ab.py [sf] [legs]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")

from pyspark.sql import functions as F

import scale_probe as sp


def main():
    sf = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    legs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = sp.get_spark_ui()
    spark.sparkContext.setLogLevel("WARN")
    from openeo_odc_driver_spark.plans.graph import ProcessGraph

    root = sp.build_stores(spark, sf)
    g = sp.graphs(sf)["ndvi_median"]

    def run(parts):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        pg = ProcessGraph(g, save_dir="/tmp/r13_heap_ab", tiled=True,
                          tile=sp.TILE, tiled_store_dir=root)
        with sp.HeapSampler(spark) as hs:
            cube = pg.execute(spark)
            agg = cube.df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").cast("string").alias("s"),
            ).collect()[0]
        return dict(parts=parts, wall_s=round(time.time() - t0, 1),
                    peak_gb=round(hs.peak / 1e9, 1),
                    retained_gb=round(hs.retained / 1e9, 2),
                    rows=int(agg["n"]), value_sum=agg["s"])

    for _ in range(legs):
        for parts in (32, 128):
            print(json.dumps(run(parts)), flush=True)


if __name__ == "__main__":
    main()
