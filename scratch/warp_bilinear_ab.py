"""Round-15 (VERDICT r14 task 4): tile-native BILINEAR projection warp
vs the long bilinear warp, interleaved one-session A/B at 42 M px —
the same protocol as r14's nearest-warp A/B (scratch/warp_ab.py: tiled
2.41x at sf100). Input: the sf-N s2_l2a tiled store, time-max-reduced
(2 bands x N^2 px), warped 4326->UTM32 bilinear at 600 m.

Usage: python scratch/warp_bilinear_ab.py [sf] [legs]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")

import scale_probe as sp


def main():
    sf = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    legs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = sp.get_spark_ui()
    spark.sparkContext.setLogLevel("WARN")
    root = sp.build_stores(spark, sf)

    from openeo_odc_driver_spark.core.tiled import (
        from_tiled,
        load_tiled,
        reduce_time_tiled,
        resample_spatial_warp_tiled,
    )
    from openeo_odc_driver_spark.operators.resample import (
        resample_spatial_warp,
    )

    tc = reduce_time_tiled(load_tiled(spark, f"{root}/s2_l2a"), "max")
    tc.df.cache().count()
    res = 600.0

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    a, b = [], []
    for _ in range(legs):
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        force(resample_spatial_warp_tiled(
            tc, 32632, res, method="bilinear").df)
        a.append(round(time.time() - t0, 1))
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        force(resample_spatial_warp(
            from_tiled(tc), 32632, res, method="bilinear").df)
        b.append(round(time.time() - t0, 1))
        print(f"  tiled {a[-1]}s  long {b[-1]}s", flush=True)
    print(json.dumps(
        {"sf": sf, "method": "bilinear", "tiled_walls": a,
         "long_walls": b, "tiled_best": min(a), "long_best": min(b),
         "ratio_long_over_tiled": round(min(b) / min(a), 2)}),
        flush=True)


if __name__ == "__main__":
    main()
