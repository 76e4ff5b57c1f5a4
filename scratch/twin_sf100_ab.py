"""Round-15 (VERDICT r14 task 5): re-A/B the numpy band-expression
twin AT sf100. The r12 tie was measured at 126 M cells (and the 1.26 G
attempt drowned in the box's ±3x drift); r14's masked_seasonal profile
put the interpreted SQL expression engine at 11,146 s executor time at
1.26 G cells, where per-task arrays are ~100x larger and Arrow overhead
amortizes differently — so the question reopens once, interleaved,
same-session. Verdict rule from the VERDICT: twin wins >=2x -> auto
dispatch above a catalog-constant cell threshold (same oracle guard);
tie again -> record the negative and close the question.

Legs alternate sql/numpy on the masked_seasonal graph (the widest
band-expression consumer: 3 bands x 1.26 G cells through the SCL mask
build), System.gc between runs, best-of-N, checksums asserted equal.

Usage: python scratch/twin_sf100_ab.py [legs]
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")

from pyspark.sql import functions as F

import scale_probe as sp


def main():
    legs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = sp.get_spark_ui()
    spark.sparkContext.setLogLevel("WARN")

    from openeo_odc_driver_spark.plans import graph as G

    root = sp.build_stores(spark, 100)
    g = sp.graphs(100)["masked_seasonal"]
    real = G._reduce_bands_expression_tiled
    walls = {"sql": [], "numpy": []}
    sums = {}

    def run(impl):
        G._reduce_bands_expression_tiled = functools.partial(
            real, impl=impl
        )
        try:
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            pg = G.ProcessGraph(g, save_dir="/tmp/r15_twin_ab",
                                tiled=True, tile=sp.TILE,
                                tiled_store_dir=root)
            out = pg.execute(spark)
            row = out.df.agg(
                F.count(F.lit(1)), F.sum("value")
            ).collect()[0]
            walls[impl].append(round(time.time() - t0, 1))
            sums[impl] = tuple(row)
            print(f"  {impl}: {walls[impl][-1]}s rows={row[0]} "
                  f"sum={row[1]}", flush=True)
        finally:
            G._reduce_bands_expression_tiled = real

    run("sql")  # warm leg, not counted
    walls["sql"].clear()
    for _ in range(legs):
        run("sql")
        run("numpy")
    assert sums["sql"] == sums["numpy"], f"engines disagree: {sums}"
    best = {k: min(v) for k, v in walls.items()}
    print(json.dumps({
        "graph": "masked_seasonal@sf100",
        "walls": walls, "best": best,
        "ratio_sql_over_numpy": round(best["sql"] / best["numpy"], 2),
        "checksum": str(sums["sql"]),
    }), flush=True)


if __name__ == "__main__":
    main()
