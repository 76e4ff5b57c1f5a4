"""Round-15 (VERDICT r14 task 5): re-A/B the numpy band-expression
twin AT sf100. The r12 tie was measured at 126 M cells (and the 1.26 G
attempt drowned in the box's ±3x drift); r14's masked_seasonal profile
put the interpreted SQL expression engine at 11,146 s executor time at
1.26 G cells, where per-task arrays are ~100x larger and Arrow overhead
amortizes differently — so the question reopens once, interleaved,
same-session. Verdict rule from the VERDICT: twin wins >=2x -> auto
dispatch above a catalog-constant cell threshold (same oracle guard);
tie again -> record the negative and close the question.

Target note (r15): masked_seasonal's expression stage is a COMPARISON
(SCL > 4), which is OUTSIDE the twin's exactness subset (three-valued
NULL logic has no NaN analogue — r12 decision), so both legs would run
the sql engine and measure nothing. The in-subset flagship expression
is NDVI's normalized_difference, profiled at ~half the graph wall in
r12 — legs alternate sql/numpy on ndvi_median at sf100 (1.26 G cells
through the band-expression reducer), System.gc between runs,
best-of-N, checksums asserted equal; the numpy leg asserts the twin
actually compiled (call counter).

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
    g = sp.graphs(100)["ndvi_median"]
    real = G._reduce_bands_expression_tiled
    real_numpy_compile = G._compile_expr_numpy
    numpy_compiles = []

    def counting_compile(*a, **k):
        numpy_compiles.append(1)
        return real_numpy_compile(*a, **k)

    G._compile_expr_numpy = counting_compile
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
    assert numpy_compiles, "numpy legs never reached the twin compiler"
    best = {k: min(v) for k, v in walls.items()}
    print(json.dumps({
        "graph": "ndvi_median@sf100",
        "walls": walls, "best": best,
        "ratio_sql_over_numpy": round(best["sql"] / best["numpy"], 2),
        "checksum": str(sums["sql"]),
    }), flush=True)


if __name__ == "__main__":
    main()
