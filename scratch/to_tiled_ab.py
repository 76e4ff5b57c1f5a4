"""Round-13 item 3: interleaved same-session A/B of to_tiled's two pack
engines around TILE_VECTORIZE_CELLS (=4096, i.e. tile 64), prompted by
the one r12 bench regression that coincided with changed code
(tiled_roundtrip 0.42→0.64 s after the auto dispatch landed).

Protocol per the PLANS.md measurement discipline: alternating legs
(sql, numpy, sql, numpy, ...), System.gc() between runs, best-of-N per
engine, one session; <2x difference = tie. Scene is the bench
tiled_layout shape (3 bands x 12 months x 512x512) packed at tiles
32/64/128/256 so the threshold neighborhood is bracketed.

The gate fixture itself (tiled_roundtrip: 16x16 scene, tile=5 -> 25
cells) ALWAYS takes the sql engine under auto — the dispatch cannot
have changed its plan; this A/B decides whether 4096 is the right
break-even for real shapes or the r12 bench delta was weather.

Usage: python scratch/to_tiled_ab.py [legs]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    legs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from openeo_odc_driver_spark.core.tiled import to_tiled
    from openeo_odc_driver_spark.session import get_spark
    from openeo_odc_driver_spark.sources.synthetic import (
        CubeSpec,
        synthetic_cube,
    )

    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spec = CubeSpec(n_times=12, ny=512, nx=512)
    cube = synthetic_cube(spark, spec)
    cube.df.cache().count()  # pack input held constant across legs

    def run(impl, tile):
        spark._jvm.System.gc()
        t0 = time.time()
        tc = to_tiled(cube, tile=tile, n_y=512, n_x=512, impl=impl)
        # force the pack; consumer touches the arrays so Catalyst can't
        # prune the assembly (verify-skill gotcha)
        tc.df.selectExpr(
            "sum(size(data) + coalesce(element_at(data, 1), 0.0D)) AS s"
        ).collect()
        return time.time() - t0

    print("tile  cells  sql(best)  numpy(best)  ratio  legs")
    for tile in (32, 64, 128, 256):
        a, b = [], []
        for _ in range(legs):
            a.append(run("sql", tile))
            b.append(run("numpy", tile))
        ra, rb = min(a), min(b)
        print(f"{tile:4d} {tile*tile:6d} {ra:9.2f} {rb:11.2f} "
              f"{ra/rb:6.2f}  sql={['%.2f' % x for x in a]} "
              f"numpy={['%.2f' % x for x in b]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
