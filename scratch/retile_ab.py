"""Round-13 item 4 A/B: JVM integer-ratio retile vs the Python fragment
plan at 12.6 M px, both directions (256->128 split, 128->256 merge).

Interleaved legs in one session, System.gc between runs, best-of-N,
consumer touches the arrays so Catalyst can't prune the repack.

Usage: python scratch/retile_ab.py [legs]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    legs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from openeo_odc_driver_spark.core.tiled import (
        _retile_integer_ratio_jvm,
        _retile_python,
        to_tiled,
    )
    from openeo_odc_driver_spark.session import get_spark
    from openeo_odc_driver_spark.sources.synthetic import (
        CubeSpec,
        synthetic_cube,
    )

    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spec = CubeSpec(n_times=12, ny=592, nx=592)  # 12.6M cells, 3 bands
    cube = synthetic_cube(spark, spec)

    def packed(tile):
        tc = to_tiled(cube, tile=tile, n_y=592, n_x=592)
        tc.df.cache().count()
        return tc

    def force(tc):
        tc.df.selectExpr(
            "sum(size(data) + coalesce(element_at(data, 1), 0.0D))"
        ).collect()

    for t_in, t_out, label in ((256, 128, "split"), (128, 256, "merge")):
        tc = packed(t_in)
        a, b = [], []
        for _ in range(legs):
            spark._jvm.System.gc()
            t0 = time.time()
            force(_retile_integer_ratio_jvm(tc, t_out, tc.schema))
            a.append(time.time() - t0)
            spark._jvm.System.gc()
            t0 = time.time()
            force(_retile_python(tc, t_out, 0, 0, 592, 592, tc.schema))
            b.append(time.time() - t0)
        print(f"{t_in}->{t_out} ({label}): jvm best {min(a):.2f}s "
              f"python best {min(b):.2f}s ratio {min(b)/min(a):.2f}x  "
              f"jvm={['%.2f' % x for x in a]} py={['%.2f' % x for x in b]}",
              flush=True)
        tc.df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
