"""Round-14 item 6 A/B: the RATIONAL-ratio JVM retile (gcd split+merge
decomposition) vs the Python fragment plan at 12.6 M px on a 256->96
edge (gcd 32: split k=8, merge k=3) — the retile_ab protocol verbatim:
interleaved legs in one session, System.gc between runs, best-of-N,
consumer touches the arrays so Catalyst can't prune the repack.

Usage: python scratch/retile_rational_ab.py [legs]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    legs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from openeo_odc_driver_spark.core.tiled import (
        _retile_python,
        retile,
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

    tc = to_tiled(cube, tile=256, n_y=592, n_x=592)
    tc.df.cache().count()

    def force(out):
        out.df.selectExpr(
            "sum(size(data) + coalesce(element_at(data, 1), 0.0D))"
        ).collect()

    a, b = [], []
    for _ in range(legs):
        spark._jvm.System.gc()
        t0 = time.time()
        force(retile(tc, 96))  # gcd path: split 256->32 + merge 32->96
        a.append(time.time() - t0)
        spark._jvm.System.gc()
        t0 = time.time()
        force(_retile_python(tc, 96, 0, 0, 592, 592, tc.schema))
        b.append(time.time() - t0)
    print(f"256->96 (rational, gcd 32): jvm best {min(a):.2f}s "
          f"python best {min(b):.2f}s ratio {min(b)/min(a):.2f}x  "
          f"jvm={['%.2f' % x for x in a]} py={['%.2f' % x for x in b]}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
