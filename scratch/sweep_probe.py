"""Round-15: where does sweep-query wall go? Times (noop-forced, best
of 2) the shared-fixture subtrees vs one leg vs the full sweep, for the
expensive sweep queries. Pure measurement — no engine change."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def t(spark, label, df, runs=2):
    best = None
    for _ in range(runs):
        spark._jvm.System.gc()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        w = time.time() - t0
        best = w if best is None else min(best, w)
    print(f"{label}: {best:.2f}s", flush=True)


def main() -> int:
    from openeo_odc_driver_spark.session import get_spark

    spark = get_spark("sweep-probe", cpus="32")
    from openeo_odc_driver_spark.core.tiled import (
        apply_kernel_tiled_layout,
        from_tiled,
        to_tiled,
    )
    from openeo_odc_driver_spark.registry import (
        _KERNEL,
        _KERNEL_FACTOR,
        QUERIES,
    )
    from openeo_odc_driver_spark.sources.synthetic import (
        CubeSpec,
        synthetic_cube,
    )

    cube = synthetic_cube(spark)
    t(spark, "synthetic_cube", cube.df)
    t8 = to_tiled(cube, tile=8, n_y=16, n_x=16)
    t(spark, "to_tiled(tile=8)", t8.df)
    leg = from_tiled(
        apply_kernel_tiled_layout(
            t8, _KERNEL, factor=_KERNEL_FACTOR, border="replicate"
        )
    ).df
    t(spark, "one kernel leg (replicate, shared pack)", leg)
    leg_fresh = from_tiled(
        apply_kernel_tiled_layout(
            to_tiled(cube, tile=8, n_y=16, n_x=16),
            _KERNEL, factor=_KERNEL_FACTOR, border="replicate",
        )
    ).df
    t(spark, "one kernel leg (fresh pack)", leg_fresh)
    for qname in (
        "tiled_apply_kernel_border_sweep",
        "tiled_zonal_sweep",
        "reduce_time_sweep",
        "resample_spatial_warp_sweep",
        "resample_spatial_warp_directions_sweep",
    ):
        t(spark, qname, QUERIES[qname](spark, SF_DIR))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
