"""Round-12 item 1: the 100x scale probe. Runs the three flagship
tiled-store graphs (NDVI-median, masked-seasonal, resample-align) END
TO END through the planner against stored tiled scenes at 1x / 10x /
100x of the 12.6M-cell A/B point (12.6M / 126M / 1.26G raster cells),
on local[32], and records wall time, total shuffle bytes, and peak
JVM memory per graph — the scaling exponent is the deliverable
(PLANS.md round-12 table).

Store building (one-time, cached under /tmp/r12_scale) goes through
the real pipeline: synthetic_cube (lazy range cross-join SQL) ->
to_tiled -> save_tiled, with collection ids the planner resolves via
tiled_store_dir. The graphs mirror tests/process_graphs/*.json with
whole-scene extents and WITHOUT the save_result sink (the probe
measures the query plan; sink encoders are driver-side by design and
scale separately). Each graph's result is reduced with count+sum so
the full plan executes.

Usage: python scratch/scale_probe.py [sf ...]   (default: 1 10 100)
"""
import json
import math
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

BASE = "/tmp/r12_scale"
TILE = 256

# scene edges per collection, scaled so total cells per SF point are
# ~12.6M * SF across each graph's inputs:
#   synthetic: 3 bands x 12 months x N^2      (masked_seasonal, align fine side)
#   synthetic_coarse: 3 bands x 12 x (N/2)^2  (align coarse side)
#   s2_l2a: 2 bands x 30 days x M^2           (ndvi_median)
SCALES = {
    1: dict(n_syn=592, n_s2=458),
    10: dict(n_syn=1872, n_s2=1448),
    100: dict(n_syn=5920, n_s2=4580),
}


def get_spark_ui(cpus="32"):
    """The engine session's semantic configs + the UI enabled (REST
    metrics source for shuffle/peak-memory)."""
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-probe")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        .getOrCreate()
    )


def rest(path):
    url = f"http://localhost:4099/api/v1/applications"
    apps = json.load(urllib.request.urlopen(url, timeout=10))
    app_id = apps[0]["id"]
    return json.load(urllib.request.urlopen(f"{url}/{app_id}/{path}",
                                            timeout=30))


def shuffle_totals():
    stages = rest("stages?status=complete")
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


def peak_jvm_heap():
    execs = rest("executors")
    peaks = [e.get("peakMemoryMetrics", {}).get("JVMHeapMemory", 0)
             for e in execs]
    return max(peaks or [0])


def spec_for(cid, sf):
    from openeo_odc_driver_spark.sources.synthetic import CubeSpec

    s = SCALES[sf]
    if cid == "synthetic":
        return CubeSpec(n_times=12, ny=s["n_syn"], nx=s["n_syn"])
    if cid == "synthetic_coarse":
        return CubeSpec(n_times=12, ny=s["n_syn"] // 2,
                        nx=s["n_syn"] // 2, resx=20.0, resy=20.0,
                        day_offset=3, va=11, vb=5, vc=23, vd=3, nm=29)
    if cid == "s2_l2a":
        return CubeSpec(
            bands=("B04", "B08"), n_times=30, ny=s["n_s2"], nx=s["n_s2"],
            t0="2022-06-01 00:00:00", time_unit="DAY",
            x0=11.2890625, y0=46.51953125, resx=0.0078125,
            resy=0.00390625,
        )
    raise ValueError(cid)


def build_stores(spark, sf):
    from openeo_odc_driver_spark.core.tiled import save_tiled, to_tiled
    from openeo_odc_driver_spark.sources.synthetic import synthetic_cube

    root = f"{BASE}/sf{sf}"
    for cid in ("synthetic", "synthetic_coarse", "s2_l2a"):
        path = f"{root}/{cid}"
        if os.path.exists(f"{path}/_tiled_meta.json"):
            continue
        spec = spec_for(cid, sf)
        t0 = time.time()
        save_tiled(
            to_tiled(synthetic_cube(spark, spec), tile=TILE,
                     n_y=spec.ny, n_x=spec.nx),
            path,
        )
        print(f"built {path} ({spec.ny}x{spec.nx}) in "
              f"{time.time() - t0:.0f}s", flush=True)
    return root


def graphs(sf):
    """The three flagship graph shapes (tests/process_graphs/*.json)
    with whole-scene extents and no sink."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = {}
    g = json.load(open(f"{here}/tests/process_graphs/ndvi_median.json"))
    pg = g["process_graph"]
    spec = spec_for("s2_l2a", sf)
    pg["load"]["arguments"]["spatial_extent"] = {
        "west": spec.x0 - 1.0,
        "east": spec.x0 + spec.resx * spec.nx + 1.0,
        "south": spec.y0 - spec.resy * spec.ny - 1.0,
        "north": spec.y0 + 1.0,
    }
    del pg["save"]
    pg["med"]["result"] = True
    out["ndvi_median"] = g

    g = json.load(open(f"{here}/tests/process_graphs/masked_seasonal.json"))
    pg = g["process_graph"]
    if "save" in pg:
        del pg["save"]
        for nid in pg:
            pg[nid].pop("result", None)
        pg["scaled"]["result"] = True
    out["masked_seasonal"] = g

    out["resample_align"] = json.load(
        open(f"{here}/tests/process_graphs/resample_align.json"))
    return out


def main():
    sfs = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark_ui()
    spark.sparkContext.setLogLevel("WARN")
    from openeo_odc_driver_spark.plans.graph import ProcessGraph

    results = []
    for sf in sfs:
        root = build_stores(spark, sf)
        for name, g in graphs(sf).items():
            spark.sparkContext._jvm.System.gc()
            w0, r0 = shuffle_totals()
            t0 = time.time()
            pg = ProcessGraph(g, save_dir=f"/tmp/r12_probe_out",
                              tiled=True, tile=TILE,
                              tiled_store_dir=root)
            cube = pg.execute(spark)
            agg = cube.df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").cast("string").alias("s"),
            ).collect()[0]
            wall = time.time() - t0
            w1, r1 = shuffle_totals()
            rec = dict(
                sf=sf, graph=name, wall_s=round(wall, 2),
                shuffle_write_mb=round((w1 - w0) / 1e6, 1),
                shuffle_read_mb=round((r1 - r0) / 1e6, 1),
                peak_jvm_heap_gb=round(peak_jvm_heap() / 1e9, 2),
                rows=int(agg["n"]), value_sum=agg["s"],
                demotions=list(pg.tiled_demotions),
            )
            results.append(rec)
            print(json.dumps(rec), flush=True)
    # scaling exponents between consecutive SF points
    for name in {r["graph"] for r in results}:
        pts = sorted((r["sf"], r["wall_s"]) for r in results
                     if r["graph"] == name)
        for (s1, w1), (s2, w2) in zip(pts, pts[1:]):
            exp = math.log(w2 / w1) / math.log(s2 / s1)
            print(f"{name}: {s1}x->{s2}x wall {w1}->{w2}s "
                  f"exponent {exp:.2f}", flush=True)


if __name__ == "__main__":
    main()
