"""Round-12 item 1: the 100x scale probe. Runs the three flagship
tiled-store graphs (NDVI-median, masked-seasonal, resample-align) END
TO END through the planner against stored tiled scenes at 1x / 10x /
100x of the 12.6M-cell A/B point (12.6M / 126M / 1.26G raster cells),
on local[32], and records wall time, total shuffle bytes, and peak
JVM memory per graph — the scaling exponent is the deliverable
(PLANS.md round-12 table).

Store building (one-time, cached under /tmp/r12_scale) synthesizes
tile rows directly (fast_tiled: numpy mapInPandas over tile keys,
asserted bit-identical to the to_tiled(synthetic_cube) route at sf=1
by --check) and writes them with save_tiled; the planner resolves the
collection ids via tiled_store_dir. The graphs mirror tests/process_graphs/*.json with
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


class HeapSampler:
    """Round-13 item 8: a TRUE per-graph peak instead of the
    session-cumulative high-water `peakMemoryMetrics` reading. The
    runner forces GC before each graph (baseline = live set), then this
    thread samples used heap every 250 ms through its own py4j
    connection while the graph runs. peak_used includes collectible
    garbage (the JVM doesn't GC under a roomy heap — that's the honest
    caveat); retained_after is the GC-forced live set when the graph
    finishes, i.e. what the graph actually keeps."""

    def __init__(self, spark):
        self._spark = spark
        self._stop = False
        self.peak = 0
        import threading

        self._t = threading.Thread(target=self._run, daemon=True)

    def _used(self):
        rt = self._spark.sparkContext._jvm.Runtime.getRuntime()
        return rt.totalMemory() - rt.freeMemory()

    def _run(self):
        while not self._stop:
            try:
                self.peak = max(self.peak, self._used())
            except Exception:
                pass
            time.sleep(0.25)

    def __enter__(self):
        self.baseline = self._used()
        self.peak = self.baseline
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop = True
        self._t.join(timeout=2)
        self._spark.sparkContext._jvm.System.gc()
        self.retained = self._used()


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


def fast_tiled(spark, spec):
    """The synthetic cube synthesized DIRECTLY as tile rows — numpy
    mapInPandas over (band, time, tile_row, tile_col) keys evaluating
    the CubeSpec value/NULL formulas per 256² block. Bit-identical to
    to_tiled(synthetic_cube(...)) (asserted at sf=1 by --check), but
    build cost is embarrassingly parallel instead of the long
    crossjoin + per-element HOF assembly (hours at 1.26G cells)."""
    import pandas as pd

    from openeo_odc_driver_spark.core.cube import CubeSchema, GridSpec
    from openeo_odc_driver_spark.core.tiled import TiledCube
    from openeo_odc_driver_spark.sources.synthetic import (
        ALL_DIMS,
        spec_time_extent,
        spec_times,
    )

    nby, nbx = -(-spec.ny // TILE), -(-spec.nx // TILE)
    nb, nt = len(spec.bands), spec.n_times
    keys = spark.range(nb * nt * nby * nbx).selectExpr(
        f"CAST(id div {nt * nby * nbx} AS INT) AS b",
        f"CAST((id div {nby * nbx}) % {nt} AS INT) AS ti",
        f"CAST((id div {nbx}) % {nby} AS INT) AS tile_row",
        f"CAST(id % {nbx} AS INT) AS tile_col",
    ).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")) * 4)
    bands = list(spec.bands)
    unit = spec.time_unit.upper()
    t0 = pd.Timestamp(spec.t0)
    times = [
        (t0 + (pd.DateOffset(months=int(i)) if unit == "MONTH"
               else pd.DateOffset(days=int(i)))
         + pd.DateOffset(days=spec.day_offset)).to_datetime64()
        for i in range(nt)
    ]
    P = dict(va=spec.va, vb=spec.vb, vc=spec.vc, vd=spec.vd,
             vm=spec.vm, vs=spec.vs, na=spec.na, nb=spec.nb,
             nc=spec.nc, nd=spec.nd, nm=spec.nm, ny=spec.ny,
             nx=spec.nx)

    def gen(batches):
        import numpy as np

        for pdf in batches:
            out = []
            for b, ti, tr, tc_ in pdf[
                ["b", "ti", "tile_row", "tile_col"]
            ].itertuples(index=False, name=None):
                yi = tr * TILE + np.arange(TILE)[:, None]
                xi = tc_ * TILE + np.arange(TILE)[None, :]
                v = ((b * P["va"] + ti * P["vb"] + yi * P["vc"]
                      + xi * P["vd"]) % P["vm"]) / 8.0 - P["vs"]
                nul = ((b * P["na"] + ti * P["nb"] + yi * P["nc"]
                        + xi * P["nd"]) % P["nm"]) == 0
                nul |= (yi >= P["ny"]) | (xi >= P["nx"])
                arr = v.astype(object)
                arr[nul] = None
                out.append({
                    "band": bands[b], "time": times[ti],
                    "tile_row": tr, "tile_col": tc_,
                    "data": arr.reshape(-1).tolist(),
                })
            if out:
                yield pd.DataFrame(out)

    df = keys.mapInPandas(
        gen,
        "band string, time timestamp, tile_row int, tile_col int, "
        "data array<double>",
    )
    schema = CubeSchema(
        dims=ALL_DIMS, bands=spec.bands,
        crs="EPSG:32632" if spec.resx >= 1 else "EPSG:4326",
        grid=GridSpec(x0=spec.x0, y0=spec.y0, resx=spec.resx,
                      resy=spec.resy),
        time_extent=spec_time_extent(spec), time_axis=spec_times(spec),
    )
    return TiledCube(df, schema, TILE, spec.ny, spec.nx)


def build_stores(spark, sf):
    from openeo_odc_driver_spark.core.tiled import save_tiled

    root = f"{BASE}/sf{sf}"
    for cid in ("synthetic", "synthetic_coarse", "s2_l2a"):
        path = f"{root}/{cid}"
        if os.path.exists(f"{path}/_tiled_meta.json"):
            continue
        spec = spec_for(cid, sf)
        t0 = time.time()
        save_tiled(fast_tiled(spark, spec), path)
        print(f"built {path} ({spec.ny}x{spec.nx}) in "
              f"{time.time() - t0:.0f}s", flush=True)
    return root


def check_fast_build(spark):
    """sf=1 equivalence: the fast tile synthesis must be row-identical
    to the to_tiled(synthetic_cube) route the engine uses."""
    import pandas as pd

    from openeo_odc_driver_spark.core.tiled import to_tiled
    from openeo_odc_driver_spark.sources.synthetic import synthetic_cube

    for cid in ("synthetic", "synthetic_coarse", "s2_l2a"):
        spec = spec_for(cid, 1)
        a = fast_tiled(spark, spec).df
        b = to_tiled(synthetic_cube(spark, spec), tile=TILE,
                     n_y=spec.ny, n_x=spec.nx).df
        cols = ["band", "time", "tile_row", "tile_col"]
        pa = a.toPandas().sort_values(cols).reset_index(drop=True)
        pb = b.toPandas().sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(pa, pb, check_exact=True)
        print(f"fast build == to_tiled for {cid} "
              f"({len(pa)} tile rows)", flush=True)


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


def profile_graph(spark, sf: int, graph_name: str):
    """Round-13 item 5: per-stage wall attribution for one graph at one
    SF point — which stage owns the 100x wall (the r12 probe left
    ndvi_median's 0.86 exponent unexplained)."""
    from openeo_odc_driver_spark.plans.graph import ProcessGraph

    root = build_stores(spark, sf)
    g = graphs(sf)[graph_name]
    seen = {s["stageId"] for s in rest("stages")}
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    pg = ProcessGraph(g, save_dir="/tmp/r12_probe_out", tiled=True,
                      tile=TILE, tiled_store_dir=root)
    cube = pg.execute(spark)
    cube.df.agg(F.count(F.lit(1)), F.sum("value")).collect()
    wall = time.time() - t0
    stages = [s for s in rest("stages?status=complete")
              if s["stageId"] not in seen]
    stages.sort(key=lambda s: s.get("executorRunTime", 0), reverse=True)
    print(f"\n{graph_name} @ sf{sf}: wall {wall:.1f}s, "
          f"{len(stages)} stages (top by executor time):")
    for s in stages[:10]:
        print(f"  run={s.get('executorRunTime', 0)/1000:7.1f}s "
              f"tasks={s.get('numCompleteTasks', 0):4d} "
              f"in={s.get('inputBytes', 0)/1e6:8.1f}MB "
              f"sw={s.get('shuffleWriteBytes', 0)/1e6:7.1f}MB "
              f"sr={s.get('shuffleReadBytes', 0)/1e6:7.1f}MB  "
              f"{s.get('name', '')[:70]}", flush=True)


def main():
    args = [a for a in sys.argv[1:]]
    spark = get_spark_ui()
    spark.sparkContext.setLogLevel("WARN")
    if "--check" in args:
        check_fast_build(spark)
        args.remove("--check")
    if "--profile" in args:
        i = args.index("--profile")
        graph_name = args[i + 1]
        sf = int(args[i + 2]) if len(args) > i + 2 else 10
        profile_graph(spark, sf, graph_name)
        return
    sfs = [int(a) for a in args] or [1, 10, 100]
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
            with HeapSampler(spark) as hs:
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
                heap_baseline_gb=round(hs.baseline / 1e9, 2),
                heap_peak_used_gb=round(hs.peak / 1e9, 2),
                heap_retained_gb=round(hs.retained / 1e9, 2),
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
