import sys, time, math
sys.path.insert(0, '/root/repo')
from openeo_odc_driver_spark.session import get_spark
spark = get_spark(cpus='32')
from pyspark.sql import functions as F
from openeo_odc_driver_spark.core import tiled as t
from openeo_odc_driver_spark.core.cube import Cube, CubeSchema, GridSpec

N = 2048
tc = t.load_tiled(spark, "/tmp/r9_scale/tiled")
cx, cy, r = N/2.0, N/2.0, N*0.38
POLY = [(cx + r*math.cos(a), cy + r*math.sin(a)) for a in [i*math.pi/3 + 0.1 for i in range(6)]]

# count interior vs boundary tiles using the operator's own exprs
g = tc.schema.grid
T = tc.tile
from openeo_odc_driver_spark.core.tiled import _contains_expr
px_lo = F.col("tile_col").cast("long") * T
px_hi = F.least(px_lo + (T-1), F.lit(tc.n_x - 1))
py_lo = F.col("tile_row").cast("long") * T
py_hi = F.least(py_lo + (T-1), F.lit(tc.n_y - 1))
x_lo = F.lit(g.x0) + F.lit(g.resx) * px_lo
x_hi = F.lit(g.x0) + F.lit(g.resx) * px_hi
y_hi = F.lit(g.y0) - F.lit(g.resy) * py_lo
y_lo = F.lit(g.y0) - F.lit(g.resy) * py_hi
xs = [p[0] for p in POLY]; ys = [p[1] for p in POLY]
inter = (x_lo <= max(xs)) & (x_hi >= min(xs)) & (y_lo <= max(ys)) & (y_hi >= min(ys))
full = (_contains_expr(POLY, x_lo, y_lo) & _contains_expr(POLY, x_lo, y_hi)
        & _contains_expr(POLY, x_hi, y_lo) & _contains_expr(POLY, x_hi, y_hi))
cls = tc.df.select(F.when(full, "interior").when(inter, "boundary").otherwise("outside").alias("c")).groupBy("c").count().collect()
print("tile classes:", {r["c"]: r["count"] for r in cls}, flush=True)

def timeit(label, fn, runs=3):
    best = min((lambda t0=time.time(): (fn(), time.time()-t0)[1])() for _ in range(runs))
    print(f"{label}: best {best:.2f}s", flush=True)

# isolate: interior-only (empty polygon of boundary) vs boundary-only
out = t.aggregate_spatial_tiled(tc, [POLY], "mean")
timeit("full zonal tiled", lambda: out.df.collect())
# a: interior branch only — classify, numpy partials, no explode
interior_df = tc.df.where(full)
timeit("scan+classify only", lambda: tc.df.where(inter).count())
import numpy as np, pandas as pd
def partials(batches):
    for pdf in batches:
        if not len(pdf): continue
        a = np.array([np.asarray(d, dtype="float64") for d in pdf["data"]])
        yield pd.DataFrame({"s":[float(np.nansum(a))], "c":[int((~np.isnan(a)).sum())]})
timeit("interior numpy partials", lambda: interior_df.select("data").mapInPandas(partials, "s double, c bigint").groupBy().sum().collect())
bdf = tc.df.where(inter & ~full)
timeit("boundary explode+tag+agg", lambda: bdf.select(
    "band","time","tile_row","tile_col", F.posexplode("data").alias("_pos","value")).count())

t0=time.time(); q2 = t.aggregate_spatial_tiled(tc, [POLY], "mean"); print(f"plan construction: {time.time()-t0:.2f}s", flush=True)
t0=time.time(); q2.df.collect(); print(f"first exec: {time.time()-t0:.2f}s", flush=True)
t0=time.time(); q3 = t.aggregate_spatial_tiled(tc, [POLY], "mean"); q3.df.collect(); print(f"construct+exec warm: {time.time()-t0:.2f}s", flush=True)
# long-path comparison in same session
from openeo_odc_driver_spark.operators.aggregates import aggregate_spatial
schema = CubeSchema(dims=("band","time","y","x"), bands=("B04",), grid=GridSpec(x0=0.0, y0=float(N-1), resx=1.0, resy=1.0))
cube = Cube(spark.read.parquet("/tmp/r9_scale/long"), schema)
t0=time.time(); aggregate_spatial(cube, [POLY], "mean").df.collect(); print(f"long construct+exec: {time.time()-t0:.2f}s", flush=True)
t0=time.time(); aggregate_spatial(cube, [POLY], "mean").df.collect(); print(f"long construct+exec warm: {time.time()-t0:.2f}s", flush=True)
