import sys
sys.path.insert(0, '/root/repo')
from openeo_odc_driver_spark.session import get_spark
spark = get_spark(cpus='8')
import pandas as pd
from openeo_odc_driver_spark.plans.graph import ProcessGraph

for name in ("ndvi_median", "masked_seasonal", "resample_pushdown"):
    path = f"tests/process_graphs/{name}.json"
    long_df = ProcessGraph.from_file(path, save_dir=f"/tmp/pg_l_{name}").execute(spark).df
    tiled_df = ProcessGraph.from_file(path, save_dir=f"/tmp/pg_t_{name}", tiled=True).execute(spark).df
    lp = long_df.toPandas(); tp = tiled_df.toPandas()
    cols = sorted(lp.columns)
    lp = lp[cols].sort_values(cols).reset_index(drop=True)
    tp = tp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(lp, tp, check_exact=True)
    print(f"{name}: tiled == long, {len(lp)} rows", flush=True)
