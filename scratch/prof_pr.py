import sys, time
sys.path.insert(0, '/root/repo')
from openeo_odc_driver_spark.session import get_spark
spark = get_spark(cpus='32')
import importlib.util
spec = importlib.util.spec_from_file_location('e','/root/repo/__spark_entry__.py')
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
for name in ("copurchase_pagerank", "ivf_pq_ann", "multimodal_jpeg_decode"):
    q = m.queries()[name]
    for i in range(3):
        t0=time.time(); df = q(spark, '/root/testdata/sf0.1'); n=df.count()
        print(f"{name} run{i}: {time.time()-t0:.2f}s rows={n}", flush=True)
