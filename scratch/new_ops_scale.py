"""Time the round-7-late queries at the generated sf0.1 vs sf1.0 data
(10x rows; scratch/gen_sf.py) and print the scaling ratio — the same
discipline as scratch/scale_ratio.py, scoped to the newest ops.

Usage: python scratch/new_ops_scale.py [names...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

NAMES = sys.argv[1:] or [
    "train_split_census",
    "event_session_type_pairs",
    "shingle_containment_pairs",
    "split_leakage_report",
    "tpch_q4_order_priority",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_idle_customers",
]


def main():
    from openeo_odc_driver_spark.session import get_spark
    from openeo_odc_driver_spark.registry import QUERIES

    spark = get_spark(cpus="32")
    out = {}
    for sf_dir in ("/root/repo/.sfdata/sf0.1", "/root/repo/.sfdata/sf1.0"):
        for name in NAMES:
            best = None
            for _ in range(3):
                t0 = time.monotonic()
                n = QUERIES[name](spark, sf_dir).count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            out[(sf_dir, name)] = (best, n)
            print(f"{sf_dir.rsplit('/',1)[-1]:7} {name:32} {best:7.2f}s rows={n}",
                  flush=True)
    print(f"\n{'ratio':>7}  {'sf0.1':>7}  {'sf1.0':>8}  query   (linear = 10.0)")
    for name in NAMES:
        a, _ = out[("/root/repo/.sfdata/sf0.1", name)]
        b, _ = out[("/root/repo/.sfdata/sf1.0", name)]
        print(f"{b / max(a, 1e-9):7.2f}  {a:7.3f}  {b:8.3f}  {name}")


if __name__ == "__main__":
    main()
