"""Compare the generated-data benches at sf0.1 vs sf1.0 (same generator,
10x rows) and print the per-query scaling ratio table for PLANS.md.

Queries on the synthetic cube (flagship_ndvi, reduce_time_sweep,
apply_kernel, streaming_*) are SF-INDEPENDENT — their ratio is pure
measurement noise and is labeled as such.
"""

import json

SF_INDEPENDENT = {
    "flagship_ndvi", "reduce_time_sweep", "apply_kernel",
    "streaming_tumbling_hourly",
}

a = json.load(open("/root/repo/scratch/bench_sf01_gen.json"))
b = json.load(open("/root/repo/scratch/bench_sf10_gen.json"))
qa, qb = a["queries"], b["queries"]
print(f"sf0.1-gen total {a['value']}s (load {a['loadavg_end']}), "
      f"sf1.0-gen total {b['value']}s (load {b['loadavg_end']})")
rows = []
for k in qb:
    if k in qa:
        rows.append((qb[k] / max(qa[k], 1e-9), k, qa[k], qb[k]))
rows.sort(reverse=True)
print(f"{'ratio':>7}  {'sf0.1':>7}  {'sf1.0':>8}  query")
for r, k, x, y in rows:
    tag = "  [sf-independent]" if k in SF_INDEPENDENT else ""
    print(f"{r:7.2f}  {x:7.3f}  {y:8.3f}  {k}{tag}")
dep = [r for r, k, _, _ in rows if k not in SF_INDEPENDENT]
print(f"\nsf-dependent queries: n={len(dep)}, "
      f"median ratio {sorted(dep)[len(dep)//2]:.2f}, "
      f"max {max(dep):.2f} (linear = 10.0)")
