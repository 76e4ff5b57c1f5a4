"""VP8L decode throughput probe (round-11 item 5): rows/s/core for the
bit-serial pure-Python decoder at the fixture's 32x32 RGB payloads and
a 64x64 variant, plus bytes/s. Conclusion recorded in PLANS.md."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from openeo_odc_driver_spark.pipeline.multimodal import synth_webp_bytes
from openeo_odc_driver_spark.pipeline.webp import decode_webp

for w, h, n in ((32, 32, 64), (64, 64, 16)):
    blobs = [synth_webp_bytes(i, w, h) for i in range(n)]
    t0 = time.time()
    px = 0
    for b in blobs:
        arr = decode_webp(b)
        px += arr.shape[0] * arr.shape[1]
    dt = time.time() - t0
    tot = sum(len(b) for b in blobs)
    print(f"{w}x{h}: {n} imgs in {dt:.2f}s -> {n/dt:.1f} imgs/s/core, "
          f"{px/dt/1e3:.1f} kpx/s/core, {tot/dt/1e3:.1f} kB/s/core "
          f"(avg {tot/n:.0f} B/img)")
