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

# Round-12 item 4 A/B: previous-row-only predictor payloads decode via the
# vectorized row path; forcing _ROW_PARALLEL_MODES empty reruns the same
# payloads through the scalar scan for an honest speedup factor.
import numpy as np
from openeo_odc_driver_spark.pipeline import webp as W

rng = np.random.default_rng(5)
img = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
for mode in (0, 2):
    payload = W.encode_webp(img, predictor_mode=mode)
    reps = 6
    t0 = time.time()
    for _ in range(reps):
        out = W.decode_webp(payload)
    fast = (time.time() - t0) / reps
    assert (out == img).all()
    saved = W._ROW_PARALLEL_MODES
    W._ROW_PARALLEL_MODES = frozenset()
    t0 = time.time()
    for _ in range(reps):
        out2 = W.decode_webp(payload)
    slow = (time.time() - t0) / reps
    W._ROW_PARALLEL_MODES = saved
    assert (out2 == img).all()
    px = img.shape[0] * img.shape[1]
    print(f"pred mode {mode} 128x128: vectorized {fast*1e3:.1f} ms "
          f"({px/fast/1e3:.0f} kpx/s/core) vs scalar {slow*1e3:.1f} ms "
          f"({px/slow/1e3:.0f} kpx/s/core) -> {slow/fast:.1f}x")
