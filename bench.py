"""Benchmark: fused noise+denoise throughput on device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver's north-star >5,000 600x1000 images/sec/chip for the
fused noise+denoise pipeline on TPU v5e (BASELINE.md).  The reference runs
this per image on the host (cv2 + skimage + sklearn, single image per
iteration) — it has no published throughput to compare against
(BASELINE.json "published": {}).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMGS_PER_SEC = 5000.0
H, W = 600, 1000
BATCH = 64
NOISE = 'sap_median_var0.4'  # BASELINE.json config 2: s&p + median over
# batched 600x1000 tensors


def main():
    from tpudenoise.noise.pipeline import make_pipeline

    rng = np.random.RandomState(3)
    images = jnp.asarray(
        rng.randint(0, 256, (BATCH, H, W, 3)).astype(np.float32))
    images = jax.device_put(images)
    fn = make_pipeline(NOISE, mode='TRAIN')
    key = jax.random.PRNGKey(3)

    # warmup / compile
    out = fn(key, images)
    out.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(jax.random.fold_in(key, i), images)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * iters / dt
    result = {
        "metric": f"fused noise+denoise ({NOISE}) {H}x{W} images/sec/chip",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    sys.exit(main())
