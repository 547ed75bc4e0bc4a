"""Benchmark: fused noise+denoise throughput on device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver's north-star >5,000 600x1000 images/sec/chip for the
fused noise+denoise pipeline on TPU v5e (BASELINE.md).  The reference runs
this per image on the host (cv2 + skimage + sklearn, single image per
iteration) and publishes no throughput (BASELINE.json "published": {}).

Methodology: the per-dispatch tunnel overhead in this environment is
~31 ms regardless of batch size, so the pipeline is applied `INNER` times
inside one jit (lax.scan with per-step key folding) over a `BATCH`-image
tensor — one dispatch measures INNER*BATCH images of pure device work,
which is what "images/sec/chip" means in production.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMGS_PER_SEC = 5000.0
H, W = 600, 1000
BATCH = 128
INNER = 8
NOISE = 'sap_median_var0.4'  # BASELINE.json config 2: s&p + median over
# batched 600x1000 tensors


def main():
    jax.config.update('jax_threefry_partitionable', True)
    from tpudenoise.noise.pallas_kernels import fused_sap_median_batched

    rng = np.random.RandomState(3)
    # uint8 batches: what the loader actually ships to device (4x fewer
    # HBM bytes each way than f32; kernel compute is f32 in registers and
    # bit-identical — tests/test_pallas.py::test_u8_io_matches_f32)
    images = jax.device_put(jnp.asarray(
        rng.randint(0, 256, (BATCH, H, W, 3)).astype(np.uint8)))
    seeds = jnp.arange(BATCH, dtype=jnp.int32)

    @jax.jit
    def run_many(images, seeds):
        def step(c, i):
            out = fused_sap_median_batched(images, seeds + i, amount=0.4,
                                           double_filter=True, tile_h=120)
            # fold the output into a running checksum so no step is DCE'd
            return c + jnp.sum(out[0, ::97, ::89].astype(jnp.float32)), None
        c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(INNER))
        return c

    float(run_many(images, seeds))  # compile + warmup
    float(run_many(images, seeds + 7))  # second warmup (scheduler settle)

    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        float(run_many(images, seeds + 1000 * r))
    dt = (time.perf_counter() - t0) / reps

    imgs_per_sec = BATCH * INNER / dt
    result = {
        "metric": f"fused noise+denoise pallas ({NOISE}) "
                  f"{H}x{W} images/sec/chip",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    sys.exit(main())
