"""Where does the scanned-switch mix program spend its time?

The per-kind expectation from `profile_mix_kinds.py` (batched, vmapped
numbers weighted by the var_all table) is far below the measured mix
throughput, so either (a) the scan serialization makes individual
generators slower at batch 1 than their vmapped batch-16 cost, or (b)
there is a constant per-scan-step overhead (switch dispatch, dynamic
slice in/out).  This script separates the two:

  * `scan[kind]`  — a 2-entry same-kind plan (forces the scanned path,
    collapses to ONE template: no switch fan-out) — per-image cost of
    that generator at batch 1 inside the scan.
  * `vmap[kind]`  — the single-spec vmapped path, same batch.
  * `scan[original]` — the floor: pure scan+slice overhead.
  * the real var_all plans with and without the bilateral post.

  python benchmarks/profile_mix_scan.py [--small] [--fast-rng]
"""
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    small = '--small' in sys.argv
    fast = '--fast-rng' in sys.argv
    h, w, b = (128, 160, 8) if small else (600, 1000, 64)
    inner, reps = 4, 3

    from benchmarks._timing import time_chained_dispatches
    from tpudenoise.noise.pipeline import make_pipeline
    from tpudenoise.noise.spec import NoisePlan, parse

    rng = np.random.RandomState(3)
    images = jax.device_put(jnp.asarray(
        rng.randint(0, 256, (b, h, w, 3)).astype(np.float32)))
    key = jax.random.PRNGKey(3)

    def measure(plan):
        fn = make_pipeline(plan, mode='TRAIN', fast_rng=fast)
        best = time_chained_dispatches(fn, key, images, inner, reps=reps,
                                       readout_scale=1e-12)
        return 1000.0 * best / (b * inner), fn.backend

    print(f'geometry {h}x{w} batch {b} fast_rng={fast}', flush=True)

    kinds = ['original', 'gaussian_var1.0', 'sap_var0.4', 'speckle_var1.0',
             'uniform_var0.6', 'rayleigh_var0.2', 'periodic_var100',
             'shader', 'poisson', 'gamma_var0.1', 'brownian_var0.09',
             'quant_var7', 'bloom']
    for ks in kinds:
        try:
            spec = parse(ks, mode='TRAIN').specs[0]
            scan_plan = NoisePlan(specs=(spec, spec), raw=f'2x:{ks}')
            ms_scan, _ = measure(scan_plan)
            ms_vmap, _ = measure(parse(ks, mode='TRAIN'))
            print(f'  {ks:18s} scan {ms_scan:7.3f} ms/img   '
                  f'vmap {ms_vmap:7.3f} ms/img   '
                  f'penalty {ms_scan - ms_vmap:+7.3f}', flush=True)
        except Exception as e:  # synthetic 2-spec plans can trip XLA
            print(f'  {ks:18s} FAILED: {str(e)[:90]}', flush=True)

    for noise in ('noise_mix_var_all', 'noise_mix_var_all_bilateral'):
        ms, backend = measure(parse(noise, mode='TRAIN'))
        print(f'  {noise:34s} {ms:7.3f} ms/img ({backend})', flush=True)

    # ---- poisson stage attribution (the dominant mix kind) ----
    import functools
    from benchmarks._timing import RTT_MS
    import time as _time
    from tpudenoise.noise import generators as G
    from tpudenoise.noise.fast_samplers import poisson_fixed

    x01 = images / 255.0
    u8 = images

    def timeit(fn, *a):
        f = jax.jit(fn)
        f(*a)[0].block_until_ready() if isinstance(f(*a), tuple) else \
            jax.block_until_ready(f(*a))
        best = float('inf')
        for _ in range(3):
            t0 = _time.perf_counter()
            jax.block_until_ready(f(*a))
            best = min(best, _time.perf_counter() - t0)
        return max(best * 1000.0 - RTT_MS, 0.0) / b

    ms = timeit(jax.vmap(G._u8_unique_count), u8)
    print(f'  [poisson] u8_unique_count        {ms:7.3f} ms/img', flush=True)
    keys = jax.random.split(key, b)
    ms = timeit(jax.vmap(lambda k, x: poisson_fixed(k, x * 256.0)),
                keys, x01)
    print(f'  [poisson] poisson_fixed(lam)     {ms:7.3f} ms/img', flush=True)
    ms = timeit(jax.vmap(G.poisson), keys, x01, u8)
    print(f'  [poisson] full generator         {ms:7.3f} ms/img', flush=True)


if __name__ == '__main__':
    main()
