"""Per-kind mix cost attribution: XLA scanned path vs fused Pallas kernel.

Mixed plans now route through the fused Pallas mix kernel by default
(noise/pallas_mix.py); the XLA scanned switch remains the stream/parity
reference (use_pallas=False).  This script attributes both:

  * `scan[kind]`  — a 2-entry same-kind plan through the XLA scanned
    path (use_pallas=False): per-image cost of that generator at batch 1
    inside the scan.  Brownian's scanned row OOM'd at batch 64 (XLA
    copies the (64,600,1000,3) batch through a T(8,128) layout padding
    3 -> 128 lanes = 19.6 GB); rows that fail at the full batch retry at
    batch 16 and are marked `b16`.
  * `fused[kind]` — the same 2-entry plan through the production fused
    kernel.
  * `vmap[kind]`  — the single-spec vmapped path, same batch.
  * the real var_all plans through both backends.

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

    images16 = images[:16]

    def measure(plan, use_pallas=None, ims=None):
        ims = images if ims is None else ims
        fn = make_pipeline(plan, mode='TRAIN', fast_rng=fast,
                           use_pallas=use_pallas)
        best = time_chained_dispatches(fn, key, ims, inner, reps=reps,
                                       readout_scale=1e-12)
        return 1000.0 * best / (ims.shape[0] * inner), fn.backend

    print(f'geometry {h}x{w} batch {b} fast_rng={fast}', flush=True)

    kinds = ['original', 'gaussian_var1.0', 'sap_var0.4', 'speckle_var1.0',
             'uniform_var0.6', 'rayleigh_var0.2', 'periodic_var100',
             'shader', 'poisson', 'gamma_var0.1', 'brownian_var0.09',
             'quant_var7', 'bloom']
    for ks in kinds:
        spec = parse(ks, mode='TRAIN').specs[0]
        scan_plan = NoisePlan(specs=(spec, spec), raw=f'2x:{ks}')
        try:
            ms_scan, _ = measure(scan_plan, use_pallas=False)
            tag = ''
        except Exception:
            # batch-64 layout blowup (docstring): retry at batch 16
            try:
                ms_scan, _ = measure(scan_plan, use_pallas=False,
                                     ims=images16)
                tag = ' b16'
            except Exception as e:
                print(f'  {ks:18s} scan FAILED: {str(e)[:70]}', flush=True)
                ms_scan, tag = float('nan'), ''
        try:
            ms_fused, _ = measure(scan_plan)
        except Exception as e:
            print(f'  {ks:18s} fused FAILED: {str(e)[:70]}', flush=True)
            ms_fused = float('nan')
        ms_vmap, _ = measure(parse(ks, mode='TRAIN'))
        print(f'  {ks:18s} scan {ms_scan:7.3f}{tag:4s} '
              f'fused {ms_fused:7.3f}   vmap {ms_vmap:7.3f} ms/img',
              flush=True)

    for noise in ('noise_mix_var_all', 'noise_mix_var_all_bilateral'):
        plan = parse(noise, mode='TRAIN')
        ms, backend = measure(plan)
        print(f'  {noise:34s} {ms:7.3f} ms/img ({backend})', flush=True)
        ms, backend = measure(plan, use_pallas=False)
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
