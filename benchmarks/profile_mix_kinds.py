"""Per-kind cost ablation for the mixed-noise path (BASELINE config 3).

Times each generator kind as a single-spec batched pipeline at the bench
geometry, plus the two post-pass filters, so the mix budget
(sum over kinds of draw_probability x kind_cost) can be attributed.

  python benchmarks/profile_mix_kinds.py [--small] [--fast-rng]
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

KINDS = ['original', 'gaussian_var1.0', 'poisson', 'sap_var0.4',
         'speckle_var1.0', 'uniform_var0.6', 'gamma_var0.1',
         'rayleigh_var0.2', 'periodic_var100', 'brownian_var0.09',
         'quant_var7', 'bloom', 'shader']


def main():
    small = '--small' in sys.argv
    fast = '--fast-rng' in sys.argv
    # inner x b images per blocking readback: at inner=2 the cheap kinds'
    # signal (~6 ms) drowned in tunnel-RTT jitter and printed 0.000
    # (round-3 misattribution); 8x16 images puts even 0.1 ms/img kinds
    # at ~4x the jitter
    h, w, b, inner = (128, 160, 4, 2) if small else (600, 1000, 16, 8)
    from tpudenoise.noise.pipeline import make_pipeline
    rng = np.random.RandomState(3)
    images = jax.device_put(jnp.asarray(
        rng.randint(0, 256, (b, h, w, 3)).astype(np.float32)))
    key = jax.random.PRNGKey(3)

    from benchmarks._timing import (ms_per_item_minus_rtt,
                                    time_chained_dispatches)

    def timeit(fn):
        if fast:
            # fast_rng must avoid the outer-scan shape (fault story and
            # recipe live in benchmarks/_timing.py)
            best = time_chained_dispatches(fn, key, images, inner)
            return ms_per_item_minus_rtt(best, b * inner)

        @jax.jit
        def run_many(images):
            def step(c, i):
                out = fn(jax.random.fold_in(key, i), images)
                # full-BATCH sum: an out[0] readout let XLA dead-code-
                # eliminate the other images' work for fusable
                # elementwise kinds (they printed 0.000 in round 3);
                # strided-slice READBACKS are the thing to avoid, an
                # in-jit full sum costs one bandwidth pass
                return c + jnp.sum(out.astype(jnp.float32)) * 1e-9, None
            c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(inner))
            return c
        float(run_many(images))
        float(run_many(images))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_many(images))
            best = min(best, time.perf_counter() - t0)
        # one blocking readback per run costs the ~31 ms tunnel RTT
        return ms_per_item_minus_rtt(best, b * inner)  # ms/image, real

    print(f'geometry {h}x{w} batch {b} fast_rng={fast}', flush=True)
    for kind in KINDS:
        # default use_pallas (auto): time the PRODUCTION dispatch — the
        # earlier use_pallas=False forced bloom onto the XLA scan
        # compositor (~2 ms/img) the pipeline never runs on TPU
        fn = make_pipeline(kind, mode='TRAIN', fast_rng=fast)
        ms = timeit(fn)
        print(f'  {kind:22s} {ms:8.3f} ms/img ({fn.backend})', flush=True)
    for post in ('original_bilateral', 'original_wavelet'):
        fn = make_pipeline(post, mode='TRAIN', fast_rng=fast)
        ms = timeit(fn)
        print(f'  {post:22s} {ms:8.3f} ms/img ({fn.backend})', flush=True)


if __name__ == '__main__':
    main()
