"""Scanned-switch vs host-grouped dispatch for the mixed-noise configs
(BASELINE config 3).

The scanned mix serializes images (one generator at batch 1 per scan
step); GroupedMix batches same-branch images into one vmapped dispatch
each.  This script measures both at the bench geometry so the dispatch
restructuring is justified by numbers, not vibes.

  python benchmarks/profile_mix_grouped.py [--small] [--fast-rng]
        [--noise noise_mix_var_all_bilateral]
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    small = '--small' in sys.argv
    fast = '--fast-rng' in sys.argv
    noise = 'noise_mix_var_all_bilateral'
    if '--noise' in sys.argv:
        noise = sys.argv[sys.argv.index('--noise') + 1]
    h, w, b = (128, 160, 8) if small else (600, 1000, 64)
    inner, reps = 4, 3

    from tpudenoise.noise.pipeline import GroupedMix, make_pipeline
    rng = np.random.RandomState(3)
    images = jax.device_put(jnp.asarray(
        rng.randint(0, 256, (b, h, w, 3)).astype(np.float32)))
    key = jax.random.PRNGKey(3)

    # ---- scanned (the current production path) ----
    fn = make_pipeline(noise, mode='TRAIN', fast_rng=fast)
    print(f'geometry {h}x{w} batch {b} noise={noise} fast_rng={fast}',
          flush=True)

    from benchmarks._timing import time_chained_dispatches
    best = time_chained_dispatches(fn, key, images, inner, reps=reps,
                                   readout_scale=1e-12)
    ips_scan = b * inner / best
    print(f'  scanned switch   ({fn.backend:26s}) {ips_scan:8.1f} img/s '
          f'({1000 * best / (b * inner):.3f} ms/img)', flush=True)

    # ---- grouped (host-driven same-kind batching) ----
    # Production shape: branches for the whole workload pre-drawn in ONE
    # device call + readback (the eval harness amortizes this to one RTT
    # per dataset), then per-batch grouped applies chain asynchronously
    # with a single final readback.
    gm = GroupedMix(noise, mode='TRAIN', fast_rng=fast)
    draws = []
    for i in range(inner):
        branch, level, akeys = gm.draw(jax.random.fold_in(key, 100 + i), b)
        draws.append((np.asarray(branch), level, akeys))

    def grouped_pass():
        acc = jnp.float32(0)
        for branch_h, level, akeys in draws:
            out = gm.apply_grouped(branch_h, level, akeys, images)
            acc = acc + jnp.sum(out[0]) * 1e-12
        return float(acc)  # ONE blocking readback for the whole pass

    grouped_pass()  # compile every (template, group-size) executable
    grouped_pass()  # warmup (scheduler settle)
    best = float('inf')
    for r in range(reps):
        t0 = time.perf_counter()
        grouped_pass()
        best = min(best, time.perf_counter() - t0)
    ips_grp = b * inner / best
    print(f'  grouped dispatch ({gm.backend:26s}) {ips_grp:8.1f} img/s '
          f'({1000 * best / (b * inner):.3f} ms/img)  '
          f'[{gm.n_templates} templates]', flush=True)
    print(f'  speedup: {ips_grp / ips_scan:.2f}x', flush=True)


if __name__ == '__main__':
    main()
