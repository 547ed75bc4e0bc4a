"""True device-side batch-1 inference latency for the detector.

The round-4 '~12.7 ms single-image' number was measured with chained
async dispatches (one readback per trial); through the axon tunnel each
dispatch still pays an enqueue gap, so for a ~7 ms program the chain
can be enqueue-bound, overstating device latency.  Here the chain runs
INSIDE one jit via lax.scan (the scan body is traced once, so the
program stays under the remote-compile request limit that a vmapped
batch hits), with the output summed into the next input as the
serializing data dependency (measurement rule 6: operands must vary in
ways the simplifier cannot erase).

  python benchmarks/profile_batch1.py [net] [--inner N]

Reports ms/img device time and the implied img/s, plus the same scan at
batch 8 for the amortization comparison.  Reference contract is
1 image/batch (ref lib/model/config.py:69) — this is the like-for-like
latency number.
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(model, params, shape, batch, inner, reps=3):
    rng = np.random.RandomState(3)
    if batch == 1:
        img = jnp.asarray(rng.randn(*shape, 3).astype(np.float32) * 30)
        info = jnp.asarray([600., 1000., 1.], jnp.float32)

        def step(c, _):
            out = model.forward_test(params, img + c, info)
            return jnp.sum(out['cls_prob']).astype(jnp.float32) * 1e-9, None
    else:
        img = jnp.asarray(
            rng.randn(batch, *shape, 3).astype(np.float32) * 30)
        info = jnp.tile(jnp.asarray([[600., 1000., 1.]], jnp.float32),
                        (batch, 1))
        fwd = jax.vmap(lambda im, inf: model.forward_test(params, im, inf))

        def step(c, _):
            out = fwd(img + c, info)
            return jnp.sum(out['cls_prob']).astype(jnp.float32) * 1e-9, None

    @jax.jit
    def run():
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=inner)
        return c

    float(run())  # compile
    float(run())  # warmup (first timed trial absorbs server-side warmup)
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run())
        best = min(best, time.perf_counter() - t0)
    # one blocking readback per trial = ~31 ms tunnel RTT
    return max(best * 1000.0 - 31.0, 0.0) / (inner * batch)


def main():
    net = sys.argv[1] if len(sys.argv) > 1 else 'res101'
    inner = (int(sys.argv[sys.argv.index('--inner') + 1])
             if '--inner' in sys.argv else 8)
    from tpudenoise.core.config import default_config
    from tpudenoise.models.faster_rcnn import FasterRCNN

    cfg = default_config()
    model = FasterRCNN(backbone=net, num_classes=21, cfg=cfg)
    shape = (608, 1024)
    params = model.init(jax.random.PRNGKey(0), image_shape=shape)

    ms1 = scan_time(model, params, shape, batch=1, inner=inner)
    print(f'{net} @ {shape} batch 1 (scan x{inner}): '
          f'{ms1:7.2f} ms/img = {1000.0 / ms1:.1f} img/s', flush=True)
    ms8 = scan_time(model, params, shape, batch=8, inner=max(2, inner // 4))
    print(f'{net} @ {shape} batch 8 (scan x{max(2, inner // 4)}): '
          f'{ms8:7.2f} ms/img = {8000.0 / ms8 / 8:.1f} img/s x8',
          flush=True)


if __name__ == '__main__':
    main()
