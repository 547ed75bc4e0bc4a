"""Full training-step throughput (fwd + bwd + momentum update) at the
production geometry — the number behind the README's train-step claim.

The step carries TrainState, so the chain serializes naturally through
the state; one scalar readback at the end (tunnel RTT amortized).

  python benchmarks/profile_train_step.py [res101] [--batch 8] [--small]
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    net = next((a for a in sys.argv[1:] if not a.startswith('-')), 'res101')
    batch = int(sys.argv[sys.argv.index('--batch') + 1]) \
        if '--batch' in sys.argv else 8
    small = '--small' in sys.argv
    shape = (128, 160) if small else (608, 1024)

    from benchmarks._timing import RTT_MS
    from tpudenoise.core.config import default_config
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.train.train_step import make_train_step

    C = default_config()
    model = FasterRCNN(backbone=net, num_classes=2, cfg=C)
    init_state, step_fn = make_train_step(model, C)
    state = init_state(jax.random.PRNGKey(0), image_shape=shape)

    rng = np.random.RandomState(3)
    g = 8
    gt = np.zeros((batch, g, 5), np.float32)
    gt[..., 0] = rng.rand(batch, g) * (shape[1] - 120)
    gt[..., 1] = rng.rand(batch, g) * (shape[0] - 120)
    gt[..., 2] = gt[..., 0] + 40 + rng.rand(batch, g) * 80
    gt[..., 3] = gt[..., 1] + 40 + rng.rand(batch, g) * 80
    gt[..., 4] = 1.0
    batch_d = {
        'image': jnp.asarray(rng.randn(batch, *shape, 3).astype(np.float32)
                             * 30),
        'im_info': jnp.tile(jnp.asarray(
            [[shape[0] - 8, shape[1] - 24, 1.]], jnp.float32), (batch, 1)),
        'gt_boxes': jnp.asarray(gt),
        'gt_mask': jnp.ones((batch, g), bool),
    }
    key = jax.random.PRNGKey(3)

    def chain(state, n):
        losses = None
        for i in range(n):
            state, losses = step_fn(state, jax.random.fold_in(key, i),
                                    batch_d)
        return state, float(losses['total_loss'])

    inner, reps = 4, 3
    state, _ = chain(state, 1)    # compile + warmup
    state, _ = chain(state, 2)
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        state, tl = chain(state, inner)
        best = min(best, time.perf_counter() - t0)
    ms_img = max(best * 1000.0 - RTT_MS, 0.0) / (inner * batch)
    print(f'{net} train step @ {shape} batch {batch}: '
          f'{ms_img:.2f} ms/img ({1000.0 / ms_img:.1f} img/s)  '
          f'[total_loss {tl:.3f}]', flush=True)


if __name__ == '__main__':
    main()
