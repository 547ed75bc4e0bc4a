"""Fine-grained profile of the res101 inference glue (proposal/NMS +
class-NMS postprocess) — the only stages of the test forward not already
at the MXU roofline (profile_detect.py: RoI head 3.69 ms = 91% of
practical peak; glue ~0.9 ms).

Times cumulative stage chains at the production geometry (608x1024,
batch 8, 21 classes) plus micro-benchmarks of the candidate costs
(top_k, argsort, suppression-mask build, fixpoint sweeps) and reports
the measured fixpoint sweep count.

  python benchmarks/profile_rpn_glue.py [--small]
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

RTT_MS = 31.0


def _time(fn, *args, inner=8, reps=3):
    """Chained async dispatches, one readback; returns ms per call."""
    @jax.jit
    def once(acc, *a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)),
                                  x.astype(jnp.float32), 0.0))
                for x in leaves)
        return acc + s * 1e-9

    def chain(n):
        acc = jnp.float32(0)
        for _ in range(n):
            acc = once(acc, *args)
        return float(acc)

    chain(1)
    chain(2)
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        chain(inner)
        best = min(best, time.perf_counter() - t0)
    return max(best / inner * 1000.0 - RTT_MS / inner, 0.0)


def main():
    small = '--small' in sys.argv
    shape = (128, 160) if small else (608, 1024)
    batch = 2 if small else 8
    ncls = 21

    from tpudenoise.core.config import default_config
    from tpudenoise.eval.harness import postprocess_detections
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.ops.boxes import bbox_transform_inv, clip_boxes
    from tpudenoise.ops.nms import NEG_INF, nms_packed
    from tpudenoise.ops.proposal import proposal_layer

    C = default_config()
    model = FasterRCNN(backbone='res101', num_classes=ncls, cfg=C)
    params = model.init(jax.random.PRNGKey(0), image_shape=shape)
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.randn(batch, *shape, 3).astype(np.float32) * 30)
    infos = jnp.tile(jnp.asarray([[shape[0] - 8, shape[1] - 24, 1.]],
                                 jnp.float32), (batch, 1))
    pre_n, post_n = C.TEST.RPN_PRE_NMS_TOP_N, C.TEST.RPN_POST_NMS_TOP_N
    if small:
        pre_n, post_n = 256, 32

    print(f'res101 @ {shape} batch {batch} pre/post {pre_n}/{post_n}',
          flush=True)

    def rpn_only(im):
        feat, _, scores, deltas, anchors = model._rpn_forward(params, im)
        return scores, deltas

    def to_topk(im, info):
        feat, _, scores, deltas, anchors = model._rpn_forward(params, im)
        proposals = bbox_transform_inv(anchors, deltas)
        proposals = clip_boxes(proposals, (info[0], info[1]))
        cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
        cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
        inside = (cx < info[1]) & (cy < info[0])
        s = jnp.where(inside, scores, NEG_INF)
        ts, ti = jax.lax.top_k(s, pre_n)
        return ts, proposals[ti]

    def to_nms(im, info):
        feat, _, scores, deltas, anchors = model._rpn_forward(params, im)
        return proposal_layer(scores, deltas, anchors, info[:2], 0.7,
                              pre_n, post_n)

    t_rpn = _time(jax.vmap(rpn_only), imgs)
    t_topk = _time(jax.vmap(to_topk), imgs, infos)
    t_nms = _time(jax.vmap(to_nms), imgs, infos)
    print(f'  backbone+rpn            {t_rpn:7.2f} ms/batch '
          f'({t_rpn / batch:.3f} ms/img)', flush=True)
    print(f'  + decode/clip/top_k     {t_topk:7.2f}  (delta '
          f'{(t_topk - t_rpn) / batch:.3f} ms/img)', flush=True)
    print(f'  + mask build + fixpoint {t_nms:7.2f}  (delta '
          f'{(t_nms - t_topk) / batch:.3f} ms/img)', flush=True)

    # ---- micro: the candidate costs in isolation ----
    k_anch = 17100 if not small else 1710
    s_micro = jnp.asarray(rng.rand(batch, k_anch).astype(np.float32))
    t = _time(jax.vmap(lambda s: jax.lax.top_k(s, pre_n)), s_micro)
    print(f'  [micro] top_k({k_anch}->{pre_n}) x{batch}   '
          f'{t:7.2f} ms', flush=True)
    t = _time(jax.vmap(lambda s: jnp.argsort(-s)), s_micro)
    print(f'  [micro] argsort({k_anch}) x{batch}       {t:7.2f} ms',
          flush=True)

    x1 = rng.rand(batch, pre_n, 1) * 900
    y1 = rng.rand(batch, pre_n, 1) * 500
    bx = np.concatenate([x1, y1, x1 + 20 + rng.rand(batch, pre_n, 1) * 200,
                         y1 + 20 + rng.rand(batch, pre_n, 1) * 200],
                        axis=-1).astype(np.float32)
    sc = rng.rand(batch, pre_n).astype(np.float32)
    bx_d, sc_d = jnp.asarray(bx), jnp.asarray(sc)
    t = _time(jax.vmap(lambda b, s: nms_packed(b, s, 0.7, post_n)),
              bx_d, sc_d)
    print(f'  [micro] nms_packed({pre_n}) x{batch}     {t:7.2f} ms',
          flush=True)

    # fixpoint sweep count on this box field (host re-run of the loop)
    from tpudenoise.ops.nms import (build_suppression_masks,
                                    build_suppression_masks_pallas,
                                    _pack_bits)
    tile = 512 if pre_n >= 512 else 256
    n_pad = ((pre_n + tile - 1) // tile) * tile
    order = np.argsort(-sc[0])
    sb = np.zeros((n_pad, 4), np.float32)
    sb[:pre_n] = bx[0][order]
    if jax.default_backend() == 'tpu':
        masks = build_suppression_masks_pallas(jnp.asarray(sb), 0.7,
                                               tile=tile)
    else:
        masks = build_suppression_masks(jnp.asarray(sb), 0.7, block=tile)
    alive = jnp.asarray(np.arange(n_pad) < pre_n)
    sweeps = 0
    while True:
        ap = _pack_bits(alive)
        suppressed = jnp.any((masks & ap[:, None]) != 0, axis=0)
        new_alive = jnp.asarray(np.arange(n_pad) < pre_n) & ~suppressed
        sweeps += 1
        if bool(jnp.all(new_alive == alive)):
            break
        alive = new_alive
    print(f'  [micro] fixpoint sweeps to converge: {sweeps}', flush=True)

    # ---- postprocess (class-NMS) ----
    rois = jnp.asarray(bx[:, :post_n] if post_n <= pre_n else bx)
    rmask = jnp.ones((batch, post_n), bool)
    prob = jnp.asarray(rng.dirichlet(np.ones(ncls),
                                     (batch, post_n)).astype(np.float32))
    pred = jnp.asarray((rng.randn(batch, post_n, 4 * ncls) * 0.1)
                       .astype(np.float32))
    t = _time(jax.vmap(lambda r, m, p, bb, inf: postprocess_detections(
        r, m, p, bb, inf, ncls, 0.3, 0.0)),
        rois, rmask, prob, pred, infos)
    print(f'  postprocess_detections  {t:7.2f} ms/batch '
          f'({t / batch:.3f} ms/img)', flush=True)


if __name__ == '__main__':
    main()
