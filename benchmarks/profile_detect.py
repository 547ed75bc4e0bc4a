"""Stage breakdown of forward_test on TPU: backbone, RPN, proposal+NMS,
RoI head.  Run:  python benchmarks/profile_detect.py [net]"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, img, *args, reps=8):
    """Serially data-dependent chain (the perturbed image feeds the next
    call) with ONE final readback — the only reliable way to time through
    the tunnel: independent calls overlap, and block_until_ready does not
    truly block."""
    out = fn(img, *args)  # compile
    # force a real readback: through the tunnel block_until_ready does
    # not truly block, so without this the timed loop absorbs compile
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    best = float('inf')
    for _ in range(3):  # first trial still absorbs server-side warmup
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(img + acc, *args)
            acc = jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(
                jnp.float32) * 1e-9
        float(acc)
        best = min(best, (time.perf_counter() - t0) / reps * 1000)
    # the single blocking readback per trial costs the ~31 ms tunnel RTT,
    # amortized over reps — subtract it to report device time
    return max(best - 31.0 / reps, 0.0)  # ms


def main_batched(net, batch=8, shape=(608, 1024)):
    """Batch-N stage breakdown: each stage jit(vmap(...)) like the
    production path, chained serially with one readback (see timeit).
    Attribution for the batch-8 roofline gap (606 GFLOP/img -> 4.7 ms
    floor at 65% MFU; measured ~7.0)."""
    from tpudenoise.core.config import default_config
    from tpudenoise.eval.harness import postprocess_detections
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.ops.proposal import proposal_layer

    cfg = default_config()
    model = FasterRCNN(backbone=net, num_classes=21, cfg=cfg)
    params = model.init(jax.random.PRNGKey(0), image_shape=shape)
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.randn(batch, *shape, 3).astype(np.float32) * 30)
    infos = jnp.tile(jnp.asarray([[600., 1000., 1.]], jnp.float32),
                     (batch, 1))

    bb = jax.jit(jax.vmap(lambda im: model.head_mod.apply(
        {'params': params['head']}, im[None])[0]))
    rpn = jax.jit(jax.vmap(lambda im: model._rpn_forward(params, im)[2]))

    def upto_prop(im, inf):
        _, _, scores, deltas, anchors = model._rpn_forward(params, im)
        rois, _, _ = proposal_layer(
            scores, deltas, anchors, inf[:2], cfg.TEST.RPN_NMS_THRESH,
            cfg.TEST.RPN_PRE_NMS_TOP_N, cfg.TEST.RPN_POST_NMS_TOP_N)
        return rois
    prop = jax.jit(jax.vmap(upto_prop, in_axes=(0, 0)))
    full = jax.jit(jax.vmap(
        lambda im, inf: model.forward_test(params, im, inf),
        in_axes=(0, 0)))

    def fwd_post(im, inf):
        out = model.forward_test(params, im, inf)
        return postprocess_detections(
            out['rois'], out['roi_mask'], out['cls_prob'],
            out['bbox_pred'], inf, 21, cfg.TEST.NMS, 0.0)[1]
    fpost = jax.jit(jax.vmap(fwd_post, in_axes=(0, 0)))

    t_bb = timeit(bb, imgs) / batch
    t_rpn = timeit(rpn, imgs) / batch
    t_prop = timeit(lambda im, inf: prop(im, inf), imgs, infos) / batch
    t_full = timeit(lambda im, inf: full(im, inf)['cls_prob'],
                    imgs, infos) / batch
    t_post = timeit(fpost, imgs, infos) / batch
    print(f'{net} @ {shape} batch {batch} (ms/img):')
    print(f'  backbone head          {t_bb:7.2f}')
    print(f'  + rpn conv             {t_rpn:7.2f}  (rpn {t_rpn - t_bb:+.2f})')
    print(f'  + proposal/NMS         {t_prop:7.2f}  (nms {t_prop - t_rpn:+.2f})')
    print(f'  full forward_test      {t_full:7.2f}  (roi head {t_full - t_prop:+.2f})')
    print(f'  + class-NMS postproc   {t_post:7.2f}  (post {t_post - t_full:+.2f})')


def main():
    net = sys.argv[1] if len(sys.argv) > 1 else 'vgg16'
    from tpudenoise.core.config import default_config
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.ops.proposal import proposal_layer

    if '--batch' in sys.argv:
        b = int(sys.argv[sys.argv.index('--batch') + 1])
        return main_batched(net, batch=b)

    cfg = default_config()
    model = FasterRCNN(backbone=net, num_classes=21, cfg=cfg)
    shape = (608, 1024)
    params = model.init(jax.random.PRNGKey(0), image_shape=shape)
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randn(*shape, 3).astype(np.float32) * 30)
    info = jnp.asarray([600., 1000., 1.], jnp.float32)

    # full
    full = jax.jit(lambda im, p, inf: model.forward_test(p, im, inf))
    t_full = timeit(full, img, params, info)

    # backbone head only
    bb = jax.jit(lambda im, p: model.head_mod.apply(
        {'params': p['head']}, im[None]))
    t_bb = timeit(bb, img, params)

    # backbone + rpn
    rpn = jax.jit(lambda im, p: model._rpn_forward(p, im)[2])
    t_rpn = timeit(rpn, img, params)

    # backbone + rpn + proposal/NMS
    def upto_prop(im, p, inf):
        feat, _, scores, deltas, anchors = model._rpn_forward(p, im)
        rois, roi_scores, mask = proposal_layer(
            scores, deltas, anchors, inf[:2], cfg.TEST.RPN_NMS_THRESH,
            cfg.TEST.RPN_PRE_NMS_TOP_N, cfg.TEST.RPN_POST_NMS_TOP_N)
        return rois
    t_prop = timeit(jax.jit(upto_prop), img, params, info)

    print(f'{net} @ {shape}:')
    print(f'  backbone head          {t_bb:7.2f} ms')
    print(f'  + rpn conv             {t_rpn:7.2f} ms  (rpn {t_rpn - t_bb:+.2f})')
    print(f'  + proposal/NMS         {t_prop:7.2f} ms  (nms {t_prop - t_rpn:+.2f})')
    print(f'  full forward_test      {t_full:7.2f} ms  (roi head {t_full - t_prop:+.2f})')


if __name__ == '__main__':
    main()
