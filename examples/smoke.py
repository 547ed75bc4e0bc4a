"""Library smoke: anchors -> RPN-style decode -> clip -> device NMS ->
fused noise+denoise, on whatever platform jax picks (TPU by default).

  python examples/smoke.py
"""
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tpudenoise.noise.pipeline import make_pipeline
    from tpudenoise.ops.anchors import anchor_grid, generate_anchors
    from tpudenoise.ops.boxes import bbox_transform_inv, clip_boxes
    from tpudenoise.ops.nms import nms_fixpoint, nms_packed

    print('platform:', jax.default_backend(), jax.devices()[0].device_kind)

    base = generate_anchors()
    assert base.shape == (9, 4)
    anchors = anchor_grid(38, 50, 16)
    print('anchor grid:', anchors.shape)

    rng = np.random.RandomState(3)
    deltas = jnp.asarray(rng.randn(anchors.shape[0], 4).astype(np.float32)
                         * 0.1)
    boxes = clip_boxes(bbox_transform_inv(anchors, deltas), (600., 800.))
    scores = jnp.asarray(rng.rand(anchors.shape[0]).astype(np.float32))
    k = 300
    top_scores, idx = jax.lax.top_k(scores, k)
    sel, mask = nms_fixpoint(boxes[idx], top_scores, 0.7, max_outputs=100)
    print('nms keep:', int(jnp.sum(mask)), 'of', k)

    # bit-packed NMS (Pallas mask kernel on TPU) must agree with the
    # dense fixpoint on the same problem
    selp, maskp = nms_packed(boxes[idx], top_scores, 0.7, max_outputs=100)
    kept_dense = set(np.asarray(sel)[np.asarray(mask)].tolist())
    kept_packed = set(np.asarray(selp)[np.asarray(maskp)].tolist())
    assert kept_packed == kept_dense, (
        len(kept_packed), len(kept_dense))
    print('nms_packed keep:', len(kept_packed), '(matches dense)')

    fn = make_pipeline('sap_median_var0.4', mode='TEST')
    img = jnp.asarray(rng.randint(0, 256, (1, 120, 160, 3))
                      .astype(np.float32))
    out = fn(jax.random.PRNGKey(0), img)
    print('pipeline backend:', fn.backend, 'out', out.shape, out.dtype,
          float(out.min()), float(out.max()))
    print('SMOKE OK')


if __name__ == '__main__':
    main()
