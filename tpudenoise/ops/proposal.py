"""RPN proposal generation on device, fixed shapes.

Re-expresses proposal_layer / proposal_layer_tf (ref lib/layer_utils/
proposal_layer.py:16-88): decode RPN deltas on all anchors, clip to the
image, pre-NMS top-K by objectness, NMS at 0.7, keep post_nms_topN — plus
proposal_top_layer (ref proposal_top_layer.py:17-85): NMS-free top
RPN_TOP_N selection.

Differences from the reference, by design:
  * fixed-size padded outputs + validity masks instead of dynamic counts;
  * anchors whose grid cell lies in the batch-padding region (beyond
    im_info) are masked out before selection — the reference has no
    padding because every image is its own graph run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpudenoise.ops.boxes import bbox_transform_inv, clip_boxes
from tpudenoise.ops.nms import NEG_INF, nms_packed


@functools.partial(jax.jit,
                   static_argnames=('pre_nms_top_n', 'post_nms_top_n'))
def proposal_layer(rpn_scores: jnp.ndarray, rpn_deltas: jnp.ndarray,
                   anchors: jnp.ndarray, im_hw, nms_thresh,
                   pre_nms_top_n: int, post_nms_top_n: int):
    """Args:
      rpn_scores: (K,) positive-class objectness for each anchor (the
        reference slices rpn_cls_prob[..., A:] — network.py:337-346).
      rpn_deltas: (K, 4).
      anchors: (K, 4).
      im_hw: (2,) actual image height/width inside the padded canvas.

    Returns (rois (post_n, 4), scores (post_n,), mask (post_n,)).
    """
    proposals = bbox_transform_inv(anchors, rpn_deltas)
    proposals = clip_boxes(proposals, (im_hw[0], im_hw[1]))

    # mask anchors centered in the padding region
    cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    inside = (cx < im_hw[1]) & (cy < im_hw[0])
    scores = jnp.where(inside, rpn_scores, NEG_INF)

    # pre-NMS top-K (ref config TRAIN 12000 / TEST 6000)
    k = min(pre_nms_top_n, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = proposals[top_idx]
    valid = top_scores > NEG_INF

    # bit-packed NMS: at the reference budgets (12,000 train / 6,000 test
    # pre-NMS boxes) the packed (K/32, K) uint32 suppression state is 32x
    # smaller than the dense IoU matrix — batch-8 DP training fits HBM
    # top_k emits scores sorted descending (ties index-ascending, same as
    # the stable argsort nms_packed would do) — skip the re-sort inside
    keep, keep_mask = nms_packed(top_boxes, top_scores, nms_thresh,
                                 max_outputs=post_nms_top_n, valid=valid,
                                 presorted=True)
    safe = jnp.maximum(keep, 0)
    rois = jnp.where(keep_mask[:, None], top_boxes[safe], 0.0)
    roi_scores = jnp.where(keep_mask, top_scores[safe], 0.0)
    return rois, roi_scores, keep_mask


@functools.partial(jax.jit, static_argnames=('top_n',))
def proposal_top_layer(rpn_scores: jnp.ndarray, rpn_deltas: jnp.ndarray,
                       anchors: jnp.ndarray, im_hw, top_n: int):
    """NMS-free alternative: top RPN_TOP_N=5000 by score, then decode+clip
    (ref proposal_top_layer.py:58-85; selection before decoding, unlike
    proposal_layer).

    Documented deviation: when fewer than top_n anchors score (anchor
    count < top_n), the reference's numpy path PADS by sampling indices
    with replacement (npr.choice, ref proposal_top_layer.py:30-38),
    duplicating random proposals; here the short tail is masked out
    instead (fixed shapes, no duplicates).  In practice 5000 < the anchor
    count at every supported geometry, so the branch never fires; the TF
    path the reference actually runs (tf.nn.top_k) has no pad either."""
    cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    inside = (cx < im_hw[1]) & (cy < im_hw[0])
    scores = jnp.where(inside, rpn_scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(scores, top_n)
    props = bbox_transform_inv(anchors[top_idx], rpn_deltas[top_idx])
    props = clip_boxes(props, (im_hw[0], im_hw[1]))
    mask = top_scores > NEG_INF
    return props, jnp.where(mask, top_scores, 0.0), mask
