"""On-device training target assignment, fixed shapes.

Replaces the reference's two host round-trips per step — anchor_target_layer
and proposal_target_layer, both wrapped in tf.py_func (ref lib/nets/
network.py:164-210, lib/layer_utils/anchor_target_layer.py:18-162,
lib/layer_utils/proposal_target_layer.py:18-152) — with vectorized,
key-driven XLA programs (SURVEY.md §7 hard part #6).  npr.choice
subsampling becomes shuffle-prefix (without replacement) / iid randint
(with replacement), preserving the sampling statistics.

gt_boxes are padded to a fixed G with a validity mask (column 4 = class
label > 0 for valid rows in this framework's convention; a separate mask
argument keeps zero-class datasets representable).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpudenoise.ops.boxes import bbox_overlaps, bbox_transform

BIG = jnp.float32(1e9)


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray           # (K,) float: 1 fg, 0 bg, -1 ignore
    bbox_targets: jnp.ndarray     # (K, 4)
    bbox_inside_weights: jnp.ndarray   # (K, 4)
    bbox_outside_weights: jnp.ndarray  # (K, 4)


def _random_disable(key, mask: jnp.ndarray, keep_n) -> jnp.ndarray:
    """Keep a random subset of size keep_n from mask=True entries (the
    npr.choice(disable) of anchor_target_layer.py:73-86)."""
    r = jax.random.uniform(key, mask.shape)
    score = jnp.where(mask, r, BIG)
    order = jnp.argsort(score)                 # random order of True entries
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(mask.shape[0]))
    return mask & (rank < keep_n)


@functools.partial(jax.jit, static_argnames=(
    'rpn_batch', 'fg_fraction', 'pos_thresh', 'neg_thresh',
    'clobber_positives'))
def anchor_target_layer(key, anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                        gt_mask: jnp.ndarray, im_hw,
                        rpn_batch: int = 256, fg_fraction: float = 0.5,
                        pos_thresh: float = 0.7, neg_thresh: float = 0.3,
                        clobber_positives: bool = False) -> AnchorTargets:
    """RPN training labels (ref anchor_target_layer.py:18-162).

    anchors: (K, 4); gt_boxes: (G, 5) padded; gt_mask: (G,) validity.
    """
    k = anchors.shape[0]
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < im_hw[1]) & (anchors[:, 3] < im_hw[0]))

    overlaps = bbox_overlaps(anchors, gt_boxes[:, :4])       # (K, G)
    overlaps = jnp.where(gt_mask[None, :], overlaps, -1.0)
    overlaps = jnp.where(inside[:, None], overlaps, -1.0)
    argmax = jnp.argmax(overlaps, axis=1)                    # per anchor
    max_ov = jnp.max(overlaps, axis=1)
    gt_max = jnp.max(overlaps, axis=0)                       # per gt
    # anchors achieving any gt's max (ref :50-54 np.where(== gt_max))
    is_gt_best = jnp.any(
        (overlaps == gt_max[None, :]) & gt_mask[None, :] & (gt_max[None, :]
                                                            > 0), axis=1)

    labels = jnp.full((k,), -1.0)
    if not clobber_positives:
        labels = jnp.where(inside & (max_ov < neg_thresh) & (max_ov >= 0),
                           0.0, labels)
    labels = jnp.where(is_gt_best & inside, 1.0, labels)
    labels = jnp.where(inside & (max_ov >= pos_thresh), 1.0, labels)
    if clobber_positives:
        labels = jnp.where(inside & (max_ov < neg_thresh) & (max_ov >= 0),
                           0.0, labels)

    # subsample fg to fg_fraction*batch, then bg to fill
    k1, k2 = jax.random.split(key)
    num_fg_cap = int(fg_fraction * rpn_batch)
    fg = labels == 1.0
    fg_kept = _random_disable(k1, fg, num_fg_cap)
    labels = jnp.where(fg & ~fg_kept, -1.0, labels)
    num_fg = jnp.sum(labels == 1.0)
    bg = labels == 0.0
    bg_kept = _random_disable(k2, bg, rpn_batch - num_fg)
    labels = jnp.where(bg & ~bg_kept, -1.0, labels)

    targets = bbox_transform(anchors, gt_boxes[argmax, :4])
    targets = jnp.where(inside[:, None], targets, 0.0)

    in_w = jnp.where((labels == 1.0)[:, None], 1.0, 0.0)
    num_examples = jnp.maximum(jnp.sum(labels >= 0), 1.0)
    uniform = 1.0 / num_examples
    out_w = jnp.where((labels >= 0)[:, None], uniform, 0.0)
    return AnchorTargets(labels, targets.astype(jnp.float32), in_w, out_w)


class ProposalTargets(NamedTuple):
    rois: jnp.ndarray             # (B, 4)
    labels: jnp.ndarray           # (B,) int32
    bbox_targets: jnp.ndarray     # (B, 4*num_classes)
    bbox_inside_weights: jnp.ndarray
    bbox_outside_weights: jnp.ndarray


@functools.partial(jax.jit, static_argnames=(
    'num_classes', 'batch', 'fg_fraction', 'fg_thresh', 'bg_hi', 'bg_lo',
    'bbox_normalize_stds', 'bbox_normalize_means', 'use_gt'))
def proposal_target_layer(key, rois: jnp.ndarray, roi_mask: jnp.ndarray,
                          gt_boxes: jnp.ndarray, gt_mask: jnp.ndarray,
                          num_classes: int, batch: int = 128,
                          fg_fraction: float = 0.25,
                          fg_thresh: float = 0.5, bg_hi: float = 0.5,
                          bg_lo: float = 0.1,
                          bbox_normalize_stds=(0.1, 0.1, 0.2, 0.2),
                          bbox_normalize_means=(0., 0., 0., 0.),
                          use_gt: bool = False) -> ProposalTargets:
    """Sample `batch` RoIs with labels and class-expanded regression targets
    (ref proposal_target_layer.py:18-152).

    rois: (R, 4) image-space proposals with mask; gt_boxes: (G, 5) padded.

    Gradient boundary: the reference wraps this layer in tf.py_func
    (network.py:189-193), so no gradient flows from the RoI-head losses
    back into the RPN through the sampled rois or the regression targets.
    stop_gradient reproduces that boundary (without it the smooth-L1
    *target* argument would leak loss gradient into the RPN deltas via
    proposals — a training-dynamics deviation the reference cannot have).
    """
    rois = jax.lax.stop_gradient(rois)
    if use_gt:  # TRAIN.USE_GT (ref :30-36), off by default
        rois = jnp.concatenate([rois, gt_boxes[:, :4]], axis=0)
        roi_mask = jnp.concatenate([roi_mask, gt_mask], axis=0)
    r = rois.shape[0]
    overlaps = bbox_overlaps(rois, gt_boxes[:, :4])
    overlaps = jnp.where(gt_mask[None, :], overlaps, -1.0)
    overlaps = jnp.where(roi_mask[:, None], overlaps, -1.0)
    gt_assign = jnp.argmax(overlaps, axis=1)
    max_ov = jnp.max(overlaps, axis=1)
    roi_labels = gt_boxes[gt_assign, 4]

    is_fg = roi_mask & (max_ov >= fg_thresh)
    is_bg = roi_mask & (max_ov < bg_hi) & (max_ov >= bg_lo)
    n_fg = jnp.sum(is_fg)
    n_bg = jnp.sum(is_bg)

    k1, k2, k3, k4 = jax.random.split(key, 4)
    # random orderings of fg / bg indices (shuffle-prefix = choice w/o repl)
    fg_order = jnp.argsort(jnp.where(is_fg, jax.random.uniform(k1, (r,)),
                                     BIG))
    bg_order = jnp.argsort(jnp.where(is_bg, jax.random.uniform(k2, (r,)),
                                     BIG))

    fg_cap = int(fg_fraction * batch)  # 32
    # fg count per the reference's three regimes (:118-135)
    both = (n_fg > 0) & (n_bg > 0)
    fg_count = jnp.where(both, jnp.minimum(fg_cap, n_fg),
                         jnp.where(n_fg > 0, batch, 0))

    slots = jnp.arange(batch)
    # fg slot i: without replacement while i < n_fg, else iid resample
    fg_iid = jax.random.randint(k3, (batch,), 0, jnp.maximum(n_fg, 1))
    fg_idx = jnp.where(slots < n_fg, slots, fg_iid)
    fg_sel = fg_order[jnp.minimum(fg_idx, r - 1)]
    # bg slot j = i - fg_count
    bg_j = slots - fg_count
    bg_iid = jax.random.randint(k4, (batch,), 0, jnp.maximum(n_bg, 1))
    bg_idx = jnp.where(bg_j < n_bg, bg_j, bg_iid)
    bg_sel = bg_order[jnp.clip(bg_idx, 0, r - 1)]

    take_fg = slots < fg_count
    sel = jnp.where(take_fg, fg_sel, bg_sel)

    # degenerate image (no fg, no bg): reference pdb-crashes (:136-138);
    # we fall back to any valid roi with label 0
    none_valid = (n_fg == 0) & (n_bg == 0)
    fallback = jnp.argmax(roi_mask)
    sel = jnp.where(none_valid, fallback, sel)

    out_rois = rois[sel]
    labels = jnp.where(take_fg, roi_labels[sel], 0.0)  # bg clamped to 0
    labels = jnp.where(none_valid, 0.0, labels).astype(jnp.int32)

    targets = bbox_transform(out_rois, gt_boxes[gt_assign[sel], :4])
    stds = jnp.asarray(bbox_normalize_stds, jnp.float32)
    means = jnp.asarray(bbox_normalize_means, jnp.float32)
    targets = (targets - means) / stds

    # expand to 4K layout (ref _get_bbox_regression_labels :58-80)
    bt = jnp.zeros((batch, num_classes, 4), jnp.float32)
    cls_idx = jnp.clip(labels, 0, num_classes - 1)
    bt = bt.at[slots, cls_idx].set(targets)
    iw = jnp.zeros((batch, num_classes, 4), jnp.float32)
    iw = iw.at[slots, cls_idx].set(
        jnp.where((labels > 0)[:, None], 1.0, 0.0))
    bt = jnp.where((labels > 0)[:, None, None], bt, 0.0)
    bt = bt.reshape(batch, num_classes * 4)
    iw = iw.reshape(batch, num_classes * 4)
    ow = (iw > 0).astype(jnp.float32)
    return ProposalTargets(out_rois, labels, bt, iw, ow)
