"""Detection losses (ref lib/nets/network.py:269-326): smooth-L1 with the
reference's sigma formulation (3.0 RPN, 1.0 RCNN) and masked softmax CE;
4-term total + weight decay handled by the optimizer."""

from __future__ import annotations

import jax.numpy as jnp
import optax


def smooth_l1(bbox_pred, bbox_targets, inside_w, outside_w, sigma: float,
              reduce_dims) -> jnp.ndarray:
    """ref network.py:269-282 `_smooth_l1_loss` (elementwise Huber with
    1/sigma^2 knee, inside/outside weighting, sum over reduce_dims then
    mean)."""
    s2 = sigma * sigma
    diff = inside_w * (bbox_pred - bbox_targets)
    ad = jnp.abs(diff)
    flag = (ad < 1.0 / s2).astype(jnp.float32)
    per = flag * 0.5 * s2 * diff * diff + (1.0 - flag) * (ad - 0.5 / s2)
    per = outside_w * per
    return jnp.mean(jnp.sum(per, axis=reduce_dims))


def masked_softmax_ce(logits, labels, valid) -> jnp.ndarray:
    """mean CE over entries with valid=True (the reference gathers label
    != -1 rows, network.py:287-293)."""
    # f32: bf16 logsumexp can round below the max logit on confident
    # rows, yielding (impossible) slightly negative CE values
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), jnp.maximum(labels, 0))
    n = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(jnp.where(valid, ce, 0.0)) / n


def detection_losses(rpn_cls_logits, rpn_labels, rpn_bbox_pred, rpn_targets,
                     rpn_in_w, rpn_out_w, cls_score, labels, bbox_pred,
                     bbox_targets, bbox_in_w, bbox_out_w):
    """The 4-term loss (ref network.py:284-326).

    rpn_cls_logits: (K, 2) per-anchor (neg, pos) logits;
    rpn_labels: (K,) in {-1, 0, 1}; cls_score: (B, C); labels: (B,).
    """
    rpn_valid = rpn_labels >= 0
    rpn_ce = masked_softmax_ce(rpn_cls_logits,
                               rpn_labels.astype(jnp.int32), rpn_valid)
    # reference sums over the NHWC dims then means over batch=1: the sum of
    # all elements — reduce over every axis here (flat layout)
    rpn_box = smooth_l1(rpn_bbox_pred, rpn_targets, rpn_in_w, rpn_out_w,
                        sigma=3.0, reduce_dims=(0, 1))
    ce = masked_softmax_ce(cls_score, labels,
                           jnp.ones(labels.shape, bool))
    box = smooth_l1(bbox_pred, bbox_targets, bbox_in_w, bbox_out_w,
                    sigma=1.0, reduce_dims=(1,))
    total = ce + box + rpn_ce + rpn_box
    return {'rpn_cross_entropy': rpn_ce, 'rpn_loss_box': rpn_box,
            'cross_entropy': ce, 'loss_box': box, 'total_loss': total}
