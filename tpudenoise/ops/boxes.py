"""Box geometry ops — pure JAX, batched, static-shaped.

Single implementations replace the reference's duplicated numpy/TF twins
(ref: lib/model/bbox_transform.py:14-117 and lib/utils/bbox.pyx:15-55).
All functions use the reference's "+1 pixel" width convention.

Shapes: boxes are (..., 4) in (x1, y1, x2, y2).  Everything vmaps/jits.
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_transform(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Encode gt boxes relative to example boxes (ref bbox_transform.py:14-32).

    Returns (..., 4) deltas (dx, dy, dw, dh).
    """
    ex_w = ex_rois[..., 2] - ex_rois[..., 0] + 1.0
    ex_h = ex_rois[..., 3] - ex_rois[..., 1] + 1.0
    ex_cx = ex_rois[..., 0] + 0.5 * ex_w
    ex_cy = ex_rois[..., 1] + 0.5 * ex_h

    gt_w = gt_rois[..., 2] - gt_rois[..., 0] + 1.0
    gt_h = gt_rois[..., 3] - gt_rois[..., 1] + 1.0
    gt_cx = gt_rois[..., 0] + 0.5 * gt_w
    gt_cy = gt_rois[..., 1] + 0.5 * gt_h

    dx = (gt_cx - ex_cx) / ex_w
    dy = (gt_cy - ex_cy) / ex_h
    dw = jnp.log(gt_w / ex_w)
    dh = jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def bbox_transform_inv(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Decode deltas on top of boxes (ref bbox_transform.py:35-66, 85-107).

    boxes: (..., N, 4); deltas: (..., N, 4*K) for K classes.
    Returns (..., N, 4*K) decoded boxes.
    """
    boxes = boxes.astype(deltas.dtype)
    widths = boxes[..., 2] - boxes[..., 0] + 1.0
    heights = boxes[..., 3] - boxes[..., 1] + 1.0
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = deltas[..., 0::4]
    dy = deltas[..., 1::4]
    dw = deltas[..., 2::4]
    dh = deltas[..., 3::4]

    pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
    pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    # interleave back to (..., 4K) like the reference's strided writes
    x1 = pred_ctr_x - 0.5 * pred_w
    y1 = pred_ctr_y - 0.5 * pred_h
    x2 = pred_ctr_x + 0.5 * pred_w
    y2 = pred_ctr_y + 0.5 * pred_h
    out = jnp.stack([x1, y1, x2, y2], axis=-1)  # (..., K, 4)
    return out.reshape(deltas.shape)


def clip_boxes(boxes: jnp.ndarray, im_shape) -> jnp.ndarray:
    """Clip boxes (..., 4K) to [0, W-1] x [0, H-1]
    (ref bbox_transform.py:68-82).  im_shape = (H, W)."""
    h, w = im_shape[0], im_shape[1]
    x = boxes[..., 0::4]
    y = boxes[..., 1::4]
    x2 = boxes[..., 2::4]
    y2 = boxes[..., 3::4]
    x = jnp.clip(x, 0, w - 1)
    y = jnp.clip(y, 0, h - 1)
    x2 = jnp.clip(x2, 0, w - 1)
    y2 = jnp.clip(y2, 0, h - 1)
    out = jnp.stack([x, y, x2, y2], axis=-1)
    return out.reshape(boxes.shape)


def clip_boxes_lower_only(boxes: jnp.ndarray, im_shape) -> jnp.ndarray:
    """Test-path clip used by im_detect (ref lib/model/test.py:92-102):
    x1/y1 floored at 0, x2/y2 capped at W-1/H-1, but x1/y1 NOT capped and
    x2/y2 NOT floored — preserved quirk."""
    h, w = im_shape[0], im_shape[1]
    x = jnp.maximum(boxes[..., 0::4], 0)
    y = jnp.maximum(boxes[..., 1::4], 0)
    x2 = jnp.minimum(boxes[..., 2::4], w - 1)
    y2 = jnp.minimum(boxes[..., 3::4], h - 1)
    out = jnp.stack([x, y, x2, y2], axis=-1)
    return out.reshape(boxes.shape)


def bbox_overlaps(boxes: jnp.ndarray, query_boxes: jnp.ndarray) -> jnp.ndarray:
    """N x K IoU matrix with the +1 convention (ref lib/utils/bbox.pyx:15-55).

    boxes: (N, 4), query_boxes: (K, 4) -> (N, K) float IoU.
    Fully vectorized (the reference is a serial Cython double loop).
    """
    bx = boxes[:, None, :]   # (N,1,4)
    qx = query_boxes[None, :, :]  # (1,K,4)
    iw = (jnp.minimum(bx[..., 2], qx[..., 2])
          - jnp.maximum(bx[..., 0], qx[..., 0]) + 1.0)
    ih = (jnp.minimum(bx[..., 3], qx[..., 3])
          - jnp.maximum(bx[..., 1], qx[..., 1]) + 1.0)
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    area_b = ((bx[..., 2] - bx[..., 0] + 1.0)
              * (bx[..., 3] - bx[..., 1] + 1.0))
    area_q = ((qx[..., 2] - qx[..., 0] + 1.0)
              * (qx[..., 3] - qx[..., 1] + 1.0))
    union = area_b + area_q - inter
    return jnp.where(union > 0, inter / union, 0.0)
