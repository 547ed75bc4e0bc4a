"""Pure-numpy forward twin of the assembled vgg16 Faster R-CNN TEST graph.

The reference keeps numpy twins of its TF detection ops as oracles
(ref lib/layer_utils/proposal_layer.py:16-58, lib/layer_utils/
snippets.py:14-30, lib/model/bbox_transform.py:14-83, selected by
cfg.USE_E2E_TF); this module extends that idea to the WHOLE test-time
graph (backbone conv stack -> RPN -> proposal -> crop_and_resize -> tail
-> cls/bbox heads, ref lib/nets/network.py:237-267) so the jax graph can
be pinned at logit level on a fixed image + fixed weights — the strongest
end-to-end parity evidence available without the reference runtime.

numpy only (no jax) except the anchor table, which reuses the
golden-tested generate_anchors port.
"""

from __future__ import annotations

import numpy as np

from tpudenoise.ops.nms import nms_py


# ------------------------------------------------------------- layers --

def conv2d_same_np(x, w, b=None, stride=1):
    """x: (H, W, Cin); w: (kh, kw, Cin, Cout) HWIO; stride-1 SAME conv
    via im2col (slim.conv2d semantics, padding='SAME')."""
    assert stride == 1
    kh, kw, cin, cout = w.shape
    ph0, pw0 = (kh - 1) // 2, (kw - 1) // 2
    xp = np.pad(x, ((ph0, kh - 1 - ph0), (pw0, kw - 1 - pw0), (0, 0)))
    h, wd = x.shape[:2]
    cols = np.empty((h, wd, kh * kw * cin), x.dtype)
    for i in range(kh):
        for j in range(kw):
            cols[..., (i * kw + j) * cin:(i * kw + j + 1) * cin] = \
                xp[i:i + h, j:j + wd, :]
    out = cols.reshape(h * wd, -1) @ w.reshape(-1, cout)
    out = out.reshape(h, wd, cout)
    return out if b is None else out + b


def max_pool_2x2_np(x):
    """2x2/2 max pool, SAME (even dims assumed exact)."""
    h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0
    return x.reshape(h // 2, 2, w // 2, 2, c).max(axis=(1, 3))


def relu(x):
    return np.maximum(x, 0.0)


# ------------------------------------------------------------ vgg16 ----

def vgg16_head_np(head_p, img):
    """img: (H, W, 3) preprocessed.  13 convs + 4 pools (ref
    lib/nets/vgg16.py:31-51)."""
    x = img
    for s, reps in enumerate([2, 2, 3, 3, 3], start=1):
        for r in range(1, reps + 1):
            p = head_p[f'conv{s}_{r}']
            x = relu(conv2d_same_np(x, np.asarray(p['kernel']),
                                    np.asarray(p['bias'])))
        if s < 5:
            x = max_pool_2x2_np(x)
    return x


# -------------------------------------------------------------- rpn ----

def rpn_np(rpn_p, feat, num_anchors):
    """3x3 conv 512 + relu, 1x1 cls/bbox convs; per-anchor softmax over
    the (neg, pos) logit pair (ref network.py:328-346)."""
    p = rpn_p['rpn_conv']
    x = relu(conv2d_same_np(feat, np.asarray(p['kernel']),
                            np.asarray(p['bias'])))
    pc = rpn_p['rpn_cls_score']
    cls = x @ np.asarray(pc['kernel'])[0, 0] + np.asarray(pc['bias'])
    pb = rpn_p['rpn_bbox_pred']
    bbox = x @ np.asarray(pb['kernel'])[0, 0] + np.asarray(pb['bias'])
    a = num_anchors
    neg, pos = cls[..., :a], cls[..., a:]
    scores = np.exp(pos - np.logaddexp(neg, pos)).reshape(-1)
    return scores, bbox.reshape(-1, 4)


# --------------------------------------------------- box ops (numpy) ---

def bbox_transform_inv_np(boxes, deltas):
    widths = boxes[:, 2] - boxes[:, 0] + 1.0
    heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights
    dx, dy = deltas[:, 0::4], deltas[:, 1::4]
    dw, dh = deltas[:, 2::4], deltas[:, 3::4]
    pcx = dx * widths[:, None] + ctr_x[:, None]
    pcy = dy * heights[:, None] + ctr_y[:, None]
    pw = np.exp(dw) * widths[:, None]
    ph = np.exp(dh) * heights[:, None]
    out = np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                    pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1)
    return out.reshape(deltas.shape)


def clip_boxes_np(boxes, hw):
    h, w = hw
    out = boxes.copy()
    out[:, 0::4] = np.clip(boxes[:, 0::4], 0, w - 1)
    out[:, 1::4] = np.clip(boxes[:, 1::4], 0, h - 1)
    out[:, 2::4] = np.clip(boxes[:, 2::4], 0, w - 1)
    out[:, 3::4] = np.clip(boxes[:, 3::4], 0, h - 1)
    return out


def proposal_np(scores, deltas, anchors, im_hw, nms_thresh, pre_n, post_n):
    """Greedy reference proposal path (ref proposal_layer.py:16-58):
    decode, clip, sort desc, pre-NMS top-K, nms, post-NMS top-K."""
    proposals = bbox_transform_inv_np(anchors, deltas)
    proposals = clip_boxes_np(proposals, im_hw)
    order = np.argsort(-scores)[:pre_n]
    props, scs = proposals[order], scores[order]
    dets = np.hstack([props, scs[:, None]]).astype(np.float32)
    keep = nms_py(dets, nms_thresh)[:post_n]
    return props[keep], scs[keep]


# ----------------------------------------------------- crop + heads ----

def crop_and_resize_np(feat, boxes, crop):
    """tf.image.crop_and_resize bilinear semantics (extrapolation 0),
    boxes normalized (y1, x1, y2, x2) — numpy port of
    tpudenoise.ops.roi_align.crop_and_resize."""
    h, w, c = feat.shape
    out = np.zeros((boxes.shape[0], crop, crop, c), feat.dtype)
    grid = np.arange(crop)
    for r, (y1, x1, y2, x2) in enumerate(boxes):
        if crop > 1:
            in_y = y1 * (h - 1) + grid * (y2 - y1) * (h - 1) / (crop - 1)
            in_x = x1 * (w - 1) + grid * (x2 - x1) * (w - 1) / (crop - 1)
        else:
            in_y = np.array([0.5 * (y1 + y2) * (h - 1)])
            in_x = np.array([0.5 * (x1 + x2) * (w - 1)])
        vy = (in_y >= 0) & (in_y <= h - 1)
        vx = (in_x >= 0) & (in_x <= w - 1)
        y0 = np.floor(in_y)
        x0 = np.floor(in_x)
        ly, lx = in_y - y0, in_x - x0
        y0 = np.clip(y0, 0, h - 1).astype(int)
        x0 = np.clip(x0, 0, w - 1).astype(int)
        y1i = np.clip(y0 + 1, 0, h - 1)
        x1i = np.clip(x0 + 1, 0, w - 1)
        tl = feat[y0][:, x0]
        tr = feat[y0][:, x1i]
        bl = feat[y1i][:, x0]
        br = feat[y1i][:, x1i]
        top = tl + (tr - tl) * lx[None, :, None]
        bot = bl + (br - bl) * lx[None, :, None]
        val = top + (bot - top) * ly[:, None, None]
        out[r] = val * (vy[:, None] & vx[None, :])[:, :, None]
    return out


def roi_to_normalized_np(rois, feat_hw, stride=16.0):
    fh, fw = feat_hw
    return np.stack([rois[:, 1] / ((fh - 1.0) * stride),
                     rois[:, 0] / ((fw - 1.0) * stride),
                     rois[:, 3] / ((fh - 1.0) * stride),
                     rois[:, 2] / ((fw - 1.0) * stride)], axis=1)


# ------------------------------------------------------- full graph ----

def vgg16_forward_test_np(params, img, num_classes,
                          rpn_nms_thresh=0.7, pre_n=6000, post_n=300,
                          pool_size=7,
                          bbox_stds=(0.1, 0.1, 0.2, 0.2),
                          bbox_means=(0.0, 0.0, 0.0, 0.0)):
    """Full TEST-mode forward on one exact-size image (no padding).

    Returns dict {rois, roi_scores, cls_prob, bbox_pred} for the kept
    proposals, matching FasterRCNN.forward_test's valid prefix.
    """
    from tpudenoise.ops.anchors import anchor_grid
    h, w = img.shape[:2]
    feat = vgg16_head_np(params['head'], img)
    fh, fw = feat.shape[:2]
    num_anchors = 9
    scores, deltas = rpn_np(params['rpn'], feat, num_anchors)
    anchors = np.asarray(anchor_grid(fh, fw, 16))
    rois, roi_scores = proposal_np(scores, deltas, anchors, (h, w),
                                   rpn_nms_thresh, pre_n, post_n)
    norm = roi_to_normalized_np(rois, (fh, fw))
    crops = crop_and_resize_np(feat, norm, pool_size * 2)
    pooled = np.stack([max_pool_2x2_np(c) for c in crops])
    x = pooled.reshape(pooled.shape[0], -1)
    t = params['tail']['tail']
    x = relu(x @ np.asarray(t['fc6']['kernel'])
             + np.asarray(t['fc6']['bias']))
    x = relu(x @ np.asarray(t['fc7']['kernel'])
             + np.asarray(t['fc7']['bias']))
    rc = params['tail']['rcnn']
    cls = x @ np.asarray(rc['cls_score']['kernel']) \
        + np.asarray(rc['cls_score']['bias'])
    bbox = x @ np.asarray(rc['bbox_pred']['kernel']) \
        + np.asarray(rc['bbox_pred']['bias'])
    e = np.exp(cls - cls.max(axis=1, keepdims=True))
    cls_prob = e / e.sum(axis=1, keepdims=True)
    stds = np.tile(np.asarray(bbox_stds, np.float64), num_classes)
    means = np.tile(np.asarray(bbox_means, np.float64), num_classes)
    return {'rois': rois, 'roi_scores': roi_scores, 'cls_prob': cls_prob,
            'bbox_pred': bbox * stds + means}
