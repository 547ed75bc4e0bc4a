"""Parity tests for box ops vs straight numpy ports of the reference
(lib/model/bbox_transform.py, lib/utils/bbox.pyx)."""

import numpy as np
import pytest

from tpudenoise.ops import boxes as B


def _np_bbox_transform(ex_rois, gt_rois):
    """Port of ref bbox_transform.py:14-32."""
    ex_w = ex_rois[:, 2] - ex_rois[:, 0] + 1.0
    ex_h = ex_rois[:, 3] - ex_rois[:, 1] + 1.0
    ex_cx = ex_rois[:, 0] + 0.5 * ex_w
    ex_cy = ex_rois[:, 1] + 0.5 * ex_h
    gt_w = gt_rois[:, 2] - gt_rois[:, 0] + 1.0
    gt_h = gt_rois[:, 3] - gt_rois[:, 1] + 1.0
    gt_cx = gt_rois[:, 0] + 0.5 * gt_w
    gt_cy = gt_rois[:, 1] + 0.5 * gt_h
    return np.vstack([(gt_cx - ex_cx) / ex_w, (gt_cy - ex_cy) / ex_h,
                      np.log(gt_w / ex_w), np.log(gt_h / ex_h)]).T


def _np_bbox_transform_inv(bx, deltas):
    """Port of ref bbox_transform.py:35-66."""
    bx = bx.astype(deltas.dtype)
    widths = bx[:, 2] - bx[:, 0] + 1.0
    heights = bx[:, 3] - bx[:, 1] + 1.0
    ctr_x = bx[:, 0] + 0.5 * widths
    ctr_y = bx[:, 1] + 0.5 * heights
    dx, dy = deltas[:, 0::4], deltas[:, 1::4]
    dw, dh = deltas[:, 2::4], deltas[:, 3::4]
    pcx = dx * widths[:, None] + ctr_x[:, None]
    pcy = dy * heights[:, None] + ctr_y[:, None]
    pw = np.exp(dw) * widths[:, None]
    ph = np.exp(dh) * heights[:, None]
    out = np.zeros(deltas.shape, dtype=deltas.dtype)
    out[:, 0::4] = pcx - 0.5 * pw
    out[:, 1::4] = pcy - 0.5 * ph
    out[:, 2::4] = pcx + 0.5 * pw
    out[:, 3::4] = pcy + 0.5 * ph
    return out


def _np_overlaps(b, q):
    """Port of ref lib/utils/bbox.pyx:15-55."""
    n, k = b.shape[0], q.shape[0]
    out = np.zeros((n, k))
    for kk in range(k):
        qa = (q[kk, 2] - q[kk, 0] + 1) * (q[kk, 3] - q[kk, 1] + 1)
        for nn in range(n):
            iw = min(b[nn, 2], q[kk, 2]) - max(b[nn, 0], q[kk, 0]) + 1
            if iw > 0:
                ih = min(b[nn, 3], q[kk, 3]) - max(b[nn, 1], q[kk, 1]) + 1
                if ih > 0:
                    ua = ((b[nn, 2] - b[nn, 0] + 1)
                          * (b[nn, 3] - b[nn, 1] + 1) + qa - iw * ih)
                    out[nn, kk] = iw * ih / ua
    return out


@pytest.fixture
def rng():
    return np.random.RandomState(3)


def _rand_boxes(rng, n, scale=500.0):
    x1 = rng.uniform(0, scale, n)
    y1 = rng.uniform(0, scale, n)
    w = rng.uniform(1, scale / 2, n)
    h = rng.uniform(1, scale / 2, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def test_bbox_transform_roundtrip(rng):
    ex = _rand_boxes(rng, 64)
    gt = _rand_boxes(rng, 64)
    deltas = np.asarray(B.bbox_transform(ex, gt))
    # f32 log/div vs the f64 oracle: ~1e-4 relative
    np.testing.assert_allclose(deltas, _np_bbox_transform(ex, gt),
                               rtol=1e-3, atol=1e-4)
    # In the reference's +1-width convention decode(encode(gt)) returns
    # (x1, y1, x2+1, y2+1): the decoder writes ctr +/- 0.5*w with w
    # including the +1 (ref bbox_transform.py:56-65).
    decoded = np.asarray(B.bbox_transform_inv(ex, deltas))
    want = gt + np.array([0., 0., 1., 1.], dtype=np.float32)
    np.testing.assert_allclose(decoded, want, rtol=1e-3, atol=1e-2)


def test_bbox_transform_inv_multiclass(rng):
    bx = _rand_boxes(rng, 32)
    deltas = rng.randn(32, 4 * 21).astype(np.float32) * 0.1
    got = np.asarray(B.bbox_transform_inv(bx, deltas))
    want = _np_bbox_transform_inv(bx, deltas)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_clip_boxes(rng):
    bx = (_rand_boxes(rng, 32) - 200.0)
    got = np.asarray(B.clip_boxes(bx, (300, 400)))
    assert got.min() >= 0
    assert got[:, 0::4].max() <= 399 and got[:, 1::4].max() <= 299
    # reference clips x to W-1 and y to H-1 (bbox_transform.py:68-82)
    want = bx.copy()
    want[:, 0::4] = np.clip(want[:, 0::4], 0, 399)
    want[:, 1::4] = np.clip(want[:, 1::4], 0, 299)
    want[:, 2::4] = np.clip(want[:, 2::4], 0, 399)
    want[:, 3::4] = np.clip(want[:, 3::4], 0, 299)
    np.testing.assert_allclose(got, want)


def test_bbox_overlaps_matches_cython_port(rng):
    b = _rand_boxes(rng, 40)
    q = _rand_boxes(rng, 13)
    got = np.asarray(B.bbox_overlaps(b, q))
    np.testing.assert_allclose(got, _np_overlaps(b, q), rtol=1e-5, atol=1e-6)
