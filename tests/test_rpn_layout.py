"""Pin the RPN score/delta raster conventions against a numpy port of the
reference's caffe-style reshape+softmax chain (network.py:71-90, 337-346).
A silent layout mismatch here would mislabel every anchor."""

import jax
import numpy as np

from tpudenoise.models.rpn import rpn_softmax_scores
from tpudenoise.ops.anchors import anchor_grid


def _reference_scores(rpn_cls):
    """Port of _reshape_layer + softmax + slice [..., A:]:
    (H, W, 2A) -> positive prob per anchor in (H, W, A) layout."""
    h, w, c2 = rpn_cls.shape
    a = c2 // 2
    x = rpn_cls[None]                          # (1, H, W, 2A)
    to_caffe = x.transpose(0, 3, 1, 2)          # (1, 2A, H, W)
    reshaped = to_caffe.reshape(1, 2, a * h, w)
    to_tf = reshaped.transpose(0, 2, 3, 1)      # (1, A*H, W, 2)
    e = np.exp(to_tf - to_tf.max(axis=-1, keepdims=True))
    prob = e / e.sum(axis=-1, keepdims=True)    # softmax over the pair
    # back: (1, A*H, W, 2) -> (1, 2, A*H, W) -> (1, 2A, H, W) -> (H, W, 2A)
    back = prob.transpose(0, 3, 1, 2).reshape(1, 2 * a, h, w)
    back = back.transpose(0, 2, 3, 1)[0]
    return back[..., a:]                        # positive half


def test_rpn_scores_match_reference_reshape_chain():
    rng = np.random.RandomState(0)
    h, w, a = 5, 7, 9
    rpn_cls = rng.randn(h, w, 2 * a).astype(np.float32)
    want = _reference_scores(rpn_cls).reshape(-1)
    got = np.asarray(rpn_softmax_scores(rpn_cls, a))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_score_order_matches_anchor_grid_order():
    """scores.reshape(-1)[i] must describe anchors[i]: h-major, w, then
    anchor index innermost."""
    h, w, a = 3, 4, 9
    anchors = np.asarray(anchor_grid(h, w, 16))
    # anchor i = (y, x, a) with a innermost: check the grid shift pattern
    i = (1 * w + 2) * a + 5  # y=1, x=2, anchor 5
    base = np.asarray(anchor_grid(1, 1, 16))[5]
    np.testing.assert_array_equal(anchors[i],
                                  base + [2 * 16, 1 * 16, 2 * 16, 1 * 16])
    # scores flatten the (H, W, A) positive-prob map the same way
    scores = np.zeros((h, w, a), np.float32)
    scores[1, 2, 5] = 1.0
    flat = scores.reshape(-1)
    assert flat[i] == 1.0
