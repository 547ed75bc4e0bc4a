"""On-device target assignment vs numpy ports of the reference layers
(lib/layer_utils/anchor_target_layer.py, proposal_target_layer.py).

Sampling RNGs differ (jax vs npr), so exact comparison covers the
deterministic paths (no subsampling needed); sampling paths are checked
statistically (counts, caps, label/expansion invariants).
"""

import jax
import numpy as np

from tpudenoise.ops.anchors import anchor_grid
from tpudenoise.train.targets import (anchor_target_layer,
                                      proposal_target_layer)

KEY = jax.random.PRNGKey(3)


def _np_anchor_labels(anchors, gt, im_hw, pos=0.7, neg=0.3):
    """Deterministic label part of ref anchor_target_layer.py:31-70."""
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < im_hw[1]) & (anchors[:, 3] < im_hw[0]))
    idx = np.where(inside)[0]
    a = anchors[idx]
    n, g = len(a), len(gt)
    ov = np.zeros((n, g))
    for j in range(g):
        qa = (gt[j, 2] - gt[j, 0] + 1) * (gt[j, 3] - gt[j, 1] + 1)
        iw = np.minimum(a[:, 2], gt[j, 2]) - np.maximum(a[:, 0],
                                                        gt[j, 0]) + 1
        ih = np.minimum(a[:, 3], gt[j, 3]) - np.maximum(a[:, 1],
                                                        gt[j, 1]) + 1
        inter = np.maximum(iw, 0) * np.maximum(ih, 0)
        ua = ((a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1) + qa
              - inter)
        ov[:, j] = inter / ua
    max_ov = ov.max(axis=1)
    gt_max = ov.max(axis=0)
    labels = -np.ones(n)
    labels[max_ov < neg] = 0
    for j in range(g):
        labels[ov[:, j] == gt_max[j]] = 1
    labels[max_ov >= pos] = 1
    full = -np.ones(len(anchors))
    full[idx] = labels
    return full


def _setup():
    anchors = np.asarray(anchor_grid(12, 16, 16))
    gt = np.array([[30, 40, 120, 150, 1],
                   [100, 20, 180, 90, 1],
                   [0, 0, 0, 0, 0]], np.float32)
    gm = np.array([True, True, False])
    im_hw = np.array([190., 250.])
    return anchors, gt, gm, im_hw


def test_anchor_labels_match_reference_port():
    anchors, gt, gm, im_hw = _setup()
    at = anchor_target_layer(KEY, anchors, gt, gm, im_hw)
    want = _np_anchor_labels(anchors, gt[gm], im_hw)
    got = np.asarray(at.labels)
    n_fg_want = (want == 1).sum()
    n_bg_want = (want == 0).sum()
    if n_fg_want <= 128 and n_bg_want <= 256 - (want == 1).sum():
        # no subsampling triggered -> exact label parity
        np.testing.assert_array_equal(got, want)
    else:
        # subsampled: every fg/bg in `got` must be fg/bg in `want`
        assert np.all(want[got == 1] == 1)
        assert np.all(want[got == 0] == 0)


def test_anchor_sampling_caps():
    anchors, gt, gm, im_hw = _setup()
    at = anchor_target_layer(KEY, anchors, gt, gm, im_hw, rpn_batch=32,
                             fg_fraction=0.5)
    lab = np.asarray(at.labels)
    assert (lab == 1).sum() <= 16
    assert (lab >= 0).sum() <= 32
    # outside weights uniform over labeled examples
    ow = np.asarray(at.bbox_outside_weights)
    n = (lab >= 0).sum()
    np.testing.assert_allclose(ow[lab >= 0], 1.0 / n, rtol=1e-5)
    assert np.all(ow[lab == -1] == 0)
    # inside weights only on fg
    iw = np.asarray(at.bbox_inside_weights)
    assert np.all(iw[lab == 1] == 1.0)
    assert np.all(iw[lab != 1] == 0.0)


def test_anchor_targets_encode_argmax_gt():
    anchors, gt, gm, im_hw = _setup()
    at = anchor_target_layer(KEY, anchors, gt, gm, im_hw)
    lab = np.asarray(at.labels)
    t = np.asarray(at.bbox_targets)
    # fg targets are bounded (anchors overlap their gt)
    assert np.abs(t[lab == 1]).max() < 2.5


def test_proposal_targets_basic():
    rng = np.random.RandomState(0)
    anchors, gt, gm, im_hw = _setup()
    # proposals: jittered copies of gt (fg) + far boxes (bg) + invalid pad
    fg_rois = np.tile(gt[:2, :4], (20, 1)) + rng.randn(40, 4) * 3
    # bg must land in [BG_THRESH_LO, BG_THRESH_HI) = [0.1, 0.5): shift gt
    # boxes along x by 0.6 width -> IoU = 0.4/1.6 = 0.25
    dx = (gt[:2, 2] - gt[:2, 0]) * 0.6
    bg_base = gt[:2, :4] + np.stack([dx, 0 * dx, dx, 0 * dx], 1)
    bg_rois = np.tile(bg_base, (30, 1)) + rng.randn(60, 4) * 2
    rois = np.concatenate([fg_rois, bg_rois, np.zeros((28, 4))]).astype(
        np.float32)
    mask = np.concatenate([np.ones(100, bool), np.zeros(28, bool)])
    pt = proposal_target_layer(KEY, rois, mask, gt, gm, num_classes=2,
                               batch=64)
    labels = np.asarray(pt.labels)
    assert labels.shape == (64,)
    n_fg = (labels > 0).sum()
    assert 1 <= n_fg <= 16  # fg_fraction 0.25 * 64
    # fg slots come first (reference layout: fg then bg)
    assert np.all(labels[:n_fg] > 0) and np.all(labels[n_fg:] == 0)
    # expansion layout: class-c slice holds the targets for fg
    bt = np.asarray(pt.bbox_targets).reshape(64, 2, 4)
    iw = np.asarray(pt.bbox_inside_weights).reshape(64, 2, 4)
    assert np.all(iw[labels == 0] == 0)
    assert np.all(iw[labels == 1, 1] == 1.0)
    assert np.all(iw[labels == 1, 0] == 0.0)
    assert np.all(bt[labels == 0] == 0)
    # normalized targets of jittered-gt rois are small
    assert np.abs(bt[labels == 1, 1]).max() < 3.0


def test_proposal_targets_no_fg_fallback():
    """Reference pdb-crashes when an image has neither fg nor bg in range
    (proposal_target_layer.py:136-138); we must emit all-bg instead."""
    anchors, gt, gm, im_hw = _setup()
    rois = np.tile(np.array([[200., 220., 240., 248.]], np.float32),
                   (32, 1))  # zero overlap with gt, but >= bg_lo? no: 0.0
    mask = np.ones(32, bool)
    pt = proposal_target_layer(KEY, rois, mask, gt, gm, num_classes=2,
                               batch=16)
    labels = np.asarray(pt.labels)
    assert np.all(labels == 0)
    assert np.asarray(pt.bbox_inside_weights).sum() == 0


def test_proposal_target_layer_is_a_gradient_boundary():
    """The reference computes proposal targets in tf.py_func
    (network.py:189-193): no gradient flows from RoI-head losses back to
    the RPN through sampled rois/targets.  Assert the JAX twin severs
    that path too."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    gt = jnp.asarray([[10., 10., 60., 60., 1.]])
    gt_mask = jnp.asarray([True])

    def f(rois):
        pt = proposal_target_layer(key, rois, jnp.ones(rois.shape[0], bool),
                                   gt, gt_mask, num_classes=2, batch=8)
        return (jnp.sum(pt.rois) + jnp.sum(pt.bbox_targets)
                + jnp.sum(pt.labels.astype(jnp.float32)))

    rois = jnp.asarray(np.random.RandomState(0).uniform(0, 80, (16, 4))
                       .astype(np.float32))
    rois = rois.at[:, 2:].add(rois[:, :2])
    g = jax.grad(f)(rois)
    assert float(jnp.abs(g).sum()) == 0.0
