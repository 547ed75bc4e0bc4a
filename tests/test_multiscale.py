"""Multi-scale TEST.SCALES pyramid (ref lib/model/test.py:49-83 builds
an image pyramid over cfg.TEST.SCALES; _rescale_boxes:105-109 maps each
level back through its own scale).  The sequential harness runs one
forward per scale and merges the union through a single per-class NMS."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.fixtures import make_rrdata_fixture


def _mk(rois, probs, scale, ph, pw):
    r = rois.shape[0]
    return (jnp.asarray(rois, jnp.float32),
            jnp.ones((r,), bool),
            jnp.asarray(probs, jnp.float32),
            jnp.zeros((r, probs.shape[1] * 4), jnp.float32),  # zero deltas
            jnp.asarray([ph, pw, scale], jnp.float32))


def test_pyramid_postprocess_semantics():
    """Decode-per-level + merged NMS: each level's rois divide by its own
    im_scale; an overlapping weaker candidate from the other level is
    suppressed; a disjoint one survives."""
    from tpudenoise.eval.harness import postprocess_detections_pyramid

    # level 0 at scale 2.0: roi (20,20,60,60) -> original (10,10,30,30),
    # score .9.  level 1 at scale 1.0: roi (11,11,31,31) overlapping
    # (IoU ~.9), score .6 -> suppressed; roi (50,50,70,70) disjoint,
    # score .7 -> kept.
    l0 = _mk(np.array([[20., 20., 60., 60.]]),
             np.array([[0.1, 0.9]]), 2.0, 120., 160.)
    l1 = _mk(np.array([[11., 11., 31., 31.], [50., 50., 70., 70.]]),
             np.array([[0.4, 0.6], [0.3, 0.7]]), 1.0, 60., 80.)
    # pad level 0 to R=2 with a masked row so the levels stack
    rois = jnp.stack([jnp.concatenate([l0[0], jnp.zeros((1, 4))]), l1[0]])
    masks = jnp.stack([jnp.asarray([True, False]), l1[1]])
    probs = jnp.stack([jnp.concatenate([l0[2], jnp.zeros((1, 2))]), l1[2]])
    preds = jnp.stack([jnp.concatenate([l0[3], jnp.zeros((1, 8))]), l1[3]])
    infos = jnp.stack([l0[4], l1[4]])

    boxes_c, scores_c, mask_c = postprocess_detections_pyramid(
        rois, masks, probs, preds, infos, num_classes=2, nms_thresh=0.3,
        score_thresh=0.05, max_per_class=4)
    kept_scores = sorted(np.asarray(scores_c)[0][np.asarray(mask_c)[0]],
                         reverse=True)
    np.testing.assert_allclose(kept_scores, [0.9, 0.7], atol=1e-6)
    kept_boxes = np.asarray(boxes_c)[0][np.asarray(mask_c)[0]]
    # the level-0 winner decoded through ITS scale: 20/2 = 10; the +1
    # width convention of bbox_transform_inv reconstructs x2 as
    # ctr + 0.5*(w = x2-x1+1) = x2 + 1 under zero deltas (ref
    # lib/model/bbox_transform.py:47-61)
    best = kept_boxes[int(np.argmax(
        np.asarray(scores_c)[0][np.asarray(mask_c)[0]]))]
    np.testing.assert_allclose(best, [10., 10., 31., 31.], atol=1e-4)


def test_pyramid_single_level_matches_flat():
    """A one-level pyramid must reproduce postprocess_detections
    exactly (same decode, same NMS)."""
    from tpudenoise.eval.harness import (postprocess_detections,
                                         postprocess_detections_pyramid)
    rng = np.random.RandomState(0)
    r, c = 16, 3
    x1 = rng.rand(r, 1) * 50
    y1 = rng.rand(r, 1) * 40
    rois = np.hstack([x1, y1, x1 + 10 + rng.rand(r, 1) * 30,
                      y1 + 10 + rng.rand(r, 1) * 30]).astype(np.float32)
    probs = rng.dirichlet(np.ones(c), size=r).astype(np.float32)
    preds = (rng.randn(r, 4 * c) * 0.1).astype(np.float32)
    mask = rng.rand(r) > 0.2
    info = jnp.asarray([90., 120., 1.5], jnp.float32)

    flat = postprocess_detections(
        jnp.asarray(rois), jnp.asarray(mask), jnp.asarray(probs),
        jnp.asarray(preds), info, c, 0.3, 0.01, max_per_class=8)
    pyr = postprocess_detections_pyramid(
        jnp.asarray(rois)[None], jnp.asarray(mask)[None],
        jnp.asarray(probs)[None], jnp.asarray(preds)[None], info[None],
        c, 0.3, 0.01, max_per_class=8)
    for a, b in zip(flat, pyr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_test_net_multiscale_end_to_end(tmp_path):
    """test_net with SCALES=(120, 150) runs the pyramid (two compiled
    buckets), merges detections, and completes the AP sweep; the BATCHED
    harness runs the same pyramid (noise once per chunk, one prep+forward
    per scale, merged per-class NMS) and must reproduce the sequential
    detections — bit-tight on the host-prep leg, sub-pixel-aggregate on
    the device-prep leg (ops/resize.py's <= ~0.05 u8 deviation at
    scale != 1)."""
    from tpudenoise.core.config import default_config, get_output_dir
    from tpudenoise.data.voc_like import rrData
    from tpudenoise.eval.harness import test_net, test_net_batched
    from tpudenoise.models.faster_rcnn import FasterRCNN

    root = str(tmp_path)
    make_rrdata_fixture(root, n_test=3, size=(160, 200))
    cfg = default_config()
    cfg.DATA_DIR = root
    cfg.ROOT_DIR = root
    cfg.TEST.SCALES = (120, 150)
    cfg.TEST.MAX_SIZE = 200
    cfg.TEST.RPN_PRE_NMS_TOP_N = 128
    cfg.TEST.RPN_POST_NMS_TOP_N = 32

    m = FasterRCNN(backbone='vgg16', num_classes=2, cfg=cfg)
    params = m.init(jax.random.PRNGKey(0), image_shape=(128, 160))
    d = rrData('test', '2021', config=cfg)
    d.competition_mode(True)
    res = test_net(m, params, d, 'pyr', 'original', config=cfg,
                   bucket=(160, 224))
    assert res is not None

    import os.path as osp
    import pickle

    def _load(tag):
        with open(osp.join(get_output_dir(d.name, tag, cfg),
                           'detections.pkl'), 'rb') as f:
            return pickle.load(f)

    dets = _load('pyr')
    n = sum(len(dets[c][i]) for c in range(1, len(dets))
            for i in range(len(dets[0])))
    assert n > 0, 'pyramid eval produced no detections'

    d2 = rrData('test', '2021', config=cfg)
    d2.competition_mode(True)
    test_net_batched(m, params, d2, 'pyr_bh', 'original', eval_batch=3,
                     config=cfg, bucket=(160, 224), device_prep=False)
    bat = _load('pyr_bh')
    for cls in range(1, len(dets)):
        for i in range(len(dets[cls])):
            a, b = np.asarray(dets[cls][i]), np.asarray(bat[cls][i])
            assert a.shape == b.shape, (cls, i, a.shape, b.shape)
            if a.size:
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)

    d3 = rrData('test', '2021', config=cfg)
    d3.competition_mode(True)
    test_net_batched(m, params, d3, 'pyr_bd', 'original', eval_batch=3,
                     config=cfg, bucket=(160, 224))
    dev = _load('pyr_bd')
    matched = total = 0
    for cls in range(1, len(dets)):
        for i in range(len(dets[cls])):
            a = np.asarray(dets[cls][i])
            c = np.asarray(dev[cls][i])
            assert abs(len(a) - len(c)) <= 1, (cls, i, len(a), len(c))
            for row in (a if a.size else np.zeros((0, 5))):
                total += 1
                if c.size and np.min(np.abs(c - row[None]).max(1)) < 0.5:
                    matched += 1
    assert total == 0 or matched / total >= 0.85, (matched, total)
