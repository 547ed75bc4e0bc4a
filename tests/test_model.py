"""Model-level tests: forward shapes, roi_align parity with a numpy
crop_and_resize port, and a full train step (small vgg16)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudenoise.core.config import default_config
from tpudenoise.models.faster_rcnn import FasterRCNN
from tpudenoise.ops.roi_align import crop_and_resize

KEY = jax.random.PRNGKey(0)


def _np_crop_and_resize(feat, boxes, crop):
    """Port of tf.image.crop_and_resize bilinear kernel semantics."""
    h, w, c = feat.shape
    out = np.zeros((len(boxes), crop, crop, c), np.float32)
    for bi, (y1, x1, y2, x2) in enumerate(boxes):
        for i in range(crop):
            in_y = y1 * (h - 1) + i * (y2 - y1) * (h - 1) / (crop - 1)
            if in_y < 0 or in_y > h - 1:
                continue
            ty, ly = int(np.floor(in_y)), in_y - np.floor(in_y)
            by = min(ty + 1, h - 1)
            for j in range(crop):
                in_x = x1 * (w - 1) + j * (x2 - x1) * (w - 1) / (crop - 1)
                if in_x < 0 or in_x > w - 1:
                    continue
                tx, lx = int(np.floor(in_x)), in_x - np.floor(in_x)
                bx = min(tx + 1, w - 1)
                top = feat[ty, tx] + (feat[ty, bx] - feat[ty, tx]) * lx
                bot = feat[by, tx] + (feat[by, bx] - feat[by, tx]) * lx
                out[bi, i, j] = top + (bot - top) * ly
    return out


def test_crop_and_resize_matches_tf_semantics():
    rng = np.random.RandomState(0)
    feat = rng.randn(12, 16, 5).astype(np.float32)
    boxes = np.array([
        [0.1, 0.2, 0.6, 0.8],
        [0.0, 0.0, 1.0, 1.0],
        [-0.1, 0.3, 0.5, 1.2],   # out-of-range -> zero extrapolation
        [0.5, 0.5, 0.5, 0.5],    # degenerate box
    ], np.float32)
    got = np.asarray(crop_and_resize(feat, boxes, 7))
    want = _np_crop_and_resize(feat, boxes, 7)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope='module')
def small_model():
    cfg = default_config()
    m = FasterRCNN(backbone='vgg16', num_classes=2, cfg=cfg)
    params = m.init(KEY, image_shape=(128, 192))
    return m, params, cfg


def test_forward_test_shapes(small_model):
    m, params, cfg = small_model
    img = np.random.RandomState(0).randn(128, 192, 3).astype(
        np.float32) * 20
    out = m.forward_test(params, jnp.asarray(img),
                         jnp.asarray([120., 180., 1.]))
    n = cfg.TEST.RPN_POST_NMS_TOP_N
    assert out['rois'].shape == (n, 4)
    assert out['cls_prob'].shape == (n, 2)
    assert out['bbox_pred'].shape == (n, 8)
    probs = np.asarray(out['cls_prob'])
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    # valid rois lie inside the true image extent
    mask = np.asarray(out['roi_mask'])
    rois = np.asarray(out['rois'])[mask]
    assert rois[:, 0].min() >= 0 and rois[:, 2].max() <= 179
    assert rois[:, 3].max() <= 119


def test_train_step_updates_and_freezes(small_model):
    from tpudenoise.train.train_step import make_train_step
    m, _, cfg = small_model
    cfg = cfg.clone()
    cfg.TRAIN.LEARNING_RATE = 1e-4
    # anchors must FIT inside the tiny 120x180 test image: at the default
    # scales (8, 16, 32) even the smallest anchor is 128 px, every label
    # is -1 and the direct RPN loss path is identically zero (gradients
    # to rpn_conv then only existed through the rois->targets leak the
    # reference's tf.py_func boundary forbids — now stop_gradient'ed)
    m2 = FasterRCNN(backbone='vgg16', num_classes=2, cfg=cfg,
                    anchor_scales=(2, 4, 8))
    init_state, step_fn = make_train_step(m2, cfg)
    state = init_state(KEY, image_shape=(128, 192))
    rng = np.random.RandomState(0)
    gt = np.array([[[20., 30., 90., 100., 1.], [60., 10., 150., 80., 1.]]],
                  np.float32)
    batch = {
        'image': jnp.asarray(rng.randn(1, 128, 192, 3).astype(np.float32)
                             * 20),
        'im_info': jnp.asarray([[120., 180., 1.]]),
        'gt_boxes': jnp.asarray(gt),
        'gt_mask': jnp.ones((1, 2), bool),
    }
    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x), state.params)
    state, losses = step_fn(state, jax.random.PRNGKey(1), batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    p1 = state.params
    # frozen conv1/conv2 untouched (ref vgg16.py:33-37)
    np.testing.assert_array_equal(p0['head']['conv1_1']['kernel'],
                                  np.asarray(p1['head']['conv1_1']
                                             ['kernel']))
    np.testing.assert_array_equal(p0['head']['conv2_2']['kernel'],
                                  np.asarray(p1['head']['conv2_2']
                                             ['kernel']))
    # trainable layers moved
    assert np.abs(np.asarray(p1['head']['conv5_3']['kernel'])
                  - p0['head']['conv5_3']['kernel']).max() > 0
    assert np.abs(np.asarray(p1['rpn']['rpn_conv']['kernel'])
                  - p0['rpn']['rpn_conv']['kernel']).max() > 0
    assert np.abs(np.asarray(p1['tail']['rcnn']['cls_score']['kernel'])
                  - p0['tail']['rcnn']['cls_score']['kernel']).max() > 0


def test_backbone_feature_strides():
    for name, ch in [('vgg16', 512), ('res50', 1024), ('mobile', 512)]:
        m = FasterRCNN(backbone=name, num_classes=2)
        params = m.init(jax.random.PRNGKey(1), image_shape=(64, 96))
        feat = m.head_mod.apply({'params': params['head']},
                                jnp.zeros((1, 64, 96, 3)))
        assert feat.shape[1:3] == (4, 6), (name, feat.shape)
        assert feat.shape[-1] == ch, (name, feat.shape)


def test_zero_init_residual_is_identity_and_trainable():
    """Random-init resnets start as identity residual units via a zeroed
    conv3 KERNEL (NOT the bn3 gamma — BN params are frozen by
    frozen_param_filter, so a zero gamma would permanently kill the
    branch: zero gradient to conv1/2/3 through a frozen zero scale).
    The branch must come back to life: one train step with the
    from-scratch config gives the deep conv3 kernel a nonzero update."""
    import jax
    import jax.numpy as jnp
    from tpudenoise.core.config import default_config
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.train.train_step import make_train_step

    cfg = default_config()
    cfg.RESNET.FIXED_BLOCKS = 0
    cfg.RESNET.FREEZE_ROOT = False
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 128
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 32
    cfg.TRAIN.BATCH_SIZE = 16
    cfg.TRAIN.RPN_BATCHSIZE = 32
    m = FasterRCNN(backbone='res50', num_classes=2, cfg=cfg)
    params = m.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    u1 = params['head']['block1']['unit_1']
    assert float(np.abs(u1['conv3']['kernel']).max()) == 0.0
    assert float(np.abs(u1['bn3']['gamma']).max()) > 0.0  # NOT the gamma
    assert float(np.abs(u1['conv1']['kernel']).max()) > 0.0
    t = params['tail']['tail']['block4']['unit_1']
    assert float(np.abs(t['conv3']['kernel']).max()) == 0.0

    init_state, step_fn = make_train_step(m, cfg)
    state = init_state(jax.random.PRNGKey(3), image_shape=(64, 96))
    rng = np.random.RandomState(0)
    batch = {
        'image': jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32)
                             * 30),
        'im_info': jnp.asarray([[60., 90., 1.]], jnp.float32),
        'gt_boxes': jnp.asarray([[[5., 5., 40., 50., 1.]]], jnp.float32),
        'gt_mask': jnp.ones((1, 1), bool),
    }
    state2, losses = step_fn(state, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(losses['total_loss']))
    # a DEEP head residual branch received a real update
    before = state.params['head']['block3']['unit_1']['conv3']['kernel']
    after = state2.params['head']['block3']['unit_1']['conv3']['kernel']
    assert float(np.abs(np.asarray(after) - np.asarray(before)).max()) > 0


def test_lr_warmup_schedule():
    from tpudenoise.core.config import default_config
    from tpudenoise.train.train_step import lr_schedule
    cfg = default_config()
    cfg.TRAIN.WARMUP_ITERS = 10
    s = lr_schedule(cfg)
    lr = cfg.TRAIN.LEARNING_RATE
    assert abs(float(s(0)) - lr * 0.1) < 1e-9
    assert abs(float(s(4)) - lr * 0.5) < 1e-9
    assert abs(float(s(9)) - lr) < 1e-9
    assert abs(float(s(500)) - lr) < 1e-9
    # default stays pure reference semantics
    cfg2 = default_config()
    s2 = lr_schedule(cfg2)
    assert abs(float(s2(0)) - lr) < 1e-9


def test_crop_and_resize_matmul_matches_gather():
    """The MXU (separable matmul) formulation and the 4-corner-gather
    oracle agree to float tolerance, including out-of-range extrapolation
    rows and the crop_size=1 midpoint branch."""
    from tpudenoise.ops.roi_align import crop_and_resize_gather
    rng = np.random.RandomState(7)
    feat = rng.randn(19, 27, 8).astype(np.float32)
    boxes = rng.uniform(-0.3, 1.2, (23, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:] - boxes[:, :2])
    for crop in (7, 14, 1):
        got = np.asarray(crop_and_resize(feat, boxes, crop))
        want = np.asarray(crop_and_resize_gather(feat, boxes, crop))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
