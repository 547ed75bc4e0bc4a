"""Batched eval harness must reproduce the sequential harness exactly
(same per-image PRNG keys, same detections)."""

import numpy as np
import pytest

from tests.fixtures import make_rrdata_fixture


@pytest.fixture(scope='module')
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp('beval')
    make_rrdata_fixture(root, n_test=5, size=(160, 200))
    from tpudenoise.core.config import default_config
    cfg = default_config()
    cfg.DATA_DIR = str(root)
    cfg.ROOT_DIR = str(root)
    cfg.TEST.SCALES = (150,)
    cfg.TEST.MAX_SIZE = 200
    cfg.TEST.RPN_PRE_NMS_TOP_N = 256
    cfg.TEST.RPN_POST_NMS_TOP_N = 64
    return cfg


def test_batched_matches_sequential(env):
    import jax
    from tpudenoise.data.voc_like import rrData
    from tpudenoise.eval.harness import test_net, test_net_batched
    from tpudenoise.models.faster_rcnn import FasterRCNN
    cfg = env
    m = FasterRCNN(backbone='vgg16', num_classes=2, cfg=cfg)
    params = m.init(jax.random.PRNGKey(0), image_shape=(160, 224))

    d1 = rrData('test', '2021', config=cfg)
    d1.competition_mode(True)
    test_net(m, params, d1, 'seq', 'sap_median_var0.4', config=cfg,
             bucket=(160, 224))
    d2 = rrData('test', '2021', config=cfg)
    d2.competition_mode(True)
    # host-prep leg: bit-tight parity (same cv2 resize as the sequential
    # loop — only batching/PRNG plumbing differs)
    test_net_batched(m, params, d2, 'bat', 'sap_median_var0.4',
                     eval_batch=3, config=cfg, bucket=(160, 224),
                     device_prep=False)
    # device-prep leg (the default): the on-device bilinear prep deviates
    # from cv2 by <= ~0.05 u8-levels at scale != 1 (ops/resize.py), so
    # detections agree to sub-pixel, not to 1e-3
    d3 = rrData('test', '2021', config=cfg)
    d3.competition_mode(True)
    test_net_batched(m, params, d3, 'dev', 'sap_median_var0.4',
                     eval_batch=3, config=cfg, bucket=(160, 224))

    import pickle
    import os.path as osp
    from tpudenoise.core.config import get_output_dir
    seq = pickle.load(open(osp.join(
        get_output_dir(d1.name, 'seq', cfg), 'detections.pkl'), 'rb'))
    bat = pickle.load(open(osp.join(
        get_output_dir(d2.name, 'bat', cfg), 'detections.pkl'), 'rb'))
    dev = pickle.load(open(osp.join(
        get_output_dir(d3.name, 'dev', cfg), 'detections.pkl'), 'rb'))
    matched = total = 0
    for cls in range(len(seq)):
        for i in range(len(seq[cls])):
            a, b = np.asarray(seq[cls][i]), np.asarray(bat[cls][i])
            assert a.shape == b.shape, (cls, i, a.shape, b.shape)
            if a.size:
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)
            # device-prep leg: sub-pixel input deviations can flip a
            # marginal NMS keep on this random-init net, so assert
            # aggregate agreement — nearly every host-prep detection has
            # a device-prep twin within half a pixel
            c = np.asarray(dev[cls][i])
            assert abs(len(a) - len(c)) <= 1, (cls, i, len(a), len(c))
            for row in (a if a.size else np.zeros((0, 5))):
                total += 1
                if c.size and np.min(
                        np.abs(c - row[None]).max(1)) < 0.5:
                    matched += 1
    assert total == 0 or matched / total >= 0.85, (matched, total)


def test_fast_rng_flag_through_batched_eval(env):
    """--fast-rng must thread from the harness entry point into the
    noise pipeline (counter-hash draws) and produce a complete eval:
    same detection count structure as the threefry run, different noise
    stream (rayleigh draws differ), finite boxes."""
    import os.path as osp
    import pickle

    import jax
    from tpudenoise.core.config import get_output_dir
    from tpudenoise.data.voc_like import rrData
    from tpudenoise.eval.harness import test_net_batched
    from tpudenoise.models.faster_rcnn import FasterRCNN
    cfg = env
    m = FasterRCNN(backbone='vgg16', num_classes=2, cfg=cfg)
    params = m.init(jax.random.PRNGKey(0), image_shape=(160, 224))

    d = rrData('test', '2021', config=cfg)
    d.competition_mode(True)
    test_net_batched(m, params, d, 'frng', 'rayleigh_var0.2',
                     eval_batch=3, config=cfg, bucket=(160, 224),
                     fast_rng=True)
    dets = pickle.load(open(osp.join(
        get_output_dir(d.name, 'frng', cfg), 'detections.pkl'), 'rb'))
    assert len(dets) == 2 and len(dets[1]) == 5
    for i in range(5):
        a = np.asarray(dets[1][i])
        assert a.size == 0 or np.isfinite(a).all()


def test_device_prep_exact_at_unit_scale(env):
    """At scale == 1 (the rrData production geometry) the device prep's
    resize weights are exact one-hots — sequential-vs-batched parity is
    as tight as the host-prep path."""
    import copy
    import jax
    from tpudenoise.data.voc_like import rrData
    from tpudenoise.eval.harness import test_net, test_net_batched
    from tpudenoise.models.faster_rcnn import FasterRCNN
    cfg = copy.deepcopy(env)
    cfg.TEST.SCALES = (160,)
    cfg.TEST.MAX_SIZE = 200
    m = FasterRCNN(backbone='vgg16', num_classes=2, cfg=cfg)
    params = m.init(jax.random.PRNGKey(0), image_shape=(160, 224))
    d1 = rrData('test', '2021', config=cfg)
    d1.competition_mode(True)
    test_net(m, params, d1, 'sequ', 'gaussian_gaus_blur_var0.1',
             config=cfg, bucket=(160, 224))
    d2 = rrData('test', '2021', config=cfg)
    d2.competition_mode(True)
    test_net_batched(m, params, d2, 'devu', 'gaussian_gaus_blur_var0.1',
                     eval_batch=3, config=cfg, bucket=(160, 224))
    import pickle
    import os.path as osp
    from tpudenoise.core.config import get_output_dir
    seq = pickle.load(open(osp.join(
        get_output_dir(d1.name, 'sequ', cfg), 'detections.pkl'), 'rb'))
    dev = pickle.load(open(osp.join(
        get_output_dir(d2.name, 'devu', cfg), 'detections.pkl'), 'rb'))
    for cls in range(len(seq)):
        for i in range(len(seq[cls])):
            a, b = np.asarray(seq[cls][i]), np.asarray(dev[cls][i])
            assert a.shape == b.shape, (cls, i, a.shape, b.shape)
            if a.size:
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_compute_id_per_layer_eval(env, capsys):
    """--compute-id collects per-probe features through the eval loop and
    prints one ID line per probe layer (ref test.py:1919-2218 study)."""
    import jax
    from tpudenoise.analysis.twonn import PROBES
    from tpudenoise.data.voc_like import rrData
    from tpudenoise.eval.harness import test_net_batched
    from tpudenoise.models.faster_rcnn import FasterRCNN
    cfg = env
    m = FasterRCNN(backbone='vgg16', num_classes=2, cfg=cfg)
    params = m.init(jax.random.PRNGKey(0), image_shape=(160, 224))
    d = rrData('test', '2021', config=cfg)
    d.competition_mode(True)
    test_net_batched(m, params, d, 'idrun', 'original', eval_batch=5,
                     config=cfg, bucket=(160, 224), compute_id=True)
    outp = capsys.readouterr().out
    # fixture has 5 images (< the 10-image floor) -> study skipped cleanly;
    # the probe collection itself must have run without error
    assert 'Evaluating detections' in outp


def test_device_prep_rejects_too_small_bucket(env):
    """A bucket smaller than the rescaled geometry must raise (the
    device-prep resize would otherwise silently zero-truncate the image
    edge while im_info still reports the full extent)."""
    import jax
    import pytest as _pytest
    from tpudenoise.data.voc_like import rrData
    from tpudenoise.eval.harness import test_net_batched
    from tpudenoise.models.faster_rcnn import FasterRCNN
    cfg = env
    m = FasterRCNN(backbone='vgg16', num_classes=2, cfg=cfg)
    params = m.init(jax.random.PRNGKey(0), image_shape=(160, 224))
    d = rrData('test', '2021', config=cfg)
    d.competition_mode(True)
    with _pytest.raises(AssertionError, match='exceeds bucket'):
        test_net_batched(m, params, d, 'smallb', 'original',
                         eval_batch=3, config=cfg, bucket=(64, 64))
