"""End-to-end tests: demo CLI, solver train+snapshot+resume on the
fixture dataset, eval harness, converter roundtrip."""

import os
import os.path as osp

import numpy as np
import pytest

from tests.fixtures import make_rrdata_fixture


@pytest.fixture(scope='module')
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp('e2e_root')
    gt = make_rrdata_fixture(str(root), size=(160, 200))
    from tpudenoise.core.config import default_config
    cfg = default_config()
    cfg.DATA_DIR = str(root)
    cfg.TRAIN.SCALES = (150,)
    cfg.TRAIN.MAX_SIZE = 200
    cfg.TEST.SCALES = (150,)
    cfg.TEST.MAX_SIZE = 200
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 512
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 128
    cfg.TEST.RPN_PRE_NMS_TOP_N = 256
    cfg.TEST.RPN_POST_NMS_TOP_N = 64
    cfg.TRAIN.BATCH_SIZE = 32
    cfg.TRAIN.RPN_BATCHSIZE = 64
    cfg.TRAIN.SNAPSHOT_ITERS = 2
    cfg.TRAIN.DISPLAY = 1
    cfg.TRAIN.LEARNING_RATE = 1e-4
    cfg.ROOT_DIR = str(root)
    return cfg, gt


BUCKET = (160, 224)


def test_demo_cli_runs(tmp_path, monkeypatch):
    """The minimum end-to-end slice (SURVEY.md §3.4/§7): noise -> detect ->
    boxes rendered to output.png, via the CLI."""
    out = str(tmp_path / 'demo_out.png')
    from tpudenoise.cli import demo
    from tpudenoise.core import config as cfgmod
    cfgmod.cfg.TEST.RPN_PRE_NMS_TOP_N = 256
    cfgmod.cfg.TEST.RPN_POST_NMS_TOP_N = 64
    # one bundled real photo (the full five-image default is exercised by
    # the CLI drive on TPU; one keeps this CPU test fast)
    photo = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                     'data', 'demo', '000456.jpg')
    demo.main(['--net', 'vgg16', '--noise', 'gaussian_gaus_blur_var0.1',
               '--classes', '__background__', 'person',
               '--images', photo,
               '--conf', '0.0', '--out', out])
    assert osp.exists(out)
    import cv2
    img = cv2.imread(out)
    assert img is not None and img.shape[0] >= 300


def test_solver_train_snapshot_resume(env, tmp_path):
    cfg, gt = env
    from tpudenoise.data.roidb import combined_roidb, filter_roidb
    from tpudenoise.data.voc_like import rrData
    from tpudenoise.data.roidb import get_training_roidb
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.train.solver import Solver

    d = rrData('train', '2021', config=cfg)
    d.set_proposal_method('gt')
    roidb = filter_roidb(get_training_roidb(d, 'original', cfg), cfg)
    model = FasterRCNN(backbone='vgg16', num_classes=2, cfg=cfg)
    out_dir = str(tmp_path / 'out')
    # prefetch=True is the production CLI default; the snapshot cursor
    # protocol must stay exact under it (prefetch.py state handoff)
    solver = Solver(model, d, roidb, roidb, out_dir,
                    str(tmp_path / 'tb'), noise='original', config=cfg,
                    bucket=BUCKET, prefetch=True)
    state = solver.train_model(max_iters=3)
    assert int(state.step) == 3
    # snapshots written at iters 2 and 3
    assert osp.exists(osp.join(
        out_dir, f'{cfg.TRAIN.SNAPSHOT_PREFIX}_iter_2.pkl'))
    assert solver.find_previous() == 3

    # resume continues from 3 and reaches 5
    solver2 = Solver(model, d, roidb, roidb, out_dir,
                     str(tmp_path / 'tb2'), noise='original', config=cfg,
                     bucket=BUCKET, prefetch=True)
    state2 = solver2.train_model(max_iters=5)
    assert int(state2.step) == 5


def test_eval_harness_on_fixture(env, tmp_path):
    cfg, gt = env
    import jax
    from tpudenoise.data.voc_like import rrData
    from tpudenoise.eval.harness import test_net
    from tpudenoise.models.faster_rcnn import FasterRCNN

    d = rrData('test', '2021', config=cfg)
    d.competition_mode(True)
    model = FasterRCNN(backbone='vgg16', num_classes=2, cfg=cfg)
    params = model.init(jax.random.PRNGKey(0), image_shape=BUCKET)
    aps = test_net(model, params, d, 'randomwts', 'original',
                   config=cfg, bucket=BUCKET)
    # random weights: mAP near zero but the full pipeline must run and
    # write artifacts
    assert len(aps) == 10
    out_dir = None
    for root, dirs, files in os.walk(cfg.ROOT_DIR):
        if 'detections.pkl' in files:
            out_dir = root
    assert out_dir is not None


def test_npz_roundtrip(tmp_path):
    from tpudenoise.models.convert import load_params_npz, save_params_npz
    params = {'head': {'conv1': {'kernel': np.ones((3, 3, 3, 8))}},
              'rpn': {'rpn_conv': {'bias': np.zeros(512)}}}
    p = str(tmp_path / 'w.npz')
    save_params_npz(params, p)
    back = load_params_npz(p)
    np.testing.assert_array_equal(back['head']['conv1']['kernel'],
                                  params['head']['conv1']['kernel'])
    np.testing.assert_array_equal(back['rpn']['rpn_conv']['bias'],
                                  params['rpn']['rpn_conv']['bias'])


def test_solver_padded_batch_masked_noise(env, tmp_path):
    """Shape-diverse training batches: the noise stage must follow each
    image's valid geometry (masked pipeline) and the network input's pad
    must be ZERO after mean subtraction — the reference zero-pads AFTER
    noise + mean subtract (minibatch.py:1676-1688 -> blob.py:17-47), so
    pad pixels are exactly 0.0 there, never noised."""
    cfg, gt = env
    import jax
    import jax.numpy as jnp
    from tpudenoise.data.roidb import (combined_roidb, filter_roidb,
                                       get_training_roidb)
    from tpudenoise.data.voc_like import rrData
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.train.solver import Solver

    d = rrData('train', '2021', config=cfg)
    d.set_proposal_method('gt')
    roidb = filter_roidb(get_training_roidb(d, 'original', cfg), cfg)
    model = FasterRCNN(backbone='vgg16', num_classes=2, cfg=cfg)
    solver = Solver(model, d, roidb, roidb, str(tmp_path / 'out'),
                    str(tmp_path / 'tb'),
                    noise='gaussian_wavelet_var0.1', config=cfg,
                    batch_size=2, bucket=(192, 256))
    from tpudenoise.data.loader import RoiDataLoader
    loader = RoiDataLoader(roidb, d.num_classes, cfg, batch_size=2,
                           bucket=(192, 256))
    batch = loader.forward()
    # fixture images resize to 150x188 < the (192, 256) bucket: the
    # loader must edge-replicate the pad (stencil halo contract)
    im = batch['image']
    h, w = int(batch['im_info'][0][0]), int(batch['im_info'][0][1])
    assert h < 192 and w < 256
    assert (im[0, h:, :w] == im[0, h - 1:h, :w]).all()
    assert (im[0, :, w:] == im[0, :, w - 1:w]).all()

    prepped = solver._prep_batch(jax.random.PRNGKey(0), batch)
    out = np.asarray(prepped['image'])
    # pad region is exactly zero (reference blob semantics)
    assert (out[0, h:, :] == 0.0).all()
    assert (out[0, :, w:] == 0.0).all()
    # valid region was noised + mean-subtracted (nonzero, finite)
    assert np.isfinite(out[0, :h, :w]).all()
    assert np.abs(out[0, :h, :w]).mean() > 1.0
