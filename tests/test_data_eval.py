"""Data layer + VOC evaluation end-to-end on the synthetic fixture."""

import numpy as np
import pytest

from tests.fixtures import make_rrdata_fixture


@pytest.fixture(scope='module')
def fixture_env(tmp_path_factory):
    root = tmp_path_factory.mktemp('data_root')
    gt = make_rrdata_fixture(str(root))
    from tpudenoise.core.config import default_config
    cfg = default_config()
    cfg.DATA_DIR = str(root)
    return cfg, gt


def _make_imdb(cfg, split):
    from tpudenoise.data.voc_like import rrData
    return rrData(split, '2021', config=cfg)


def test_imdb_loads_roidb(fixture_env):
    cfg, gt = fixture_env
    d = _make_imdb(cfg, 'train')
    assert d.num_images == 4
    assert d.classes == ['__background__', 'person']
    roidb = d.gt_roidb()
    assert len(roidb) == 4
    e = roidb[0]
    assert e['boxes'].shape[1] == 4
    assert (e['gt_classes'] == 1).all()
    # XML is 1-based; roidb 0-based
    name = d.image_index[0]
    np.testing.assert_array_equal(e['boxes'], np.array(gt[name]))


def test_flip_and_prepare(fixture_env):
    cfg, gt = fixture_env
    from tpudenoise.data.roidb import get_training_roidb, filter_roidb
    d = _make_imdb(cfg, 'train')
    roidb = get_training_roidb(d, 'gaussian_var0.1', cfg)
    assert len(roidb) == 8  # flipped doubles
    assert roidb[4]['flipped']
    assert roidb[0]['noise_type'] == 'gaussian_var0.1'
    # flipped boxes mirror around the image width
    w = roidb[0]['width']
    orig = roidb[0]['boxes'][0]
    flip = roidb[4]['boxes'][0]
    assert flip[0] == w - orig[2] - 1 and flip[2] == w - orig[0] - 1
    roidb = filter_roidb(roidb, cfg)
    assert len(roidb) == 8  # all entries have fg


def test_loader_batches(fixture_env):
    cfg, gt = fixture_env
    from tpudenoise.data.loader import RoiDataLoader
    from tpudenoise.data.roidb import get_training_roidb
    d = _make_imdb(cfg, 'trainval')
    roidb = get_training_roidb(d, 'original', cfg)
    loader = RoiDataLoader(roidb, 2, cfg, batch_size=2,
                           bucket=(608, 1024), max_gt=10)
    batch = loader.forward()
    assert batch['image'].shape == (2, 608, 1024, 3)
    assert batch['gt_boxes'].shape == (2, 10, 5)
    assert batch['gt_mask'].any()
    # gt scaled by the resize scale
    scale = batch['im_info'][0, 2]
    assert 1.5 < scale < 3.0  # 240x320 -> min side 600
    # cursor state roundtrip (exact resume, ref train_val.py:62-83)
    st = loader.get_state()
    b1 = loader.forward()
    loader.set_state(st)
    b2 = loader.forward()
    np.testing.assert_array_equal(b1['image'], b2['image'])


def test_voc_eval_perfect_detections(fixture_env):
    cfg, gt = fixture_env
    d = _make_imdb(cfg, 'test')
    d.competition_mode(True)
    # perfect detections = gt boxes with score 1
    all_boxes = [[[] for _ in range(d.num_images)] for _ in range(2)]
    for i, name in enumerate(d.image_index):
        dets = np.array([[x1, y1, x2, y2, 0.9]
                         for (x1, y1, x2, y2) in gt[name]], np.float32)
        all_boxes[1][i] = dets
    aps = d.evaluate_detections(all_boxes, str(cfg.DATA_DIR) + '/out')
    assert len(aps) == 10  # IoU sweep 0.50:0.95
    assert min(aps) > 0.99  # perfect match at every IoU


def test_voc_eval_half_detections(fixture_env):
    cfg, gt = fixture_env
    d = _make_imdb(cfg, 'test')
    d.competition_mode(True)
    all_boxes = [[[] for _ in range(d.num_images)] for _ in range(2)]
    total = 0
    kept = 0
    for i, name in enumerate(d.image_index):
        dets = []
        for j, (x1, y1, x2, y2) in enumerate(gt[name]):
            total += 1
            if j % 2 == 0:
                kept += 1
                dets.append([x1, y1, x2, y2, 0.9])
        all_boxes[1][i] = np.array(dets, np.float32).reshape(-1, 5)
    aps = d.evaluate_detections(all_boxes, str(cfg.DATA_DIR) + '/out2')
    # recall capped at kept/total; VOC07 11-pt AP approximates it
    assert aps[0] <= kept / total + 0.15
    assert aps[0] > 0.2


def test_factory_names():
    from tpudenoise.data.factory import list_imdbs
    names = list_imdbs()
    assert 'rrData_2021_train' in names
    assert 'voc_2007_trainval' in names


def test_mcg_munge_layout(tmp_path):
    """mcg_munge relayouts flat MCG .mat files into the nested
    first14/first22 scheme (ref lib/datasets/tools/mcg_munge.py)."""
    import os
    from tpudenoise.data.mcg_munge import munge
    src = tmp_path / 'MCG-COCO-val2014-boxes'
    src.mkdir()
    names = ['COCO_val2014_000000193401.mat',
             'COCO_val2014_000000141334.mat']
    for n in names:
        (src / n).write_bytes(b'x')
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert munge(str(src)) == 2
    finally:
        os.chdir(cwd)
    assert (tmp_path / 'MCG' / 'mat' / 'COCO_val2014_0' /
            'COCO_val2014_000000193' /
            'COCO_val2014_000000193401.mat').exists()
    assert (tmp_path / 'MCG' / 'mat' / 'COCO_val2014_0' /
            'COCO_val2014_000000141' /
            'COCO_val2014_000000141334.mat').exists()
