"""COCO dataset + minimal in-repo COCO API (roidb semantics mirror ref
lib/datasets/coco.py:27-316; eval is the standard COCO bbox metric)."""

import json
import os.path as osp

import numpy as np
import pytest


def _write_fixture(root):
    ann_dir = root / 'coco' / 'annotations'
    ann_dir.mkdir(parents=True)
    dataset = {
        'images': [
            {'id': 1, 'width': 100, 'height': 80},
            {'id': 2, 'width': 100, 'height': 80},
        ],
        # non-contiguous category ids exercise the cat->class mapping
        'categories': [{'id': 1, 'name': 'person'},
                       {'id': 3, 'name': 'car'}],
        'annotations': [
            {'id': 10, 'image_id': 1, 'category_id': 1, 'iscrowd': 0,
             'bbox': [10, 10, 20, 30], 'area': 600},
            {'id': 11, 'image_id': 1, 'category_id': 3, 'iscrowd': 0,
             'bbox': [50, 5, 30, 20], 'area': 600},
            # crowd region: must become all -1 overlaps in the roidb and
            # be ignored (not a missed gt) by the eval
            {'id': 12, 'image_id': 1, 'category_id': 1, 'iscrowd': 1,
             'bbox': [0, 40, 50, 35], 'area': 1750},
            # extends past the image edge -> clipped in the roidb
            {'id': 13, 'image_id': 2, 'category_id': 1, 'iscrowd': 0,
             'bbox': [90, 65, 20, 20], 'area': 400},
        ],
    }
    with open(ann_dir / 'instances_val2014.json', 'w') as f:
        json.dump(dataset, f)


@pytest.fixture
def ds(tmp_path):
    _write_fixture(tmp_path)
    from tpudenoise.core.config import default_config
    cfg = default_config()
    cfg.DATA_DIR = str(tmp_path)
    from tpudenoise.data.coco import coco
    return coco('val', '2014', config=cfg)


def test_roidb_semantics(ds):
    assert ds.classes == ('__background__', 'person', 'car')
    roidb = ds.gt_roidb()
    assert len(roidb) == 2
    r1 = roidb[0]
    # xywh -> x1y1x2y2 with the reference's -1 width convention
    np.testing.assert_array_equal(r1['boxes'][0], [10, 10, 29, 39])
    assert r1['gt_classes'][0] == 1 and r1['gt_classes'][1] == 2
    # crowd row: -1 overlaps everywhere
    assert (r1['gt_overlaps'][2] == -1).all()
    assert r1['gt_overlaps'][0, 1] == 1.0
    # image 2's box is clipped to the image extent
    np.testing.assert_array_equal(roidb[1]['boxes'][0], [90, 65, 99, 79])


def test_image_path_naming(ds):
    assert ds.image_path_at(0).endswith('COCO_val2014_000000000001.jpg')


def test_eval_perfect_detections(ds, tmp_path, capsys):
    """Detections == the non-crowd gts (raw annotation boxes — the eval
    scores against the unclipped json like pycocotools) -> AP = AR = 1.0;
    the crowd region contributes no miss."""
    cat_to_cls = {1: 1, 3: 2}
    all_boxes = [[[] for _ in range(2)] for _ in range(ds.num_classes)]
    for ann in ds._COCO.dataset['annotations']:
        if ann['iscrowd']:
            continue
        x, y, w, h = ann['bbox']
        i = ann['image_id'] - 1
        cls = cat_to_cls[ann['category_id']]
        det = np.asarray([[x, y, x + w - 1, y + h - 1, 0.9]], np.float32)
        all_boxes[cls][i] = (np.vstack([all_boxes[cls][i], det])
                             if len(all_boxes[cls][i]) else det)
    ds.evaluate_detections(all_boxes, str(tmp_path))
    out = capsys.readouterr().out
    assert 'AP @[.50:.95 | all | 100]' in out
    first = [ln for ln in out.splitlines() if 'AP @[.50:.95 | all' in ln][0]
    assert abs(float(first.split('=')[1]) - 1.0) < 1e-6


def test_cocoeval_fp_halves_precision(tmp_path):
    """One TP (IoU 1.0) + one lower-scored FP for the same class: AP stays
    1.0 (PR curve hits recall 1 at precision 1 before the FP), and a
    higher-scored FP drags AP to ~0.5."""
    from tpudenoise.data.coco_api import COCO, COCOeval
    gt = COCO()
    gt.dataset = {
        'images': [{'id': 1, 'width': 100, 'height': 100}],
        'categories': [{'id': 1, 'name': 'x'}],
        'annotations': [{'id': 1, 'image_id': 1, 'category_id': 1,
                         'iscrowd': 0, 'bbox': [10, 10, 20, 20],
                         'area': 400}],
    }
    gt.create_index()

    def run(fp_score):
        dt = gt.loadRes([
            {'image_id': 1, 'category_id': 1, 'bbox': [10, 10, 20, 20],
             'score': 0.9},
            {'image_id': 1, 'category_id': 1, 'bbox': [60, 60, 20, 20],
             'score': fp_score}])
        ev = COCOeval(gt, dt, 'bbox')
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        return ev.stats[0]

    assert abs(run(0.1) - 1.0) < 1e-6
    # FP ranked above the TP: precision at recall>0 is 1/2
    assert abs(run(0.99) - 0.5) < 0.01


def test_factory_registers_coco():
    from tpudenoise.data.factory import list_imdbs
    names = list_imdbs()
    assert 'coco_2014_val' in names and 'coco_2015_test-dev' in names


def test_cocoeval_area_range_rematch():
    """Per-area-range re-matching: a detection overlapping both a small
    and a medium gt must match the small gt when the medium one is
    ignore-flagged for the small range (pycocotools semantics) — a single
    global match would report AR_small = 0."""
    from tpudenoise.data.coco_api import COCO, COCOeval
    gt = COCO()
    gt.dataset = {
        'images': [{'id': 1, 'width': 200, 'height': 200}],
        'categories': [{'id': 1, 'name': 'x'}],
        'annotations': [
            {'id': 1, 'image_id': 1, 'category_id': 1, 'iscrowd': 0,
             'bbox': [10, 10, 30, 30], 'area': 900},      # small
            {'id': 2, 'image_id': 1, 'category_id': 1, 'iscrowd': 0,
             'bbox': [8, 8, 40, 40], 'area': 1600},       # medium
        ],
    }
    gt.create_index()
    dt = gt.loadRes([{'image_id': 1, 'category_id': 1,
                      'bbox': [8, 8, 40, 40], 'score': 0.9}])
    ev = COCOeval(gt, dt, 'bbox')
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    # IoU(dt, small gt) = 900/1600 = 0.5625 -> matched at t=.50/.55
    ar_small = ev.stats[9]
    assert abs(ar_small - 0.2) < 1e-6, ar_small


def test_loadres_does_not_mutate_input():
    from tpudenoise.data.coco_api import COCO
    gt = COCO()
    gt.dataset = {'images': [{'id': 1, 'width': 10, 'height': 10}],
                  'categories': [{'id': 1, 'name': 'x'}],
                  'annotations': []}
    gt.create_index()
    dets = [{'image_id': 1, 'category_id': 1, 'bbox': [1, 1, 2, 2],
             'score': 0.5}]
    gt.loadRes(dets)
    assert set(dets[0]) == {'image_id', 'category_id', 'bbox', 'score'}
