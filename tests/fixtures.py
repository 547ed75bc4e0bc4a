"""Synthetic rrData-layout fixture dataset for end-to-end tests: colored
rectangles as 'person' boxes, VOC XML annotations, deterministic."""

import os
import os.path as osp

import numpy as np


def make_rrdata_fixture(root: str, n_train: int = 4, n_test: int = 3,
                        size=(240, 320), seed: int = 3, sizes=None):
    """Create DATA_DIR layout: root/6thfloorData/6thFloorTest/{JPEGImages,
    Annotations_cvat/6thFloorTest/{Annotations,ImageSets/Main}}.
    Returns dict of gt boxes per split.

    sizes: optional list of (h, w) cycled across images — builds a
    shape-DIVERSE dataset (the VOC-like case the bucketed noise stage
    targets); default: every image is `size`."""
    import cv2
    rng = np.random.RandomState(seed)
    base = osp.join(root, '6thfloorData', '6thFloorTest')
    jdir = osp.join(base, 'JPEGImages')
    adir = osp.join(base, 'Annotations_cvat', '6thFloorTest', 'Annotations')
    sdir = osp.join(base, 'Annotations_cvat', '6thFloorTest', 'ImageSets',
                    'Main')
    for d in (jdir, adir, sdir):
        os.makedirs(d, exist_ok=True)

    gt = {}
    splits = {'train': [f'tr{i:03d}' for i in range(n_train)],
              'test': [f'te{i:03d}' for i in range(n_test)]}
    splits['trainval'] = splits['train']
    splits['val'] = splits['test']
    for split in ('train', 'test'):
        for k, name in enumerate(splits[split]):
            h, w = sizes[k % len(sizes)] if sizes else size
            img = (rng.rand(h, w, 3) * 60 + 60).astype(np.uint8)
            n_obj = rng.randint(1, 4)
            boxes = []
            for _ in range(n_obj):
                bw = rng.randint(min(40, w // 4), min(90, w // 2))
                bh = rng.randint(min(60, h // 4), min(110, h // 2))
                x1 = rng.randint(0, w - bw - 1)
                y1 = rng.randint(0, h - bh - 1)
                color = tuple(int(c) for c in rng.randint(180, 255, 3))
                cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), color, -1)
                boxes.append((x1, y1, x1 + bw, y1 + bh))
            cv2.imwrite(osp.join(jdir, name + '.jpg'), img)
            objs = '\n'.join(
                f'  <object><name>person</name><bndbox>'
                f'<xmin>{x1 + 1}</xmin><ymin>{y1 + 1}</ymin>'
                f'<xmax>{x2 + 1}</xmax><ymax>{y2 + 1}</ymax>'
                f'</bndbox></object>'
                for (x1, y1, x2, y2) in boxes)
            xml = (f'<annotation><filename>{name}.jpg</filename>'
                   f'<size><width>{w}</width><height>{h}</height>'
                   f'<depth>3</depth></size>\n{objs}\n</annotation>')
            with open(osp.join(adir, name + '.xml'), 'w') as f:
                f.write(xml)
            gt[name] = boxes
    for split, names in splits.items():
        with open(osp.join(sdir, split + '.txt'), 'w') as f:
            f.write('\n'.join(names) + '\n')
    return gt
