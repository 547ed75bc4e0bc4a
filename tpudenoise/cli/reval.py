"""Re-evaluation CLI (ref tools/reval.py:27-72): reload a saved
detections.pkl and re-run imdb.evaluate_detections without re-running the
network."""

from __future__ import annotations

import argparse
import os.path as osp
import pickle
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='Re-evaluate results')
    p.add_argument('output_dir', help='directory containing detections.pkl')
    p.add_argument('--imdb', dest='imdb_name', default='voc_2007_test')
    p.add_argument('--comp', dest='comp_mode', action='store_true')
    p.add_argument('--nms', dest='apply_nms', action='store_true',
                   help='re-apply NMS before evaluating')
    return p.parse_args(argv)


def apply_nms_all(all_boxes, thresh):
    """ref lib/model/test.py:135-163 apply_nms; native C++ host NMS when
    available (cfg.USE_NATIVE_NMS), numpy oracle otherwise."""
    import numpy as np
    from tpudenoise.core.config import cfg
    from tpudenoise.ops.native import nms_host
    from tpudenoise.ops.nms import nms_py
    nms_fn = nms_host if cfg.USE_NATIVE_NMS else nms_py
    out = [[[] for _ in r] for r in all_boxes]
    for c, per_image in enumerate(all_boxes):
        for i, dets in enumerate(per_image):
            dets = np.asarray(dets)
            if dets.size == 0:
                continue
            ok = (dets[:, 2] > dets[:, 0]) & (dets[:, 3] > dets[:, 1])
            dets = dets[ok]
            if dets.size == 0:
                continue
            keep = nms_fn(dets, thresh)
            out[c][i] = dets[keep].copy()
    return out


def main(argv=None):
    args = parse_args(argv)
    from tpudenoise.core.config import cfg
    from tpudenoise.data.factory import get_imdb

    det_file = osp.join(args.output_dir, 'detections.pkl')
    with open(det_file, 'rb') as f:
        all_boxes = pickle.load(f)
    imdb_obj = get_imdb(args.imdb_name)
    imdb_obj.competition_mode(args.comp_mode)
    if args.apply_nms:
        print(f'Applying NMS to all detections (thresh {cfg.TEST.NMS})')
        all_boxes = apply_nms_all(all_boxes, cfg.TEST.NMS)
    print(f'Evaluating detections from {det_file}')
    imdb_obj.evaluate_detections(all_boxes, args.output_dir)


if __name__ == '__main__':
    sys.exit(main())
