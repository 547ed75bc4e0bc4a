"""Train CLI (ref tools/trainval_net.py:30-149): same flag contract
(--weight --imdb --imdbval --iters --tag --net --noise --cfg --set) plus
TPU-batch options."""

from __future__ import annotations

import argparse
import pprint
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='Train a Faster R-CNN network'
                                            ' (TPU-native)')
    p.add_argument('--cfg', dest='cfg_file', default=None,
                   help='optional config file')
    p.add_argument('--weight', default=None,
                   help='initial weights (.npz from the converter or an '
                        'orbax checkpoint dir)')
    p.add_argument('--imdb', dest='imdb_name',
                   default='voc_2007_trainval')
    p.add_argument('--imdbval', dest='imdbval_name',
                   default='voc_2007_test')
    p.add_argument('--iters', dest='max_iters', type=int, default=70000)
    p.add_argument('--tag', default=None)
    p.add_argument('--net', default='res50',
                   choices=['vgg16', 'res50', 'res101', 'res152',
                            'mobile'])
    p.add_argument('--noise', default='original',
                   help='{noise}_{denoise}_var{level} string')
    p.add_argument('--batch', type=int, default=1,
                   help='images per device batch (TPU addition; the '
                        'reference is fixed at 1)')
    p.add_argument('--bucket', type=int, nargs=2, default=None,
                   help='static padded image bucket H W (default: derived '
                        'from TRAIN geometry and dataset orientations)')
    p.add_argument('--no-prefetch', action='store_true',
                   help='disable the threaded JPEG-decode prefetch '
                        '(exact-resume-safe, on by default)')
    p.add_argument('--fast-rng', action='store_true',
                   help='counter-hash bitstream draws for every '
                        'stochastic noise generator (faster; different '
                        'stream, same distribution)')
    p.add_argument('--distributed', action='store_true',
                   help='multi-host pod bring-up: call '
                        'jax.distributed.initialize (cluster '
                        'auto-detection) before anything else; the '
                        'production mesh then spans the whole slice')
    p.add_argument('--set', dest='set_cfgs', nargs=argparse.REMAINDER,
                   default=None, help='set config keys')
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.distributed:
        from tpudenoise.core.mesh import initialize_distributed
        initialize_distributed()
    from tpudenoise.core.config import (cfg, cfg_from_file, cfg_from_list,
                                        get_output_dir, get_output_tb_dir)
    from tpudenoise.data.roidb import combined_roidb
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.train.solver import train_net

    if args.cfg_file:
        cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)
    print('Using config:')
    pprint.pprint(cfg)
    np.random.seed(cfg.RNG_SEED)

    imdb_obj, roidb = combined_roidb(args.imdb_name, args.noise)
    print(f'{len(roidb)} roidb entries')
    output_dir = get_output_dir(imdb_obj.name, args.tag)
    tb_dir = get_output_tb_dir(imdb_obj.name, args.tag)

    # validation roidb without flipping (ref trainval_net.py:117-124)
    orig_flip = cfg.TRAIN.USE_FLIPPED
    cfg.TRAIN.USE_FLIPPED = False
    _, valroidb = combined_roidb(args.imdbval_name, args.noise)
    cfg.TRAIN.USE_FLIPPED = orig_flip
    print(f'{len(valroidb)} validation roidb entries')

    model = FasterRCNN(backbone=args.net,
                       num_classes=imdb_obj.num_classes,
                       anchor_scales=tuple(cfg.ANCHOR_SCALES),
                       anchor_ratios=tuple(cfg.ANCHOR_RATIOS), cfg=cfg)
    pretrained = None
    if args.weight:
        from tpudenoise.models.convert import load_pretrained
        pretrained = load_pretrained(args.weight, args.net)
    train_net(model, imdb_obj, roidb, valroidb, output_dir, tb_dir,
              pretrained_params=pretrained, max_iters=args.max_iters,
              noise=args.noise, config=cfg, batch_size=args.batch,
              bucket=tuple(args.bucket) if args.bucket else None,
              fast_rng=args.fast_rng, prefetch=not args.no_prefetch)


if __name__ == '__main__':
    sys.exit(main())
