"""Test/eval CLI (ref tools/test_net.py:27-133): same flag contract incl.
--noise; restores an orbax snapshot and runs the full eval harness."""

from __future__ import annotations

import argparse
import pprint
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='Test a Faster R-CNN network'
                                            ' (TPU-native)')
    p.add_argument('--cfg', dest='cfg_file', default=None)
    p.add_argument('--model', default=None,
                   help='orbax snapshot path (…_iter_N) or .npz weights')
    p.add_argument('--imdb', dest='imdb_name', default='voc_2007_test')
    p.add_argument('--comp', dest='comp_mode', action='store_true')
    p.add_argument('--num_dets', dest='max_per_image', type=int,
                   default=100)
    p.add_argument('--tag', default='')
    p.add_argument('--net', default='res50',
                   choices=['vgg16', 'res50', 'res101', 'res152',
                            'mobile'])
    p.add_argument('--noise', default='original')
    p.add_argument('--strict-ref', action='store_true',
                   help='reproduce the reference test-path quirks '
                        '(sap/quant fallthrough etc.)')
    p.add_argument('--compute-id', action='store_true',
                   help='log the TwoNN intrinsic dimension of backbone '
                        'features over the dataset (the reference ID '
                        'study)')
    p.add_argument('--profile', default=None, metavar='DIR',
                   help='capture a jax.profiler trace of the eval into '
                        'DIR (view in TensorBoard/Perfetto)')
    p.add_argument('--fast-rng', action='store_true',
                   help='counter-hash bitstream draws for every '
                        'stochastic noise generator (faster; different '
                        'stream, same distribution)')
    p.add_argument('--host-prep', action='store_true',
                   help='use the host cv2.resize prep instead of the '
                        'on-device bilinear prep (batched eval only)')
    p.add_argument('--eval-batch', type=int, default=1,
                   help='>1 evaluates in vmapped batches (same results, '
                        'full chip occupancy; the reference is strictly '
                        'one image per step)')
    p.add_argument('--distributed', action='store_true',
                   help='multi-host pod bring-up: call '
                        'jax.distributed.initialize (cluster '
                        'auto-detection) before anything else; the '
                        'production mesh then spans the whole slice')
    p.add_argument('--set', dest='set_cfgs', nargs=argparse.REMAINDER,
                   default=None)
    return p.parse_args(argv)


def load_params(model, model_path, net, key, image_shape=(608, 1024)):
    import jax
    import jax.numpy as jnp
    import numpy as np
    params = model.init(key, image_shape=image_shape)
    if not model_path:
        print('WARNING: no --model given; evaluating random weights')
        return params, 'random'
    if model_path.endswith('.npz'):
        from tpudenoise.models.convert import load_pretrained
        from tpudenoise.train.solver import _merge_pretrained
        pre = load_pretrained(model_path, net)
        return _merge_pretrained(params, pre), model_path
    # training snapshots carry params+opt_state+step+key; restore the raw
    # tree without a template (a partial template is rejected by orbax)
    # and coerce the params subtree onto the live structure/dtypes
    import orbax.checkpoint as ocp
    import os.path as osp
    ckptr = ocp.PyTreeCheckpointer()
    raw = ckptr.restore(osp.abspath(model_path) + '.orbax')
    restored = raw['params']
    coerce = lambda tpl, got: jnp.asarray(np.asarray(got), tpl.dtype)
    params = jax.tree_util.tree_map(coerce, params, restored)
    return params, model_path


def main(argv=None):
    args = parse_args(argv)
    if args.distributed:
        from tpudenoise.core.mesh import initialize_distributed
        initialize_distributed()
    from tpudenoise.core.config import cfg, cfg_from_file, cfg_from_list
    from tpudenoise.data.factory import get_imdb
    from tpudenoise.eval.harness import test_net
    from tpudenoise.models.faster_rcnn import FasterRCNN
    import jax

    if args.cfg_file:
        cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)
    print('Using config:')
    pprint.pprint(cfg)
    np.random.seed(cfg.RNG_SEED)

    imdb_obj = get_imdb(args.imdb_name)
    imdb_obj.competition_mode(args.comp_mode)

    model = FasterRCNN(backbone=args.net,
                       num_classes=imdb_obj.num_classes,
                       anchor_scales=tuple(cfg.ANCHOR_SCALES),
                       anchor_ratios=tuple(cfg.ANCHOR_RATIOS), cfg=cfg)
    params, tag = load_params(model, args.model, args.net,
                              jax.random.PRNGKey(cfg.RNG_SEED))
    weights_name = (args.tag or tag or 'default').replace('/', '_')
    from tpudenoise.utils.profiling import trace
    with trace(args.profile):
        if args.eval_batch > 1:
            from tpudenoise.eval.harness import test_net_batched
            test_net_batched(model, params, imdb_obj, weights_name,
                             args.noise, eval_batch=args.eval_batch,
                             max_per_image=args.max_per_image, config=cfg,
                             strict_ref=args.strict_ref,
                             compute_id=args.compute_id,
                             device_prep=not args.host_prep,
                             fast_rng=args.fast_rng)
        else:
            test_net(model, params, imdb_obj, weights_name, args.noise,
                     max_per_image=args.max_per_image, config=cfg,
                     strict_ref=args.strict_ref,
                     compute_id=args.compute_id,
                     fast_rng=args.fast_rng)


if __name__ == '__main__':
    sys.exit(main())
