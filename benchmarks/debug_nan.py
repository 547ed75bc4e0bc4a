"""Reproduce the res101 fixture-training NaN: per-iter losses, dump the
offending batch. Run on TPU:  python benchmarks/debug_nan.py"""
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    import jax
    from tests.fixtures import make_rrdata_fixture
    from tpudenoise.core.config import default_config
    from tpudenoise.data.loader import RoiDataLoader
    from tpudenoise.data.roidb import filter_roidb, get_training_roidb
    from tpudenoise.data.voc_like import rrData
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.train.solver import Solver

    root = '/tmp/nan_debug'
    if not osp.exists(osp.join(root, '6thfloorData')):
        make_rrdata_fixture(root, n_train=16, n_test=20, size=(240, 320),
                            seed=3)
    cfg = default_config()
    cfg.DATA_DIR = root
    cfg.ROOT_DIR = root
    cfg.TRAIN.SCALES = (240,)
    cfg.TRAIN.MAX_SIZE = 320
    cfg.TRAIN.WARMUP_ITERS = 100
    cfg.TRAIN.GRAD_CLIP = 10.0
    cfg.TRAIN.DISPLAY = 1

    d_tr = rrData('train', '2021', config=cfg)
    d_tr.set_proposal_method('gt')
    roidb = filter_roidb(get_training_roidb(d_tr, 'original', cfg), cfg)
    model = FasterRCNN(backbone='res101', num_classes=2, cfg=cfg)
    solver = Solver(model, d_tr, roidb, roidb, root + '/out', root + '/tb',
                    noise='original', config=cfg, bucket=(240, 320))

    # manual loop mirroring train_model but recording batches
    loader = RoiDataLoader(roidb, d_tr.num_classes, cfg,
                           batch_size=solver.batch_size,
                           bucket=solver.bucket, max_gt=solver.max_gt)
    key = jax.random.PRNGKey(cfg.RNG_SEED)
    state = solver._init_state_fn(key, solver.bucket)
    prev = None
    for it in range(1, 120):
        key, k_noise, k_step = jax.random.split(key, 3)
        raw = loader.forward()
        batch = solver._prep_batch(k_noise, raw)
        state, losses = solver._step_fn(state, k_step, batch)
        vals = {k: float(v) for k, v in losses.items()}
        print(it, {k: round(v, 4) for k, v in vals.items()},
              'gt boxes:', np.asarray(raw['gt_boxes'])[..., :4].astype(int).tolist(),
              'mask:', np.asarray(raw['gt_mask']).astype(int).tolist(),
              flush=True)
        if not all(np.isfinite(v) for v in vals.values()):
            print('FIRST NAN at iter', it)
            print('prev batch gt:', prev)
            break
        prev = (np.asarray(raw['gt_boxes']).tolist(),
                np.asarray(raw['gt_mask']).tolist())


if __name__ == '__main__':
    main()
