"""Snapshot pruning + legacy config overlay compatibility."""

import os
import os.path as osp

import numpy as np


def test_remove_old_snapshots(tmp_path):
    from tpudenoise.core.config import default_config
    from tpudenoise.train.solver import Solver
    cfg = default_config()
    cfg.TRAIN.SNAPSHOT_KEPT = 2
    out = str(tmp_path)
    solver = Solver.__new__(Solver)  # no model needed for pruning
    solver.cfg = cfg
    solver.output_dir = out
    prefix = cfg.TRAIN.SNAPSHOT_PREFIX
    for it in (2, 4, 6, 8):
        open(osp.join(out, f'{prefix}_iter_{it}.pkl'), 'w').write('x')
        os.makedirs(osp.join(out, f'{prefix}_iter_{it}.orbax'),
                    exist_ok=True)
    solver.remove_old_snapshots()
    left = sorted(f for f in os.listdir(out) if f.endswith('.pkl'))
    assert left == [f'{prefix}_iter_6.pkl', f'{prefix}_iter_8.pkl']
    assert not osp.exists(osp.join(out, f'{prefix}_iter_2.orbax'))
    assert osp.exists(osp.join(out, f'{prefix}_iter_8.orbax'))


def test_legacy_yaml_keys_accepted(tmp_path):
    """Reference-era YAML overlays carry USE_GPU_NMS / USE_E2E_TF — they
    must load without KeyError (no-op here)."""
    from tpudenoise.core.config import cfg_from_file, default_config
    p = tmp_path / 'legacy.yml'
    p.write_text('USE_GPU_NMS: False\nUSE_E2E_TF: True\n'
                 'TRAIN:\n  BATCH_SIZE: 256\n')
    cfg = default_config()
    cfg_from_file(str(p), into=cfg)
    assert cfg.TRAIN.BATCH_SIZE == 256
    assert cfg.USE_GPU_NMS is False
