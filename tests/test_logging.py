"""TensorBoard summary coverage: histogram records (TRAIN/ variables,
SCORE/ predictions, ACT/ activations + zero_fraction) and per-detection
eval 'score' scalars — the reference's summary surface beyond scalars
(ref lib/nets/network.py:57-68, lib/model/test.py:1864-1874,
train_val.py:325-362)."""

import numpy as np

import jax
import jax.numpy as jnp


def _read_events(tb_dir):
    from tensorboard.backend.event_processing import event_accumulator
    acc = event_accumulator.EventAccumulator(
        str(tb_dir), size_guidance={'histograms': 0, 'scalars': 0})
    acc.Reload()
    return acc


def test_log_histogram_writes_tfevents(tmp_path):
    from tpudenoise.utils.logging import MetricsLogger
    logger = MetricsLogger(tb_dir=str(tmp_path), quiet=True)
    assert logger.active_sinks
    rng = np.random.RandomState(0)
    logger.log_histogram('TRAIN/foo/kernel', rng.randn(257), step=3)
    logger.log_histogram('empty/skipped', np.zeros((0,)), step=3)
    logger.log_scalar_quiet('score', 0.91, step=7)
    logger.close()
    acc = _read_events(tmp_path)
    assert 'TRAIN/foo/kernel' in acc.Tags()['histograms']
    assert 'empty/skipped' not in acc.Tags()['histograms']
    sc = acc.Scalars('score')
    assert sc[0].step == 7 and abs(sc[0].value - 0.91) < 1e-6


def test_solver_histogram_summaries(tmp_path):
    """The Solver summary step emits the reference's histogram triple:
    one TRAIN/ histogram per variable, SCORE/ histograms for every
    prediction tensor, ACT/ histograms with zero_fraction scalars."""
    from tpudenoise.core.config import default_config
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.train.solver import Solver
    from tpudenoise.utils.logging import MetricsLogger

    cfg = default_config()
    cfg.TEST.RPN_PRE_NMS_TOP_N = 64
    cfg.TEST.RPN_POST_NMS_TOP_N = 16
    model = FasterRCNN(backbone='vgg16', num_classes=2, cfg=cfg)
    params = model.init(jax.random.PRNGKey(0), image_shape=(64, 96))

    solver = Solver.__new__(Solver)  # summary path only — no data layer
    solver.cfg = cfg
    solver.model = model
    solver.logger = MetricsLogger(tb_dir=str(tmp_path), quiet=True)
    solver._act_fn = None

    class _State:
        pass

    state = _State()
    state.params = params
    rng = np.random.RandomState(3)
    batch = {
        'image': jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32)
                             * 20),
        'im_info': jnp.asarray([[64., 96., 1.]], jnp.float32),
    }
    solver._log_histogram_summaries(state, batch, it=5)
    solver.logger.close()

    acc = _read_events(tmp_path)
    hists = acc.Tags()['histograms']
    n_leaves = len(jax.tree_util.tree_leaves(params))
    assert sum(t.startswith('TRAIN/') for t in hists) == n_leaves
    for tag in ('SCORE/rpn_cls_prob', 'SCORE/rpn_bbox_pred', 'SCORE/rois',
                'SCORE/roi_scores', 'SCORE/cls_score', 'SCORE/cls_prob',
                'SCORE/bbox_pred', 'ACT/net_conv/activations',
                'ACT/rpn_cls_map/activations'):
        assert tag in hists, f'missing histogram {tag}'
    scalars = acc.Tags()['scalars']
    assert 'ACT/net_conv/zero_fraction' in scalars
    assert 'ACT/rpn_cls_map/zero_fraction' in scalars


def test_eval_det_score_summaries(tmp_path):
    """_log_det_scores writes one 'score' scalar per >=0.8 detection,
    stepped by image index (ref test.py:1864-1874)."""
    from tpudenoise.eval.harness import _log_det_scores
    from tpudenoise.utils.logging import (MetricsLogger,
                                          get_metrics_logger,
                                          set_metrics_logger)
    prev = get_metrics_logger()
    logger = MetricsLogger(tb_dir=str(tmp_path), quiet=True)
    set_metrics_logger(logger)
    try:
        dets = np.asarray([[0, 0, 10, 10, 0.95],
                           [1, 1, 8, 9, 0.5],
                           [2, 2, 9, 9, 0.81]], np.float32)
        _log_det_scores(dets, image_index=4)
        _log_det_scores(np.zeros((0, 5), np.float32), image_index=5)
    finally:
        set_metrics_logger(prev)
    logger.close()
    acc = _read_events(tmp_path)
    sc = acc.Scalars('score')
    assert len(sc) == 2
    assert {round(s.value, 2) for s in sc} == {0.95, 0.81}
    assert all(s.step == 4 for s in sc)
