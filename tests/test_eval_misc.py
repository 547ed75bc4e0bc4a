"""voc_ap goldens, proposal_top (TEST.MODE='top'), blob utils, ds_utils."""

import jax
import jax.numpy as jnp
import numpy as np


def test_voc_ap_11_point_golden():
    from tpudenoise.eval.voc_eval import voc_ap
    # perfect detector: rec ramps to 1, prec stays 1
    rec = np.linspace(0.1, 1.0, 10)
    prec = np.ones(10)
    assert abs(voc_ap(rec, prec, use_07_metric=True) - 1.0) < 1e-9
    assert abs(voc_ap(rec, prec, use_07_metric=False) - 1.0) < 1e-9
    # known case: half the recall at full precision
    rec = np.array([0.25, 0.5])
    prec = np.array([1.0, 1.0])
    # 11-pt: t in {0,.1,.2,.3,.4,.5} have prec 1 -> 6/11
    assert abs(voc_ap(rec, prec, True) - 6 / 11) < 1e-9
    # continuous: area = 0.5 * 1.0
    assert abs(voc_ap(rec, prec, False) - 0.5) < 1e-9


def test_proposal_top_mode_forward():
    """TEST.MODE='top' routes through proposal_top_layer
    (ref network.py:352-356, proposal_top_layer.py:58-85)."""
    from tpudenoise.core.config import default_config
    from tpudenoise.models.faster_rcnn import FasterRCNN
    cfg = default_config()
    cfg.TEST.MODE = 'top'
    cfg.TEST.RPN_TOP_N = 50
    m = FasterRCNN(backbone='vgg16', num_classes=2, cfg=cfg)
    params = m.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    img = np.random.RandomState(0).randn(64, 96, 3).astype(np.float32) * 20
    out = m.forward_test(params, jnp.asarray(img),
                         jnp.asarray([60., 90., 1.]))
    assert out['rois'].shape == (50, 4)
    assert bool(np.asarray(out['roi_mask']).all())  # top-k has no padding
    # rois clipped to the true extent
    rois = np.asarray(out['rois'])
    assert rois[:, 2].max() <= 89 and rois[:, 3].max() <= 59


def test_blob_utils():
    from tpudenoise.utils.blob import im_list_to_blob, prep_im_for_blob
    ims = [np.ones((10, 12, 3), np.float32),
           np.full((8, 16, 3), 2.0, np.float32)]
    blob = im_list_to_blob(ims)
    assert blob.shape == (2, 10, 16, 3)
    assert blob[1, 9, 0, 0] == 0.0  # zero padding
    im, scale = prep_im_for_blob(
        np.zeros((100, 200, 3), np.uint8), np.zeros((1, 1, 3)), 600, 1000)
    # min side 100 -> x6 would make max side 1200 > 1000 -> scale by 5
    assert abs(scale - 5.0) < 1e-6
    assert im.shape[:2] == (500, 1000)


def test_ds_utils():
    from tpudenoise.data.ds_utils import (filter_small_boxes, unique_boxes,
                                          xywh_to_xyxy, xyxy_to_xywh)
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [5, 5, 20, 20]],
                     float)
    assert list(unique_boxes(boxes)) == [0, 2]
    xywh = xyxy_to_xywh(boxes)
    np.testing.assert_array_equal(xywh_to_xyxy(xywh), boxes)
    assert list(filter_small_boxes(boxes, 8)) == [0, 1, 2]
    assert list(filter_small_boxes(boxes, 12)) == [2]


def test_metrics_logger_writes_tfevents(tmp_path):
    """tb_dir produces REAL TensorBoard event files (the reference's TB
    contract, ref train_val.py:156-157), readable back via the tfevents
    record format."""
    import pytest
    pytest.importorskip('torch.utils.tensorboard')
    pytest.importorskip(
        'tensorboard.backend.event_processing.event_file_loader')
    from tpudenoise.utils.logging import MetricsLogger
    d = str(tmp_path / 'tb')
    lg = MetricsLogger(logdir=d, tb_dir=d, quiet=True)
    lg.log({'total_loss': 1.5, 'note': 'skipped-nonscalar'}, step=3)
    lg.close()
    import glob
    evs = glob.glob(d + '/events.out.tfevents.*')
    assert evs, 'no tfevents file written'
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader)
    scalars = [(v.tag, e.step) for e in EventFileLoader(evs[0]).Load()
               for v in e.summary.value]
    assert ('total_loss', 3) in scalars


def test_metrics_logger_image_summary(tmp_path):
    """log_image writes a TensorBoard IMAGE summary (the reference's
    gt-annotated image summaries, ref network.py:40-68) viewable in TB."""
    import pytest
    pytest.importorskip('torch.utils.tensorboard')
    pytest.importorskip(
        'tensorboard.backend.event_processing.event_file_loader')
    from tpudenoise.utils.logging import MetricsLogger
    from tpudenoise.utils.visualization import draw_bounding_boxes
    d = str(tmp_path / 'tb')
    lg = MetricsLogger(logdir=d, tb_dir=d, quiet=True)
    img = np.full((40, 60, 3), 128, np.uint8)
    drawn = draw_bounding_boxes(
        img, np.array([[5, 5, 30, 30, 1]], np.float32))
    lg.log_image('train/gt_image', drawn, step=7)
    lg.close()
    import glob
    evs = glob.glob(d + '/events.out.tfevents.*')
    assert evs
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader)
    found = [(v.tag, e.step, v.WhichOneof('value'),
              v.metadata.plugin_data.plugin_name)
             for ev in evs for e in EventFileLoader(ev).Load()
             for v in e.summary.value]
    # writer version dependent: legacy 'image' proto field or the v2
    # tensor-based format tagged for the images plugin
    assert any(t == 'train/gt_image' and s == 7
               and (k == 'image' or plug == 'images')
               for t, s, k, plug in found), found


def test_load_images_helper(tmp_path):
    """Helpers.load_images contract: glob -> RGB -> resize to 1280x720
    (ref tools/Helpers.py:87-94)."""
    import cv2
    import numpy as np
    from tpudenoise.utils.visualization import load_images
    im = np.zeros((10, 12, 3), np.uint8)
    im[:, :, 0] = 255  # blue in BGR on disk
    cv2.imwrite(str(tmp_path / 'a.jpg'), im)
    cv2.imwrite(str(tmp_path / 'b.jpg'), im)
    out = load_images(str(tmp_path / '*.jpg'), size=(64, 32))
    assert len(out) == 2 and out[0].shape == (32, 64, 3)
    # BGR->RGB flip: the blue plane must land in channel 2
    assert out[0][..., 2].mean() > 200 and out[0][..., 0].mean() < 50
