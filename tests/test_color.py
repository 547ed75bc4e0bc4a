"""Color conversion parity vs OpenCV (the reference's converter)."""

import cv2
import numpy as np
import pytest

from tpudenoise.ops.color import (bgr_u8_to_lab_u8, lab_u8_to_bgr_u8,
                                  rgb01_to_ycbcr, ycbcr_to_rgb01)


@pytest.fixture
def img():
    rng = np.random.RandomState(3)
    return rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)


def test_bgr2lab_matches_cv2(img):
    want = cv2.cvtColor(img, cv2.COLOR_BGR2LAB).astype(np.float32)
    got = np.asarray(bgr_u8_to_lab_u8(img.astype(np.float32)))
    # f32 vs cv2's fixed-point LUTs: +/-1 quantization step on ~10% of
    # pixels; never more than one step
    assert np.abs(got - want).max() <= 1.0
    assert (np.abs(got - want) > 0.5).mean() < 0.15


def test_lab2bgr_matches_cv2(img):
    lab = cv2.cvtColor(img, cv2.COLOR_BGR2LAB)
    want = cv2.cvtColor(lab, cv2.COLOR_LAB2BGR).astype(np.float32)
    got = np.asarray(lab_u8_to_bgr_u8(lab.astype(np.float32)))
    assert np.abs(got - want).max() <= 2.0
    assert (np.abs(got - want) > 1.0).mean() < 0.02


def test_ycbcr_roundtrip(img):
    rgb = img[..., ::-1].astype(np.float32) / 255.0
    y = np.asarray(rgb01_to_ycbcr(rgb))
    assert y[..., 0].min() >= 15.9 and y[..., 0].max() <= 235.1
    back = np.asarray(ycbcr_to_rgb01(y))
    np.testing.assert_allclose(back, rgb, atol=2e-3)


def test_ycbcr_matches_cv2_ycrcb(img):
    """cv2 uses YCrCb order with the same BT.601 matrix — cross-check the
    luma channel (full-range in cv2 vs studio-range in skimage differs by
    the 16/219 scaling; compare via the known affine relation)."""
    rgb = img[..., ::-1].astype(np.float32) / 255.0
    y_skimage = np.asarray(rgb01_to_ycbcr(rgb))[..., 0]
    y_cv = cv2.cvtColor(img, cv2.COLOR_BGR2YCrCb)[..., 0].astype(np.float32)
    # skimage: Y = 16 + 219 * y_full where y_full = y_cv/255
    approx = 16.0 + 219.0 * (y_cv / 255.0)
    assert np.abs(y_skimage - approx).max() <= 1.5


def test_hsv_matches_cv2(img):
    from tpudenoise.ops.color import hsv_u8_to_rgb_u8, rgb_u8_to_hsv_u8
    rgb = img[..., ::-1]
    want = cv2.cvtColor(rgb, cv2.COLOR_RGB2HSV).astype(np.float32)
    got = np.asarray(rgb_u8_to_hsv_u8(rgb.astype(np.float32)))
    assert np.abs(got - want).max() <= 1.0
    back_want = cv2.cvtColor(want.astype(np.uint8),
                             cv2.COLOR_HSV2RGB).astype(np.float32)
    back = np.asarray(hsv_u8_to_rgb_u8(want))
    assert np.abs(back - back_want).max() <= 2.0
    assert (np.abs(back - back_want) > 1.0).mean() < 0.02
