"""Bit-level parity of denoise stencils vs OpenCV (the reference's filters;
SURVEY.md §7 hard part #3)."""

import cv2
import numpy as np
import pytest

from tpudenoise.denoise.stencils import (bilateral, gaussian_blur3, mean3,
                                         median3)


@pytest.fixture
def img():
    rng = np.random.RandomState(3)
    return rng.randint(0, 256, (40, 56, 3)).astype(np.uint8)


def test_gaussian_blur3_matches_cv2_exact(img):
    want = cv2.GaussianBlur(img, (3, 3), 0).astype(np.float32)
    got = np.asarray(gaussian_blur3(img.astype(np.float32)))
    np.testing.assert_array_equal(got, want)


def test_mean3_matches_cv2(img):
    want = cv2.blur(img, (3, 3)).astype(np.float32)
    got = np.asarray(mean3(img.astype(np.float32)))
    # f32 (sum * 1/9) vs cv2's f64 path: ties can flip by one step, rarely
    diff = np.abs(got - want)
    assert diff.max() <= 1.0
    assert (diff > 0).mean() < 0.005


def test_median3_matches_cv2_exact(img):
    want = cv2.medianBlur(img, 3).astype(np.float32)
    got = np.asarray(median3(img.astype(np.float32)))
    np.testing.assert_array_equal(got, want)


def test_bilateral_matches_cv2(img):
    want = cv2.bilateralFilter(img, 9, 20, 100,
                               borderType=cv2.BORDER_CONSTANT).astype(
        np.float32)
    got = np.asarray(bilateral(img.astype(np.float32)))
    diff = np.abs(got - want)
    # float32 exp vs cv2's LUT: +/-1 step tolerance
    assert diff.max() <= 1.0
    assert (diff > 0).mean() < 0.05


def test_bilateral_smooth_region_noop():
    flat = np.full((16, 16, 3), 77.0, np.float32)
    out = np.asarray(bilateral(flat))
    # flat region is a fixpoint everywhere — even at the zero-padded
    # border, because the color weight of pad pixels is exp(-231^2/800)~0
    # (cv2 agrees: corner stays 77)
    assert np.all(out == 77.0)


def test_filters_on_batch_vmap(img):
    import jax
    batch = np.stack([img, img[::-1]]).astype(np.float32)
    out = jax.vmap(median3)(batch)
    assert out.shape == batch.shape
