"""Pallas bilateral vs the XLA reference (interpret mode)."""

import jax
import numpy as np
import pytest

from tpudenoise.denoise.pallas_bilateral import bilateral_pallas
from tpudenoise.denoise.stencils import bilateral


@pytest.fixture
def imgs():
    rng = np.random.RandomState(3)
    return rng.randint(0, 256, (2, 48, 64, 3)).astype(np.float32)


def test_matches_xla_bilateral(imgs):
    got = np.asarray(bilateral_pallas(imgs, tile_h=16, interpret=True))
    want = np.asarray(jax.vmap(bilateral)(imgs))
    d = np.abs(got - want)
    # identical math; at worst a rounding boundary flips on f32 sum order
    assert d.max() <= 1.0
    assert (d > 0).mean() < 1e-3


def test_matches_cv2(imgs):
    import cv2
    got = np.asarray(bilateral_pallas(imgs, tile_h=16, interpret=True))
    want = np.stack([cv2.bilateralFilter(
        im.astype(np.uint8), 9, 20, 100,
        borderType=cv2.BORDER_CONSTANT) for im in imgs]).astype(np.float32)
    d = np.abs(got - want)
    assert d.max() <= 1.0
    assert (d > 0).mean() < 0.05


def test_tile_partition_invariance(imgs):
    a = np.asarray(bilateral_pallas(imgs, tile_h=16, interpret=True))
    b = np.asarray(bilateral_pallas(imgs, tile_h=48, interpret=True))
    np.testing.assert_array_equal(a, b)
