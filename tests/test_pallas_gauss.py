"""Fused gaussian+blur Pallas kernel (interpret mode)."""

import jax
import numpy as np
import pytest

from tpudenoise.denoise.stencils import gaussian_blur3
from tpudenoise.noise.pallas_kernels import fused_gaussian_blur


@pytest.fixture
def imgs():
    rng = np.random.RandomState(3)
    return rng.randint(0, 256, (2, 48, 64, 3)).astype(np.float32)


def _run(images, seeds, var, double=True, tile_h=16):
    return np.asarray(fused_gaussian_blur(
        images, np.asarray(seeds, np.int32), var, double,
        tile_h=tile_h, interpret=True))


def test_var0_is_pure_double_blur(imgs):
    """var=0 disables the noise: output must be bit-exact cv2-style
    GaussianBlur applied twice."""
    got = _run(imgs, [1, 2], var=0.0, double=True)
    want = np.asarray(jax.vmap(
        lambda im: gaussian_blur3(gaussian_blur3(im)))(imgs))
    np.testing.assert_array_equal(got, want)


def test_var0_single_blur(imgs):
    got = _run(imgs, [1, 2], var=0.0, double=False)
    want = np.asarray(jax.vmap(gaussian_blur3)(imgs))
    np.testing.assert_array_equal(got, want)


def test_noise_statistics():
    """Box-Muller noise on a mid-gray image: the pre-clip noise is
    N(0, var) in [0,1] units; after blur the field keeps the mean and
    shrinks the variance by the kernel's energy."""
    imgs = np.full((1, 96, 128, 3), 128.0, np.float32)
    got = _run(imgs, [7], var=0.01, double=False, tile_h=48)
    x = got / 255.0
    assert abs(x.mean() - 128 / 255) < 0.01
    # [1,2,1]/4 separable twice (2D) scales noise var by (3/8)^2
    expect_std = 0.1 * (3.0 / 8.0)
    assert abs(x.std() - expect_std) < 0.01


def test_tile_partition_invariance(imgs):
    a = _run(imgs, [5, 6], var=0.1, tile_h=16)
    b = _run(imgs, [5, 6], var=0.1, tile_h=48)
    np.testing.assert_array_equal(a, b)


def test_seed_independence(imgs):
    a = _run(imgs, [5, 6], var=1.0)
    b = _run(imgs, [7, 8], var=1.0)
    assert np.abs(a - b).mean() > 1.0
