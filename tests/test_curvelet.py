"""Curvelet frame: tight-frame exactness and denoising behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from tpudenoise.denoise.curvelet import (_frame_denoise_channel,
                                         _wedge_windows,
                                         curvelet_denoise_u8)


def test_windows_partition_of_unity():
    wins = _wedge_windows(64, 96, 4, 16)
    total = np.sum(wins * wins, axis=0)
    np.testing.assert_allclose(total, 1.0, atol=1e-5)


def test_keep_all_is_identity():
    """keep=1.0 -> analysis+synthesis must reconstruct exactly (tight
    frame)."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (64, 96, 3)).astype(np.float32)
    out = np.asarray(curvelet_denoise_u8(img, keep=1.0))
    np.testing.assert_array_equal(out, img)


def test_band_count():
    # nbscales=4, nbangles=16: lowpass + 4+8+16 wedges = 29 bands
    wins = _wedge_windows(64, 64, 4, 16)
    assert wins.shape[0] == 1 + 4 + 8 + 16


def test_denoise_improves_psnr():
    rng = np.random.RandomState(1)
    clean = np.zeros((96, 96, 3), np.float32)
    clean[20:70, 30:80] = 180.0
    yy, xx = np.mgrid[0:96, 0:96]
    clean[..., 1] += 40 * np.sin(xx / 12.0)
    noisy = np.clip(clean + rng.randn(96, 96, 3) * 40, 0, 255
                    ).astype(np.float32)
    out = np.asarray(curvelet_denoise_u8(noisy, keep=0.1))

    def psnr(a, b):
        mse = np.mean((a - b) ** 2)
        return 10 * np.log10(255.0 ** 2 / mse)

    assert psnr(out, clean) > psnr(noisy, clean) + 1.5


def test_small_image_fallback():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (16, 24, 3)).astype(np.float32)
    out = np.asarray(curvelet_denoise_u8(img, keep=0.5))
    assert out.shape == img.shape
    assert out.min() >= 0 and out.max() <= 255
