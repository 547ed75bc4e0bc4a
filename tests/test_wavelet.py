"""Wavelet denoiser: perfect-reconstruction of the bior1.5 bank, subband
behavior, and end-to-end denoising quality."""

import jax
import numpy as np
import pytest

from tpudenoise.denoise import wavelet as W


def test_filter_bank_dc_gain():
    # lowpass analysis DC gain = sqrt(2); highpass kills DC
    assert abs(W.DEC_LO.sum() - np.sqrt(2)) < 1e-6
    assert abs(W.DEC_HI.sum()) < 1e-7
    assert abs(W.REC_LO.sum() - np.sqrt(2)) < 1e-6
    assert abs(W.REC_HI.sum()) < 1e-7


@pytest.mark.parametrize('n', [64, 100, 37, 128])
def test_dwt_1d_perfect_reconstruction(n):
    rng = np.random.RandomState(0)
    x = rng.randn(3, n).astype(np.float32)
    lo, hi = W._analysis_1d(x, axis=1)
    assert lo.shape[1] == (n + W._L - 1) // 2  # pywt length convention
    y = np.asarray(W._synthesis_1d(lo, hi, n, axis=1))
    np.testing.assert_allclose(y, x, atol=2e-5)


@pytest.mark.parametrize('shape', [(64, 96), (101, 67)])
def test_dwt2_perfect_reconstruction(shape):
    rng = np.random.RandomState(1)
    x = rng.randn(*shape).astype(np.float32)
    aa, d = W.dwt2(x)
    y = np.asarray(W.idwt2(aa, d, shape))
    np.testing.assert_allclose(y, x, atol=2e-5)


def test_wavedec2_multilevel_roundtrip():
    rng = np.random.RandomState(2)
    x = rng.randn(96, 160).astype(np.float32)
    a, coeffs, shapes = W.wavedec2(x, levels=3)
    y = np.asarray(W.waverec2(a, coeffs, shapes))
    np.testing.assert_allclose(y, x, atol=5e-5)


def test_constant_image_lands_in_approx():
    x = np.full((64, 64), 0.7, np.float32)
    aa, (ad, da, dd) = W.dwt2(x)
    # interior approx = 0.7 * 2 (sqrt2 per axis); details ~ 0
    assert abs(np.asarray(aa)[8:-8, 8:-8].mean() - 1.4) < 1e-4
    assert np.abs(np.asarray(dd)).max() < 1e-5


def test_default_levels_matches_skimage_rule():
    # 600x1000, dec_len 10: dwt_max_level = 6 each -> 6-3 = 3
    assert W.default_levels(600, 1000) == 3
    assert W.default_levels(64, 64) == 1   # max(2-3,1)


def test_denoise_improves_psnr():
    rng = np.random.RandomState(3)
    # piecewise-smooth image + gaussian noise
    clean = np.zeros((128, 128, 3), np.float32)
    clean[:, :64] = 0.3
    clean[40:90, 30:100] = 0.8
    yy, xx = np.mgrid[0:128, 0:128]
    clean[..., 2] = 0.5 + 0.3 * np.sin(xx / 20.0)
    noisy = np.clip(clean + rng.randn(128, 128, 3) * 0.15, 0, 1
                    ).astype(np.float32)
    out = np.asarray(W.denoise_wavelet(noisy))

    def psnr(a, b):
        mse = np.mean((a - b) ** 2)
        return 10 * np.log10(1.0 / mse)

    p_noisy = psnr(noisy, clean)
    p_out = psnr(np.clip(out, 0, 1), clean)
    assert p_out > p_noisy + 2.0  # meaningful denoising


def test_denoise_identity_on_clean_image():
    x = np.tile(np.linspace(0.2, 0.8, 64, dtype=np.float32)[None, :, None],
                (64, 1, 3))
    out = np.asarray(W.denoise_wavelet(x))
    # noise-free smooth image: sigma ~ 0 -> nearly unchanged
    assert np.abs(out - x).max() < 0.02


def test_denoise_batch_vmap():
    rng = np.random.RandomState(4)
    batch = rng.rand(2, 64, 96, 3).astype(np.float32)
    out = jax.vmap(lambda im: W.denoise_wavelet(im, levels=2))(batch)
    assert out.shape == batch.shape


def test_median_nonneg_matches_jnp_median():
    import jax.numpy as jnp
    """Bit-prefix rank selection == jnp.median bit-for-bit on non-negative
    floats: odd/even lengths, heavy duplicates, zeros."""
    rng = np.random.RandomState(11)
    for n in (7, 8, 1001, 1000):
        rows = [rng.rand(n).astype(np.float32),
                np.repeat(rng.rand(n // 7 + 1).astype(np.float32),
                          7)[:n],
                np.zeros(n, np.float32)]
        x = np.stack(rows)
        got = np.asarray(W._median_nonneg(jnp.asarray(x)))
        want = np.median(x, axis=-1).astype(np.float32)
        np.testing.assert_array_equal(got, want)


def test_denoise_wavelet_batched_matches_per_image():
    import jax.numpy as jnp
    rng = np.random.RandomState(5)
    batch = rng.rand(3, 64, 96, 3).astype(np.float32)
    a = np.asarray(W.denoise_wavelet_batched(jnp.asarray(batch)))
    b = np.asarray(jax.vmap(W.denoise_wavelet)(jnp.asarray(batch)))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_band_matrices_match_slice_formulation():
    """The MXU band-matrix analysis/synthesis must reproduce the
    shifted-slice formulation exactly (both formulations kept; the slice
    path is the executable spec of the phase/extension conventions)."""
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    for h, w in [(57, 83), (64, 96)]:
        x = jnp.asarray(rng.rand(2, h, w).astype(np.float32))
        lo_r, hi_r = W._analysis_1d(x, -1)
        m = lo_r.shape[-1]
        am = jnp.asarray(W._analysis_matrix(w))
        both = jnp.einsum('wn,...w->...n', am, x,
                          precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(both[..., :m]),
                                   np.asarray(lo_r), atol=2e-6)
        np.testing.assert_allclose(np.asarray(both[..., m:]),
                                   np.asarray(hi_r), atol=2e-6)
        y_r = W._synthesis_1d(lo_r, hi_r, w, axis=-1)
        sm = jnp.asarray(W._synthesis_matrix(m, w))
        y_m = jnp.einsum('mn,...m->...n', sm,
                         jnp.concatenate([lo_r, hi_r], -1),
                         precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_r),
                                   atol=2e-6)


def test_masked_stats_match_exact_size_interior():
    """Bucketed-eval correctness: on an edge-replicate-padded canvas the
    BayesShrink statistics must mask to the valid region.  Without the
    mask the pad's near-zero detail coefficients collapse the sigma
    median and the pass silently becomes a no-op (the ref computes all
    statistics at the exact image size, test.py:197-289)."""
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    h, w = 96, 144
    bkt = (160, 224)
    yy, xx = np.mgrid[0:h, 0:w]
    clean = (0.5 + 0.3 * np.sin(yy / 17.0) * np.cos(xx / 23.0))
    clean = np.stack([clean] * 3, -1).astype(np.float32)
    img = (clean + rng.normal(0, 0.08, (h, w, 3))).astype(np.float32)
    pad = np.pad(img, ((0, bkt[0] - h), (0, bkt[1] - w), (0, 0)),
                 mode='edge')

    lv = W.default_levels(h, w)
    exact = np.asarray(W.denoise_wavelet(jnp.asarray(img), levels=lv))
    masked = np.asarray(W.denoise_wavelet(
        jnp.asarray(pad), levels=lv,
        hw=jnp.asarray([h, w], jnp.int32)))[:h, :w]
    unmasked = np.asarray(W.denoise_wavelet(jnp.asarray(pad),
                                            levels=lv))[:h, :w]

    m = 16
    sl = (slice(m, h - m), slice(m, w - m))
    err_masked = np.abs(masked[sl] - exact[sl]).max()
    err_unmasked = np.abs(unmasked[sl] - exact[sl]).max()
    # calibrated: 0.025 vs 0.319 (the unmasked pass returns the noisy
    # input unchanged)
    assert err_masked < 0.05
    assert err_unmasked > 5 * err_masked
    # the masked pass actually denoises; the unmasked one did nothing
    assert (np.abs(masked[sl] - clean[sl]).mean()
            < 0.7 * np.abs(img[sl] - clean[sl]).mean())
    assert np.abs(unmasked - img).max() < 1e-5

    # the batched planar entry matches the per-image masked path exactly
    mb = np.asarray(W.denoise_wavelet_batched(
        jnp.asarray(pad)[None], levels=lv,
        hw=jnp.asarray([[h, w]], jnp.int32)))[0, :h, :w]
    np.testing.assert_array_equal(mb, masked)


def test_masked_median_matches_subset_median():
    """_median_nonneg_masked == jnp.median over the valid prefix, for odd
    and even valid counts, with garbage in the pad tail."""
    import jax.numpy as jnp
    rng = np.random.RandomState(1)
    n = 64
    for nv in (33, 34, 63, 64, 1, 2):
        x = rng.rand(3, n).astype(np.float32)
        mask = np.zeros((3, n), bool)
        mask[:, :nv] = True
        got = np.asarray(W._median_nonneg_masked(
            jnp.asarray(x), jnp.asarray(mask),
            jnp.full((3,), nv, np.int32)))
        want = np.median(x[:, :nv], axis=-1)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
