"""Device-precision budgets on the REAL accelerator.

The main suite forces CPU (conftest.py), where f32 matmuls are exact and
the Precision enums are invisible — so the shipped TPU numerics (bf16x3
wavelet DWT, HIGHEST-precision roi_align einsums) were untested until
this file (ADVICE r3).  Opt-in:

    TPUDENOISE_TPU_TESTS=1 python -m pytest tests/test_tpu_numerics.py -q

Skipped automatically when the backend is CPU (i.e. in the normal run).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="real-accelerator numerics; run with TPUDENOISE_TPU_TESTS=1")


def test_wavelet_roundtrip_tpu_budget():
    """Single-level dec+rec error at Precision.HIGH (bf16x3) stays within
    the documented 6e-5 budget on [0,1] data (wavelet.py _PREC note)."""
    from tpudenoise.denoise.wavelet import dwt2, idwt2

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(96, 160).astype(np.float32))

    @jax.jit
    def roundtrip(x):
        aa, details = dwt2(x)
        return idwt2(aa, details, x.shape)

    err = float(jnp.max(jnp.abs(roundtrip(x) - x)))
    assert err <= 8e-5, f"TPU DWT round-trip error {err:.2e} > 8e-5 budget"


def test_crop_and_resize_tpu_precision():
    """The einsum crop_and_resize runs at Precision.HIGHEST on device:
    max deviation from the exact f64 host computation must be at f32
    rounding scale (~1e-5 of feature magnitude), NOT the ~2^-8 bf16
    scale that Precision.DEFAULT would give (ADVICE r3 medium)."""
    from tpudenoise.ops.roi_align import crop_and_resize

    rng = np.random.RandomState(0)
    h, w, c = 38, 64, 32
    feat = rng.randn(h, w, c).astype(np.float32)
    r = 64
    y1 = rng.rand(r) * 0.6
    x1 = rng.rand(r) * 0.6
    boxes = np.stack([y1, x1, y1 + 0.3 * rng.rand(r) + 0.05,
                      x1 + 0.3 * rng.rand(r) + 0.05], axis=1)
    out = np.asarray(crop_and_resize(jnp.asarray(feat),
                                     jnp.asarray(boxes.astype(np.float32)),
                                     7))

    # exact f64 oracle of the same separable-matmul semantics
    def weights(coords, size):
        valid = (coords >= 0) & (coords <= size - 1)
        c0 = np.floor(coords)
        frac = coords - c0
        c0i = np.clip(c0, 0, size - 1).astype(np.int64)
        c1i = np.clip(c0i + 1, 0, size - 1)
        wm = np.zeros(coords.shape + (size,), np.float64)
        rr, ss = np.indices(coords.shape)
        wm[rr, ss, c0i] += 1.0 - frac
        wm[rr, ss, c1i] += frac
        return wm * valid[..., None]

    grid = np.arange(7, dtype=np.float64)
    by1, bx1, by2, bx2 = boxes.T
    in_y = by1[:, None] * (h - 1) + grid[None, :] * (
        (by2 - by1) * (h - 1) / 6)[:, None]
    in_x = bx1[:, None] * (w - 1) + grid[None, :] * (
        (bx2 - bx1) * (w - 1) / 6)[:, None]
    A = weights(in_y, h)
    B = weights(in_x, w)
    ref = np.einsum('riy,yxc->rixc', A, feat.astype(np.float64))
    ref = np.einsum('rixc,rjx->rijc', ref, B)

    err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 5e-5, (
        f"crop_and_resize rel err {err:.2e}: HIGHEST precision regressed "
        "(bf16 operand rounding would give ~4e-3)")


def test_fused_mix_kernel_compiled_stats():
    """The fused Pallas mix kernel COMPILED (not interpret-mode, which is
    what the CPU suite exercises): per-kind output domains and first
    moments on the real accelerator.  Guards Mosaic lowering regressions
    (u8 load hops, lane rolls, SMEM carry) that interpret mode cannot
    see."""
    from tpudenoise.noise.pallas_mix import fused_mix_noise
    from tpudenoise.noise.spec import Kind

    B, H, W = 2, 64, 128
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(np.full((B, H, W, 3), 128, np.uint8))
    seeds = jnp.asarray(rng.randint(0, 2**31, (B, 2)), jnp.int32)
    vals = jnp.full((B,), 256.0, jnp.float32)
    centers = jnp.zeros((B, 60), jnp.float32)
    bloom = jnp.zeros((B, 48, 8), jnp.float32)
    kinds = (int(Kind.ORIGINAL), int(Kind.GAUSSIAN), int(Kind.SAP),
             int(Kind.POISSON))

    def run(pos, level):
        br = jnp.full((B,), pos, jnp.int32)
        lv = jnp.full((B,), level, jnp.float32)
        return np.asarray(fused_mix_noise(
            imgs, br, lv, seeds, vals, centers, bloom, kinds))

    out = run(0, 0.0)                       # original: exact pass-through
    np.testing.assert_array_equal(out, np.full_like(out, 128.0))

    out = run(1, 0.1)                       # gaussian: [0,1] quirk domain
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert abs(out.mean() - 128.0 / 255.0) < 0.02
    assert abs(out.std() - np.sqrt(0.1)) < 0.05

    out = run(2, 0.4)                       # sap: ~20% salt / ~20% pepper
    f_salt = (out == 255.0).mean()
    f_pepper = (out == 0.0).mean()
    assert abs(f_salt - 0.2) < 0.02 and abs(f_pepper - 0.2) < 0.02

    out = run(3, 0.0)                       # poisson at lam ~128.5
    lam = 128.0 / 255.0 * 256.0
    ref_mean = np.trunc(255.0 * np.clip(
        np.random.RandomState(0).poisson(lam, 200000) / 256.0, 0, 1))
    assert abs(out.mean() - ref_mean.mean()) < 1.5
    assert abs(out.std() - ref_mean.std()) / ref_mean.std() < 0.1
