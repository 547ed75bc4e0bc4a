"""Pallas fused kernel: correctness vs the reference XLA path.

Runs in interpret mode on CPU (the compiled path is exercised on real TPU
by bench.py); median/border behavior must be bit-exact given the same
noisy image, and the s&p statistics must match the Bernoulli law.
"""

import jax
import numpy as np
import pytest

from tpudenoise.denoise.stencils import median3
from tpudenoise.noise.pallas_kernels import fused_sap_median


@pytest.fixture
def imgs():
    rng = np.random.RandomState(3)
    return rng.randint(0, 256, (2, 48, 64, 3)).astype(np.float32)


def _run(images, seeds, amount=0.4, double=True, tile_h=16):
    return np.asarray(fused_sap_median(
        images, np.asarray(seeds, np.int32), amount, double,
        tile_h=tile_h, interpret=True))


def _reference_noisy(images, seeds, amount):
    """The hash-noise image computed in numpy (same hash math), for
    bit-exact median comparison."""
    def hash2d(iy, ix, seed):
        h = (iy.astype(np.uint32) * np.uint32(0x9E3779B9)
             ^ ix.astype(np.uint32) * np.uint32(0x85EBCA6B)
             ^ np.uint32(seed & 0xFFFFFFFF) * np.uint32(0xC2B2AE35))
        h ^= h >> np.uint32(16)
        h = (h * np.uint32(0x7FEB352D)) & np.uint32(0xFFFFFFFF)
        h ^= h >> np.uint32(15)
        h = (h * np.uint32(0x846CA68B)) & np.uint32(0xFFFFFFFF)
        h ^= h >> np.uint32(16)
        return h

    b, h, w, _ = images.shape
    w3 = w * 3
    iy = np.tile(np.arange(h, dtype=np.int64)[:, None], (1, w3))
    ix = np.tile(np.arange(w3, dtype=np.int64)[None, :], (h, 1))
    out = []
    old = np.seterr(over='ignore')
    for i in range(b):
        flat = images[i].reshape(h, w3).copy()
        bf = hash2d(iy, ix, int(seeds[i]))
        thresh = np.uint32(int(amount * 4294967296.0))
        # single hash: high bits drive the flip decision, bit 0 the
        # salt-vs-pepper coin (mirrors the kernel)
        flipped = bf < thresh
        salted = (bf & np.uint32(1)) == 1
        flat[flipped & salted] = 255.0
        flat[flipped & ~salted] = 0.0
        out.append(flat.reshape(h, w, 3))
    np.seterr(**old)
    return np.stack(out)


def test_fused_matches_median_of_hash_noise(imgs):
    seeds = np.array([7, 42])
    got = _run(imgs, seeds, amount=0.4, double=True)
    noisy = _reference_noisy(imgs, seeds, 0.4)
    want = np.asarray(jax.vmap(lambda im: median3(median3(im)))(noisy))
    np.testing.assert_array_equal(got, want)


def test_fused_single_filter(imgs):
    seeds = np.array([7, 42])
    got = _run(imgs, seeds, amount=0.2, double=False)
    noisy = _reference_noisy(imgs, seeds, 0.2)
    want = np.asarray(jax.vmap(median3)(noisy))
    np.testing.assert_array_equal(got, want)


def test_hash_noise_statistics():
    imgs = np.full((1, 64, 96, 3), 128.0, np.float32)
    noisy = _reference_noisy(imgs, [123], 0.4)
    flipped = noisy != 128.0
    assert abs(flipped.mean() - 0.4) < 0.02
    ones = (noisy == 255.0).sum()
    zeros = (noisy == 0.0).sum()
    assert abs(ones / (ones + zeros) - 0.5) < 0.02
    # independence across seeds
    noisy2 = _reference_noisy(imgs, [124], 0.4)
    agree = ((noisy == 255) & (noisy2 == 255)).mean()
    assert abs(agree - 0.04) < 0.01  # 0.2 * 0.2


def test_tile_partition_invariance(imgs):
    """Different tile heights must give identical output (halo noise
    consistency via the coordinate-stable hash)."""
    seeds = np.array([5, 6])
    a = _run(imgs, seeds, tile_h=16)
    b = _run(imgs, seeds, tile_h=48)
    np.testing.assert_array_equal(a, b)


def test_non_divisible_height():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (1, 50, 40, 3)).astype(np.float32)
    seeds = np.array([9])
    got = _run(imgs, seeds, tile_h=16)
    noisy = _reference_noisy(imgs, seeds, 0.4)
    want = np.asarray(jax.vmap(lambda im: median3(median3(im)))(noisy))
    np.testing.assert_array_equal(got, want)


def test_gauss_per_image_sigma_matches_static_var():
    """The per-image sigma (scalar-prefetch) path must equal running each
    image separately with its level as the static var — the randomized
    gaussian level quirk is per IMAGE (ref test.py:1678-1682)."""
    import jax.numpy as jnp
    from tpudenoise.noise.pallas_kernels import fused_gaussian_blur
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (2, 48, 64, 3)).astype(np.float32)
    seeds = np.asarray([3, 11], np.int32)
    sig = jnp.sqrt(jnp.asarray([0.1, 1.5], jnp.float32))
    got = np.asarray(fused_gaussian_blur(
        imgs, seeds, var=0.1, double_filter=True, tile_h=16,
        interpret=True, sigmas=sig))
    want = np.concatenate([
        np.asarray(fused_gaussian_blur(
            imgs[:1], seeds[:1], var=0.1, double_filter=True, tile_h=16,
            interpret=True)),
        np.asarray(fused_gaussian_blur(
            imgs[1:], seeds[1:], var=1.5, double_filter=True, tile_h=16,
            interpret=True))])
    np.testing.assert_array_equal(got, want)


def test_u8_io_matches_f32(imgs):
    """uint8-I/O kernels (what the production pipeline and bench run) must
    be bit-identical to the f32 path: compute is f32 in registers either
    way, only the DMA dtype differs."""
    from tpudenoise.noise.pallas_kernels import (fused_gaussian_blur,
                                                 fused_sap_median_batched)
    seeds = np.asarray([7, 42], np.int32)
    f32 = np.asarray(fused_sap_median_batched(
        imgs, seeds, 0.4, True, tile_h=16, interpret=True))
    u8 = np.asarray(fused_sap_median_batched(
        imgs.astype(np.uint8), seeds, 0.4, True, tile_h=16,
        interpret=True))
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(f32, u8.astype(np.float32))

    f32g = np.asarray(fused_gaussian_blur(
        imgs, seeds, var=0.1, double_filter=True, tile_h=16,
        interpret=True))
    u8g = np.asarray(fused_gaussian_blur(
        imgs.astype(np.uint8), seeds, var=0.1, double_filter=True,
        tile_h=16, interpret=True))
    assert u8g.dtype == np.uint8
    np.testing.assert_array_equal(f32g, u8g.astype(np.float32))


# ---------------------------------------------------------------- bloom --

def test_bloom_params_scan_matches_reference():
    """bloom_apply_scan(bloom_params(...)) must be bit-identical to the
    in-scan drawing bloom() — same jax.random ops, refactored out."""
    import jax
    import jax.numpy as jnp
    from tpudenoise.noise.generators import (bloom, bloom_apply_scan,
                                             bloom_params)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 256, (120, 160, 3))
                      .astype(np.float32))
    for seed in (0, 5):
        key = jax.random.PRNGKey(seed)
        want = np.asarray(bloom(key, img))
        got = np.asarray(bloom_apply_scan(
            img, bloom_params(key, 120, 160)))
        np.testing.assert_array_equal(got, want)
    # masked variant parity
    hw = jnp.asarray([100, 140], jnp.int32)
    key = jax.random.PRNGKey(2)
    want = np.asarray(bloom(key, img, hw=hw))
    got = np.asarray(bloom_apply_scan(img, bloom_params(key, 120, 160,
                                                        hw=hw)))
    np.testing.assert_array_equal(got, want)


def test_bloom_pallas_interpret_matches_scan():
    """The single-pass Pallas compositor == the XLA scan consumer,
    bit-exact in interpret mode, incl. a non-tile-aligned height."""
    import jax
    import jax.numpy as jnp
    from tpudenoise.noise.generators import bloom_apply_scan, bloom_params
    from tpudenoise.noise.pallas_bloom import bloom_pallas
    rng = np.random.RandomState(1)
    for h, w in [(128, 160), (90, 160)]:
        img = jnp.asarray(rng.randint(0, 256, (h, w, 3))
                          .astype(np.float32))
        params = bloom_params(jax.random.PRNGKey(7), h, w)
        want = np.asarray(bloom_apply_scan(img, params))
        got = np.asarray(bloom_pallas(img, params, interpret=True))
        np.testing.assert_array_equal(got, want)


def test_bloom_pipeline_pallas_parity(monkeypatch):
    """make_pipeline(use_pallas=True) routes bloom through the Pallas
    compositor; equal to the XLA path (interpret mode on CPU), incl. the
    masked bucket path."""
    import functools
    import jax
    import jax.numpy as jnp
    import tpudenoise.noise.pallas_bloom as pb
    from tpudenoise.noise import pipeline as pipe
    monkeypatch.setattr(pb, 'bloom_pallas',
                        functools.partial(pb.bloom_pallas, interpret=True))
    rng = np.random.RandomState(0)
    im = jnp.asarray(rng.randint(0, 256, (2, 70, 96, 3))
                     .astype(np.float32))
    a = pipe.make_pipeline('bloom', mode='TEST', use_pallas=False)(
        jax.random.PRNGKey(0), im)
    b = pipe.make_pipeline('bloom', mode='TEST', use_pallas=True)(
        jax.random.PRNGKey(0), im)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(0), i))(jnp.arange(2))
    am = pipe.make_pipeline('bloom', mode='TEST', use_pallas=False).masked(
        keys, im, jnp.asarray([[60, 80]] * 2, jnp.int32))
    bm = pipe.make_pipeline('bloom', mode='TEST', use_pallas=True).masked(
        keys, im, jnp.asarray([[60, 80]] * 2, jnp.int32))
    np.testing.assert_array_equal(np.asarray(am), np.asarray(bm))
