"""Noise generator semantics tests.

RNGs differ from numpy/scipy, so parity is statistical: distribution
moments, clipping rules and the uint8 round-trip semantics re-derived from
skimage.util.random_noise / scipy.stats (SURVEY.md §7 stage 2).
"""

import jax
import numpy as np
import pytest
import scipy.stats as st

from tpudenoise.noise import generators as G
from tpudenoise.noise.spec import (Denoise, Kind, parse)


KEY = jax.random.PRNGKey(3)


@pytest.fixture
def img_u8():
    rng = np.random.RandomState(3)
    return rng.randint(0, 256, (64, 96, 3)).astype(np.float32)


# ------------------------------------------------------------- casts ------

def test_wrap_cast_matches_numpy_astype():
    vals = np.array([-3.2, -0.5, 0.0, 0.9, 255.0, 255.9, 258.7, 512.2,
                     -257.5, 1000.4], dtype=np.float64)
    want = vals.astype(np.uint8).astype(np.float32)
    got = np.asarray(G.wrap_cast_u8(vals.astype(np.float32)))
    np.testing.assert_array_equal(got, want)


def test_saturate_matches_cv2_saturate_cast():
    import cv2
    a = np.array([[250, 200, 3]], np.uint8)
    b = np.array([[10, 100, 250]], np.uint8)
    want = cv2.add(a, b).astype(np.float32)
    got = np.asarray(G.saturate_u8(a.astype(np.float32)
                                   + b.astype(np.float32)))
    np.testing.assert_array_equal(got, want)


# --------------------------------------------------------- generators -----

def test_gaussian_moments_and_clip(img_u8):
    x01 = np.asarray(G.to_unit(img_u8))
    out = np.asarray(G.gaussian(KEY, x01, var=0.1))
    assert out.min() >= 0.0 and out.max() <= 1.0
    # unclipped region: recompute noise on mid-gray to check sigma
    mid = np.full_like(x01, 0.5)
    out_mid = np.asarray(G.gaussian(KEY, mid, var=0.01))
    assert abs(out_mid.std() - 0.1) < 0.005
    assert abs(out_mid.mean() - 0.5) < 0.005


def test_u8_unique_count_exact():
    """The fused 256-bit-presence count == numpy's unique over edge
    cases (single value, dense low range, full range, sparse words)."""
    rng = np.random.RandomState(5)
    cases = [np.zeros((8, 8, 3), np.float32),
             np.full((8, 8, 3), 255.0, np.float32),
             rng.randint(0, 7, (16, 16, 3)).astype(np.float32),
             rng.randint(0, 256, (40, 50, 3)).astype(np.float32),
             (rng.randint(0, 8, (16, 16, 3)) * 33).astype(np.float32)]
    for im in cases:
        got = int(G._u8_unique_count(jax.numpy.asarray(im)))
        assert got == len(np.unique(im.astype(np.uint8)))


def test_poisson_vals_from_unique_count(img_u8):
    x01 = G.to_unit(img_u8)
    out = np.asarray(G.poisson(KEY, x01, img_u8))
    assert out.min() >= 0.0 and out.max() <= 1.0
    # skimage semantics: vals = 2**ceil(log2(unique)); 256 unique -> 256;
    # Poisson(x*256)/256 has std sqrt(x/256) ~ 0.044 at x=0.5
    mid_u8 = np.full((64, 96, 3), 128.0, np.float32)
    out_mid = np.asarray(G.poisson(KEY, G.to_unit(mid_u8), mid_u8))
    # only ONE unique value -> vals = 1 -> Poisson(0.502)/1: integers!
    assert set(np.unique(out_mid)).issubset({0.0, 1.0})
    # realistic image: many unique values
    lam_scale = 256.0
    expect_std = np.sqrt(0.5 / lam_scale)
    mid2 = np.tile(np.arange(256, dtype=np.float32), 72).reshape(64, 96, 3)
    out2 = np.asarray(G.poisson(KEY, G.to_unit(mid2), mid2))
    sel = (mid2 == 128.0)
    assert abs(out2[sel].std() - expect_std) < 0.01


def test_sap_fractions(img_u8):
    x01 = G.to_unit(img_u8)
    amount = 0.4
    out = np.asarray(G.salt_and_pepper(KEY, x01, amount))
    x = np.asarray(x01)
    flipped = out != x
    assert abs(flipped.mean() - amount * (1 - (x01.size and 0))) < 0.02
    ones = (out == 1.0) & flipped
    zeros = (out == 0.0) & flipped
    assert abs(ones.sum() / flipped.sum() - 0.5) < 0.03
    assert np.all(ones | zeros | ~flipped)


def test_speckle_variance_scales_with_signal(img_u8):
    x01 = np.full((64, 96, 3), 0.5, np.float32)
    out = np.asarray(G.speckle(KEY, x01, var=0.04))
    # x + x*n: std = 0.5 * 0.2 = 0.1
    assert abs(out.std() - 0.1) < 0.01


def test_uniform_no_clip(img_u8):
    x01 = G.to_unit(img_u8)
    out = np.asarray(G.uniform_add(KEY, x01, high=1.2))
    assert out.max() > 1.0  # cv2.add on float does not saturate
    d = out - np.asarray(x01)
    assert d.min() >= 0.0 and d.max() <= 1.2
    assert abs(d.mean() - 0.6) < 0.02


def test_gamma_moments(img_u8):
    x01 = np.zeros((64, 96, 3), np.float32)
    scale, a = 0.1, 1.99
    out = np.asarray(G.gamma_add(KEY, x01, scale, a))
    m, v = st.gamma.stats(a, scale=scale, moments='mv')
    assert abs(out.mean() - m) < 0.01
    assert abs(out.var() - v) < 0.01


def test_rayleigh_moments(img_u8):
    x01 = np.zeros((64, 96, 3), np.float32)
    scale = 0.2
    out = np.asarray(G.rayleigh_add(KEY, x01, scale))
    m, v = st.rayleigh.stats(scale=scale, moments='mv')
    assert abs(out.mean() - m) < 0.01
    assert abs(out.var() - v) < 0.005


def test_brownian_matches_numpy_reference(img_u8):
    """Structure check vs the reference's recipe on a tiny image: B wraps to
    pseudo-random u8 texture; output is saturating add (test.py:905-1126)."""
    out = np.asarray(G.brownian(KEY, img_u8, dt=0.9))
    assert out.min() >= 0 and out.max() <= 255
    assert np.all(out >= img_u8)  # noise is non-negative u8 added


def test_fast_bits_elementwise_moments(img_u8):
    """fast_bits=True reroutes the elementwise generators through the
    counter-hash bitstream (generators.py salt registry).  Same
    distributions as the threefry path (moments pinned below), but a
    DIFFERENT stream — assert both, so a silently-ignored flag or a
    broken hash path fails loudly."""
    shape = (64, 96, 3)
    mid = np.full(shape, 0.5, np.float32)

    out = np.asarray(G.gaussian(KEY, mid, var=0.01, fast_bits=True))
    slow = np.asarray(G.gaussian(KEY, mid, var=0.01))
    assert abs(out.std() - 0.1) < 0.005
    assert abs(out.mean() - 0.5) < 0.005
    assert not np.allclose(out, slow)

    out = np.asarray(G.speckle(KEY, mid, var=0.04, fast_bits=True))
    assert abs(out.std() - 0.1) < 0.01  # x + x*n at x=0.5: 0.5*0.2

    x01 = G.to_unit(img_u8)
    out = np.asarray(G.salt_and_pepper(KEY, x01, 0.4, fast_bits=True))
    flipped = out != np.asarray(x01)
    assert abs(flipped.mean() - 0.4) < 0.02
    ones = (out == 1.0) & flipped
    assert abs(ones.sum() / flipped.sum() - 0.5) < 0.03

    out = np.asarray(G.uniform_add(KEY, x01, high=1.2, fast_bits=True))
    d = out - np.asarray(x01)
    assert d.min() >= 0.0 and d.max() <= 1.2
    assert abs(d.mean() - 0.6) < 0.02

    zeros = np.zeros(shape, np.float32)
    out = np.asarray(G.rayleigh_add(KEY, zeros, 0.2, fast_bits=True))
    m, v = st.rayleigh.stats(scale=0.2, moments='mv')
    assert abs(out.mean() - m) < 0.01
    assert abs(out.var() - v) < 0.005

    out = np.asarray(G.brownian(KEY, img_u8, dt=0.9, fast_bits=True))
    assert out.min() >= 0 and out.max() <= 255
    assert np.all(out >= img_u8)
    assert not np.allclose(out, np.asarray(G.brownian(KEY, img_u8,
                                                      dt=0.9)))


def test_periodic_matches_numpy_reference(img_u8):
    h, w, _ = img_u8.shape
    n = img_u8.size
    t = np.linspace(-np.pi, np.pi, n)
    noise_ref = (np.sin(t) * 255).astype(np.uint8).reshape(h, w, 3)
    import cv2
    want = cv2.add(img_u8.astype(np.uint8), noise_ref).astype(np.float32)
    got = np.asarray(G.periodic(KEY, img_u8, 3.14159265358979))
    # f32 sin vs f64 oracle: a handful of pixels sit exactly on a
    # truncation boundary — allow <=1 step on <0.1% of pixels
    diff = np.abs(got - want)
    assert diff.max() <= 1.0
    assert (diff > 0).mean() < 1e-3


def test_shader(img_u8):
    out = np.asarray(G.shader(img_u8))
    import cv2
    want = cv2.add(cv2.add(img_u8.astype(np.uint8), img_u8.astype(np.uint8)),
                   img_u8.astype(np.uint8)).astype(np.float32)[..., ::-1]
    np.testing.assert_array_equal(out, want)


def test_bloom_runs_and_brightens():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 100, (128, 128, 3)).astype(np.float32)
    out = np.asarray(G.bloom(KEY, img))
    assert out.shape == img.shape
    assert out.min() >= 0 and out.max() <= 255
    # flare source at (100,100) must brighten that region
    assert out[95:105, 95:105].mean() > img[95:105, 95:105].mean() + 50


def test_quant_palette_size():
    from tpudenoise.noise.kmeans import quantize_colors
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (48, 64, 3)).astype(np.float32)
    out = np.asarray(quantize_colors(KEY, img, k=3))
    # after LAB->BGR roundtrip the palette stays tiny (<= k distinct colors)
    colors = np.unique(out.reshape(-1, 3), axis=0)
    assert len(colors) <= 3


# ------------------------------------------------------------- parser -----

def test_parse_single():
    p = parse('speckle_median_var1.0')
    assert len(p.specs) == 1
    s = p.specs[0]
    assert s.kind == Kind.SPECKLE and s.level == 1.0
    assert s.denoise == Denoise.MEDIAN
    # train-pipeline default double-applies the filter as post-pass
    assert p.post_denoise == Denoise.MEDIAN


def test_parse_gaussian_randomized_level():
    p = parse('gaussian_var0.1')
    assert p.specs[0].is_random_level
    assert p.specs[0].unit_float_output
    p2 = parse('gaussian_gaus_blur_var0.1')
    assert not p2.specs[0].unit_float_output
    assert p2.specs[0].denoise == Denoise.GAUS_BLUR


def test_parse_strict_test_quirks():
    p = parse('sap_var0.4', mode='TEST', strict_ref=True)
    assert p.specs[0].kind == Kind.ORIGINAL  # test.py:1691-1697
    p = parse('quant_var7', mode='TEST', strict_ref=True)
    assert p.specs[0].kind == Kind.ORIGINAL
    p = parse('sap_var0.4', mode='TRAIN', strict_ref=True)
    assert p.specs[0].kind == Kind.SAP and p.specs[0].level == 0.4


def test_parse_mix():
    p = parse('noise_mix_var_low', mode='TEST')
    assert len(p.specs) == 13
    kinds = {s.kind for s in p.specs}
    assert Kind.QUANT in kinds and Kind.BLOOM in kinds
    # train mix maps bloom -> shader (minibatch.py:1572-1573)
    pt = parse('noise_mix_var_low', mode='TRAIN')
    assert Kind.BLOOM not in {s.kind for s in pt.specs}


def test_parse_unknown_fallback():
    p = parse('totally_new_noise')
    s = p.specs[0]
    assert s.kind == Kind.GAUSSIAN and s.level == 0.1
    assert s.denoise == Denoise.MEAN  # test.py:1757-1768


def test_parse_levels():
    assert parse('brownian_var0.09').specs[0].level == 0.09
    assert parse('brownian_var0.009').specs[0].level == 0.009
    assert parse('periodic_varsize').specs[0].level == -1.0
    assert parse('quant_var10').specs[0].level == 10
    assert parse('uniform_bilateral_var1.2').specs[0].denoise == \
        Denoise.BILATERAL


# ------------------------------------------------- fixed-round samplers --

def test_stirling_lgamma_matches_lax():
    """stirling_lgamma (8-step lift + Stirling series) vs lax.lgamma over
    the PTRS argument range (cand + 1 for lam in [10, 256] reaches a few
    sigma past lam): agreement to a few f32 ulps, relative."""
    import jax
    import jax.numpy as jnp
    from tpudenoise.noise.fast_samplers import stirling_lgamma
    z = jnp.concatenate([
        jnp.linspace(0.5, 20.0, 2001),
        jnp.linspace(20.0, 600.0, 2001),
        jnp.asarray([1.0, 2.0, 1e4, 1e6]),
    ])
    got = np.asarray(stirling_lgamma(z))
    want = np.asarray(jax.lax.lgamma(z.astype(jnp.float32)))
    # lgamma(1)=lgamma(2)=0: absolute tolerance floor for the zeros
    denom = np.maximum(np.abs(want), 1.0)
    assert np.max(np.abs(got - want) / denom) < 5e-6


def test_poisson_fixed_chi2_across_lam():
    """poisson_fixed (inverse-CDF < 10 <= PTRS) is distributionally exact:
    chi-square GoF vs scipy pmf across the split boundary and the u8 lam
    range (lam = pixel * vals <= 256)."""
    import jax
    import jax.numpy as jnp
    from tpudenoise.noise.fast_samplers import poisson_fixed
    key = jax.random.PRNGKey(0)
    n = 200_000
    for lam in (0.5, 9.5, 10.5, 256.0):
        out = np.asarray(poisson_fixed(key, jnp.full((n,), lam))).astype(int)
        assert (out >= 0).all()
        kmax = int(st.poisson(lam).ppf(1 - 1e-6)) + 2
        obs = np.bincount(out, minlength=kmax + 1)[:kmax + 1].astype(float)
        exp = st.poisson(lam).pmf(np.arange(kmax + 1)) * n
        m = exp > 20
        chi2 = ((obs[m] - exp[m]) ** 2 / exp[m]).sum()
        dof = int(m.sum()) - 1
        p = 1 - st.chi2(dof).cdf(chi2)
        assert p > 1e-4, (lam, chi2, dof, p)
    # lam=0 maps to exactly 0
    z = np.asarray(poisson_fixed(key, jnp.zeros((1000,))))
    np.testing.assert_array_equal(z, 0.0)


def test_gamma_fixed_matches_scipy():
    """Marsaglia-Tsang fixed-round gamma: KS vs scipy at the generator's
    shape (1.99) and a larger one."""
    import jax
    from tpudenoise.noise.fast_samplers import gamma_fixed
    key = jax.random.PRNGKey(1)
    for a in (1.99, 4.0):
        out = np.asarray(gamma_fixed(key, a, (200_000,)))
        assert (out > 0).all()
        ks = st.kstest(out, st.gamma(a).cdf).statistic
        assert ks < 0.01, (a, ks)


def test_poisson_fixed_fast_bits_chi2():
    """The counter-hash bitstream variant passes the same chi-square GoF
    as the threefry path (the stream differs, the distribution must
    not)."""
    import jax
    import jax.numpy as jnp
    from tpudenoise.noise.fast_samplers import poisson_fixed
    key = jax.random.PRNGKey(7)
    n = 200_000
    for lam in (0.5, 9.5, 10.5, 256.0):
        out = np.asarray(poisson_fixed(key, jnp.full((n,), lam),
                                       fast_bits=True)).astype(int)
        assert (out >= 0).all()
        kmax = int(st.poisson(lam).ppf(1 - 1e-6)) + 2
        obs = np.bincount(out, minlength=kmax + 1)[:kmax + 1].astype(float)
        exp = st.poisson(lam).pmf(np.arange(kmax + 1)) * n
        m = exp > 20
        chi2 = ((obs[m] - exp[m]) ** 2 / exp[m]).sum()
        dof = int(m.sum()) - 1
        p = 1 - st.chi2(dof).cdf(chi2)
        assert p > 1e-4, (lam, chi2, dof, p)
    # distinct keys give distinct streams; same key reproduces
    a = np.asarray(poisson_fixed(jax.random.PRNGKey(1),
                                 jnp.full((1000,), 64.0), fast_bits=True))
    b = np.asarray(poisson_fixed(jax.random.PRNGKey(2),
                                 jnp.full((1000,), 64.0), fast_bits=True))
    c = np.asarray(poisson_fixed(jax.random.PRNGKey(1),
                                 jnp.full((1000,), 64.0), fast_bits=True))
    assert (a != b).any()
    np.testing.assert_array_equal(a, c)


def test_gamma_fixed_fast_bits_ks():
    import jax
    from tpudenoise.noise.fast_samplers import gamma_fixed
    key = jax.random.PRNGKey(3)
    for a in (1.99, 4.0):
        out = np.asarray(gamma_fixed(key, a, (200_000,), fast_bits=True))
        assert (out > 0).all()
        ks = st.kstest(out, st.gamma(a).cdf).statistic
        assert ks < 0.01, (a, ks)


def test_pipeline_fast_rng_moments():
    """make_pipeline(fast_rng=True) reroutes the stochastic generators
    through the hash bitstream (spot-checked here on the sampler-heavy
    poisson/gamma; the elementwise kinds are covered by
    test_fast_bits_elementwise_moments): outputs keep the right
    distribution (moments) and differ streamwise from threefry."""
    import jax
    import jax.numpy as jnp
    from tpudenoise.noise.pipeline import make_pipeline
    rng = np.random.RandomState(0)
    img = rng.randint(30, 220, (2, 64, 80, 3)).astype(np.float32)
    key = jax.random.PRNGKey(5)
    for noise in ('poisson', 'gamma_var0.1'):
        slow = make_pipeline(noise, mode='TRAIN', use_pallas=False)
        fast = make_pipeline(noise, mode='TRAIN', use_pallas=False,
                             fast_rng=True)
        a = np.asarray(slow(key, jnp.asarray(img)))
        b = np.asarray(fast(key, jnp.asarray(img)))
        assert (a != b).any()  # different stream
        # same first two moments of the added noise
        np.testing.assert_allclose(b.mean(), a.mean(),
                                   rtol=0.02, atol=0.5)
        np.testing.assert_allclose((b - img).std(), (a - img).std(),
                                   rtol=0.05, atol=0.5)


def test_kmeans_palette_quality_vs_sklearn():
    """The quant palette fit (k-means++ init + 15 Lloyd iterations on an
    8192-point subsample) must stay within 10% of sklearn
    MiniBatchKMeans inertia on a real photo in LAB space — the
    data-driven basis for the iters=25->15 trim (kmeans.py docstring)."""
    import cv2
    from sklearn.cluster import MiniBatchKMeans

    from tpudenoise.noise.kmeans import kmeans
    from tpudenoise.ops.color import bgr_u8_to_lab_u8
    img = cv2.imread('data/demo/000456.jpg').astype(np.float32)
    lab = np.asarray(bgr_u8_to_lab_u8(jax.numpy.asarray(img)))
    pts = lab.reshape(-1, 3)
    sub = pts[np.random.RandomState(0).randint(0, len(pts), 20000)]

    def inertia(centers):
        d = ((sub[:, None, :] - centers[None]) ** 2).sum(-1)
        return float(d.min(1).mean())

    for k in (3, 7, 10):
        ref = inertia(MiniBatchKMeans(n_clusters=k, random_state=3,
                                      n_init=3).fit(sub).cluster_centers_)
        c, _ = kmeans(KEY, jax.numpy.asarray(pts), k=k)
        assert inertia(np.asarray(c)) <= 1.10 * ref, k


def test_hash_words_uses_full_64bit_seed():
    """Seed pairs that collide under the old initial-stage fold
    (s0*0xC2B2AE35 ^ s1*0x27D4EB2F equal) must now produce different
    streams: the 64-bit key's collision protection is only real if no
    32-bit linear combination of the words determines the output."""
    import jax.numpy as jnp
    from tpudenoise.noise.fast_samplers import _hash_words

    s0a, s1a = np.uint32(0x12345678), np.uint32(0x9ABCDEF0)
    # pick (s0b, s1b) != (s0a, s1a) with the same folded word:
    # changing s0 by d shifts the fold by d*C3; compensate via s1
    C3, C4 = 0xC2B2AE35, 0x27D4EB2F
    inv_C4 = pow(C4, -1, 2**32)
    s0b = np.uint32((int(s0a) + 1) & 0xFFFFFFFF)
    fold_a = (int(s0a) * C3 ^ int(s1a) * C4) & 0xFFFFFFFF
    # solve s1b * C4 = fold_a ^ s0b*C3 (mod 2^32; C4 odd => invertible)
    want = fold_a ^ ((int(s0b) * C3) & 0xFFFFFFFF)
    s1b = np.uint32((want * inv_C4) & 0xFFFFFFFF)
    # sanity: the OLD fold really collides for this pair
    fold_b = (int(s0b) * C3 ^ int(s1b) * C4) & 0xFFFFFFFF
    assert fold_a == fold_b and (s0a, s1a) != (s0b, s1b)

    ha = np.asarray(_hash_words((4096,), 7, jnp.asarray([s0a, s1a])))
    hb = np.asarray(_hash_words((4096,), 7, jnp.asarray([s0b, s1b])))
    assert (ha != hb).mean() > 0.99  # streams fully decorrelated
