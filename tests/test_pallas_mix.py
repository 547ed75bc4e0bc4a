"""Fused Pallas mix kernel (noise/pallas_mix.py) vs the XLA generators.

Runs in interpret mode on CPU (the compiled path is exercised on real TPU
by bench.py).  Deterministic kinds (periodic, shader, original, bloom,
quant-given-the-palette) must match the XLA generators exactly; stochastic
kinds share the entry-draw chain bit-exactly and are pinned statistically
(the RNG stream is the documented coordinate-hash trade, as for the
headline fused kernels).  Brownian's carried prefix is pinned bit-exactly
against a jnp replication of the hash increments and against itself across
tile partitions.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudenoise.noise import generators as G
from tpudenoise.noise.pallas_mix import (_hash_ctr, _u01_bits,
                                         fused_mix_bilateral,
                                         fused_mix_noise, mix_prologue,
                                         plan_tables)
from tpudenoise.noise.spec import Kind, NoiseSpec, parse

B, H, W = 3, 24, 40  # small geometry: interpret mode runs every op on CPU


@pytest.fixture
def imgs():
    rng = np.random.RandomState(3)
    return jnp.asarray(rng.randint(0, 256, (B, H, W, 3)), jnp.uint8)


def _params(batch=B, level=0.4, vals=256.0):
    """Per-image kernel params with fixed seeds (no prologue)."""
    branch = jnp.zeros((batch,), jnp.int32)
    levels = jnp.full((batch,), level, jnp.float32)
    seeds = jnp.asarray([[7 + i, 1000 + i] for i in range(batch)],
                        jnp.int32)
    valsa = jnp.full((batch,), vals, jnp.float32)
    centers = jnp.zeros((batch, 60), jnp.float32)
    bloom = jnp.zeros((batch, 48, 8), jnp.float32)
    return branch, levels, seeds, valsa, centers, bloom


def _run_kind(imgs, kind, level=0.4, tile_h=8, vals=256.0,
              centers=None, bloom=None):
    branch, levels, seeds, valsa, c0, b0 = _params(imgs.shape[0], level,
                                                   vals)
    return fused_mix_noise(
        imgs, branch, levels, seeds, valsa,
        c0 if centers is None else centers,
        b0 if bloom is None else bloom,
        kinds=(int(kind),), tile_h=tile_h, interpret=True)


# ------------------------------------------------- deterministic kinds --

def test_original_passthrough(imgs):
    out = _run_kind(imgs, Kind.ORIGINAL)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(imgs, np.float32))


def test_periodic_matches_xla(imgs):
    """Same formula as generators.periodic; interpret mode evaluates
    op-by-op while the jitted XLA generator FMA-contracts `-a + idx*step`,
    so `t` can differ by one ulp — flipping trunc(sin(t)*255) by one step
    where sin*255 sits on an integer (measured 0.7% of elements at the
    varsize amplitude).  Identical math, contraction-level tolerance."""
    for level in (3.14159265358979, 100.0, -1.0):
        got = np.asarray(_run_kind(imgs, Kind.PERIODIC, level=level))
        want = np.asarray(jax.vmap(lambda im: G.periodic(
            None, im.astype(jnp.float32), level))(imgs))
        assert np.mean(got != want) < 0.02
        assert np.abs(got - want).max() <= 1.0


def test_shader_bitexact_vs_xla(imgs):
    got = _run_kind(imgs, Kind.SHADER)
    want = jax.vmap(lambda im: G.shader(im.astype(jnp.float32)))(imgs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bloom_bitexact_vs_xla(imgs):
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    params = jax.vmap(lambda k: G.bloom_params(k, H, W))(keys)
    got = _run_kind(imgs, Kind.BLOOM, bloom=params)
    want = jax.vmap(lambda im, p: G.bloom_apply_scan(
        im.astype(jnp.float32), p))(imgs, params)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quant_matches_xla_palette(imgs):
    """Same fitted centers as quantize_colors (the prologue replicates its
    key chain — see test_prologue below); given the palette the map is the
    same argmin up to f32 distance-form rounding on near-ties."""
    from tpudenoise.noise.kmeans import quantize_colors
    from tpudenoise.ops.color import bgr_u8_to_lab_u8, lab_u8_to_bgr_u8
    from tpudenoise.noise.kmeans import kmeans

    key = jax.random.PRNGKey(11)
    k = 7
    img = imgs[0].astype(jnp.float32)
    want = np.asarray(quantize_colors(key, img, k))

    lab = bgr_u8_to_lab_u8(img)
    pts = lab.reshape(-1, 3)
    centers, _ = kmeans(key, pts, k=k)
    centers_u8 = jnp.trunc(jnp.clip(centers, 0.0, 255.0))
    bgr = lab_u8_to_bgr_u8(centers_u8)
    c60 = jnp.zeros((1, 60), jnp.float32)
    c60 = c60.at[0, :k * 6].set(
        jnp.concatenate([centers, bgr], axis=1).reshape(-1))
    c60 = c60.at[0, k * 6::6].set(1e9)
    c60 = c60.at[0, k * 6 + 1::6].set(1e9)
    c60 = c60.at[0, k * 6 + 2::6].set(1e9)

    got = np.asarray(_run_kind(imgs[:1], Kind.QUANT, centers=c60))[0]
    # every output pixel is a palette color...
    palette = {tuple(row) for row in np.asarray(bgr)}
    colors = {tuple(px) for px in got.reshape(-1, 3)}
    assert colors <= palette
    # ...and near-ties aside, the map matches the XLA assignment
    mismatch = np.mean(np.any(got != want, axis=-1))
    assert mismatch < 0.02


# ------------------------------------------------------ brownian prefix --

def _brownian_expect(img_u8, dt, seed0, seed1):
    """jnp replication of the kernel's hash increments + exclusive
    prefix (generators.brownian semantics)."""
    h, w, _ = img_u8.shape
    yy, xx, cc = jnp.meshgrid(jnp.arange(h), jnp.arange(w),
                              jnp.arange(3), indexing='ij')
    ctr = ((yy * w + xx) * 3 + cc).astype(jnp.uint32)
    s0 = jnp.uint32(seed0)
    s1 = jnp.uint32(seed1)
    u1 = _u01_bits(_hash_ctr(ctr, 72, s0, s1))
    u2 = _u01_bits(_hash_ctr(ctr, 73, s0, s1))
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
        jnp.float32(2.0 * np.pi) * u2)
    db = (z * jnp.sqrt(jnp.float32(dt))).reshape(-1)
    b = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                         jnp.cumsum(db[:-1])])
    noise = G.wrap_cast_u8(b * 255.0).reshape(img_u8.shape)
    return G.saturate_u8(img_u8.astype(jnp.float32) + noise)


def test_brownian_matches_hash_replication(imgs):
    dt = 0.09
    got = np.asarray(_run_kind(imgs[:1], Kind.BROWNIAN, level=dt,
                               tile_h=8))[0]
    want = np.asarray(_brownian_expect(imgs[0], dt, 7, 1000))
    # the kernel reconstructs the prefix as carry + row-scan + lane-scan;
    # f32 association differs from the flat cumsum by a few ulps, which
    # matters only when B*255 sits within an ulp of an integer
    assert np.mean(got != want) < 1e-3
    np.testing.assert_allclose(got, want, atol=1.0)


def test_brownian_tile_partition_invariant(imgs):
    """The carried prefix must make the output independent of tile_h —
    the riskiest piece of cross-grid-step state."""
    a = np.asarray(_run_kind(imgs, Kind.BROWNIAN, level=0.009, tile_h=8))
    b = np.asarray(_run_kind(imgs, Kind.BROWNIAN, level=0.009, tile_h=24))
    np.testing.assert_array_equal(a, b)


def test_stochastic_tile_partition_invariant(imgs):
    """Coordinate-stable RNG: per-kind output identical across tilings."""
    for kind, lvl in ((Kind.GAUSSIAN, 0.1), (Kind.SAP, 0.4),
                      (Kind.POISSON, 0.0), (Kind.GAMMA, 0.1)):
        a = np.asarray(_run_kind(imgs, kind, level=lvl, tile_h=8))
        b = np.asarray(_run_kind(imgs, kind, level=lvl, tile_h=16))
        np.testing.assert_array_equal(a, b)


# ------------------------------------------------- stochastic statistics --

def test_gaussian_stats(imgs):
    var = 0.1
    flat = jnp.full((1, 64, 96, 3), 128, jnp.uint8)
    out = np.asarray(_run_kind(flat, Kind.GAUSSIAN, level=var, tile_h=32))
    assert out.min() >= 0.0 and out.max() <= 1.0  # [0,1] quirk domain
    base = 128.0 / 255.0
    clipped = np.clip(base + np.sqrt(var) * np.random.RandomState(0)
                      .randn(200000), 0, 1)
    assert abs(out.mean() - clipped.mean()) < 0.01
    assert abs(out.std() - clipped.std()) < 0.01


def test_sap_stats():
    amount = 0.4
    flat = jnp.full((1, 64, 96, 3), 128, jnp.uint8)
    out = np.asarray(_run_kind(flat, Kind.SAP, level=amount, tile_h=32))
    n = out.size
    f_salt = (out == 255.0).sum() / n
    f_pepper = (out == 0.0).sum() / n
    assert abs(f_salt - amount / 2) < 0.01
    assert abs(f_pepper - amount / 2) < 0.01
    assert ((out == 128.0).sum() / n) > 1 - amount - 0.01


def _wrap_np(x):
    return np.mod(np.trunc(x), 256.0)


def test_uniform_rayleigh_speckle_gamma_moments():
    """Monte-Carlo the exact u8-domain transform (trunc bias + mod-256
    wrap included) in numpy and compare first two moments."""
    flat = jnp.full((1, 64, 96, 3), 100, jnp.uint8)
    x01 = 100.0 / 255.0
    rng = np.random.RandomState(1)
    nmc = 400000

    out = np.asarray(_run_kind(flat, Kind.UNIFORM, level=0.6, tile_h=32))
    ref = _wrap_np(255.0 * (x01 + rng.uniform(0, 0.6, nmc)))
    assert abs(out.mean() - ref.mean()) < 1.5
    assert abs(out.std() - ref.std()) < 1.5

    out = np.asarray(_run_kind(flat, Kind.RAYLEIGH, level=0.2, tile_h=32))
    ref = _wrap_np(255.0 * (x01 + 0.2 * np.sqrt(
        -2.0 * np.log(rng.uniform(1e-12, 1.0, nmc)))))
    assert abs(out.mean() - ref.mean()) < 1.5
    assert abs(out.std() - ref.std()) < 2.0

    out = np.asarray(_run_kind(flat, Kind.SPECKLE, level=0.5, tile_h=32))
    ref = _wrap_np(255.0 * np.clip(
        x01 + x01 * np.sqrt(0.5) * rng.randn(nmc), 0, 1))
    assert abs(out.mean() - ref.mean()) < 1.5
    assert abs(out.std() - ref.std()) < 1.5

    out = np.asarray(_run_kind(flat, Kind.GAMMA, level=0.1, tile_h=32))
    ref = _wrap_np(255.0 * (x01 + 0.1 * rng.gamma(1.99, 1.0, nmc)))
    assert abs(out.mean() - ref.mean()) < 1.5
    assert abs(out.std() - ref.std()) < 2.0


def test_poisson_stats():
    """Constant images at representative u8 values, vals = 256: the
    marginal Poisson(lam = v*256/255) per regime (inverse-CDF lam < 10,
    Hoermann PTRS above) vs a large numpy Monte-Carlo of the exact
    transform.  18k kernel draws per lam -> mean SE ~ std/136, std rel
    SE < 0.6%; tolerances sit at ~4 SE."""
    rng = np.random.RandomState(7)
    for v in (2, 5, 7,          # inverse-CDF regime
              20, 80, 180):     # PTRS regime
        img = jnp.full((1, 64, 96, 3), v, jnp.uint8)
        out = np.asarray(_run_kind(img, Kind.POISSON, vals=256.0,
                                   tile_h=32), np.float64)
        lam = v / 255.0 * 256.0
        k = rng.poisson(lam, 2_000_000)
        ref = np.trunc(255.0 * np.clip(k / 256.0, 0.0, 1.0))
        assert abs(out.mean() - ref.mean()) < 0.05 * max(ref.std(), 1.0)
        assert abs(out.std() - ref.std()) / max(ref.std(), 1.0) < 0.025


# ---------------------------------------------------- prologue + routing --

def test_prologue_draw_matches_scan_chain(imgs):
    """Entry draw chain == the XLA scan body's (split -> randint over E):
    branch distribution is bit-identical to the scanned switch."""
    plan = parse('noise_mix_var_medium_bilateral', mode='TRAIN')
    kinds, eb, el = plan_tables(plan.specs)
    key = jax.random.PRNGKey(3)
    batch = 16
    keys = jax.random.split(key, batch)
    big = jnp.tile(imgs[:1], (batch, 1, 1, 1))
    branch, level, seeds, vals, centers, bloom = mix_prologue(
        keys, big.astype(jnp.float32), kinds, eb, el)

    e = len(plan.specs)
    for i in range(batch):
        kc, ka = jax.random.split(keys[i])
        idx = int(jax.random.randint(kc, (), 0, e))
        assert int(branch[i]) == int(eb[idx])
        assert float(level[i]) == float(el[idx])
        kd = np.asarray(jax.random.key_data(ka)).reshape(-1)
        got_seed = np.asarray(seeds[i]).astype(np.uint32)
        assert got_seed[0] == np.uint32(kd[0])
        assert got_seed[1] == np.uint32(kd[-1])
        kind = int(plan.specs[idx].kind)
        if kind == int(Kind.POISSON):
            assert float(vals[i]) >= 1.0
        if kind == int(Kind.QUANT):
            assert np.asarray(centers[i]).max() >= 1e8  # inactive mask
        else:
            assert np.asarray(centers[i]).max() == 0.0


def test_prologue_quant_centers_match_quantize_colors(imgs):
    """The traced-k fit reproduces kmeans.quantize_colors' center chain
    bit-exactly for the drawn k (kmeans_fit_traced_k contract)."""
    from tpudenoise.noise.kmeans import kmeans
    from tpudenoise.ops.color import bgr_u8_to_lab_u8

    specs = (NoiseSpec(Kind.QUANT, level=7.0),
             NoiseSpec(Kind.QUANT, level=7.0))
    kinds, eb, el = plan_tables(specs)
    key = jax.random.PRNGKey(9)
    keys = jax.random.split(key, 1)
    img = imgs[:1].astype(jnp.float32)
    _, _, _, _, centers, _ = mix_prologue(keys, img, kinds, eb, el)

    _, ka = jax.random.split(keys[0])
    lab = bgr_u8_to_lab_u8(img[0])
    want, _ = kmeans(ka, lab.reshape(-1, 3), k=7)
    got = np.asarray(centers[0][:7 * 6].reshape(7, 6)[:, :3])
    np.testing.assert_array_equal(got, np.asarray(want))


def test_prologue_gathered_fit_matches_full(imgs):
    """The budgeted gather-fit (only quant-drawn images run the k-means
    fit) returns bit-identical prologue outputs to the full-batch fit —
    same (ka, image, kk) per image — and the lax.cond overflow fallback
    (budget below the drawn count) is exact too."""
    plan = parse('noise_mix_var_all', mode='TRAIN')
    kinds, eb, el = plan_tables(plan.specs)
    batch = 32
    keys = jax.random.split(jax.random.PRNGKey(7), batch)
    rng = np.random.RandomState(11)
    big = jnp.asarray(rng.randint(0, 256, (batch, H, W, 3)), jnp.float32)
    full = mix_prologue(keys, big, kinds, eb, el, _fit_budget=batch)
    pos_quant = kinds.index(int(Kind.QUANT))
    n_quant = int(np.sum(np.asarray(full[0]) == pos_quant))
    assert n_quant >= 1  # the draw must exercise the gather
    gathered = mix_prologue(keys, big, kinds, eb, el, _fit_budget=8)
    overflow = mix_prologue(keys, big, kinds, eb, el, _fit_budget=1)
    for a, b in zip(full, gathered):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(full, overflow):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_pipeline_u8_input_bitequal_f32(imgs):
    """uint8 input produces bit-identical output to the same values as
    float32: the kernels load u8 either way (the f32 path is cast
    exactly), so callers holding the loader's u8 tensors skip the f32
    planarize tax for free."""
    from tpudenoise.noise.pipeline import _fused_mix_pipeline

    plan = parse('noise_mix_var_medium_bilateral', mode='TRAIN')
    fn = _fused_mix_pipeline(plan, interpret=True)
    key = jax.random.PRNGKey(3)
    out_u8 = np.asarray(fn(key, imgs[:2]))
    out_f32 = np.asarray(fn(key, imgs[:2].astype(jnp.float32)))
    np.testing.assert_array_equal(out_u8, out_f32)


def test_fused_bilateral_equals_noise_then_bilateral(imgs):
    """Planar fused tail == bilateral(interleaved fused noise): the noise
    streams are identical by construction (element-raster counter), the
    stencil is the shared _bilateral_body."""
    from tpudenoise.denoise.stencils import bilateral

    branch, levels, seeds, vals, c0, b0 = _params(B, level=0.4)
    kinds = (int(Kind.SAP),)
    noisy = fused_mix_noise(imgs, branch, levels, seeds, vals, c0, b0,
                            kinds=kinds, tile_h=8, interpret=True)
    want = jax.vmap(bilateral)(noisy)
    got = fused_mix_bilateral(imgs, branch, levels, seeds, vals, c0, b0,
                              kinds=kinds, tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-2)


def test_pipeline_routing_and_shapes(imgs):
    """_fused_mix_pipeline end-to-end in interpret mode: mixed batch in,
    filtered batch out, per-image branches drawn from the plan."""
    from tpudenoise.noise.pipeline import _fused_mix_pipeline

    plan = parse('noise_mix_var_medium_bilateral', mode='TRAIN')
    fn = _fused_mix_pipeline(plan, interpret=True)
    assert fn.backend == 'pallas:fused_mix+bilateral'
    key = jax.random.PRNGKey(3)
    out = np.asarray(fn(key, imgs[:2].astype(jnp.float32)))
    assert out.shape == (2, H, W, 3)
    assert np.isfinite(out).all()

    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(2))
    out_k = np.asarray(fn.keyed(keys, imgs[:2].astype(jnp.float32)))
    assert out_k.shape == (2, H, W, 3)
