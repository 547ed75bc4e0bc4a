"""Fused noise->denoise pipeline tests: end-to-end plan execution,
mix switching, domain quirks."""

import jax
import numpy as np
import pytest

from tpudenoise.noise.pipeline import make_pipeline

KEY = jax.random.PRNGKey(3)


@pytest.fixture
def batch():
    rng = np.random.RandomState(3)
    return rng.randint(0, 256, (2, 64, 96, 3)).astype(np.float32)


@pytest.mark.parametrize('noise', [
    'gaussian_gaus_blur_var0.1',
    'sap_median_var0.4',
    'speckle_wavelet_var1.0',
    'uniform_bilateral_var0.6',
    'poisson_mean',
    'brownian_var0.09',
    'periodic_median_var100',
    'rayleigh_var0.2',
    'original',
])
def test_pipeline_runs_u8_domain(noise, batch):
    fn = make_pipeline(noise)
    out = np.asarray(fn(KEY, batch))
    assert out.shape == batch.shape
    assert out.min() >= 0.0 and out.max() <= 255.0
    assert np.all(out == np.round(out))  # integer-valued u8 domain


def test_gaussian_plain_unit_float_quirk(batch):
    """gaussian with no denoise emits the float [0,1] image
    (ref test.py:290-305)."""
    fn = make_pipeline('gaussian_var0.1')
    out = np.asarray(fn(KEY, batch))
    assert out.max() <= 1.0


def test_quant_pipeline(batch):
    fn = make_pipeline('quant_var3', mode='TRAIN')
    out = np.asarray(fn(KEY, batch))
    for b in range(2):
        colors = np.unique(out[b].reshape(-1, 3), axis=0)
        assert len(colors) <= 3


def test_strict_test_quant_is_original(batch):
    fn = make_pipeline('quant_var3', mode='TEST', strict_ref=True)
    out = np.asarray(fn(KEY, batch))
    np.testing.assert_array_equal(out, batch)


def test_mix_selects_different_kinds(batch):
    big = np.tile(batch, (8, 1, 1, 1))  # 16 images
    fn = make_pipeline('noise_mix_var_medium')
    out = np.asarray(fn(KEY, big))
    assert out.shape == big.shape
    # different images got different treatments (16 draws over 13 kinds)
    diffs = [np.abs(out[i] - big[i]).mean() for i in range(16)]
    assert len({round(d, 2) for d in diffs}) > 4


def test_mix_is_deterministic_given_key(batch):
    fn = make_pipeline('noise_mix_var_low')
    a = np.asarray(fn(KEY, batch))
    b = np.asarray(fn(KEY, batch))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(fn(jax.random.PRNGKey(4), batch))
    assert np.abs(a - c).mean() > 0


def test_double_filter_train_semantics(batch):
    """Default (train-pipeline) semantics double-apply the filter: generator
    variant + standalone post-pass (minibatch.py:1636-1663)."""
    from tpudenoise.denoise.stencils import mean3
    from tpudenoise.noise.pipeline import apply_spec
    from tpudenoise.noise.spec import parse
    plan = parse('sap_mean_var0.4')
    fn = make_pipeline(plan)
    out = np.asarray(fn(KEY, batch))
    # manually: spec apply (noise+mean) then post mean
    keys = jax.random.split(KEY, 2)
    manual0 = mean3(apply_spec(plan.specs[0], keys[0], batch[0]))
    np.testing.assert_array_equal(out[0], np.asarray(manual0))


def test_curvelet_plan(batch):
    fn = make_pipeline('curvelet')
    out = np.asarray(fn(KEY, batch))
    assert out.shape == batch.shape
    assert out.min() >= 0 and out.max() <= 255


def test_keyed_matches_sequential(batch):
    """fn.keyed(per-image fold_in keys) must reproduce the sequential
    harness loop (fn(fold_in(key, i), im[None]) per image) bit-exactly —
    the single-dispatch batched-eval noise contract."""
    fn = make_pipeline('speckle_mean_var1.0', mode='TEST')
    idx = [5, 2, 9, 0]
    imgs = np.concatenate([batch, batch[::-1]])  # 4 images
    keys = jax.numpy.stack(
        [jax.random.fold_in(KEY, i) for i in idx])
    got = np.asarray(fn.keyed(keys, imgs))
    want = np.concatenate(
        [np.asarray(fn(jax.random.fold_in(KEY, i), imgs[j:j + 1]))
         for j, i in enumerate(idx)])
    np.testing.assert_array_equal(got, want)


def test_keyed_matches_sequential_mix(batch):
    fn = make_pipeline('noise_mix_var_low', mode='TEST')
    idx = [3, 7]
    keys = jax.numpy.stack([jax.random.fold_in(KEY, i) for i in idx])
    got = np.asarray(fn.keyed(keys, batch))
    want = np.concatenate(
        [np.asarray(fn(jax.random.fold_in(KEY, i), batch[j:j + 1]))
         for j, i in enumerate(idx)])
    np.testing.assert_array_equal(got, want)


def test_pallas_backend_selection():
    """Production call sites get the fused Pallas kernels on TPU (auto);
    the plan->backend routing is checked here without executing."""
    cases = {
        'sap_median_var0.4': 'pallas:sap_median',
        'gaussian_gaus_blur_var0.1': 'pallas:gaussian_blur',
        'speckle_bilateral_var1.0': 'pallas:bilateral_x2',
        'noise_mix_var_medium_bilateral': 'pallas:fused_mix+bilateral',
        'noise_mix_var_low': 'pallas:fused_mix',
        'noise_mix_var_medium_wavelet': 'pallas:fused_mix',
    }
    for noise, backend in cases.items():
        fn = make_pipeline(noise, mode='TRAIN', use_pallas=True)
        assert fn.backend == backend, (noise, fn.backend)
    assert make_pipeline('sap_median_var0.4',
                         use_pallas=False).backend == 'xla'
    # plans the kernels don't cover fall back to XLA even with pallas on
    assert make_pipeline('speckle_wavelet_var1.0',
                         use_pallas=True).backend == 'xla'


def test_mix_post_denoise_applies(batch):
    """The standalone post-pass keys off the FULL noise string for mixes
    too (ref minibatch.py:1636-1663): every image of a
    'noise_mix_*_bilateral' batch is bilateral-filtered."""
    from tpudenoise.denoise.stencils import bilateral
    from tpudenoise.noise.spec import Denoise, parse
    plan = parse('noise_mix_var_low_bilateral', mode='TRAIN')
    assert plan.post_denoise == Denoise.BILATERAL
    fn_plain = make_pipeline('noise_mix_var_low', mode='TRAIN',
                             use_pallas=False)
    fn_post = make_pipeline('noise_mix_var_low_bilateral', mode='TRAIN',
                            use_pallas=False)
    a = np.asarray(fn_plain(KEY, batch))
    b = np.asarray(fn_post(KEY, batch))
    want = np.asarray(jax.vmap(lambda im: bilateral(im))(a))
    np.testing.assert_array_equal(b, want)


def test_group_specs_preserves_entry_tables():
    """Branch collapsing keeps one entry slot per mix-table entry (the
    per-image randint stream is over ENTRIES) and maps each entry to a
    branch whose template matches its kind, with the level recoverable
    from the lookup table for traced kinds and from the template
    otherwise."""
    from tpudenoise.noise.pipeline import _TRACED_LEVEL_KINDS, _group_specs
    from tpudenoise.noise.spec import Kind, parse

    for mode in ('TRAIN', 'TEST'):
        specs = parse('noise_mix_var_all', mode=mode).specs
        templates, traced, eb, el = _group_specs(specs)
        assert len(eb) == len(specs) == len(el)
        assert len(templates) < len(specs)  # actually collapsed
        for i, s in enumerate(specs):
            t = templates[eb[i]]
            assert t.kind == s.kind
            if traced[eb[i]]:
                assert s.kind in _TRACED_LEVEL_KINDS
                assert el[i] == np.float32(s.level)
            else:
                assert t.level == s.level
        # quant keeps one branch per cluster count (static shapes)
        quant_branches = {eb[i] for i, s in enumerate(specs)
                          if s.kind == Kind.QUANT}
        quant_levels = {s.level for s in specs if s.kind == Kind.QUANT}
        assert len(quant_branches) == len(quant_levels)


def test_grammar_full_cross_product():
    """Every (kind, denoise-variant) cell of the reference grammar
    (test.py:1641-1831 elif chains x the 5 filter suffixes) builds and
    produces a valid image — catches per-cell routing breaks (e.g. the
    per-kind wavelet domain table) that the spot checks above miss."""
    kinds = ['gaussian_var0.1', 'poisson', 'sap_var0.4', 'speckle_var1.0',
             'periodic_var100', 'brownian_var0.09', 'quant_var7',
             'uniform_var0.6', 'gamma_var0.1', 'rayleigh_var0.2',
             'bloom', 'shader', 'original']
    denoises = ['', '_gaus_blur', '_mean', '_median', '_bilateral',
                '_wavelet']
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    small = jnp.asarray(rng.randint(0, 256, (1, 24, 32, 3))
                        .astype(np.float32))

    def stem_is_gaussian_plain(kind, d):
        return kind.startswith('gaussian') and d == ''

    for kind in kinds:
        for d in denoises:
            if '_var' in kind:
                stem, var = kind.rsplit('_var', 1)
                noise = f'{stem}{d}_var{var}'
            else:
                noise = f'{kind}{d}'
            fn = make_pipeline(noise, mode='TEST', use_pallas=False)
            out = np.asarray(fn(KEY, small))
            assert out.shape == small.shape, noise
            assert np.isfinite(out).all(), noise
            if stem_is_gaussian_plain(kind, d):
                # plain-gaussian unit-float quirk (ref test.py:290-305)
                assert out.max() <= 1.0, noise
            else:
                assert out.min() >= 0.0 and out.max() <= 255.0, noise


def test_curvelet_post_chunked_matches_vmap():
    """The HBM-bounded lax.map chunking of the batched curvelet post must
    be a pure batching detail: identical output to the plain vmap."""
    from tpudenoise.denoise.curvelet import curvelet_denoise_u8
    from tpudenoise.noise.pipeline import _post_batched_for
    from tpudenoise.noise.spec import parse

    plan = parse('curvelet', mode='TRAIN')
    post = _post_batched_for(plan, unit_float=False)
    rng = np.random.RandomState(0)
    import jax.numpy as jnp
    out = jnp.asarray(rng.randint(0, 256, (8, 24, 40, 3))
                      .astype(np.float32))
    got = np.asarray(post(out))          # 8 % 4 == 0 -> chunked path
    want = np.asarray(jax.vmap(curvelet_denoise_u8)(out))
    np.testing.assert_array_equal(got, want)
