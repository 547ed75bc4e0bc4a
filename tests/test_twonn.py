"""TwoNN intrinsic dimension: recovers known manifold dimensions."""

import numpy as np

from tpudenoise.analysis.twonn import compute_id, estimate_from_dist, \
    pairwise_dist


def test_pairwise_dist_matches_scipy():
    from scipy.spatial.distance import pdist, squareform
    rng = np.random.RandomState(0)
    x = rng.randn(50, 8).astype(np.float32)
    want = squareform(pdist(x, 'euclidean')).astype(np.float32)
    got = np.asarray(pairwise_dist(x))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_twonn_recovers_gaussian_dimension():
    rng = np.random.RandomState(1)
    for d in (2, 5):
        x = rng.randn(600, d).astype(np.float32)
        mean, err = compute_id(x, nres=5, seed=0)
        assert abs(mean - d) < 0.8, (d, mean)


def test_twonn_embedded_manifold():
    """2-D manifold embedded in 20-D: ID ~ 2 regardless of ambient dim."""
    rng = np.random.RandomState(2)
    latent = rng.randn(600, 2).astype(np.float32)
    basis = rng.randn(2, 20).astype(np.float32)
    x = latent @ basis
    mean, err = compute_id(x, nres=5, seed=0)
    assert abs(mean - 2.0) < 0.5, mean


def test_estimate_handles_duplicates():
    rng = np.random.RandomState(3)
    x = rng.randn(100, 3).astype(np.float32)
    x[10] = x[11]  # duplicate -> r1 == 0 for both
    dist = pairwise_dist(x)
    d, n_good = estimate_from_dist(np.asarray(dist))
    assert int(n_good) <= 98
    assert 1.0 < float(d) < 6.0


def test_backbone_probe_features_vgg():
    """Per-layer probes (the reference ID study's tensors,
    ref test.py:1919-2218): every vgg probe + 'head' comes back as one
    grid-pooled vector per image with the probe layer's channel count."""
    import jax
    from tpudenoise.analysis.twonn import PROBES, make_probe_fn
    from tpudenoise.models.faster_rcnn import FasterRCNN
    m = FasterRCNN(backbone='vgg16', num_classes=2)
    params = m.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    fn = make_probe_fn(m, grid=2)
    imgs = np.random.RandomState(0).randn(3, 64, 96, 3).astype(np.float32)
    feats = fn(params, imgs)
    assert set(feats) == set(PROBES['vgg16']) | {'head'}
    widths = {'conv1_1': 64, 'conv1_2': 64, 'conv2_2': 128, 'conv3_3': 256,
              'conv4_3': 512, 'conv5_3': 512, 'head': 512}
    for p, v in feats.items():
        assert np.asarray(v).shape == (3, 4 * widths[p]), p
        assert np.isfinite(np.asarray(v)).all(), p


def test_backbone_probe_features_res50():
    import jax
    from tpudenoise.analysis.twonn import PROBES, make_probe_fn
    from tpudenoise.models.faster_rcnn import FasterRCNN
    m = FasterRCNN(backbone='res50', num_classes=2)
    params = m.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    fn = make_probe_fn(m, grid=2)
    imgs = np.random.RandomState(1).randn(2, 64, 96, 3).astype(np.float32)
    feats = fn(params, imgs)
    assert set(feats) == set(PROBES['res50']) | {'head'}
    # bottleneck conv3 widths: block1=256, block2=512, block3=1024
    assert np.asarray(feats['block1/unit_1/conv3']).shape == (2, 4 * 256)
    assert np.asarray(feats['block2/unit_4/conv3']).shape == (2, 4 * 512)
    assert np.asarray(feats['block3/unit_4/conv3']).shape == (2, 4 * 1024)


def test_per_layer_id_runs():
    from tpudenoise.analysis.twonn import per_layer_id
    rng = np.random.RandomState(4)
    feats = {'a': rng.randn(60, 16).astype(np.float32),
             'b': rng.randn(60, 32).astype(np.float32)}
    ids = per_layer_id(feats, nres=3)
    assert set(ids) == {'a', 'b'}
    for mean, err in ids.values():
        assert np.isfinite(mean) and np.isfinite(err)


def test_grid_pool_tiny_map_no_nan():
    """Probe maps smaller than the grid must not average empty bins."""
    import jax.numpy as jnp
    from tpudenoise.analysis.twonn import _grid_pool
    out = np.asarray(_grid_pool(jnp.ones((2, 5, 8)), 4))
    assert out.shape == (4 * 4 * 8,)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, 1.0)


def test_backbone_probe_features_mobile():
    import jax
    from tpudenoise.analysis.twonn import PROBES, make_probe_fn
    from tpudenoise.models.faster_rcnn import FasterRCNN
    m = FasterRCNN(backbone='mobile', num_classes=2)
    params = m.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    fn = make_probe_fn(m, grid=2)
    imgs = np.random.RandomState(2).randn(2, 64, 96, 3).astype(np.float32)
    feats = fn(params, imgs)
    assert set(feats) == set(PROBES['mobile']) | {'head'}
    for p, v in feats.items():
        assert np.asarray(v).ndim == 2 and np.isfinite(np.asarray(v)).all()


def test_grid_pool_dyn_matches_static_full_extent():
    """_grid_pool_dyn(hw = full shape) must equal _grid_pool exactly, and
    tiny maps must not produce empty bins."""
    import jax.numpy as jnp
    from tpudenoise.analysis.twonn import _grid_pool, _grid_pool_dyn
    rng = np.random.RandomState(0)
    for h, w in [(7, 9), (16, 16), (2, 5), (38, 50)]:
        feat = jnp.asarray(rng.randn(h, w, 6).astype(np.float32))
        want = np.asarray(_grid_pool(feat, 4))
        got = np.asarray(_grid_pool_dyn(
            feat, jnp.asarray([h, w], jnp.int32), 4))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_grid_pool_dyn_ignores_padding():
    """Pooling the valid region of a zero-padded map == pooling the
    unpadded map: padding must not bias the ID probe features."""
    import jax.numpy as jnp
    from tpudenoise.analysis.twonn import _grid_pool_dyn
    rng = np.random.RandomState(1)
    feat = rng.randn(19, 23, 4).astype(np.float32)
    padded = np.zeros((32, 40, 4), np.float32)
    padded[:19, :23] = feat
    a = np.asarray(_grid_pool_dyn(jnp.asarray(feat),
                                  jnp.asarray([19, 23], jnp.int32), 4))
    b = np.asarray(_grid_pool_dyn(jnp.asarray(padded),
                                  jnp.asarray([19, 23], jnp.int32), 4))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_probe_fn_padded_vs_unpadded_vgg():
    """make_probe_fn with hw on a bucket-padded image matches the
    unpadded forward's probes at the shallow layers (exact at stride 1;
    near-exact while the receptive field is small).  Deep vgg probes on a
    toy 48x80 image have ~200 px receptive fields, so padding-region
    features bleed into the valid region through the convs themselves —
    the masked pool removes the *pooling* bias (test above proves that
    mechanism directly), not conv-boundary bleed."""
    import jax
    import jax.numpy as jnp
    from tpudenoise.analysis.twonn import make_probe_fn
    from tpudenoise.models.faster_rcnn import FasterRCNN
    m = FasterRCNN(backbone='vgg16', num_classes=2, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    fn = make_probe_fn(m, grid=2)
    rng = np.random.RandomState(3)
    img = rng.randn(48, 80, 3).astype(np.float32)
    padded = np.zeros((64, 96, 3), np.float32)
    padded[:48, :80] = img
    hw = jnp.asarray([[48, 80]], jnp.int32)
    un = fn(params, img[None], hw)
    pa = fn(params, padded[None], hw)
    pa_full = fn(params, padded[None], jnp.asarray([[64, 96]], jnp.int32))
    np.testing.assert_allclose(np.asarray(pa['conv1_1']),
                               np.asarray(un['conv1_1']),
                               rtol=1e-5, atol=1e-5)
    for p, tol in [('conv1_2', 0.03), ('conv2_2', 0.08)]:
        a, b = np.asarray(un[p]), np.asarray(pa[p])
        scale = np.abs(a).max()
        assert np.abs(b - a).max() < tol * scale, p
        # and strictly better than pooling the full padded map
        c = np.asarray(pa_full[p])
        assert np.abs(b - a).max() < np.abs(c - a).max(), p


def test_infer_stride_non_divisible_extents():
    """Stride inference from SAME-padded extents must survive inputs not
    divisible by the cumulative stride: ceil(600/16) = 38 rows, and the
    old floor derivation 600 // 38 = 15 overestimated the valid extent
    (ceil(300/15) = 20 rows vs the true ceil(300/16) = 19), letting
    zero-pad rows back into the grid-pooled ID features on custom
    buckets."""
    from tpudenoise.analysis.twonn import _infer_stride
    for n_in, s in [(600, 16), (100, 16), (1000, 16), (608, 16),
                    (600, 32), (97, 8), (64, 1), (50, 2), (123, 4)]:
        n_out = -(-n_in // s)
        assert _infer_stride(n_in, n_out) == s, (n_in, s)
