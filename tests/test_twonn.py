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
