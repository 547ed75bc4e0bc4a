"""TwoNN intrinsic-dimension estimator (Facco et al. 2017).

Re-expresses the reference's estimator (ref lib/nets/resnet_v1.py:187-268,
duplicated in vgg16.py:107-171): for each point take the two nearest
neighbours r1 < r2, mu = r2/r1; the empirical CDF of mu satisfies
-log(1 - F(mu)) = d * log(mu), so the ID d is the through-origin slope over
the first `fraction` of sorted points.  `compute_id` bootstraps `nres`
subsamples of 90% (resnet_v1.py:250-268).

The pairwise distance matrix and per-point two-NN run on device (the
distance matrix is one x.xT MXU matmul); the tiny regression is closed-form
(d = sum(x*y)/sum(x*x)) instead of sklearn.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def pairwise_dist(x: jnp.ndarray) -> jnp.ndarray:
    """(N, D) -> (N, N) euclidean distances via the x.xT expansion."""
    x = x.astype(jnp.float32)
    sq = jnp.sum(x * x, axis=1)
    d2 = sq[:, None] - 2.0 * (x @ x.T) + sq[None, :]
    n = x.shape[0]
    d2 = d2 * (1.0 - jnp.eye(n, dtype=x.dtype))  # exact-zero diagonal
    return jnp.sqrt(jnp.maximum(d2, 0.0))


@functools.partial(jax.jit, static_argnames=('fraction',))
def estimate_from_dist(dist: jnp.ndarray, fraction: float = 0.9):
    """ID estimate from a square distance matrix (ref estimate()).

    Degenerate points (r1 == 0 or r1 == r2) are masked out rather than
    removed (static shapes); the regression uses the first
    floor(n_good * fraction) of the sorted mu values.
    Returns (d, n_good).
    """
    n = dist.shape[0]
    # two smallest nonself distances per row
    big = jnp.finfo(jnp.float32).max
    d = dist + jnp.eye(n, dtype=dist.dtype) * big
    k2pair = -jax.lax.top_k(-d, 2)[0]        # (N, 2) ascending
    r1, r2 = k2pair[:, 0], k2pair[:, 1]
    good = (r1 > 0) & (r1 != r2)
    n_good = jnp.sum(good)
    mu = jnp.where(good, r2 / jnp.maximum(r1, 1e-30), big)
    mu = jnp.sort(mu)                         # good points first
    # Femp over the good points
    idx = jnp.arange(1, n + 1, dtype=jnp.float32)
    femp = idx / jnp.maximum(n_good, 1)
    x = jnp.log(mu)
    y = -jnp.log(jnp.maximum(1.0 - femp, 1e-12))
    # the reference drops the last two points then keeps
    # npoints = floor(n_good * fraction)
    npoints = jnp.floor(n_good * fraction).astype(jnp.int32)
    keep = (jnp.arange(n) < jnp.minimum(npoints, n_good - 2))
    x = jnp.where(keep, x, 0.0)
    y = jnp.where(keep, y, 0.0)
    slope = jnp.sum(x * y) / jnp.maximum(jnp.sum(x * x), 1e-12)
    return slope, n_good


def compute_id(activations, nres: int = 20, fraction: float = 0.9,
               seed: int = 0):
    """Bootstrap mean/std of the ID over `nres` subsamples of 90% of the
    points (ref computeID, resnet_v1.py:250-268).

    activations: (N, ...) array; flattened to (N, D).
    """
    r = np.asarray(activations)
    r = r.reshape(r.shape[0], -1)
    n = int(np.round(r.shape[0] * 0.9))
    dist = pairwise_dist(jnp.asarray(r))
    rng = np.random.RandomState(seed)
    ids = []
    for _ in range(nres):
        perm = rng.permutation(r.shape[0])[:n]
        sub = dist[np.ix_(perm, perm)]
        d, _ = estimate_from_dist(jnp.asarray(sub), fraction=fraction)
        ids.append(float(d))
    return float(np.mean(ids)), float(np.std(ids))


# named backbone probe points matching the activations the reference's
# commented ID study samples per net (ref lib/model/test.py:1919-2218)
RESNET_PROBES = ['conv1', 'block1', 'block2', 'block3', 'block4']
VGG_PROBES = [f'conv{i}_last' for i in range(1, 6)] + ['fc6', 'fc7']


def backbone_intrinsic_dim(model, params, images, probes=None,
                           nres: int = 5):
    """Run the backbone over a batch and estimate the ID of the pooled
    activations at each probe (global-average-pooled feature vectors, one
    per image — the ID study's per-layer representation)."""
    import jax.numpy as jnp
    feats = model.head_mod.apply({'params': params['head']},
                                 jnp.asarray(images))
    pooled = np.asarray(jnp.mean(feats, axis=(1, 2)))
    mean, err = compute_id(pooled, nres=nres)
    return {'head': (mean, err)}
