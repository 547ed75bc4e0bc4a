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
import math

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


# Named backbone probe points matching the activations the reference's ID
# study samples per net (ref lib/model/test.py:1919-2218): the conv3 output
# of specific bottleneck units for resnets, specific conv layers for vgg16
# (the reference grabs the raw Conv2D outputs via get_tensor_by_name).
# mobile has no reference probe list; evenly-spaced pointwise convs stand in.
PROBES = {
    'res101': ['block1/unit_1/conv3', 'block2/unit_1/conv3',
               'block2/unit_4/conv3', 'block3/unit_8/conv3',
               'block3/unit_11/conv3', 'block3/unit_14/conv3',
               'block3/unit_17/conv3', 'block3/unit_20/conv3',
               'block3/unit_23/conv3'],
    'res50': ['block1/unit_1/conv3', 'block1/unit_3/conv3',
              'block2/unit_1/conv3', 'block2/unit_2/conv3',
              'block2/unit_3/conv3', 'block2/unit_4/conv3',
              'block3/unit_3/conv3', 'block3/unit_4/conv3'],
    # res152 has no reference list (study covers 50/101/vgg); the res101
    # probes are valid unit indices for 152 and keep curves comparable
    'res152': ['block1/unit_1/conv3', 'block2/unit_1/conv3',
               'block2/unit_4/conv3', 'block3/unit_8/conv3',
               'block3/unit_11/conv3', 'block3/unit_14/conv3',
               'block3/unit_17/conv3', 'block3/unit_20/conv3',
               'block3/unit_23/conv3'],
    'vgg16': ['conv1_1', 'conv1_2', 'conv2_2', 'conv3_3', 'conv4_3',
              'conv5_3'],
    'mobile': ['layer_1/pointwise', 'layer_3/pointwise',
               'layer_5/pointwise', 'layer_7/pointwise',
               'layer_9/pointwise', 'layer_11/pointwise'],
}


def _grid_pool(feat: jnp.ndarray, grid: int) -> jnp.ndarray:
    """(H, W, C) -> (grid*grid*C,) adaptive average pooling: keeps coarse
    spatial structure while bounding the feature dim (the reference
    flattens full conv maps, feat.reshape(shape[0], -1), which is
    intractable to store across a dataset — documented deviation)."""
    h, w, _ = feat.shape
    hb = np.linspace(0, h, grid + 1).astype(int)
    wb = np.linspace(0, w, grid + 1).astype(int)

    def cell(i, j):
        # maps smaller than the grid collapse bins; widen empty ones to a
        # single (repeated) row/col instead of averaging zero elements
        y0 = min(hb[i], h - 1)
        y1 = max(hb[i + 1], y0 + 1)
        x0 = min(wb[j], w - 1)
        x1 = max(wb[j + 1], x0 + 1)
        return feat[y0:y1, x0:x1].mean(axis=(0, 1))

    cells = [cell(i, j) for i in range(grid) for j in range(grid)]
    return jnp.concatenate(cells).astype(jnp.float32)


def _grid_pool_dyn(feat: jnp.ndarray, hw, grid: int) -> jnp.ndarray:
    """_grid_pool restricted to the valid (non-padded) top-left hw region,
    with DYNAMIC hw (traced int32 (2,)): bin-membership row/col weight
    matrices turn the adaptive pool into two small matmuls, so zero-pad
    rows/columns of bucket-padded images never enter the cells (the
    reference's ID study samples activations of the unpadded image).
    Matches _grid_pool bit-for-bit when hw == feat.shape[:2]."""
    h_full, w_full, c = feat.shape
    h, w = hw[0], hw[1]
    ar = jnp.arange(grid + 1, dtype=jnp.float32)
    hb = jnp.floor(ar * h.astype(jnp.float32) / grid).astype(jnp.int32)
    wb = jnp.floor(ar * w.astype(jnp.float32) / grid).astype(jnp.int32)
    # same collapse rules as _grid_pool.cell: y0 = min(hb[i], h-1),
    # y1 = max(hb[i+1], y0+1)
    y0 = jnp.minimum(hb[:-1], h - 1)
    y1 = jnp.maximum(hb[1:], y0 + 1)
    x0 = jnp.minimum(wb[:-1], w - 1)
    x1 = jnp.maximum(wb[1:], x0 + 1)
    rows = jnp.arange(h_full, dtype=jnp.int32)
    cols = jnp.arange(w_full, dtype=jnp.int32)
    rw = ((rows[None, :] >= y0[:, None])
          & (rows[None, :] < y1[:, None])).astype(jnp.float32)  # (g, H)
    cw = ((cols[None, :] >= x0[:, None])
          & (cols[None, :] < x1[:, None])).astype(jnp.float32)  # (g, W)
    f32 = feat.astype(jnp.float32)
    tmp = jnp.einsum('gh,hwc->gwc', rw, f32)
    sums = jnp.einsum('jw,gwc->gjc', cw, tmp)                   # (g, g, C)
    counts = ((y1 - y0)[:, None] * (x1 - x0)[None, :]
              ).astype(jnp.float32)[..., None]
    return (sums / counts).reshape(-1)


def _infer_stride(n_in: int, n_out: int) -> int:
    """Cumulative SAME-padding stride from static extents, where
    n_out = ceil(n_in / s).  Floor division underestimates s whenever
    n_in % s != 0 (a 600-row input's stride-16 map has ceil(600/16) = 38
    rows and 600 // 38 = 15, which would let zero-pad rows back into the
    masked pool); every backbone stride here is a power of two, so round
    in log space — exact for any n_out >= 4."""
    return 1 << round(math.log2(n_in / n_out))


def make_probe_fn(model, grid: int = 4):
    """Jitted per-layer activation collector for the ID study.

    Returns fn(params, images (B,H,W,3) preprocessed, hw=None) ->
    {probe: (B, grid*grid*C_probe)} for every probe in
    PROBES[model.backbone] plus 'head' (the stride-16 feature map).
    Activations are captured with flax capture_intermediates — the JAX
    analogue of the reference's graph.get_tensor_by_name + sess.run per
    probe (test.py:1919-2218), in ONE forward instead of one per probe.

    hw: optional (B, 2) int32 valid (h, w) extents of bucket-padded
    inputs; when given, each probe pools only over the valid region at
    that layer's stride (ceil(hw / stride)), so padding never biases the
    ID estimate.
    """
    probes = PROBES.get(model.backbone, [])
    leaf = {p.split('/')[-1] for p in probes}

    def run(params, images, hw=None):
        feat, state = model.head_mod.apply(
            {'params': params['head']}, images,
            capture_intermediates=lambda mdl, _: mdl.name in leaf,
            mutable=['intermediates'])
        inter = state['intermediates']
        h_in, w_in = images.shape[1], images.shape[2]

        def pool(arr):
            if hw is None:
                return jax.vmap(lambda f: _grid_pool(f, grid))(arr)
            # SAME-padded stride chain: layer extent = ceil(valid / s)
            sy = _infer_stride(h_in, arr.shape[1])
            sx = _infer_stride(w_in, arr.shape[2])
            hw_l = jnp.stack([-(-hw[:, 0] // sy), -(-hw[:, 1] // sx)],
                             axis=1)
            return jax.vmap(
                lambda f, e: _grid_pool_dyn(f, e, grid))(arr, hw_l)

        out = {}
        for p in probes:
            node = inter
            for part in p.split('/'):
                node = node[part]
            out[p] = pool(node['__call__'][0])
        out['head'] = pool(feat)
        return out

    return jax.jit(run)


def per_layer_id(feats: dict, nres: int = 10, seed: int = 0) -> dict:
    """{probe: (N, D) stacked features} -> {probe: (mean_id, std_id)},
    ordered like PROBES (shallow -> deep) with 'head' last."""
    return {p: compute_id(np.asarray(v), nres=nres, seed=seed)
            for p, v in feats.items()}


def backbone_intrinsic_dim(model, params, images, probes=None,
                           nres: int = 5, grid: int = 4):
    """Run the backbone over a batch and estimate the per-layer TwoNN ID
    at every probe point (+ 'head').  Returns {probe: (mean, err)}."""
    fn = make_probe_fn(model, grid=grid)
    feats = fn(params, jnp.asarray(images))
    if probes is not None:
        feats = {p: v for p, v in feats.items() if p in probes}
    return per_layer_id(feats, nres=nres)
