"""On-device K-Means color quantization ("quant" noise).

The reference quantizes the LAB-space palette with sklearn MiniBatchKMeans
(k in {3, 7, 10}) per image on the host (ref: lib/model/test.py:592-765) —
the single most expensive host op in its pipeline.  Here: k-means++ style
init + full-batch Lloyd iterations, entirely on device.  The assignment
step is an (N, k) distance matrix = one MXU matmul; exact-RNG parity with
sklearn is impossible (different PRNG), so parity is statistical: same k,
same space (LAB), convergence to a (better) local optimum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpudenoise.ops.color import bgr_u8_to_lab_u8, lab_u8_to_bgr_u8


@functools.partial(jax.jit, static_argnames=('k', 'iters', 'sample'))
def kmeans(key, points: jnp.ndarray, k: int, iters: int = 15,
           sample: int = 8192, sample_idx=None):
    """Mini-batch k-means with k-means++ init.

    points: (N, D) float32.  Returns (centers (k, D), labels (N,)).

    When N > `sample`, the init and the iterations fit on a random
    subsample and only the final assignment touches every point.  The
    iterations are MINI-BATCH steps over cycling 1024-point slices of
    the fit set with sklearn's cumulative-count incremental update
    (c += (sum_B - |B|c) / v_new) — the reference's own estimator
    (sklearn MiniBatchKMeans, batch_size 1024, ref test.py:592-765).
    Full-batch Lloyd on the 8k fit set was 8x the per-step cost and
    measurably no better (inertia test vs sklearn, test_noise.py); the
    mini-batch step is what makes the fused-mix prologue's fit-every-
    image vmap affordable (0.21 -> ~0.06 ms/img at batch 64 on v5e).
    iters=15: inertia on the bundled demo photos (LAB space, k in
    {3,7,10}) stays within the 10%%-of-sklearn regression gate; halving
    the fit SET (4096) did cost 4-5%% on some images, so the fit-set
    size stays.

    sample_idx: optional precomputed (S,) fit-subsample indices — used by
    the bucketed path to draw the fit set from the VALID region only
    (padded garbage must not skew the palette).
    """
    all_points = points
    n = points.shape[0]
    if sample_idx is not None:
        points = points[sample_idx]
        n = points.shape[0]
    elif sample and n > sample:
        key, sub = jax.random.split(key)
        # with replacement: what MiniBatchKMeans effectively does across
        # batches, and it avoids a full N-element gumbel sort
        idx = jax.random.randint(sub, (sample,), 0, n)
        points = points[idx]
        n = sample

    # --- k-means++ init: sequential over k (k <= 10), each step one
    # (N,) distance reduction ---
    key, sub = jax.random.split(key)
    first = points[jax.random.randint(sub, (), 0, n)]
    centers0 = jnp.zeros((k, points.shape[1]), points.dtype).at[0].set(first)
    d2_0 = jnp.sum((points - first) ** 2, axis=-1)

    def init_step(carry, i):
        centers, d2, key = carry
        key, sub = jax.random.split(key)
        # sample proportionally to d2 via Gumbel-max on log d2
        logits = jnp.log(jnp.maximum(d2, 1e-12))
        g = jax.random.gumbel(sub, (n,))
        idx = jnp.argmax(logits + g)
        c = points[idx]
        centers = centers.at[i].set(c)
        d2 = jnp.minimum(d2, jnp.sum((points - c) ** 2, axis=-1))
        return (centers, d2, key), None

    # unroll: the init/Lloyd bodies are tiny (8k-point ops), so the scan
    # is sequential-step-overhead-bound on TPU; unrolling lets XLA fuse
    # consecutive steps (identical math and stream)
    (centers, _, key), _ = jax.lax.scan(
        init_step, (centers0, d2_0, key), jnp.arange(1, k), unroll=3)

    # --- mini-batch steps: assignment via matmul (MXU), sklearn's
    # cumulative-count incremental center update ---
    x2 = jnp.sum(points ** 2, axis=-1, keepdims=True)  # (N, 1)
    mb = min(1024, n)

    def step(carry, i):
        centers, cum = carry
        start = jax.lax.rem(i * mb, jnp.int32(n))
        pts = jax.lax.dynamic_slice(points, (start, jnp.int32(0)),
                                    (mb, points.shape[1]))
        px2 = jax.lax.dynamic_slice(x2, (start, jnp.int32(0)), (mb, 1))
        c2 = jnp.sum(centers ** 2, axis=-1)            # (k,)
        # ||x - c||^2 = x2 - 2 x.c + c2
        d = px2 - 2.0 * pts @ centers.T + c2[None, :]
        labels = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(labels, k, dtype=points.dtype)  # (mb, k)
        counts = onehot.sum(axis=0)                    # (k,)
        sums = onehot.T @ pts                          # (k, D) — MXU
        cum = cum + counts
        # empty batches leave the center in place (sums = counts = 0)
        centers = centers + ((sums - counts[:, None] * centers)
                             / jnp.maximum(cum[:, None], 1.0))
        return (centers, cum), None

    (centers, _), _ = jax.lax.scan(
        step, (centers, jnp.zeros((k,), points.dtype)),
        jnp.arange(iters, dtype=jnp.int32), unroll=5)

    # full-batch Lloyd polish: 3 classic mean-replacement steps pull the
    # mini-batch solution inside the 10%-of-sklearn inertia gate at ~1/4
    # the old full-batch-every-step cost
    def lloyd(centers, _):
        c2 = jnp.sum(centers ** 2, axis=-1)
        d = x2 - 2.0 * points @ centers.T + c2[None, :]
        labels = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(labels, k, dtype=points.dtype)
        counts = onehot.sum(axis=0)
        sums = onehot.T @ points
        new_centers = sums / jnp.maximum(counts[:, None], 1.0)
        new_centers = jnp.where(counts[:, None] > 0, new_centers, centers)
        return new_centers, None

    centers, _ = jax.lax.scan(lloyd, centers, None, length=3, unroll=3)
    # final assignment over ALL points (fit may have been subsampled)
    ax2 = jnp.sum(all_points ** 2, axis=-1, keepdims=True)
    c2 = jnp.sum(centers ** 2, axis=-1)
    d = ax2 - 2.0 * all_points @ centers.T + c2[None, :]
    labels = jnp.argmin(d, axis=-1)
    return centers, labels


K_PAD = 10  # max cluster count in the reference grammar (quant_var10)


def kmeans_fit_traced_k(key, points: jnp.ndarray, kk) -> tuple:
    """The `kmeans` fit with the cluster count as TRACED data.

    points: (S, D) float32 — the (already-subsampled) fit set; kk: traced
    int32 in [1, K_PAD].  Returns (centers (K_PAD, D), active (K_PAD,)
    bool).  Stream parity with the static-k `kmeans` fit is exact: the
    init scan consumes one key split per step regardless of k in both
    versions, so for the same key and fit set the first kk centers are
    bit-identical to `kmeans(key, pts, k=kk)` (tests/test_pallas_mix.py
    pins it).  Used by the fused Pallas mix kernel's prologue, where the
    drawn quant level (k in {3, 7, 10}) is per-image data.
    """
    n = points.shape[0]
    active = jnp.arange(K_PAD) < kk

    key, sub = jax.random.split(key)
    first = points[jax.random.randint(sub, (), 0, n)]
    centers0 = jnp.zeros((K_PAD, points.shape[1]),
                         points.dtype).at[0].set(first)
    d2_0 = jnp.sum((points - first) ** 2, axis=-1)

    def init_step(carry, i):
        centers, d2, key = carry
        key, sub = jax.random.split(key)
        logits = jnp.log(jnp.maximum(d2, 1e-12))
        g = jax.random.gumbel(sub, (n,))
        idx = jnp.argmax(logits + g)
        c = points[idx]
        live = i < kk
        centers = jnp.where(live, centers.at[i].set(c), centers)
        d2 = jnp.where(live,
                       jnp.minimum(d2, jnp.sum((points - c) ** 2, -1)), d2)
        return (centers, d2, key), None

    (centers, _, key), _ = jax.lax.scan(
        init_step, (centers0, d2_0, key), jnp.arange(1, K_PAD), unroll=3)

    x2 = jnp.sum(points ** 2, axis=-1, keepdims=True)
    inf = jnp.float32(jnp.inf)
    mb = min(1024, n)

    def step(carry, i):
        centers, cum = carry
        start = jax.lax.rem(i * mb, jnp.int32(n))
        pts = jax.lax.dynamic_slice(points, (start, jnp.int32(0)),
                                    (mb, points.shape[1]))
        px2 = jax.lax.dynamic_slice(x2, (start, jnp.int32(0)), (mb, 1))
        c2 = jnp.sum(centers ** 2, axis=-1)
        d = px2 - 2.0 * pts @ centers.T + c2[None, :]
        d = jnp.where(active[None, :], d, inf)
        labels = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(labels, K_PAD, dtype=points.dtype)
        counts = onehot.sum(axis=0)
        sums = onehot.T @ pts
        cum = cum + counts
        # inactive/empty slots see counts = sums = 0 -> zero delta
        centers = centers + ((sums - counts[:, None] * centers)
                             / jnp.maximum(cum[:, None], 1.0))
        return (centers, cum), None

    (centers, _), _ = jax.lax.scan(
        step, (centers, jnp.zeros((K_PAD,), points.dtype)),
        jnp.arange(15, dtype=jnp.int32), unroll=5)

    def lloyd(centers, _):
        c2 = jnp.sum(centers ** 2, axis=-1)
        d = x2 - 2.0 * points @ centers.T + c2[None, :]
        d = jnp.where(active[None, :], d, inf)
        labels = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(labels, K_PAD, dtype=points.dtype)
        counts = onehot.sum(axis=0)
        sums = onehot.T @ points
        new_centers = sums / jnp.maximum(counts[:, None], 1.0)
        new_centers = jnp.where(counts[:, None] > 0, new_centers, centers)
        return jnp.where(active[:, None], new_centers, centers), None

    centers, _ = jax.lax.scan(lloyd, centers, None, length=3, unroll=3)
    return centers, active


def quantize_colors(key, img_u8: jnp.ndarray, k: int,
                    iters: int = 15, hw=None) -> jnp.ndarray:
    """The 'quant' noise: BGR->LAB, k-means palette, truncate centers to u8,
    palette-map every pixel, LAB->BGR (ref test.py:594-765: centers cast via
    .astype('uint8') — truncation, preserved).

    hw: optional valid (h, w) extent of a bucket-padded canvas; the
    palette then fits on a subsample drawn from the valid region only
    (dynamic randint bounds); the final palette map still covers the full
    canvas (pad output is cropped by the caller)."""
    h, w = img_u8.shape[0], img_u8.shape[1]
    lab = bgr_u8_to_lab_u8(img_u8)
    pts = lab.reshape(-1, 3)
    if hw is None:
        centers, labels = kmeans(key, pts, k=k, iters=iters)
    else:
        key, ky, kx = jax.random.split(key, 3)
        ys = jax.random.randint(ky, (8192,), 0, hw[0])
        xs = jax.random.randint(kx, (8192,), 0, hw[1])
        centers, labels = kmeans(key, pts, k=k, iters=iters,
                                 sample_idx=ys * w + xs)
    centers_u8 = jnp.trunc(jnp.clip(centers, 0.0, 255.0))
    # LAB->BGR commutes with the palette lookup (elementwise on k
    # distinct colors), so convert the (k, 3) centers, not the (H, W, 3)
    # palette image — drops a full-image transcendental pass,
    # bit-identical output
    bgr_centers = lab_u8_to_bgr_u8(centers_u8)
    # palette map as one-hot matmul, not bgr_centers[labels]: a 600k-row
    # gather costs ~30 ms on v5e, the (N, k) @ (k, 3) matmul is free
    onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
    return (onehot @ bgr_centers).reshape(h, w, 3)
