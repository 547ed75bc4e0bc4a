"""RoI crop-and-resize pooling on device.

Reimplements tf.image.crop_and_resize bilinear semantics exactly
(ref: lib/nets/network.py:143-159 `_crop_pool_layer`, resnet variant
lib/nets/resnet_v1.py:60-81): boxes are normalized (y1, x1, y2, x2) over
the (H-1, W-1) extent, sample grid index i in [0, crop-1] maps to
y1*(H-1) + i*(y2-y1)*(H-1)/(crop-1), bilinear with extrapolation value 0
outside the image.

Implemented as separable bilinear-interpolation MATMULS: per RoI a
(S, H) row-weight matrix and an (S, W) column-weight matrix (each row
two nonzeros — the bilinear taps), applied as out = A @ feat @ B^T over
R-chunks.  On TPU this runs on the MXU; the naive 4-corner gather
formulation (kept below as `crop_and_resize_gather`) bottoms out at
<10% of HBM bandwidth in XLA's gather lowering and dominated the whole
detection forward (measured ~3.5 ms vs ~0.2 ms for 300 RoIs of a
38x64x1024 res101 feature map).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _interp_weights(coords: jnp.ndarray, size: int, dtype) -> jnp.ndarray:
    """coords: (R, S) continuous sample positions along an axis of length
    `size`.  Returns (R, S, size) bilinear tap weights; rows for samples
    outside [0, size-1] are all-zero (tf extrapolation_value=0)."""
    valid = (coords >= 0) & (coords <= size - 1)
    c0 = jnp.floor(coords)
    frac = coords - c0
    c0i = jnp.clip(c0, 0, size - 1).astype(jnp.int32)
    c1i = jnp.clip(c0i + 1, 0, size - 1)
    iota = jnp.arange(size, dtype=jnp.int32)
    w = ((iota[None, None, :] == c0i[..., None]) * (1.0 - frac[..., None])
         + (iota[None, None, :] == c1i[..., None]) * frac[..., None])
    return jnp.where(valid[..., None], w, 0.0).astype(dtype)


def _sample_grid(boxes: jnp.ndarray, h: int, w: int, crop_size: int):
    """Continuous sample positions of tf.image.crop_and_resize."""
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    if crop_size > 1:
        hs = (y2 - y1) * (h - 1) / (crop_size - 1)
        ws = (x2 - x1) * (w - 1) / (crop_size - 1)
        grid = jnp.arange(crop_size, dtype=boxes.dtype)
        in_y = y1[:, None] * (h - 1) + grid[None, :] * hs[:, None]  # (R, S)
        in_x = x1[:, None] * (w - 1) + grid[None, :] * ws[:, None]
    else:
        in_y = (0.5 * (y1 + y2) * (h - 1))[:, None]
        in_x = (0.5 * (x1 + x2) * (w - 1))[:, None]
    return in_y, in_x


@functools.partial(jax.jit, static_argnames=('crop_size',))
def crop_and_resize(feat: jnp.ndarray, boxes: jnp.ndarray,
                    crop_size: int) -> jnp.ndarray:
    """feat: (H, W, C); boxes: (R, 4) normalized (y1, x1, y2, x2).
    Returns (R, crop_size, crop_size, C).

    out[r] = A_r @ feat @ B_r^T with A_r/B_r the bilinear tap weights —
    two MXU contractions per R-chunk (chunked so the (chunk, S, W, C)
    intermediate stays small)."""
    h, w, c = feat.shape
    r = boxes.shape[0]
    in_y, in_x = _sample_grid(boxes.astype(jnp.float32), h, w, crop_size)
    A = _interp_weights(in_y, h, feat.dtype)      # (R, S, H)
    B = _interp_weights(in_x, w, feat.dtype)      # (R, S, W)

    chunk = min(r, 64)
    pad = (-r) % chunk
    if pad:
        A = jnp.pad(A, ((0, pad), (0, 0), (0, 0)))
        B = jnp.pad(B, ((0, pad), (0, 0), (0, 0)))
    nc = (r + pad) // chunk
    s = A.shape[1]
    A4 = A.reshape(nc, chunk, s, h)
    B4 = B.reshape(nc, chunk, s, w)

    def step(_, ab):
        a, b = ab
        # HIGHEST: the tap weights are fractional — Precision.DEFAULT
        # would round them (and the features) to bf16 on the MXU, a
        # silent ~2^-8 quantization of the detection path that CPU tests
        # can't observe.  Cost is negligible at (64,S,H)x(H,W,C) shapes.
        t = jnp.einsum('riy,yxc->rixc', a, feat,
                       precision=jax.lax.Precision.HIGHEST)
        return None, jnp.einsum('rixc,rjx->rijc', t, b,
                                precision=jax.lax.Precision.HIGHEST)

    _, out = jax.lax.scan(step, None, (A4, B4))
    return out.reshape(nc * chunk, s, s, c)[:r]


@functools.partial(jax.jit, static_argnames=('crop_size',))
def crop_and_resize_gather(feat: jnp.ndarray, boxes: jnp.ndarray,
                           crop_size: int) -> jnp.ndarray:
    """Gather-formulation twin of `crop_and_resize` (4-corner lerp).
    Kept as the cross-check oracle; same semantics, different rounding
    (lerp vs weighted sum)."""
    h, w, c = feat.shape
    r = boxes.shape[0]
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    if crop_size > 1:
        hs = (y2 - y1) * (h - 1) / (crop_size - 1)
        ws = (x2 - x1) * (w - 1) / (crop_size - 1)
        grid = jnp.arange(crop_size, dtype=feat.dtype)
        in_y = y1[:, None] * (h - 1) + grid[None, :] * hs[:, None]  # (R, S)
        in_x = x1[:, None] * (w - 1) + grid[None, :] * ws[:, None]
    else:
        in_y = (0.5 * (y1 + y2) * (h - 1))[:, None]
        in_x = (0.5 * (x1 + x2) * (w - 1))[:, None]

    # bilinear corners with out-of-range -> 0 extrapolation
    def sample(in_y, in_x):
        valid_y = (in_y >= 0) & (in_y <= h - 1)            # (R, S)
        valid_x = (in_x >= 0) & (in_x <= w - 1)
        y0 = jnp.floor(in_y)
        x0 = jnp.floor(in_x)
        ly = in_y - y0
        lx = in_x - x0
        y0 = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
        x0 = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
        y1i = jnp.clip(y0 + 1, 0, h - 1)
        x1i = jnp.clip(x0 + 1, 0, w - 1)

        flat = feat.reshape(h * w, c)

        def g(yi, xi):  # (R,Sy),(R,Sx) -> (R,Sy,Sx,C)
            idx = yi[:, :, None] * w + xi[:, None, :]
            return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
                r, yi.shape[1], xi.shape[1], c)

        top_left = g(y0, x0)
        top_right = g(y0, x1i)
        bot_left = g(y1i, x0)
        bot_right = g(y1i, x1i)
        ly_ = ly[:, :, None, None]
        lx_ = lx[:, None, :, None]
        top = top_left + (top_right - top_left) * lx_
        bot = bot_left + (bot_right - bot_left) * lx_
        out = top + (bot - top) * ly_
        mask = (valid_y[:, :, None] & valid_x[:, None, :])[..., None]
        return jnp.where(mask, out, 0.0)

    return sample(in_y, in_x)


def max_pool_2x2_same(x: jnp.ndarray) -> jnp.ndarray:
    """slim.max_pool2d([2,2], padding='SAME') over (R, H, W, C)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), 'SAME')


def roi_boxes_to_normalized(rois: jnp.ndarray, feat_hw, feat_stride: float
                            ) -> jnp.ndarray:
    """Convert image-space rois (R, 4) (x1, y1, x2, y2) to the normalized
    (y1, x1, y2, x2) boxes of _crop_pool_layer (ref network.py:146-155):
    divide by (feat_dim - 1) * stride."""
    fh, fw = feat_hw
    height = (fh - 1.0) * feat_stride
    width = (fw - 1.0) * feat_stride
    x1 = rois[:, 0] / width
    y1 = rois[:, 1] / height
    x2 = rois[:, 2] / width
    y2 = rois[:, 3] / height
    return jnp.stack([y1, x1, y2, x2], axis=1)
