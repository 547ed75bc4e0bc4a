"""Bilinear image resize as separable banded-matrix matmuls (MXU).

Replaces the eval harness's per-chunk host hop (device noise -> host
cv2.resize -> device forward; ref lib/model/test.py:49-83 does the resize
with cv2.INTER_LINEAR on the host).  The weights reproduce cv2's
INTER_LINEAR coordinate convention exactly:

  dsize   = (cvRound(w*scale), cvRound(h*scale))     [computed by the
             caller on the host, double precision, so the geometry is
             bit-identical to utils.blob.prep_im_for_blob]
  src_y   = (dst_y + 0.5) / scale - 0.5              [when called with
             fx/fy, cv2 maps with the REQUESTED scale, not one recomputed
             from the rounded dsize — verified numerically]
  2-tap   = (1-f) * row[i0] + f * row[i0+1], source coordinate clamped to
            [0, n-1] (f saturates to 1 at the far edge).

A resize is then two matmuls: rows (PH, BH) @ (BH, BW*3) and columns over
the result — banded matrices with 2 nonzeros per row, dense on the MXU
(the same gathers-are-slow reformulation as ops/roi_align.py).  Rows and
columns beyond the true output extent get all-zero weights, so the output
arrives already zero-padded to the static bucket (pad_to_bucket semantics)
with no extra pass.

Precision: coordinates are computed in f32 (cv2 uses double) — the ratio
rounding error is <= ~1e-4 of a pixel at 1000-px extents, i.e. <= ~0.05
u8-domain levels through the 2-tap kernel; the matmuls run at
Precision.HIGHEST so accumulation is f32-exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_weights(out_size: int, in_size: int, out_len, in_len, scale):
    """(out_size, in_size) f32 bilinear row-weights.

    out_size/in_size: static canvas extents.  out_len/in_len: true
    (traced or static) extents — rows >= out_len are zero, columns read
    only [0, in_len).  scale: the cv2 fx/fy factor (out ~= in * scale);
    cv2 INTER_LINEAR convention (see module doc).
    """
    out_len = jnp.asarray(out_len, jnp.float32)
    in_len = jnp.asarray(in_len, jnp.float32)
    ratio = 1.0 / jnp.asarray(scale, jnp.float32)
    y = jnp.arange(out_size, dtype=jnp.float32)
    s = jnp.clip((y + 0.5) * ratio - 0.5, 0.0, in_len - 1.0)
    i0 = jnp.clip(jnp.floor(s), 0.0, jnp.maximum(in_len - 2.0, 0.0))
    f = s - i0
    i = jnp.arange(in_size, dtype=jnp.float32)
    w = ((i[None, :] == i0[:, None]) * (1.0 - f)[:, None]
         + (i[None, :] == i0[:, None] + 1.0) * f[:, None])
    return jnp.where((y < out_len)[:, None], w, 0.0)


def resize_to_bucket(img: jnp.ndarray, h0, w0, oh, ow, scale,
                     out_bucket: tuple) -> jnp.ndarray:
    """Bilinear-resize the valid (h0, w0) region of `img` (a (BH, BW, C)
    canvas) by `scale` to (oh, ow), zero-padded into a (PH, PW, C) bucket.

    h0/w0/oh/ow/scale may be traced scalars; cv2 parity requires the
    caller to compute scale and oh = cvRound(h0*scale), ow =
    cvRound(w0*scale) on the host (prep_im_for_blob's double-precision
    rule).  Reads never touch rows >= h0 / cols >= w0, so a bucket-padded
    input needs no pre-crop.
    """
    ph, pw = out_bucket
    bh, bw = img.shape[0], img.shape[1]
    wh = resize_weights(ph, bh, oh, h0, scale)
    ww = resize_weights(pw, bw, ow, w0, scale)
    t = jnp.einsum('oh,hwc->owc', wh, img,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum('pw,owc->opc', ww, t,
                      precision=jax.lax.Precision.HIGHEST)


def prep_on_device(img: jnp.ndarray, h0, w0, oh, ow, scale, pixel_means,
                   out_bucket: tuple) -> jnp.ndarray:
    """Device twin of prep_im_for_blob + pad_to_bucket: mean-subtract the
    valid region, bilinear-resize to (oh, ow), zero-pad to `out_bucket`.

    The reference subtracts PIXEL_MEANS before resizing (blob.py:33-47);
    order is preserved (bilinear is linear, but the pad region must be
    zero AFTER the subtract — the zero weight rows guarantee that here).
    """
    x = img - jnp.asarray(pixel_means, jnp.float32)
    return resize_to_bucket(x, h0, w0, oh, ow, scale, out_bucket)
