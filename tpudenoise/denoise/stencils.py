"""Classical denoise stencils: 3x3 gaussian blur, 3x3 mean, 3x3 median,
9x9 bilateral — the reference's cv2 filter set (ref lib/model/test.py
kernel constants: blur/mean/median ksize 3, bilateral d=9 sigmaColor=20
sigmaSpace=100 BORDER_CONSTANT; BASELINE.md "Denoise kernel constants").

All functions take/return float32 images in the u8 domain ([0, 255]
integer values) with shape (H, W, C) and vmap over a batch.  They are
written as shifted-slice sums — XLA fuses these into single VPU passes; a
Pallas tiled variant of the bilateral (the only compute-heavy one) lives in
pallas_kernels.py.

OpenCV parity notes (validated in tests/test_denoise.py):
  * GaussianBlur(ksize=3, sigma=0) uses the fixed small-kernel tap set
    [1/4, 1/2, 1/4] separable.
  * Default border for blur/gaussian is BORDER_REFLECT_101 == np.pad
    'reflect'; medianBlur uses BORDER_REPLICATE == np.pad 'edge'.
  * u8 outputs round half away... OpenCV rounds to nearest even (cvRound);
    we use jnp.round (also half-to-even).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _reflect101_pad(img: jnp.ndarray, r: int) -> jnp.ndarray:
    return jnp.pad(img, ((r, r), (r, r), (0, 0)), mode='reflect')


def _replicate_pad(img: jnp.ndarray, r: int) -> jnp.ndarray:
    return jnp.pad(img, ((r, r), (r, r), (0, 0)), mode='edge')


def _separable3(img: jnp.ndarray, k0: float, k1: float) -> jnp.ndarray:
    """Apply the symmetric 3-tap kernel [k0, k1, k0] along H then W with
    REFLECT_101 borders."""
    p = _reflect101_pad(img, 1)
    h = k0 * p[:-2] + k1 * p[1:-1] + k0 * p[2:]
    out = k0 * h[:, :-2] + k1 * h[:, 1:-1] + k0 * h[:, 2:]
    return out


def gaussian_blur3(img: jnp.ndarray, round_u8: bool = True) -> jnp.ndarray:
    """cv2.GaussianBlur(img, (3,3), 0): fixed taps [1,2,1]/4 separable.

    cv2's u8 fixed-point path rounds half UP (verified empirically — exact
    match with floor(x+0.5), while half-to-even differs on 3% of pixels).
    The dyadic taps make the f32 sums exact, so parity is bit-level.
    """
    out = _separable3(img, 0.25, 0.5)
    return jnp.floor(out + 0.5) if round_u8 else out


def mean3(img: jnp.ndarray, round_u8: bool = True) -> jnp.ndarray:
    """cv2.blur(img, (3,3)): normalized box filter."""
    out = _separable3(img, 1.0, 1.0) * (1.0 / 9.0)
    return jnp.round(out) if round_u8 else out


def median3(img: jnp.ndarray) -> jnp.ndarray:
    """cv2.medianBlur(img, 3): per-channel 3x3 median, BORDER_REPLICATE.

    Median of 9 via a minimal exchange network (19 compare-exchanges) —
    pure VPU min/max, exact for integer-valued floats.
    """
    p = _replicate_pad(img, 1)
    v = [p[dy:dy + img.shape[0], dx:dx + img.shape[1]]
         for dy in range(3) for dx in range(3)]

    def cas(i, j):
        lo = jnp.minimum(v[i], v[j])
        hi = jnp.maximum(v[i], v[j])
        v[i], v[j] = lo, hi

    # Paeth's 9-element median network
    for (i, j) in [(1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7),
                   (1, 2), (4, 5), (7, 8), (0, 3), (5, 8), (4, 7),
                   (3, 6), (1, 4), (2, 5), (4, 7), (4, 2), (6, 4),
                   (4, 2)]:
        cas(i, j)
    return v[4]


@functools.partial(jax.jit, static_argnames=('d',))
def bilateral(img: jnp.ndarray, d: int = 9, sigma_color: float = 20.0,
              sigma_space: float = 100.0) -> jnp.ndarray:
    """cv2.bilateralFilter(img, d=9, sigmaColor=20, sigmaSpace=100,
    borderType=cv2.BORDER_CONSTANT).

    OpenCV semantics for 8-bit color:
      * radius = d // 2; taps restricted to the disk sqrt(i^2+j^2) <= r
      * space weight exp(-(i^2+j^2) / (2 sigma_space^2))
      * color weight exp(-(|dB|+|dG|+|dR|)^2 / (2 sigma_color^2)) shared by
        all three channels
      * constant (zero) border pixels participate with full weighting
      * out = round(sum w * v / sum w)

    Implemented as a sum over the ~69 disk taps of shifted images — one
    fused VPU loop under XLA.
    """
    r = d // 2
    h, w, _ = img.shape
    p = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode='constant')
    gc = -0.5 / (sigma_color * sigma_color)
    gs = -0.5 / (sigma_space * sigma_space)

    num = jnp.zeros_like(img)
    den = jnp.zeros(img.shape[:2] + (1,), img.dtype)
    center = img
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            rad2 = dy * dy + dx * dx
            if math.sqrt(rad2) > r:
                continue
            sw = math.exp(gs * rad2)
            v = jax.lax.dynamic_slice(p, (dy + r, dx + r, 0), (h, w, 3))
            diff = jnp.sum(jnp.abs(v - center), axis=-1, keepdims=True)
            wgt = sw * jnp.exp(gc * diff * diff)
            num = num + wgt * v
            den = den + wgt
    return jnp.round(num / den)
