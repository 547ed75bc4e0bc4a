"""Curvelet-style frequency-domain denoising, in-process.

The reference shells out to a separate python process wrapping CurveLab's
FDCT3D, keeps the top 50% of coefficients by magnitude, inverts, and round-
trips through temp.png (ref lib/model/fdct.py:232-341, invoked via
subprocess at lib/model/test.py:1829 with a hardcoded absolute path —
SURVEY.md §3.5 calls this out as the process-boundary hack to eliminate).

Here the same contract — redundant frequency transform, keep top-p
coefficients by magnitude, invert — runs as one jitted FFT program on
device.  Round 1 uses the full-image 2-D FFT as the frame (a curvelet is a
tight frame over FFT wedges; magnitude-thresholding the FFT keeps the same
dominant structures).  A windowed multi-scale wedge frame (UDCT) is the
planned upgrade.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpudenoise.noise.generators import saturate_u8, to_unit


@jax.jit
def curvelet_denoise_u8(img_u8: jnp.ndarray, keep: float = 0.5
                        ) -> jnp.ndarray:
    """Keep the top `keep` fraction of frequency coefficients by magnitude
    per channel (ref fdct.py:244-245 keeps 50%), zero the rest, invert."""
    x = to_unit(img_u8)
    f = jnp.fft.fft2(x, axes=(0, 1))
    mag = jnp.abs(f)
    # per-channel magnitude threshold at the (1-keep) quantile
    thresh = jnp.quantile(mag.reshape(-1, mag.shape[-1]), 1.0 - keep,
                          axis=0)
    f = jnp.where(mag >= thresh[None, None, :], f, 0.0)
    y = jnp.real(jnp.fft.ifft2(f, axes=(0, 1)))
    return saturate_u8(255.0 * y)
