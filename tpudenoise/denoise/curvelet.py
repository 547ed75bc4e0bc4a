"""Curvelet-frame denoising, in-process and on device.

The reference shells out to a separate python process wrapping CurveLab's
FDCT3D, keeps the top 50% of coefficients by magnitude, inverts, and
round-trips through temp.png (ref lib/model/fdct.py:232-341, invoked via
subprocess at lib/model/test.py:1829 with a hardcoded absolute path —
SURVEY.md §3.5 calls this out as the process-boundary hack to eliminate).

Implementation: a uniform discrete curvelet-style frame built directly in
the 2-D FFT domain — `nbscales` dyadic radial bands split into
`nbangles` angular wedges (mirroring fdct.py's nbscales=4,
nbangles_coarse=16 defaults), with smooth squared-cosine windows forming a
partition of unity (sum of squared windows == 1 everywhere), so
analysis -> synthesis is EXACT up to float error.  Coefficient magnitudes
are measured per band in the image domain, the global top-`keep` fraction
survives (ref fdct.py:244-245 keeps 50%), and the image is re-synthesized.
Everything is jnp: one jitted program, no subprocess, batched via vmap.

`curvelet_denoise_u8` keeps a plain-FFT fallback for tiny images where the
wedge windows degenerate.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from tpudenoise.noise.generators import saturate_u8, to_unit


@functools.lru_cache(maxsize=8)
def _wedge_windows(h: int, w: int, nbscales: int, nbangles: int):
    """Build the squared-cosine partition-of-unity windows (numpy, cached
    per shape): returns (n_bands, h, w) float32 with sum(win^2) == 1."""
    fy = np.fft.fftfreq(h)[:, None]          # [-0.5, 0.5)
    fx = np.fft.fftfreq(w)[None, :]
    r = np.sqrt(fy * fy + fx * fx) / 0.5     # radius normalized to [0, ~1.4]
    theta = np.arctan2(fy, fx)               # [-pi, pi]

    # radial partition: lowpass + (nbscales-1) dyadic annuli; squared-cos
    # crossfades so sum of squares = 1
    edges = [0.5 ** (nbscales - s) for s in range(1, nbscales)] + [2.0]
    # e.g. nbscales=4: [0.125, 0.25, 0.5, 2.0]

    def rise(x):  # smooth 0->1 on [0,1]
        x = np.clip(x, 0.0, 1.0)
        return np.sin(0.5 * np.pi * x)

    radial = []
    prev_edge = 0.0
    for si, edge in enumerate(edges):
        lo = prev_edge
        hi = edge
        if si == 0:
            up = 1.0 - rise((r - 0.5 * hi) / (0.5 * hi)) ** 2
            band = np.sqrt(np.clip(up, 0, 1))
        else:
            # rises over [lo/2? ...] — crossfade against the previous band
            up = rise((r - 0.5 * lo) / (0.5 * lo)) ** 2
            if si < len(edges) - 1:
                down = 1.0 - rise((r - 0.5 * hi) / (0.5 * hi)) ** 2
                band = np.sqrt(np.clip(up * down, 0, 1))
            else:
                band = np.sqrt(np.clip(up, 0, 1))
        radial.append(band)
        prev_edge = edge
    # enforce exact partition of unity radially
    norm = np.sqrt(np.sum([b * b for b in radial], axis=0))
    radial = [b / np.maximum(norm, 1e-12) for b in radial]

    # angular wedges (applied to all but the lowpass band); squared-cos
    # overlapping bumps over 2*pi with sum of squares = 1
    windows = [radial[0]]
    for si, band in enumerate(radial[1:], start=1):
        n_ang = max(nbangles // (2 ** (len(radial) - 1 - si)), 4)
        width = 2 * np.pi / n_ang
        ang_sum = np.zeros((h, w))
        bumps = []
        for a in range(n_ang):
            center = -np.pi + (a + 0.5) * width
            d = np.angle(np.exp(1j * (theta - center)))
            bump = np.cos(0.5 * np.pi * np.clip(np.abs(d) / width, 0, 1))
            bumps.append(bump)
            ang_sum += bump * bump
        ang_norm = np.sqrt(np.maximum(ang_sum, 1e-12))
        for bump in bumps:
            windows.append(band * bump / ang_norm)
    return np.stack(windows).astype(np.float32)


def _frame_denoise_channel(x: jnp.ndarray, wins: jnp.ndarray,
                           keep: float) -> jnp.ndarray:
    """One channel: analysis into wedge bands, global top-`keep` magnitude
    threshold over all coefficients, synthesis."""
    f = jnp.fft.fft2(x)
    band_f = wins * f[None]                       # (n_bands, h, w)
    coeffs = jnp.fft.ifft2(band_f, axes=(1, 2))   # image-domain coeffs
    mag = jnp.abs(coeffs)
    thresh = jnp.quantile(mag.reshape(-1), 1.0 - keep)
    kept = jnp.where(mag >= thresh, coeffs, 0.0)
    # synthesis: window again in the FFT domain and sum (tight frame)
    syn = jnp.sum(wins * jnp.fft.fft2(kept, axes=(1, 2)), axis=0)
    return jnp.real(jnp.fft.ifft2(syn))


@functools.partial(jax.jit, static_argnames=('keep', 'nbscales',
                                             'nbangles'))
def curvelet_denoise_u8(img_u8: jnp.ndarray, keep: float = 0.5,
                        nbscales: int = 4, nbangles: int = 16
                        ) -> jnp.ndarray:
    """Wedge-frame denoise of a (H, W, 3) u8-domain image: keep the top
    `keep` fraction of curvelet coefficients by magnitude (ref
    fdct.py:244-245, 261: nbscales=4, nbangles_coarse=16), reconstruct,
    saturate to u8."""
    h, w = img_u8.shape[0], img_u8.shape[1]
    x = to_unit(img_u8)
    if min(h, w) < 32:  # degenerate geometry: plain FFT threshold
        f = jnp.fft.fft2(x, axes=(0, 1))
        mag = jnp.abs(f)
        thresh = jnp.quantile(mag.reshape(-1, 3), 1.0 - keep, axis=0)
        f = jnp.where(mag >= thresh[None, None, :], f, 0.0)
        y = jnp.real(jnp.fft.ifft2(f, axes=(0, 1)))
        return saturate_u8(255.0 * y)
    wins = jnp.asarray(_wedge_windows(h, w, nbscales, nbangles))
    y = jnp.stack([_frame_denoise_channel(x[..., c], wins, keep)
                   for c in range(3)], axis=-1)
    return saturate_u8(255.0 * y)
