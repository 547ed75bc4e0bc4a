"""Anchor generation.

Base-anchor enumeration matches the reference's MATLAB-derived golden table
(ref: lib/layer_utils/generate_anchors.py:41-107, golden values at :14-39);
the H x W grid shift matches generate_anchors_pre / _pre_tf
(ref: lib/layer_utils/snippets.py:14-49) including the _tf path's int32
truncation of base anchors before shifting.

Base anchors are tiny static data — computed in numpy at trace time; the
grid expansion is jnp so it fuses into the jitted graph.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def generate_anchors(base_size: int = 16,
                     ratios=(0.5, 1, 2),
                     scales=(8, 16, 32)) -> np.ndarray:
    """9 base anchors around the (0,0,15,15) window
    (ref generate_anchors.py:41-54)."""
    ratios = np.asarray(ratios, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    base_anchor = np.array([1, 1, base_size, base_size], dtype=np.float64) - 1
    ratio_anchors = _ratio_enum(base_anchor, ratios)
    return np.vstack([_scale_enum(ratio_anchors[i, :], scales)
                      for i in range(ratio_anchors.shape[0])])


def _whctrs(anchor):
    w = anchor[2] - anchor[0] + 1
    h = anchor[3] - anchor[1] + 1
    x_ctr = anchor[0] + 0.5 * (w - 1)
    y_ctr = anchor[1] + 0.5 * (h - 1)
    return w, h, x_ctr, y_ctr


def _mkanchors(ws, hs, x_ctr, y_ctr):
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack((x_ctr - 0.5 * (ws - 1),
                      y_ctr - 0.5 * (hs - 1),
                      x_ctr + 0.5 * (ws - 1),
                      y_ctr + 0.5 * (hs - 1)))


def _ratio_enum(anchor, ratios):
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    size = w * h
    size_ratios = size / ratios
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * ratios)
    return _mkanchors(ws, hs, x_ctr, y_ctr)


def _scale_enum(anchor, scales):
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    ws = w * scales
    hs = h * scales
    return _mkanchors(ws, hs, x_ctr, y_ctr)


def anchor_grid(height: int, width: int, feat_stride: int = 16,
                anchor_scales=(8, 16, 32),
                anchor_ratios=(0.5, 1, 2)) -> jnp.ndarray:
    """Shift base anchors over the H x W feature grid -> (H*W*A, 4) float32.

    Matches generate_anchors_pre_tf (ref snippets.py:32-49): base anchors are
    truncated to int32 before adding integer shifts, then cast to float.
    Row-major over (y, x) with anchors innermost ("width changes faster",
    ref snippets.py:25).
    """
    base = generate_anchors(ratios=np.array(anchor_ratios),
                            scales=np.array(anchor_scales))
    base = base.astype(np.int32)  # _tf path truncation (snippets.py:41)
    A = base.shape[0]
    shift_x = jnp.arange(width, dtype=jnp.int32) * feat_stride
    shift_y = jnp.arange(height, dtype=jnp.int32) * feat_stride
    sx, sy = jnp.meshgrid(shift_x, shift_y)          # (H, W) each
    shifts = jnp.stack([sx.ravel(), sy.ravel(),
                        sx.ravel(), sy.ravel()], axis=1)  # (K, 4)
    anchors = jnp.asarray(base)[None, :, :] + shifts[:, None, :]  # (K, A, 4)
    return anchors.reshape(-1, 4).astype(jnp.float32)


def num_anchors(anchor_scales=(8, 16, 32), anchor_ratios=(0.5, 1, 2)) -> int:
    return len(anchor_scales) * len(anchor_ratios)
