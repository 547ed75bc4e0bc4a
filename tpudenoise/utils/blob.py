"""Blob helpers (ref lib/utils/blob.py:17-47) — kept as standalone API for
reference parity; the loader and model preprocessing use the same logic."""

from __future__ import annotations

import numpy as np


def im_list_to_blob(ims) -> np.ndarray:
    """Zero-pad a list of (H, W, 3) images to the max shape -> (N, H, W, 3)
    (ref blob.py:17-30)."""
    max_shape = np.array([im.shape for im in ims]).max(axis=0)
    blob = np.zeros((len(ims), max_shape[0], max_shape[1], 3), np.float32)
    for i, im in enumerate(ims):
        blob[i, :im.shape[0], :im.shape[1], :] = im
    return blob


def prep_im_for_blob(im: np.ndarray, pixel_means, target_size: int,
                     max_size: int):
    """Mean-subtract + min-side/max-side rescale (ref blob.py:33-47).
    The single source of truth for the rescale rule — the loader, eval
    harness and model preprocess all call this."""
    import cv2
    im = im.astype(np.float32, copy=False) - pixel_means
    im_shape = im.shape
    im_size_min = np.min(im_shape[0:2])
    im_size_max = np.max(im_shape[0:2])
    im_scale = float(target_size) / float(im_size_min)
    if np.round(im_scale * im_size_max) > max_size:
        im_scale = float(max_size) / float(im_size_max)
    im = cv2.resize(im, None, None, fx=im_scale, fy=im_scale,
                    interpolation=cv2.INTER_LINEAR)
    return im, im_scale


def _round_up(v: int, m: int = 32) -> int:
    return ((int(v) + m - 1) // m) * m


def derive_bucket(target_size: int, max_size: int,
                  portrait: bool = False) -> tuple:
    """Static padded bucket covering every min-side/max-side rescale of the
    given geometry: (short, long) for landscape, (long, short) for
    portrait, rounded up to 32."""
    s = _round_up(target_size)
    m = _round_up(max_size)
    return (m, s) if portrait else (s, m)
