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


def rescale_geometry(h: int, w: int, target_size: int, max_size: int):
    """The min-side/max-side rescale rule (ref blob.py:33-47), geometry
    only: returns (scale, out_h, out_w) with cv2's rounded dsize.  The
    single source of truth — prep_im_for_blob (host resize), the eval
    harness's device-prep path and the resize parity tests all call
    this; double precision so im_info is identical everywhere."""
    im_scale = float(target_size) / float(min(h, w))
    if np.round(im_scale * max(h, w)) > max_size:
        im_scale = float(max_size) / float(max(h, w))
    return (im_scale, int(np.round(h * im_scale)),
            int(np.round(w * im_scale)))


def prep_im_for_blob(im: np.ndarray, pixel_means, target_size: int,
                     max_size: int):
    """Mean-subtract + min-side/max-side rescale (ref blob.py:33-47),
    rescale rule from rescale_geometry."""
    import cv2
    im = im.astype(np.float32, copy=False) - pixel_means
    im_scale, _, _ = rescale_geometry(im.shape[0], im.shape[1],
                                      target_size, max_size)
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
