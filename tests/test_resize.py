"""Device bilinear resize (ops/resize.py) vs the host cv2 path it
replaces (utils/blob.prep_im_for_blob + models.faster_rcnn.pad_to_bucket).
"""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudenoise.models.faster_rcnn import pad_to_bucket
from tpudenoise.ops.resize import (prep_on_device, resize_to_bucket,
                                   resize_weights)
from tpudenoise.utils.blob import prep_im_for_blob

PIXEL_MEANS = np.array([[[102.9801, 115.9465, 122.7717]]], np.float32)


def _scale_for(h, w, target=600, max_size=1000):
    from tpudenoise.utils.blob import rescale_geometry
    return rescale_geometry(h, w, target, max_size)[0]


@pytest.mark.parametrize('h,w', [(600, 1000), (375, 500), (480, 640),
                                 (333, 500), (700, 525)])
def test_resize_matches_cv2(h, w):
    rng = np.random.RandomState(h + w)
    im = rng.randint(0, 256, (h, w, 3)).astype(np.float32)
    scale = _scale_for(h, w)
    ref = cv2.resize(im, None, None, fx=scale, fy=scale,
                     interpolation=cv2.INTER_LINEAR)
    oh, ow = ref.shape[:2]
    bucket = (1024, 1024)
    got = np.asarray(resize_to_bucket(jnp.asarray(im), h, w, oh, ow,
                                      scale, bucket))
    assert got.shape == (1024, 1024, 3)
    # f32 coordinate quantization (eps ~6e-5 px at 1000-px extents) times
    # steep random-noise gradients bounds the deviation at ~0.03 levels
    np.testing.assert_allclose(got[:oh, :ow], ref, atol=0.05)
    # pad region is exactly zero (pad_to_bucket semantics)
    assert np.all(got[oh:] == 0) and np.all(got[:, ow:] == 0)


def test_resize_identity_scale():
    """scale == 1 (the rrData geometry) must reproduce the image exactly
    up to f32 matmul roundoff."""
    rng = np.random.RandomState(0)
    im = rng.rand(600, 1000, 3).astype(np.float32) * 255
    got = np.asarray(resize_to_bucket(jnp.asarray(im), 600, 1000, 600,
                                      1000, 1.0, (608, 1024)))
    np.testing.assert_allclose(got[:600, :1000], im, atol=2e-3)


def test_resize_reads_only_valid_region():
    """A bucket-padded input with garbage in the pad region resizes
    identically to the exact-size input."""
    rng = np.random.RandomState(1)
    im = rng.rand(375, 500, 3).astype(np.float32) * 255
    canvas = np.full((600, 1000, 3), 1e6, np.float32)
    canvas[:375, :500] = im
    scale = _scale_for(375, 500)
    oh, ow = (int(np.round(375 * scale)), int(np.round(500 * scale)))
    a = np.asarray(resize_to_bucket(jnp.asarray(im), 375, 500, oh, ow,
                                    scale, (1024, 1024)))
    b = np.asarray(resize_to_bucket(jnp.asarray(canvas), 375, 500, oh, ow,
                                    scale, (1024, 1024)))
    # a 1e6 leak would show up at ~1e0+; 1e-4 is matmul-tiling roundoff
    np.testing.assert_allclose(a, b, atol=1e-4)


@pytest.mark.parametrize('h,w', [(600, 1000), (375, 500), (700, 525)])
def test_prep_on_device_matches_host_path(h, w):
    """prep_on_device == prep_im_for_blob + pad_to_bucket (the eval
    harness's host hop) to float tolerance, including the zero padding."""
    rng = np.random.RandomState(h)
    im = rng.randint(0, 256, (h, w, 3)).astype(np.float32)
    imf, scale = prep_im_for_blob(im, PIXEL_MEANS, 600, 1000)
    bucket = (1024, 1024)
    ref, (ph, pw) = pad_to_bucket(imf, bucket)
    oh, ow = (int(np.round(h * scale)), int(np.round(w * scale)))
    assert (oh, ow) == (ph, pw)  # host geometry rule drives the device op
    got = np.asarray(prep_on_device(jnp.asarray(im), h, w, oh, ow, scale,
                                    PIXEL_MEANS, bucket))
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_resize_weights_traced_lengths():
    """Weights built under jit with traced extents match the static
    build (the harness calls this per image inside one program)."""
    f = jax.jit(lambda ol, il, sc: resize_weights(64, 96, ol, il, sc))
    a = np.asarray(f(50, 80, 50 / 80))
    b = np.asarray(resize_weights(64, 96, 50, 80, 50 / 80))
    np.testing.assert_array_equal(a, b)
    # rows beyond out_len are zero; each live row sums to 1
    assert np.all(a[50:] == 0)
    np.testing.assert_allclose(a[:50].sum(1), 1.0, atol=1e-6)


def test_resize_matches_cv2_random_geometry_sweep():
    """Property sweep: 25 random raw shapes through the production
    geometry rule, each pinned against cv2 (catches convention drift at
    unusual aspect ratios / near-round scale factors)."""
    rng = np.random.RandomState(42)
    for _ in range(25):
        h = int(rng.randint(120, 900))
        w = int(rng.randint(120, 1100))
        im = rng.randint(0, 256, (h, w, 3)).astype(np.float32)
        scale = _scale_for(h, w)
        ref = cv2.resize(im, None, None, fx=scale, fy=scale,
                         interpolation=cv2.INTER_LINEAR)
        oh, ow = ref.shape[:2]
        bh = ((oh + 31) // 32) * 32
        bw = ((ow + 31) // 32) * 32
        got = np.asarray(resize_to_bucket(jnp.asarray(im), h, w, oh, ow,
                                          scale, (bh, bw)))
        np.testing.assert_allclose(got[:oh, :ow], ref, atol=0.06,
                                   err_msg=f'{h}x{w} scale={scale}')
        assert np.all(got[oh:] == 0) and np.all(got[:, ow:] == 0)
