"""Automold augmentation suite: HLS parity vs cv2 + semantic checks."""

import cv2
import jax
import numpy as np
import pytest

from tpudenoise.noise import automold as am
from tpudenoise.ops.color import hls_u8_to_rgb_u8, rgb_u8_to_hls_u8

KEY = jax.random.PRNGKey(3)


@pytest.fixture
def img():
    rng = np.random.RandomState(3)
    im = rng.randint(0, 256, (120, 160, 3)).astype(np.uint8)
    cv2.rectangle(im, (30, 30), (90, 90), (40, 160, 90), -1)
    return im


def test_hls_matches_cv2(img):
    want = cv2.cvtColor(img, cv2.COLOR_RGB2HLS).astype(np.float32)
    got = np.asarray(rgb_u8_to_hls_u8(img.astype(np.float32)))
    d = np.abs(got - want)
    assert d.max() <= 1.5
    assert (d > 1).mean() < 0.02


def test_hls_roundtrip(img):
    # cv2's own RGB->HLS->RGB roundtrip loses up to ~5 levels on saturated
    # pixels (H quantized to [0,180]); match that bound
    hls = rgb_u8_to_hls_u8(img.astype(np.float32))
    back = np.asarray(hls_u8_to_rgb_u8(hls))
    d = np.abs(back - img.astype(np.float32))
    assert d.max() <= 6.0
    assert (d > 3).mean() < 0.01


def test_brighten_darken(img):
    f = img.astype(np.float32)
    b = np.asarray(am.brighten(KEY, f, 0.5))
    d = np.asarray(am.darken(KEY, f, 0.5))
    hls_b = cv2.cvtColor(np.clip(b, 0, 255).astype(np.uint8),
                         cv2.COLOR_RGB2HLS)
    hls_o = cv2.cvtColor(img, cv2.COLOR_RGB2HLS)
    hls_d = cv2.cvtColor(np.clip(d, 0, 255).astype(np.uint8),
                         cv2.COLOR_RGB2HLS)
    assert hls_b[..., 1].mean() > hls_o[..., 1].mean()
    assert hls_d[..., 1].mean() < hls_o[..., 1].mean()


def test_shadow_darkens_lower_half(img):
    f = img.astype(np.float32)
    out = np.asarray(am.add_shadow(KEY, f, no_of_shadows=2))
    lo = cv2.cvtColor(np.clip(out, 0, 255).astype(np.uint8),
                      cv2.COLOR_RGB2HLS)[..., 1]
    orig = cv2.cvtColor(img, cv2.COLOR_RGB2HLS)[..., 1]
    # upper half untouched (shadows live in the bottom half)
    assert np.abs(lo[:50].astype(int) - orig[:50].astype(int)).mean() < 3
    assert lo[60:].mean() < orig[60:].mean()


def test_snow_brightens(img):
    f = img.astype(np.float32)
    out = np.asarray(am.add_snow(KEY, f, 0.8))
    assert out.mean() > f.mean()


def test_rain_darkens_and_blurs(img):
    f = img.astype(np.float32)
    out = np.asarray(am.add_rain(KEY, f, rain_type='heavy'))
    assert out.shape == f.shape
    # 0.7 lightness scaling makes it darker overall
    assert out.mean() < f.mean()
    # blurred: neighbor differences shrink
    tv = lambda x: np.abs(np.diff(x, axis=0)).mean()
    assert tv(out) < tv(f)


def test_fog_whitens(img):
    f = img.astype(np.float32)
    out = np.asarray(am.add_fog(KEY, f, 0.8))
    assert out.mean() > f.mean()


def test_flips(img):
    f = img.astype(np.float32)
    np.testing.assert_array_equal(np.asarray(am.fliph(f)),
                                  cv2.flip(img, 0).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(am.flipv(f)),
                                  cv2.flip(img, 1).astype(np.float32))


def test_manhole_draws_ellipse(img):
    f = img.astype(np.float32)
    out = np.asarray(am.add_manhole(KEY, f, center=(60, 80)))
    assert tuple(out[60, 80]) == (67.0, 70.0, 75.0)
    assert tuple(out[5, 5]) == tuple(f[5, 5])


def test_speed_blur(img):
    f = img.astype(np.float32)
    out = np.asarray(am.add_speed(KEY, f, 0.7))
    tv = lambda x: np.abs(np.diff(x, axis=1)).mean()
    assert tv(out) < tv(f)


def test_autumn_runs(img):
    out = np.asarray(am.add_autumn(KEY, img.astype(np.float32)))
    assert out.shape == img.shape


def test_gravel_speckles_road(img):
    f = img.astype(np.float32)
    out = np.asarray(am.add_gravel(KEY, f))
    # above the road strip (y < 3/4 h) only HLS-roundtrip noise + speckle
    # radius bleed (<= 4 px) are possible
    assert np.abs(out[:80] - f[:80]).max() <= 6.0
    assert np.abs(out[90:] - f[90:]).max() > 10.0


def test_exposure_equalizes():
    rng = np.random.RandomState(0)
    dark = (rng.rand(64, 64, 3) * 60).astype(np.float32)
    out = np.asarray(am.correct_exposure(dark))
    assert out.mean() > dark.mean() + 40


def test_augment_random_switches(img):
    f = img.astype(np.float32)
    outs = [np.asarray(am.augment_random(jax.random.PRNGKey(i), f))
            for i in range(6)]
    diffs = {round(float(np.abs(o - f).mean()), 2) for o in outs}
    assert len(diffs) > 2  # different augmentations picked


def test_color_space_api(img):
    """The reference's color helpers (Automold.py:12-147): plane
    extractors, channel-order flips, list handling, and rgb(x, 'hls')
    (the add_autumn path)."""
    import jax.numpy as jnp
    from tpudenoise.noise import automold as am
    x = jnp.asarray(img)  # u8-domain float, RGB by convention of src args
    h = np.asarray(am.hls(x))
    np.testing.assert_array_equal(np.asarray(am.hue(x)), h[..., 0])
    np.testing.assert_array_equal(np.asarray(am.lightness(x)), h[..., 1])
    np.testing.assert_array_equal(np.asarray(am.saturation(x)), h[..., 2])
    v = np.asarray(am.hsv(x))
    np.testing.assert_array_equal(np.asarray(am.value(x)), v[..., 2])
    # channel-order conversions + plane extractors (src='BGR' default)
    np.testing.assert_array_equal(np.asarray(am.bgr(x, 'RGB')),
                                  np.asarray(x)[..., ::-1])
    np.testing.assert_array_equal(np.asarray(am.rgb(am.bgr(x, 'RGB'))),
                                  np.asarray(x))
    np.testing.assert_array_equal(np.asarray(am.red(x, 'RGB')),
                                  np.asarray(x)[..., 0])
    np.testing.assert_array_equal(np.asarray(am.green(x, 'RGB')),
                                  np.asarray(x)[..., 1])
    np.testing.assert_array_equal(np.asarray(am.blue(x, 'RGB')),
                                  np.asarray(x)[..., 2])
    # HLS -> RGB dispatch used by add_autumn (rgb(image_hls, 'hls')):
    # matches cv2's HLS2RGB on the quantized planes; the roundtrip to the
    # original is bounded by the u8 H/L/S quantization itself
    import cv2
    back = np.asarray(am.rgb(jnp.asarray(h), 'hls'))
    want = cv2.cvtColor(h.astype(np.uint8),
                        cv2.COLOR_HLS2RGB).astype(np.float32)
    assert np.abs(back - want).max() <= 1.0
    assert np.abs(back - np.asarray(x)).max() <= 5.0
    # list inputs map elementwise (the reference's is_list branch)
    outs = am.hue([x, x], src='RGB')
    assert isinstance(outs, list) and len(outs) == 2
    np.testing.assert_array_equal(np.asarray(outs[0]), h[..., 0])
