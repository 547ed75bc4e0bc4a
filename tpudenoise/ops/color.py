"""Color-space conversions on device.

The reference leans on cv2.cvtColor (BGR<->LAB for the K-Means quantization
noise, ref lib/model/test.py:594-765) and skimage's rgb2ycbcr inside
denoise_wavelet (convert2ycbcr=True, ref test.py:197 etc.).  Re-derived here
as pure jnp; cv2 is the test oracle (tests/test_color.py).

All images are channel-last.  The framework's raster order is BGR (cv2
convention, like the reference).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# sRGB D65 primaries (OpenCV/IEC 61966-2-1 constants) — numpy on purpose:
# a module-level jnp array would become a leaked tracer if the module is
# first imported inside a trace (mix_prologue imports this lazily)
_RGB2XYZ = np.array([[0.412453, 0.357580, 0.180423],
                     [0.212671, 0.715160, 0.072169],
                     [0.019334, 0.119193, 0.950227]], np.float32)
_XYZ2RGB = np.array([[3.240479, -1.53715, -0.498535],
                     [-0.969256, 1.875991, 0.041556],
                     [0.055648, -0.204043, 1.057311]], np.float32)
_XN, _ZN = 0.950456, 1.088754


def _srgb_to_linear(v):
    return jnp.where(v > 0.04045, ((v + 0.055) / 1.055) ** 2.4, v / 12.92)


def _linear_to_srgb(v):
    return jnp.where(v > 0.0031308,
                     1.055 * jnp.maximum(v, 1e-12) ** (1 / 2.4) - 0.055,
                     12.92 * v)


def _f_lab(t):
    return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def bgr_u8_to_lab_u8(img_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.cvtColor(x, COLOR_BGR2LAB) for 8-bit input (with sRGB gamma;
    verified against cv2).  In/out: float32 holding u8 values."""
    bgr = img_u8 * (1.0 / 255.0)
    rgb = bgr[..., ::-1]
    lin = _srgb_to_linear(rgb)
    xyz = lin @ _RGB2XYZ.T
    x = xyz[..., 0] / _XN
    y = xyz[..., 1]
    z = xyz[..., 2] / _ZN
    L = jnp.where(y > 0.008856, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    a = 500.0 * (_f_lab(x) - _f_lab(y)) + 128.0
    b = 200.0 * (_f_lab(y) - _f_lab(z)) + 128.0
    L8 = L * (255.0 / 100.0)
    out = jnp.stack([L8, a, b], axis=-1)
    return jnp.clip(jnp.round(out), 0.0, 255.0)


def lab_u8_to_bgr_u8(lab_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.cvtColor(x, COLOR_LAB2BGR) for 8-bit input."""
    L = lab_u8[..., 0] * (100.0 / 255.0)
    a = lab_u8[..., 1] - 128.0
    b = lab_u8[..., 2] - 128.0
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def _finv(f):
        t3 = f ** 3
        return jnp.where(t3 > 0.008856, t3, (f - 16.0 / 116.0) / 7.787)

    y = jnp.where(L > 903.3 * 0.008856, fy ** 3, L / 903.3)
    x = _finv(fx) * _XN
    z = _finv(fz) * _ZN
    xyz = jnp.stack([x, y, z], axis=-1)
    lin = xyz @ _XYZ2RGB.T
    rgb = _linear_to_srgb(jnp.clip(lin, 0.0, 1.0))
    bgr = rgb[..., ::-1]
    return jnp.clip(jnp.round(bgr * 255.0), 0.0, 255.0)


# ITU-R BT.601 (skimage color.rgb2ycbcr convention: input RGB in [0,1],
# output Y in [16,235], Cb/Cr in [16,240])
def rgb01_to_ycbcr(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 16.0 + 65.481 * r + 128.553 * g + 24.966 * b
    cb = 128.0 - 37.797 * r - 74.203 * g + 112.0 * b
    cr = 128.0 + 112.0 * r - 93.786 * g - 18.214 * b
    return jnp.stack([y, cb, cr], axis=-1)


def rgb_u8_to_hls_u8(img_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.cvtColor(x, COLOR_RGB2HLS) for 8-bit: H in [0, 180), L/S in
    [0, 255] (used by the Automold augmentations' lightness edits)."""
    x = img_u8 * (1.0 / 255.0)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    vmax = jnp.maximum(jnp.maximum(r, g), b)
    vmin = jnp.minimum(jnp.minimum(r, g), b)
    l = (vmax + vmin) * 0.5
    c = vmax - vmin
    s = jnp.where(c == 0, 0.0,
                  jnp.where(l < 0.5, c / jnp.maximum(vmax + vmin, 1e-12),
                            c / jnp.maximum(2.0 - vmax - vmin, 1e-12)))
    safe_c = jnp.maximum(c, 1e-12)
    h = jnp.where(vmax == r, (g - b) / safe_c,
                  jnp.where(vmax == g, 2.0 + (b - r) / safe_c,
                            4.0 + (r - g) / safe_c))
    h = jnp.where(c == 0, 0.0, h) * 60.0
    h = jnp.where(h < 0, h + 360.0, h)
    out = jnp.stack([h * 0.5, l * 255.0, s * 255.0], axis=-1)
    return jnp.clip(jnp.round(out), 0.0, 255.0)


def rgb_u8_to_hsv_u8(img_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.cvtColor(x, COLOR_RGB2HSV) for 8-bit: H in [0, 180), S/V in
    [0, 255] (the Automold `hsv`/`value` helpers, ref tools/Automold.py:
    58-80)."""
    x = img_u8 * (1.0 / 255.0)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    vmax = jnp.maximum(jnp.maximum(r, g), b)
    vmin = jnp.minimum(jnp.minimum(r, g), b)
    c = vmax - vmin
    s = jnp.where(vmax == 0, 0.0, c / jnp.maximum(vmax, 1e-12))
    safe_c = jnp.maximum(c, 1e-12)
    h = jnp.where(vmax == r, (g - b) / safe_c,
                  jnp.where(vmax == g, 2.0 + (b - r) / safe_c,
                            4.0 + (r - g) / safe_c))
    h = jnp.where(c == 0, 0.0, h) * 60.0
    h = jnp.where(h < 0, h + 360.0, h)
    out = jnp.stack([h * 0.5, s * 255.0, vmax * 255.0], axis=-1)
    return jnp.clip(jnp.round(out), 0.0, 255.0)


def hsv_u8_to_rgb_u8(hsv: jnp.ndarray) -> jnp.ndarray:
    """cv2.cvtColor(x, COLOR_HSV2RGB) for 8-bit."""
    h = hsv[..., 0] * 2.0            # degrees
    s = hsv[..., 1] * (1.0 / 255.0)
    v = hsv[..., 2] * (1.0 / 255.0)
    c = v * s
    hp = h / 60.0
    xcomp = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    z = jnp.zeros_like(c)
    idx = jnp.clip(jnp.floor(hp), 0, 5).astype(jnp.int32)
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                   [c, xcomp, z, z, xcomp], c)
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                   [xcomp, c, c, xcomp, z], z)
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                   [z, z, xcomp, c, c], xcomp)
    m = v - c
    out = jnp.stack([r + m, g + m, b + m], axis=-1) * 255.0
    return jnp.clip(jnp.round(out), 0.0, 255.0)


def hls_u8_to_rgb_u8(hls: jnp.ndarray) -> jnp.ndarray:
    """cv2.cvtColor(x, COLOR_HLS2RGB) for 8-bit."""
    h = hls[..., 0] * 2.0            # degrees
    l = hls[..., 1] * (1.0 / 255.0)
    s = hls[..., 2] * (1.0 / 255.0)
    c = jnp.where(l < 0.5, 2.0 * l * s, (2.0 - 2.0 * l) * s)
    hp = h / 60.0
    xcomp = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    z = jnp.zeros_like(c)
    idx = jnp.clip(jnp.floor(hp), 0, 5).astype(jnp.int32)
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                   [c, xcomp, z, z, xcomp], c)
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                   [xcomp, c, c, xcomp, z], z)
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4],
                   [z, z, xcomp, c, c], xcomp)
    m = l - 0.5 * c
    out = jnp.stack([r + m, g + m, b + m], axis=-1) * 255.0
    return jnp.clip(jnp.round(out), 0.0, 255.0)


def ycbcr_to_rgb01(ycbcr: jnp.ndarray) -> jnp.ndarray:
    y = ycbcr[..., 0] - 16.0
    cb = ycbcr[..., 1] - 128.0
    cr = ycbcr[..., 2] - 128.0
    r = 0.00456621 * y + 0.00625893 * cr
    g = 0.00456621 * y - 0.00153632 * cb - 0.00318811 * cr
    b = 0.00456621 * y + 0.00791071 * cb
    return jnp.stack([r, g, b], axis=-1)
