"""The nine stochastic noise generators + bloom/shader, as pure jax.random
functions over float32 images.

The reference synthesizes noise per image on the host with
skimage.util.random_noise / scipy.stats samplers / numpy, with load-bearing
dtype round-trips (ref: lib/model/test.py:193-1607,
lib/roi_data_layer/minibatch.py:77-1634).  Here every generator is a pure
function of (key, image) that vmaps over a batch and fuses into one XLA
program — the reference's #1 hot loop (SURVEY.md §3.1) eliminated.

Conventions:
  * `img_u8`: float32 array holding integer values in [0, 255] (a uint8
    image lifted to float so the whole pipeline stays in one dtype).
  * `x01`: float32 in [0, 1] (= img_as_float semantics, u8/255).
  * uint8 cast semantics are explicit:
      - `wrap_cast_u8`: numpy `.astype(np.uint8)` = trunc toward zero then
        wrap mod 256 (load-bearing for brownian/periodic/uniform overflow).
      - `saturate_u8`: OpenCV saturate_cast<uchar> = round-half-even, clamp.
  * random_noise semantics re-derived from skimage.util.random_noise
    (documented algorithm; skimage is not a dependency): convert to [0,1]
    float, add noise, clip to [0,1] for gaussian/poisson/s&p/speckle.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- casts ---

def wrap_cast_u8(x: jnp.ndarray) -> jnp.ndarray:
    """numpy float -> uint8 cast: truncate toward zero, wrap mod 256."""
    t = jnp.trunc(x)
    return jnp.mod(t, 256.0)


def saturate_u8(x: jnp.ndarray) -> jnp.ndarray:
    """OpenCV saturate_cast<uchar>: round half-to-even then clamp."""
    return jnp.clip(jnp.round(x), 0.0, 255.0)


def to_unit(img_u8: jnp.ndarray) -> jnp.ndarray:
    """img_as_float for uint8 input: /255."""
    return img_u8 * (1.0 / 255.0)


# ----------------------------------------------------------- generators ---
#
# fast_bits: every stochastic generator takes a `fast_bits` switch that
# swaps its threefry draws for the counter-hash bitstream of
# fast_samplers (_u01/_normal) — threefry is ~20+ ALU ops per word and
# is the dominant cost of the cheap elementwise kinds and of brownian's
# 5.4M-increment path.  Salts are a module-wide registry so no two
# draws of one image/key ever share a (salt, counter) pair:
#   poisson 1/8/16-19, gamma 32-43 (fast_samplers), gaussian 64-65,
#   speckle 66-67, uniform 68, rayleigh 69, s&p 70-71, brownian 72-73.
# Streams differ from threefry (parity is distributional — PARITY.md
# deviation #2); moments are pinned in tests/test_noise.py either way.

def gaussian(key, x01: jnp.ndarray, var: float,
             fast_bits: bool = False) -> jnp.ndarray:
    """skimage random_noise(mode='gaussian', var): x + N(0, var), clip [0,1]."""
    if fast_bits:
        from tpudenoise.noise.fast_samplers import _normal, _seed_from_key
        noise = _normal(x01.shape, 64, _seed_from_key(key))
    else:
        noise = jax.random.normal(key, x01.shape, x01.dtype)
    noise = noise * jnp.sqrt(jnp.asarray(var, x01.dtype))
    return jnp.clip(x01 + noise, 0.0, 1.0)


def _u8_unique_count(img_u8: jnp.ndarray) -> jnp.ndarray:
    """Exact count of distinct u8 values WITHOUT a 256-bin histogram.

    Presence as a 256-bit set packed into 8 int32 words: each pixel
    contributes bit (v & 31) of word (v >> 5) — 8 compare/selects per
    pixel (vs 256 one-hot compares), OR-reduced over pixels, popcounted.
    The 8 word reductions are siblings over the same elementwise input so
    XLA fuses them into ONE pass over the pixels; the earlier
    broadcast-to-(N, 8) formulation materialized a 8x-the-image int32
    temporary and ran bandwidth-bound (measured 0.42 -> ~0.1 ms/img on
    v5e at 600x1000)."""
    v = img_u8.astype(jnp.int32).reshape(-1)
    word = v >> 5
    bit = jnp.left_shift(jnp.int32(1), v & 31)
    packed = jnp.stack([
        jax.lax.reduce(jnp.where(word == w, bit, 0), jnp.int32(0),
                       jax.lax.bitwise_or, dimensions=(0,))
        for w in range(8)])                                    # (8,)
    return jnp.sum(jax.lax.population_count(packed))


def poisson(key, x01: jnp.ndarray, img_u8: jnp.ndarray,
            fast_bits: bool = False) -> jnp.ndarray:
    """skimage random_noise(mode='poisson'):
    vals = 2**ceil(log2(len(unique(image)))); out = Poisson(x*vals)/vals,
    clipped.  For uint8-origin images unique(x01) == unique(u8), computed
    exactly on device via a packed 256-bit presence set (no data-dependent
    shapes).  fast_bits: counter-hash draws (fast_samplers module doc)."""
    n_unique = _u8_unique_count(img_u8)
    vals = 2.0 ** jnp.ceil(jnp.log2(n_unique.astype(jnp.float32)))
    lam = x01 * vals
    # fixed-round sampler: jax.random.poisson's rejection while_loop costs
    # ~15 ms/image on TPU inside the mix programs (see fast_samplers)
    from tpudenoise.noise.fast_samplers import poisson_fixed
    out = poisson_fixed(key, lam, fast_bits=fast_bits).astype(
        x01.dtype) / vals
    return jnp.clip(out, 0.0, 1.0)


def salt_and_pepper(key, x01: jnp.ndarray, amount: float,
                    salt_vs_pepper: float = 0.5,
                    fast_bits: bool = False) -> jnp.ndarray:
    """skimage random_noise(mode='s&p'): flip `amount` fraction of elements
    to 1 (salt, p=salt_vs_pepper) or 0 (pepper), elementwise iid."""
    if fast_bits:
        from tpudenoise.noise.fast_samplers import _seed_from_key, _u01
        seed = _seed_from_key(key)
        flipped = _u01(x01.shape, 70, seed) < amount
        salted = _u01(x01.shape, 71, seed) < salt_vs_pepper
    else:
        k1, k2 = jax.random.split(key)
        flipped = jax.random.uniform(k1, x01.shape) < amount
        salted = jax.random.uniform(k2, x01.shape) < salt_vs_pepper
    out = jnp.where(flipped & salted, 1.0, x01)
    out = jnp.where(flipped & ~salted, 0.0, out)
    return out


def speckle(key, x01: jnp.ndarray, var: float,
            fast_bits: bool = False) -> jnp.ndarray:
    """skimage random_noise(mode='speckle', var): x + x*N(0,var), clip."""
    if fast_bits:
        from tpudenoise.noise.fast_samplers import _normal, _seed_from_key
        noise = _normal(x01.shape, 66, _seed_from_key(key))
    else:
        noise = jax.random.normal(key, x01.shape, x01.dtype)
    noise = noise * jnp.sqrt(jnp.asarray(var, x01.dtype))
    return jnp.clip(x01 + x01 * noise, 0.0, 1.0)


def uniform_add(key, x01: jnp.ndarray, high: float,
                fast_bits: bool = False) -> jnp.ndarray:
    """U(0, high) added to the float image — NO clip (cv2.add on float64
    does not saturate; ref test.py:771-903)."""
    if fast_bits:
        from tpudenoise.noise.fast_samplers import _seed_from_key, _u01
        u = _u01(x01.shape, 68, _seed_from_key(key)) * high
        return x01 + u
    return x01 + jax.random.uniform(key, x01.shape, x01.dtype, 0.0, high)


def gamma_add(key, x01: jnp.ndarray, scale: float,
              a: float = 1.99, fast_bits: bool = False) -> jnp.ndarray:
    """scipy.stats.gamma.rvs(a=1.99, scale) added, no clip
    (ref test.py:1300-1437).  Fixed-round Marsaglia-Tsang sampler:
    jax.random.gamma's while_loop costs ~18 ms/image on TPU (see
    fast_samplers).  fast_bits: counter-hash draws."""
    from tpudenoise.noise.fast_samplers import gamma_fixed
    g = gamma_fixed(key, a, x01.shape, x01.dtype,
                    fast_bits=fast_bits) * scale
    return x01 + g


def rayleigh_add(key, x01: jnp.ndarray, scale: float,
                 fast_bits: bool = False) -> jnp.ndarray:
    """scipy.stats.rayleigh.rvs(scale) added, no clip (ref test.py:1439-1572).
    Rayleigh via inverse CDF: scale * sqrt(-2 ln U)."""
    if fast_bits:
        from tpudenoise.noise.fast_samplers import _seed_from_key, _u01
        u = _u01(x01.shape, 69, _seed_from_key(key))  # (0,1): log-safe
    else:
        u = jax.random.uniform(key, x01.shape, x01.dtype,
                               jnp.finfo(x01.dtype).tiny, 1.0)
    r = scale * jnp.sqrt(-2.0 * jnp.log(u))
    return x01 + r


def _valid_raster(shape, hw):
    """For a padded (H, W, C) canvas with a valid top-left (h, w) region
    (hw: (2,) int32, traced): each element's index in the VALID region's
    raster order, the validity mask, and the valid element count.  Used by
    the raster-length-dependent generators (brownian/periodic) so noise
    synthesized on a static bucket matches the exact-size semantics."""
    H, W, C = shape
    y = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    x = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    h, w = hw[0], hw[1]
    idx = (y * w + x) * C + c
    valid = (y < h) & (x < w)
    return idx, valid, h * w * C


def brownian(key, img_u8: jnp.ndarray, dt: float, hw=None,
             fast_bits: bool = False) -> jnp.ndarray:
    """Brownian path over all pixels: B = cumsum(sqrt(dt)*N(0,1)) reshaped to
    (H, W, 3); noise_u8 = wrap_cast(B*255); out = cv2.add(img, noise) which
    saturates (ref test.py:905-1126).  The cumsum runs over H*W*3 elements in
    raster order — an associative scan XLA parallelizes.

    hw: optional valid (h, w) extent of a bucket-padded canvas.  Increments
    at padded positions are zeroed before the cumsum; because padded
    elements then contribute nothing, the path value at each valid element
    equals the cumsum over the valid raster prefix — exact-size semantics
    on a static shape (the normal stream layout differs unless the pad is
    rows-only)."""
    n = img_u8.size
    if fast_bits:
        from tpudenoise.noise.fast_samplers import _normal, _seed_from_key
        db = _normal((n,), 72, _seed_from_key(key))
    else:
        db = jax.random.normal(key, (n,), jnp.float32)
    db = db * jnp.sqrt(jnp.asarray(dt, jnp.float32))
    if hw is not None:
        _, valid, _ = _valid_raster(img_u8.shape, hw)
        db = jnp.where(valid.reshape(-1), db, 0.0)
    b = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(db[:-1])])
    noise_u8 = wrap_cast_u8(b * 255.0).reshape(img_u8.shape)
    return saturate_u8(img_u8 + noise_u8)


def periodic(key, img_u8: jnp.ndarray, amplitude: float,
             hw=None) -> jnp.ndarray:
    """sin over linspace(-A, A, size) scaled by 255, wrap-cast to uint8,
    saturating add (ref test.py:1128-1298).  amplitude < 0 means A = size
    (the 'varsize' level).  Deterministic given the image shape — `key` is
    accepted for signature uniformity.

    hw: optional valid extent on a bucket-padded canvas; the raster index
    and length (and the varsize amplitude) then follow the VALID region,
    bit-identical to the exact-size run inside the valid region."""
    del key
    if hw is None:
        n = img_u8.size
        a = jnp.where(amplitude < 0, jnp.float32(n), jnp.float32(amplitude))
        # np.linspace(-A, A, n): step = 2A/(n-1)
        t = -a + jnp.arange(n, dtype=jnp.float32) * (2.0 * a / (n - 1))
        noise_u8 = wrap_cast_u8(jnp.sin(t) * 255.0).reshape(img_u8.shape)
        return saturate_u8(img_u8 + noise_u8)
    idx, _, n = _valid_raster(img_u8.shape, hw)
    nf = n.astype(jnp.float32)
    a = jnp.where(amplitude < 0, nf, jnp.float32(amplitude))
    t = -a + idx.astype(jnp.float32) * (2.0 * a / (nf - 1.0))
    noise_u8 = wrap_cast_u8(jnp.sin(t) * 255.0)
    return saturate_u8(img_u8 + noise_u8)


def shader(img_u8: jnp.ndarray, factor: float = 3.0) -> jnp.ndarray:
    """PIL ImageEnhance.Brightness(factor=3) (ref test.py:1595-1601).
    PIL loads RGB while the pipeline is BGR (cv2) — the reference therefore
    feeds a channel-swapped image downstream; reproduced via the flip."""
    bright = saturate_u8(img_u8 * factor)
    return bright[..., ::-1]


def bloom_params(key, h: int, w: int, hw=None) -> jnp.ndarray:
    """The 48 per-step compositing parameters of the sun-flare render
    (8 random circles + 40 source rings), one row per step:
    (cx, cy, r_squared, color_b, color_g, color_r, alpha, 0).

    Drawn with exactly the per-key ops of the in-scan version so the
    values are bit-identical; separated out so the Pallas single-pass
    kernel and the XLA scan consume the same data."""
    fc_x, fc_y = 100.0, 100.0
    angle = (-math.pi / 4) % (2 * math.pi)
    n_circ = 8
    src_radius = 400
    n_line = (w + 9) // 10
    line_x = jnp.arange(n_line, dtype=jnp.float32) * 10.0
    line_y = 2.0 * fc_y - (math.tan(angle) * (line_x - fc_x) + fc_y)
    if hw is None:
        n_line_d, rad_hi = n_line, max(h // 100 - 2, 1)
    else:
        n_line_d = (hw[1] + 9) // 10
        rad_hi = jnp.maximum(hw[0] // 100 - 2, 1)

    def circle(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        alpha = jax.random.uniform(k1, (), minval=0.05, maxval=0.2)
        r_idx = jax.random.randint(k2, (), 0, n_line_d)
        rad = jax.random.randint(k3, (), 1, rad_hi + 1).astype(jnp.float32)
        color = jax.random.randint(k4, (3,), 205, 256).astype(jnp.float32)
        cx = jnp.floor(line_x[r_idx])
        cy = jnp.floor(line_y[r_idx])
        return jnp.concatenate([
            jnp.stack([cx, cy, (rad ** 3) ** 2]), color,
            jnp.stack([alpha, jnp.float32(0.0)])])

    circ = jax.vmap(circle)(jax.random.split(key, n_circ))   # (8, 8)
    num_times = src_radius // 10
    alphas = jnp.linspace(0.0, 1.0, num_times)
    rads = jnp.linspace(1.0, float(src_radius), num_times)
    src = jnp.stack([
        jnp.full((num_times,), fc_x), jnp.full((num_times,), fc_y),
        rads ** 2,
        jnp.full((num_times,), 255.0), jnp.full((num_times,), 255.0),
        jnp.full((num_times,), 255.0),
        alphas[::-1] ** 3, jnp.zeros((num_times,))], axis=1)  # (40, 8)
    return jnp.concatenate([circ, src], axis=0)              # (48, 8)


def bloom_apply_scan(img_u8: jnp.ndarray, params: jnp.ndarray
                     ) -> jnp.ndarray:
    """XLA reference consumer of bloom_params: sequential overlay/output
    compositing, 2 full-image passes per step (the Pallas kernel in
    noise/pallas_bloom.py does all 48 steps in ONE HBM pass)."""
    h, w = img_u8.shape[0], img_u8.shape[1]
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def step(carry, p):
        overlay, output = carry
        mask = ((xx - p[0]) ** 2 + (yy - p[1]) ** 2) <= p[2]
        overlay = jnp.where(mask[..., None], p[3:6], overlay)
        output = saturate_u8(p[6] * overlay + (1.0 - p[6]) * output)
        return (overlay, output), None

    (_, output), _ = jax.lax.scan(
        step, (img_u8.astype(jnp.float32), img_u8.astype(jnp.float32)),
        params)
    return output


def bloom(key, img_u8: jnp.ndarray, hw=None) -> jnp.ndarray:
    """Automold add_sun_flare(flare_center=(100,100), angle=-pi/4)
    (ref tools/Automold.py:588-627, used at test.py:1590-1594).

    Geometry: 8 random flare circles centered on the mirrored flare line
    y = 2*fc_y - (tan(angle)*(x - fc_x) + fc_y), radius r^3 with
    r ~ U{1, H//100 - 2}, near-white color, alpha ~ U(0.05, 0.2); then the
    flare source: H//10... 40 concentric circles radius linspace(1, 400)
    blended with cubic alpha.  Rendered analytically: each circle is a
    full-image distance mask — pure VPU work, sequential compositing via
    lax.scan to match cv2's overlay accumulation.

    hw: optional valid extent on a bucket-padded canvas; the flare-line
    raster length and circle-radius range then follow the VALID geometry
    (dynamic randint bounds), so circle placement statistics match the
    exact-size run.

    Composition of bloom_params + bloom_apply_scan (the split the Pallas
    kernel consumes) — one implementation of the draw/composite math, so
    the XLA and Pallas paths cannot drift."""
    h, w = img_u8.shape[0], img_u8.shape[1]
    return bloom_apply_scan(img_u8, bloom_params(key, h, w, hw=hw))
