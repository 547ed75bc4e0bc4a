"""Fused Pallas mixed-noise kernel: every generator of the mix tables as an
in-register branch, one HBM pass for the whole batch, optional fused
bilateral tail.

The scanned-switch XLA mix (`pipeline._apply_specs_batched`) serializes
images and pays each generator's full HBM round-trips: per-image costs on
v5e at 600x1000 were poisson 1.65 ms, brownian ~1.0, gamma 0.94, quant
0.65, elementwise kinds 0.17-0.22 (benchmarks/profile_mix_scan.py) — a
38-entry mix (ref lib/model/test.py:1612-1639, minibatch.py:1518-1547)
averages ~0.5 ms/img of noise alone.  Here the per-image branch is a
`lax.switch` on a scalar-prefetched entry draw INSIDE one batched Pallas
kernel: the drawn generator runs in registers on VMEM tiles with
coordinate-stable counter-hash RNG (same construction as
pallas_kernels._hash2d, widened to a 64-bit per-image seed), so the only
HBM traffic is one uint8 read + one float32 write per image — and with the
bilateral tail fused (`fused_mix_bilateral`), the noise feeds the 9x9
stencil without ever touching HBM.

Stream semantics: the ENTRY DRAW (which generator an image gets) is
bit-identical to the XLA pipeline (same split/randint chain); the pixel
streams are counter-hash instead of threefry — the same stream-trade as
the headline fused kernels, statistically pinned per kind in
tests/test_pallas_mix.py.  Deterministic kinds (periodic, shader, quant
given the fitted palette, original, bloom given its params) match the XLA
generators exactly.

Host-side prologue (`mix_prologue`): per-image entry draw + the few
per-image scalars whose computation needs the whole image — the poisson
`vals` (exact u8 unique count, ref skimage random_noise poisson), the
quant K-Means palette (kmeans_fit_traced_k — the drawn cluster count is
per-image DATA), and the bloom compositing parameters — each under a
`lax.cond` so only images that drew that kind pay for it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudenoise.noise.spec import Kind

LANES = 128
HALO = 4          # bilateral d=9 radius
K_PAD = 10        # max quant cluster count (quant_var10)
N_BLOOM = 48      # bloom compositing steps (8 circles + 40 source rings)

# --------------------------------------------------------------- hash RNG --
# Counter hash over the ELEMENT RASTER INDEX (y*w + x)*3 + c, salted per
# draw, carrying the per-image threefry key's full 64 bits in two words
# injected at different avalanche stages (fast_samplers._hash_words
# rationale: a single mixed word birthday-collides across ~10^5 per-image
# keys).  Identical construction to pallas_kernels._hash2d plus the second
# seed word.


def _hash_ctr(ctr: jnp.ndarray, salt: int, s0, s1) -> jnp.ndarray:
    h = (ctr * jnp.uint32(0x9E3779B9)
         ^ jnp.uint32(salt) * jnp.uint32(0x85EBCA6B)
         ^ s0 * jnp.uint32(0xC2B2AE35))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ s1 * jnp.uint32(0x27D4EB2F)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


def _u01_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """f32 uniform in (0,1): top 24 hash bits via the int32 hop (Mosaic has
    no unsigned->float cast), offset half an ulp so 0 is excluded."""
    i24 = (bits >> 8).astype(jnp.int32)
    return (i24.astype(jnp.float32) + 0.5) * jnp.float32(2.0 ** -24)


# ------------------------------------------------------- geometry adapter --
# Branch bodies are elementwise over the tile with companion index arrays;
# only the channel split/merge and the brownian cumsum depend on layout.
#   interleaved: (rows, w3p) tiles, lane = x*3 + c  (noise-only kernel)
#   planar:      (3, rows, wp) tiles, plane = c     (fused bilateral)


class _Geo:
    def __init__(self, planar: bool, tile: jnp.ndarray, row0, h: int,
                 w: int):
        self.planar = planar
        self.tile = tile
        self.h, self.w = h, w
        if planar:
            _, rows, wp = tile.shape
            shape = (3, rows, wp)
            self.iy = row0 + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            self.ix = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
            self.ch = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            self.lane_ok = self.ix < w
        else:
            rows, w3p = tile.shape
            shape = (rows, w3p)
            self.iy = row0 + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            self.ix = lane // 3
            self.ch = lane - self.ix * 3
            self.lane_ok = lane < w * 3
        self.shape = shape
        # element raster index (y*w + x)*3 + c — coordinate-stable across
        # any tile partition; clamped y keeps halo/pad hashes in-range
        # (their values are masked out downstream)
        yc = jnp.clip(self.iy, 0, h - 1)
        self.ctr = ((yc * w + jnp.minimum(self.ix, w - 1)) * 3
                    + self.ch).astype(jnp.uint32)
        self.row_ok = (self.iy >= 0) & (self.iy < h)
        self.valid = self.row_ok & self.lane_ok

    # per-draw RNG over the tile
    def bits(self, salt: int, s0, s1) -> jnp.ndarray:
        return _hash_ctr(self.ctr, salt, s0, s1)

    def u01(self, salt: int, s0, s1) -> jnp.ndarray:
        return _u01_bits(self.bits(salt, s0, s1))

    def normal(self, salt: int, s0, s1) -> jnp.ndarray:
        u1 = self.u01(salt, s0, s1)
        u2 = self.u01(salt + 1, s0, s1)
        return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
            jnp.float32(2.0 * np.pi) * u2)

    def split_channels(self, t: jnp.ndarray):
        """(b, g, r) arrays of tile shape: each element sees its PIXEL's
        three channel values."""
        if self.planar:
            full = t.shape
            return (jnp.broadcast_to(t[0:1], full),
                    jnp.broadcast_to(t[1:2], full),
                    jnp.broadcast_to(t[2:3], full))
        L = t.shape[-1]
        r1 = pltpu.roll(t, shift=1, axis=1)       # value from lane-1
        r2 = pltpu.roll(t, shift=2, axis=1)       # value from lane-2
        f1 = pltpu.roll(t, shift=L - 1, axis=1)   # value from lane+1
        f2 = pltpu.roll(t, shift=L - 2, axis=1)   # value from lane+2
        c = self.ch
        b = jnp.where(c == 0, t, jnp.where(c == 1, r1, r2))
        g = jnp.where(c == 0, f1, jnp.where(c == 1, t, r1))
        r = jnp.where(c == 0, f2, jnp.where(c == 1, f1, t))
        return b, g, r

    def merge_channels(self, fb, fg, fr) -> jnp.ndarray:
        if self.planar:
            return jnp.concatenate([fb[0:1], fg[1:2], fr[2:3]], axis=0)
        return jnp.where(self.ch == 0, fb,
                         jnp.where(self.ch == 1, fg, fr))

    def pixel_sum(self, z: jnp.ndarray) -> jnp.ndarray:
        """Per-pixel sum of an element array's 3 channels, broadcast back
        to tile shape."""
        if self.planar:
            return jnp.broadcast_to(jnp.sum(z, axis=0, keepdims=True),
                                    z.shape)
        b, g, r = self.split_channels(z)
        return b + g + r


# --------------------------------------------------------------- helpers --

def _wrap_u8(x: jnp.ndarray) -> jnp.ndarray:
    """numpy float->uint8 cast: truncate toward zero, wrap mod 256
    (generators.wrap_cast_u8)."""
    return jnp.mod(jnp.trunc(x), 256.0)


def _sat_u8(x: jnp.ndarray) -> jnp.ndarray:
    """cv2 saturate_cast<uchar>: round half-even, clamp
    (generators.saturate_u8)."""
    return jnp.clip(jnp.round(x), 0.0, 255.0)


def _stirling_lgamma(z: jnp.ndarray) -> jnp.ndarray:
    """fast_samplers.stirling_lgamma, inlined (pure jnp, Mosaic-safe)."""
    t = z + 8.0
    inv = 1.0 / t
    pr = z * inv
    for i in range(1, 8):
        pr = pr * ((z + float(i)) * inv)
    pr = jnp.maximum(pr, jnp.float32(1e-30))
    inv2 = inv * inv
    series = inv * (jnp.float32(1.0 / 12.0)
                    - inv2 * jnp.float32(1.0 / 360.0))
    return ((t - 8.5) * jnp.log(t) - t
            + jnp.float32(0.91893853320467274178) + series - jnp.log(pr))


def _cbrt_pos(t: jnp.ndarray) -> jnp.ndarray:
    """cbrt for t >= 0 via exp/log (jnp.cbrt has no Mosaic lowering)."""
    return jnp.exp(jnp.log(jnp.maximum(t, jnp.float32(1e-30)))
                   * jnp.float32(1.0 / 3.0))


def _lane_cumsum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inclusive cumsum along `axis` via log-step rolls (jnp.cumsum has no
    Mosaic lowering)."""
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    k = 1
    while k < n:
        shifted = pltpu.roll(x, shift=k, axis=axis)
        x = x + jnp.where(idx >= k, shifted, 0.0)
        k *= 2
    return x


# ---------------------------------------------------------- branch bodies --
# Each body: geo + per-image scalars -> noisy tile (float32).  Output
# domains mirror pipeline.apply_spec for in-mix specs (denoise NONE):
# gaussian emits the float [0,1] image (the reference quirk,
# ref test.py:290-305), every other kind u8-domain floats.


def _body_original(geo, p):
    return geo.tile


def _body_gaussian(geo, p):
    z = geo.normal(64, p['s0'], p['s1'])
    x01 = geo.tile * jnp.float32(1.0 / 255.0)
    return jnp.clip(x01 + z * jnp.sqrt(p['level']), 0.0, 1.0)


def _body_sap(geo, p):
    """One hash word: u01 drives the flip, bit 0 the salt-vs-pepper coin
    (the headline sap kernel's construction; level is traced here so the
    threshold compares in f32)."""
    bits = geo.bits(70, p['s0'], p['s1'])
    flipped = _u01_bits(bits) < p['level']
    salted = (bits & jnp.uint32(1)) == jnp.uint32(1)
    out = jnp.where(flipped & salted, 255.0, geo.tile)
    return jnp.where(flipped & ~salted, 0.0, out)


def _body_speckle(geo, p):
    z = geo.normal(66, p['s0'], p['s1'])
    x01 = geo.tile * jnp.float32(1.0 / 255.0)
    out = jnp.clip(x01 + x01 * z * jnp.sqrt(p['level']), 0.0, 1.0)
    return _wrap_u8(255.0 * out)


def _body_uniform(geo, p):
    x01 = geo.tile * jnp.float32(1.0 / 255.0)
    return _wrap_u8(255.0 * (x01 + geo.u01(68, p['s0'], p['s1'])
                             * p['level']))


def _body_rayleigh(geo, p):
    u = geo.u01(69, p['s0'], p['s1'])
    x01 = geo.tile * jnp.float32(1.0 / 255.0)
    return _wrap_u8(255.0 * (x01 + p['level']
                             * jnp.sqrt(-2.0 * jnp.log(u))))


def _body_gamma(geo, p, a: float = 1.99):
    """Marsaglia-Tsang squeeze, 4 fixed rounds (fast_samplers.gamma_fixed
    with the coordinate-hash draws)."""
    d = jnp.float32(a - 1.0 / 3.0)
    c = jnp.float32(1.0 / np.sqrt(9.0 * (a - 1.0 / 3.0)))
    out = jnp.zeros(geo.shape, jnp.float32)
    last = jnp.full(geo.shape, d, jnp.float32)
    ok = jnp.zeros(geo.shape, jnp.bool_)
    for r in range(4):
        x = geo.normal(32 + 3 * r, p['s0'], p['s1'])
        u = geo.u01(34 + 3 * r, p['s0'], p['s1'])
        v = (1.0 + c * x) ** 3
        pos = v > 0.0
        vs = jnp.where(pos, v, 1.0)
        accept = pos & (jnp.log(u) <
                        0.5 * x * x + d * (1.0 - vs + jnp.log(vs)))
        cand = d * vs
        out = jnp.where(accept & ~ok, cand, out)
        ok = ok | accept
        last = jnp.where(pos, cand, last)
    g = jnp.where(ok, out, last)
    x01 = geo.tile * jnp.float32(1.0 / 255.0)
    return _wrap_u8(255.0 * (x01 + g * p['level']))


def _body_poisson(geo, p):
    """fast_samplers.poisson_fixed with coordinate-hash draws: exact
    inverse-CDF for lam < 10, Hoermann PTRS (4 rounds, Stirling lgamma)
    above, rounded-normal fallback on the ~1e-5 residual.  `vals` (the
    2^ceil(log2(u8 unique count)) quantizer) is a per-image prologue
    scalar."""
    vals = p['vals']
    x01 = geo.tile * jnp.float32(1.0 / 255.0)
    lam = x01 * vals
    small = lam < 10.0

    u = geo.u01(1, p['s0'], p['s1'])
    lam_s = jnp.minimum(lam, 10.0)
    prob = jnp.exp(-lam_s)
    cdf = prob
    k_small = jnp.zeros(geo.shape, jnp.float32)
    for n in range(1, 34):
        k_small = jnp.where(u > cdf, jnp.float32(n), k_small)
        prob = prob * lam_s * jnp.float32(1.0 / n)
        cdf = cdf + prob

    lam_b = jnp.maximum(lam, 10.0)
    b = 0.931 + 2.53 * jnp.sqrt(lam_b)
    a = -0.059 + 0.02483 * b
    inv_alpha = 1.1239 + 1.1328 / (b - 3.4)
    v_r = 0.9277 - 3.6224 / (b - 2.0)
    log_lam = jnp.log(lam_b)
    k_big = jnp.zeros(geo.shape, jnp.float32)
    ok = jnp.zeros(geo.shape, jnp.bool_)
    for r in range(4):
        w = geo.bits(16 + r, p['s0'], p['s1'])
        uu = ((w >> 16).astype(jnp.int32).astype(jnp.float32) + 0.5) \
            * jnp.float32(2.0 ** -16) - 0.5
        vv = ((w & jnp.uint32(0xFFFF)).astype(jnp.int32)
              .astype(jnp.float32) + 0.5) * jnp.float32(2.0 ** -16)
        us = 0.5 - jnp.abs(uu)
        cand = jnp.floor((2.0 * a / us + b) * uu + lam_b + 0.43)
        accept = (us >= 0.07) & (vv <= v_r)
        safe = (cand >= 0.0) & ((us >= 0.013) | (vv <= us))
        lhs = jnp.log(vv * inv_alpha / (a / (us * us) + b))
        rhs = -lam_b + cand * log_lam - _stirling_lgamma(cand + 1.0)
        accept = accept | (safe & (lhs <= rhs))
        take = accept & ~ok
        k_big = jnp.where(take, cand, k_big)
        ok = ok | accept
    z = geo.normal(8, p['s0'], p['s1'])
    fallback = jnp.maximum(jnp.round(lam_b + jnp.sqrt(lam_b) * z), 0.0)
    k_big = jnp.where(ok, k_big, fallback)

    k = jnp.where(small, k_small, k_big)
    return _wrap_u8(255.0 * jnp.clip(k / vals, 0.0, 1.0))


def _body_periodic(geo, p):
    """Deterministic sin over the raster (generators.periodic): bit-exact
    vs the XLA generator."""
    n = jnp.float32(geo.h * geo.w * 3)
    amp = jnp.where(p['level'] < 0, n, p['level'])
    idx = ((geo.iy * geo.w + geo.ix) * 3 + geo.ch).astype(jnp.float32)
    t = -amp + idx * (2.0 * amp / (n - 1.0))
    noise = _wrap_u8(jnp.sin(t) * 255.0)
    return _sat_u8(geo.tile + noise)


def _body_shader(geo, p):
    """PIL brightness x3 + the BGR<->RGB flip (generators.shader):
    bit-exact vs the XLA generator."""
    bb, gg, rr = geo.split_channels(geo.tile)
    return geo.merge_channels(_sat_u8(rr * 3.0), _sat_u8(gg * 3.0),
                              _sat_u8(bb * 3.0))


def _body_brownian(geo, p, carry_ref, tile_h: int):
    """Brownian path over the element raster: B = exclusive-prefix of
    sqrt(dt)*N(0,1) increments (generators.brownian).  The prefix is
    carried ACROSS grid steps in SMEM scratch (TPU grids run
    sequentially): within the window, an inclusive lane cumsum (log-step
    rolls) + an exclusive row cumsum reconstruct each element's prefix;
    increments at out-of-image rows and pad lanes are zeroed, so window
    overlap (bilateral halos) recomputes identical values."""
    sdt = jnp.sqrt(p['level'])
    z = jnp.where(geo.valid, geo.normal(72, p['s0'], p['s1']) * sdt, 0.0)
    if geo.planar:
        s = jnp.sum(z, axis=0)                         # (rows, wp)
        cs = _lane_cumsum(s, axis=1)                   # incl. pixel cumsum
        excl_pix = cs - s
        tot = jnp.sum(s, axis=1, keepdims=True)        # (rows, 1)
        rinc = _lane_cumsum(tot, axis=0)
        rexcl = rinc - tot
        base = (excl_pix + rexcl)[None]                # (1, rows, wp)
        zb = z[0:1]
        zg = z[1:2]
        partial = jnp.concatenate(
            [jnp.zeros_like(zb), zb, zb + zg], axis=0)
        bpath = carry_ref[0] + base + partial
        rows = z.shape[1]
    else:
        cs = _lane_cumsum(z, axis=1)
        excl = cs - z
        tot = jnp.sum(z, axis=1, keepdims=True)        # (rows, 1)
        rinc = _lane_cumsum(tot, axis=0)
        rexcl = rinc - tot
        bpath = carry_ref[0] + excl + rexcl
        rows = z.shape[0]
    # carry for the NEXT window start (windows advance by tile_h rows)
    carry_ref[0] = carry_ref[0] + rinc[min(tile_h, rows) - 1, 0]
    noise = _wrap_u8(bpath * 255.0)
    return _sat_u8(geo.tile + noise)


def _body_quant(geo, p, centers_ref, b_idx):
    """Palette map against the prologue-fitted K-Means centers
    (kmeans.quantize_colors): per-pixel LAB (cv2 BGR2LAB math from
    ops/color.py, inlined per-channel), nearest float-LAB center, output
    the center's BGR (converted from the TRUNCATED center, preserving the
    reference's .astype('uint8') quirk).  Inactive centers carry 1e9
    coordinates from the prologue so the argmin ignores them."""
    bb, gg, rr = geo.split_channels(geo.tile)
    # cv2 BGR2LAB for 8-bit (ops/color.bgr_u8_to_lab_u8, per-channel)
    inv255 = jnp.float32(1.0 / 255.0)

    def lin(v):
        v = v * inv255
        return jnp.where(v > 0.04045,
                         jnp.exp(jnp.log(jnp.maximum(
                             (v + 0.055) * jnp.float32(1.0 / 1.055),
                             jnp.float32(1e-12))) * jnp.float32(2.4)),
                         v * jnp.float32(1.0 / 12.92))

    lr, lg, lb = lin(rr), lin(gg), lin(bb)
    x = (0.412453 * lr + 0.357580 * lg + 0.180423 * lb) \
        * jnp.float32(1.0 / 0.950456)
    y = 0.212671 * lr + 0.715160 * lg + 0.072169 * lb
    zc = (0.019334 * lr + 0.119193 * lg + 0.950227 * lb) \
        * jnp.float32(1.0 / 1.088754)

    def flab(t):
        return jnp.where(t > 0.008856, _cbrt_pos(t),
                         7.787 * t + jnp.float32(16.0 / 116.0))

    Lv = jnp.where(y > 0.008856, 116.0 * _cbrt_pos(y) - 16.0, 903.3 * y)
    fx, fy, fz = flab(x), flab(y), flab(zc)
    L8 = jnp.clip(jnp.round(Lv * jnp.float32(255.0 / 100.0)), 0.0, 255.0)
    A8 = jnp.clip(jnp.round(500.0 * (fx - fy) + 128.0), 0.0, 255.0)
    B8 = jnp.clip(jnp.round(200.0 * (fy - fz) + 128.0), 0.0, 255.0)

    best = jnp.full(geo.shape, jnp.float32(1e30))
    ob = jnp.zeros(geo.shape, jnp.float32)
    og = jnp.zeros(geo.shape, jnp.float32)
    orr = jnp.zeros(geo.shape, jnp.float32)
    for k in range(K_PAD):
        cl = centers_ref[b_idx, k * 6 + 0]
        ca = centers_ref[b_idx, k * 6 + 1]
        cb = centers_ref[b_idx, k * 6 + 2]
        d = (L8 - cl) ** 2 + (A8 - ca) ** 2 + (B8 - cb) ** 2
        better = d < best
        best = jnp.where(better, d, best)
        ob = jnp.where(better, centers_ref[b_idx, k * 6 + 3], ob)
        og = jnp.where(better, centers_ref[b_idx, k * 6 + 4], og)
        orr = jnp.where(better, centers_ref[b_idx, k * 6 + 5], orr)
    return geo.merge_channels(ob, og, orr)


def _body_bloom(geo, p, bloom_ref, b_idx):
    """Sun-flare compositing (generators.bloom / pallas_bloom): 48 steps
    of overlay/output blending from prologue-drawn per-step scalars; steps
    8.. share the flare-source center so their distance field computes
    once."""
    xx = geo.ix.astype(jnp.float32)
    yy = jnp.clip(geo.iy, 0, geo.h - 1).astype(jnp.float32)
    # bloom_ref is (B, N_BLOOM*8) FLAT: a (B, 48, 8) SMEM operand would
    # pad its last dim 8->128 lanes (1.5 MB at batch 64, over the 1 MB
    # SMEM budget); 384 is already lane-aligned
    dsrc = ((xx - bloom_ref[b_idx, 8 * 8 + 0]) ** 2
            + (yy - bloom_ref[b_idx, 8 * 8 + 1]) ** 2)
    overlay = geo.tile
    output = geo.tile
    col_sel = geo.ch
    for s in range(N_BLOOM):
        r2 = bloom_ref[b_idx, s * 8 + 2]
        col = jnp.where(
            col_sel == 0, bloom_ref[b_idx, s * 8 + 3],
            jnp.where(col_sel == 1, bloom_ref[b_idx, s * 8 + 4],
                      bloom_ref[b_idx, s * 8 + 5]))
        alpha = bloom_ref[b_idx, s * 8 + 6]
        if s < 8:
            cx = bloom_ref[b_idx, s * 8 + 0]
            cy = bloom_ref[b_idx, s * 8 + 1]
            mask = (xx - cx) ** 2 + (yy - cy) ** 2 <= r2
        else:
            mask = dsrc <= r2
        overlay = jnp.where(mask, col, overlay)
        output = _sat_u8(alpha * overlay + (1.0 - alpha) * output)
    return output


def _make_branches(kinds, geo, p, carry_ref, centers_ref, bloom_ref,
                   b_idx, tile_h: int):
    """One switch branch per Kind present in the plan (plan-static).

    The switch is real per-grid-step control flow (selected-kind cost
    only: original 0.16 vs poisson 0.56 ms/img at tile_h=8, batch 64,
    600x1000 on v5e) — but the HEAVY bodies' scoped-VMEM frames scale
    with the tile and spill beyond one sublane tile, taxing EVERY step:
    at tile_h=32 the original floor was 0.72 ms/img and mixed var_all
    draws cost 0.89 (noise) / OOM-at-32 (bilateral).  Hence the
    tile_h=8 default on both kernels."""
    table = {
        Kind.ORIGINAL: lambda: _body_original(geo, p),
        Kind.GAUSSIAN: lambda: _body_gaussian(geo, p),
        Kind.POISSON: lambda: _body_poisson(geo, p),
        Kind.SAP: lambda: _body_sap(geo, p),
        Kind.SPECKLE: lambda: _body_speckle(geo, p),
        Kind.QUANT: lambda: _body_quant(geo, p, centers_ref, b_idx),
        Kind.UNIFORM: lambda: _body_uniform(geo, p),
        Kind.BROWNIAN: lambda: _body_brownian(geo, p, carry_ref, tile_h),
        Kind.PERIODIC: lambda: _body_periodic(geo, p),
        Kind.GAMMA: lambda: _body_gamma(geo, p),
        Kind.RAYLEIGH: lambda: _body_rayleigh(geo, p),
        Kind.BLOOM: lambda: _body_bloom(geo, p, bloom_ref, b_idx),
        Kind.SHADER: lambda: _body_shader(geo, p),
    }
    return [(lambda fn: lambda _: fn())(table[k]) for k in kinds]


def _load_f32(tile):
    if tile.dtype == jnp.uint8:
        return tile.astype(jnp.int32).astype(jnp.float32)
    return tile


# ------------------------------------------------------ noise-only kernel --

def _mix_noise_kernel(branch_ref, level_ref, seeds_ref, vals_ref,
                      centers_ref, bloom_ref, img_ref, out_ref, carry,
                      *, kinds, tile_h: int, h: int, w: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    tile = _load_f32(img_ref[0])
    geo = _Geo(False, tile, i * tile_h, h, w)
    p = {
        's0': seeds_ref[b, 0].astype(jnp.uint32),
        's1': seeds_ref[b, 1].astype(jnp.uint32),
        'level': level_ref[b],
        'vals': vals_ref[b],
    }

    @pl.when(i == 0)
    def _():
        carry[0] = jnp.float32(0.0)

    branches = _make_branches(kinds, geo, p, carry, centers_ref,
                              bloom_ref, b, tile_h)
    out_ref[0] = jax.lax.switch(branch_ref[b], branches, 0)


@functools.partial(jax.jit, static_argnames=('kinds', 'tile_h',
                                             'interpret'))
def fused_mix_noise(images: jnp.ndarray, branch: jnp.ndarray,
                    level: jnp.ndarray, seeds: jnp.ndarray,
                    vals: jnp.ndarray, centers: jnp.ndarray,
                    bloom: jnp.ndarray, kinds: tuple,
                    tile_h: int = 8, interpret: bool = False
                    ) -> jnp.ndarray:
    """Per-image mixed noise in ONE HBM pass (interleaved (H, W*3) tiles).

    images: (B, H, W, 3) uint8 (or integral u8-domain f32, cast exactly);
    branch: (B,) int32 position into `kinds`; level/vals: (B,) f32;
    seeds: (B, 2) int32 hash seed words; centers: (B, K_PAD*6) f32 quant
    palette [lab(3), bgr(3)] per center (1e9-masked when inactive);
    bloom: (B, 48, 8) f32 compositing params.  Output f32: gaussian
    images in [0,1] (the reference quirk), the rest u8-domain — exactly
    apply_spec's per-kind domains.
    """
    if images.dtype != jnp.uint8:
        images = jnp.clip(jnp.round(images), 0, 255).astype(jnp.uint8)
    bsz, h, w, _ = images.shape
    w3 = w * 3
    w3p = ((w3 + LANES - 1) // LANES) * LANES
    n_tiles = (h + tile_h - 1) // tile_h
    hp = n_tiles * tile_h
    flat = images.reshape(bsz, h, w3)
    flat = jnp.pad(flat, ((0, 0), (0, hp - h), (0, w3p - w3)),
                   mode='edge')
    kernel = functools.partial(_mix_noise_kernel, kinds=kinds,
                               tile_h=tile_h, h=h, w=w)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(bsz, n_tiles),
            in_specs=[pl.BlockSpec((1, tile_h, w3p),
                                   lambda b, i, *_: (b, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, tile_h, w3p),
                                   lambda b, i, *_: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, w3p), jnp.float32),
        interpret=interpret,
    )(branch.astype(jnp.int32), level.astype(jnp.float32),
      seeds.astype(jnp.int32), vals.astype(jnp.float32),
      centers.astype(jnp.float32),
      bloom.reshape(bsz, N_BLOOM * 8).astype(jnp.float32), flat)
    return out[:, :h, :w3].reshape(bsz, h, w, 3)


# ------------------------------------------------- fused bilateral kernel --

def _mix_bilateral_kernel(branch_ref, level_ref, seeds_ref, vals_ref,
                          centers_ref, bloom_ref, img_hbm, out_ref,
                          scratch, sems, carry, *, kinds, tile_h: int,
                          n_tiles: int, batch: int, h: int, w: int,
                          sigma_color: float, sigma_space: float):
    """Noise branch + 9x9 bilateral in one pass: the window carries a
    4-row halo; noise is recomputed identically in the overlap
    (coordinate-stable RNG / carried brownian prefix), and out-of-image
    elements are zeroed to reproduce the XLA path's BORDER_CONSTANT pad
    of the NOISY image."""
    from tpudenoise.denoise.pallas_bilateral import _bilateral_body

    b = pl.program_id(0)
    i = pl.program_id(1)
    k = b * n_tiles + i
    total = batch * n_tiles
    win = tile_h + 2 * HALO
    slot = jax.lax.rem(k, 2)
    nxt = jax.lax.rem(k + 1, 2)

    def dma_for(step, slot_idx):
        bb = step // n_tiles
        ii = jax.lax.rem(step, n_tiles)
        return pltpu.make_async_copy(
            img_hbm.at[bb, :, pl.ds(ii * tile_h, win), :],
            scratch.at[slot_idx], sems.at[slot_idx])

    @pl.when(k == 0)
    def _():
        dma_for(0, slot).start()

    @pl.when(k + 1 < total)
    def _():
        dma_for(k + 1, nxt).start()

    dma_for(k, slot).wait()
    tile = _load_f32(scratch[slot])
    geo = _Geo(True, tile, i * tile_h - HALO, h, w)
    p = {
        's0': seeds_ref[b, 0].astype(jnp.uint32),
        's1': seeds_ref[b, 1].astype(jnp.uint32),
        'level': level_ref[b],
        'vals': vals_ref[b],
    }

    @pl.when(i == 0)
    def _():
        carry[0] = jnp.float32(0.0)

    branches = _make_branches(kinds, geo, p, carry, centers_ref,
                              bloom_ref, b, tile_h)
    noisy = jax.lax.switch(branch_ref[b], branches, 0)
    noisy = jnp.where(geo.valid, noisy, 0.0)
    _bilateral_body(noisy, tile_h, w, sigma_color, sigma_space, out_ref)


@functools.partial(jax.jit, static_argnames=('kinds', 'sigma_color',
                                             'sigma_space', 'tile_h',
                                             'interpret'))
def fused_mix_bilateral(images: jnp.ndarray, branch: jnp.ndarray,
                        level: jnp.ndarray, seeds: jnp.ndarray,
                        vals: jnp.ndarray, centers: jnp.ndarray,
                        bloom: jnp.ndarray, kinds: tuple,
                        sigma_color: float = 20.0,
                        sigma_space: float = 100.0, tile_h: int = 8,
                        interpret: bool = False) -> jnp.ndarray:
    """Mixed noise + cv2-style bilateral (d=9) in ONE HBM pass (planar
    (3, H, W) tiles — the bilateral layout).  Equivalent to
    bilateral_pallas(fused_mix_noise(...)) with zero intermediate HBM
    traffic.  Output f32 (B, H, W, 3)."""
    assert tile_h % 8 == 0
    if images.dtype != jnp.uint8:
        images = jnp.clip(jnp.round(images), 0, 255).astype(jnp.uint8)
    bsz, h, w, _ = images.shape
    wp = ((w + LANES - 1) // LANES) * LANES
    n_tiles = (h + tile_h - 1) // tile_h
    hp = n_tiles * tile_h
    planar = jnp.transpose(images, (0, 3, 1, 2))
    planar = jnp.pad(planar, ((0, 0), (0, 0),
                              (HALO, hp - h + HALO), (0, wp - w)))
    kernel = functools.partial(
        _mix_bilateral_kernel, kinds=kinds, tile_h=tile_h,
        n_tiles=n_tiles, batch=bsz, h=h, w=w, sigma_color=sigma_color,
        sigma_space=sigma_space)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(bsz, n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((1, 3, tile_h, wp),
                                   lambda b, i, *_: (b, 0, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 3, tile_h + 2 * HALO, wp), jnp.uint8),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((1,), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, 3, hp, wp), jnp.float32),
        interpret=interpret,
    )(branch.astype(jnp.int32), level.astype(jnp.float32),
      seeds.astype(jnp.int32), vals.astype(jnp.float32),
      centers.astype(jnp.float32),
      bloom.reshape(bsz, N_BLOOM * 8).astype(jnp.float32), planar)
    return jnp.transpose(out[:, :, :h, :w], (0, 2, 3, 1))


# ---------------------------------------------------------- XLA prologue --

def plan_tables(specs):
    """Static per-plan tables: the Kinds present (sorted by enum value)
    and the per-entry (branch position, level) lookup — the fused-kernel
    analogue of pipeline._group_specs, collapsed per KIND (quant's
    cluster count and every traced level ride the per-image level
    scalar)."""
    kinds = tuple(sorted({int(s.kind) for s in specs}))
    pos_of = {k: i for i, k in enumerate(kinds)}
    eb = np.asarray([pos_of[int(s.kind)] for s in specs], np.int32)
    el = np.asarray([float(s.level) for s in specs], np.float32)
    return kinds, eb, el


def mix_prologue(keys, images, kinds, eb, el, _fit_budget=None):
    """Per-image entry draw + image-dependent scalars for the fused
    kernels.  The draw chain is bit-identical to the XLA scan body
    (pipeline._apply_specs_batched: split -> randint over E entries), so
    the branch distribution matches the scanned switch exactly; `ka`
    seeds the hash stream and the quant/bloom sub-draws.

    Everything is vmapped over the batch — an earlier lax.scan +
    per-kind lax.cond formulation serialized the batch and cost
    0.133 ms/img at batch 64 (more than the fused kernel itself); here
    the unique-count / k-means-fit / bloom draws run batched for EVERY
    image and are masked to their drawn kind afterwards.  The per-image
    key chains are identical either way, so drawn-kind outputs are
    bit-equal to the scanned version; undrawn slots are zeroed (vals 1).

    keys: (B,) per-image keys (already split, as run()/keyed() produce).
    images: (B, H, W, 3) u8-domain float32 or uint8.
    Returns (branch, level, seeds, vals, centers, bloom) device arrays.
    """
    from tpudenoise.noise.generators import _u8_unique_count, bloom_params
    from tpudenoise.noise.kmeans import kmeans_fit_traced_k
    from tpudenoise.ops.color import bgr_u8_to_lab_u8, lab_u8_to_bgr_u8

    e = len(eb)
    eb_d = jnp.asarray(eb)
    el_d = jnp.asarray(el)
    h, w = images.shape[1], images.shape[2]
    n = h * w
    pos_poisson = (kinds.index(int(Kind.POISSON))
                   if int(Kind.POISSON) in kinds else None)
    pos_quant = (kinds.index(int(Kind.QUANT))
                 if int(Kind.QUANT) in kinds else None)
    pos_bloom = (kinds.index(int(Kind.BLOOM))
                 if int(Kind.BLOOM) in kinds else None)

    def draw(k):
        kc, ka = jax.random.split(k)
        idx = jax.random.randint(kc, (), 0, e)
        kd = jax.random.key_data(ka).reshape(-1).astype(jnp.uint32)
        seed = jnp.stack([kd[0], kd[-1]]).astype(jnp.int32)
        return eb_d[idx], el_d[idx], seed, ka

    pos, level, seeds, kas = jax.vmap(draw)(keys)

    if pos_poisson is not None:
        uc = jax.vmap(lambda im: _u8_unique_count(im)
                      .astype(jnp.float32))(images)
        vals = jnp.where(pos == pos_poisson,
                         2.0 ** jnp.ceil(jnp.log2(uc)), 1.0)
    else:
        vals = jnp.ones(pos.shape, jnp.float32)

    if pos_quant is not None:
        def quant_fit(ka, img, kk):
            """Replicates kmeans.quantize_colors' fit chain bit-exactly
            for the drawn k (kmeans_fit_traced_k docstring): u8-LAB
            points, 8192-point with-replacement subsample when n > 8192
            (the same static condition as `kmeans`), traced-k fit.  The
            LAB conversion runs on the SUBSAMPLE, not the full image
            (pixelwise, so lab.reshape(-1,3)[idx] == lab(flat[idx]))."""
            flat = img.reshape(-1, 3).astype(jnp.float32)
            if n > 8192:
                k1, sub = jax.random.split(ka)
                fit_idx = jax.random.randint(sub, (8192,), 0, n)
                pts = bgr_u8_to_lab_u8(flat[fit_idx])
            else:
                k1 = ka
                pts = bgr_u8_to_lab_u8(flat)
            centers, active = kmeans_fit_traced_k(k1, pts, kk)
            centers_u8 = jnp.trunc(jnp.clip(centers, 0.0, 255.0))
            bgr = lab_u8_to_bgr_u8(centers_u8)
            lab_masked = jnp.where(active[:, None], centers,
                                   jnp.float32(1e9))
            return jnp.concatenate([lab_masked, bgr], axis=1).reshape(-1)

        is_q = pos == pos_quant
        kk = jnp.where(is_q, level.astype(jnp.int32), 1)
        bsz = int(pos.shape[0])
        # Only ~nq/e of the batch draws quant, but the vmapped fit used
        # to run for EVERY image and dominated the prologue (0.20 of
        # 0.25 ms/img at batch 64, benchmarks/profile_mix_kinds.py
        # --prologue).  Gather the quant-drawn images into a static
        # budget sized at +6 sigma of the binomial draw count and fit
        # only those; the (vanishingly rare) overflow falls back to the
        # full-batch fit via lax.cond, so every image's palette is
        # bit-identical to the ungathered version either way.
        nq = int(np.sum(eb == pos_quant))
        mean = bsz * nq / e
        budget = int(np.ceil(mean + 6.0 * np.sqrt(
            max(mean * (1.0 - nq / e), 1e-9)))) + 1
        budget = min(bsz, max(budget, 1))
        if _fit_budget is not None:  # test hook (tests/test_pallas_mix)
            budget = min(bsz, _fit_budget)
        if budget >= bsz:
            fitted = jax.vmap(quant_fit)(kas, images, kk)
        else:
            qidx = jnp.argsort(jnp.where(is_q, 0, 1), stable=True)[:budget]

            def gathered_fit(_):
                sub = jax.vmap(quant_fit)(
                    kas[qidx], images[qidx], kk[qidx])
                return jnp.zeros((bsz, K_PAD * 6),
                                 jnp.float32).at[qidx].set(sub)

            def full_fit(_):
                return jax.vmap(quant_fit)(kas, images, kk)

            fitted = jax.lax.cond(jnp.sum(is_q) <= budget,
                                  gathered_fit, full_fit, 0)
        centers = jnp.where(is_q[:, None], fitted, 0.0)
    else:
        centers = jnp.zeros((pos.shape[0], K_PAD * 6), jnp.float32)

    if pos_bloom is not None:
        params = jax.vmap(lambda a: bloom_params(a, h, w))(kas)
        bloom = jnp.where((pos == pos_bloom)[:, None, None], params, 0.0)
    else:
        bloom = jnp.zeros((pos.shape[0], N_BLOOM, 8), jnp.float32)

    return pos, level, seeds, vals, centers, bloom
