"""Fixed-round vectorized samplers for the TPU-hostile distributions.

`jax.random.poisson` / `jax.random.gamma` implement textbook rejection
sampling with data-dependent `while_loop`s — correct, but pathological on
TPU inside the mixed-noise programs (measured 15.3 / 18.2 ms per 600x1000
image vs ~0.1 ms for a normal draw; the loop iterates at full image width
until the LAST pixel accepts).  These replacements re-express the same
distributions with a FIXED number of vectorized rounds so the whole
sampler is straight-line elementwise code (fusable, scannable, no control
flow):

  * poisson_fixed — exact inverse-CDF summation for lam < _SPLIT (one
    uniform + a 42-term fused recurrence), Hörmann's PTRS transformed
    rejection (4 rounds) for large lam.  Residual failure probability
    <= ~1e-5 per pixel falls back to the rounded normal approximation.
  * gamma_fixed — Marsaglia-Tsang squeeze (4 rounds, acceptance ~97% per
    round for shape ~2); residual ~1e-6 falls back to the last
    candidate's d*v (unconditioned), a bias on <0.0002% of pixels.

The RNG *stream* differs from jax.random's samplers (the reference is
numpy/scipy on the host anyway — parity is distributional, not
streamwise; tests pin moments/KS against scipy).

PTRS reference: W. Hörmann, "The transformed rejection method for
generating Poisson random variables" (1993).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SPLIT = 10.0     # lam cutoff between inverse-CDF and PTRS
# inverse-CDF terms: P(Poisson(10) >= 34) ~ 2.1e-9, below the resolution
# of the 24-bit uniforms driving the inversion (2^-24 ~ 6e-8) — extra
# terms past 34 are unreachable for all but ~3e-8 of draws (the top f32
# ulp of u, where the accumulated cdf may sit one ulp under 1.0)
_N_INV = 34
_PTRS_ROUNDS = 4  # PTRS acceptance >= ~0.93 for lam >= 10


# ------------------------------------------------ counter-hash bitstream --
# The samplers above draw ~11 (poisson) / ~12 (gamma) threefry fields per
# image; threefry is ~20+ ALU ops per word and dominates the whole branch
# (profiled: ~45% of poisson_fixed is RNG).  `fast_bits=True` swaps the
# draws for a splitmix-style counter hash (~9 ops/word — the same
# construction, constants and accepted stream-trade as the fused Pallas
# kernels' _hash2d in noise/pallas_kernels.py), seeded deterministically
# from the incoming key, so runs remain reproducible.  Distributional
# quality is pinned by the same chi-square/KS suites as the threefry path
# (tests/test_noise.py).

def _seed_from_key(key) -> jnp.ndarray:
    """(2,) uint32 seed words carrying the threefry key's FULL 64 bits —
    a single mixed u32 would birthday-collide across ~10^5-10^6 per-image
    fold_in keys (~45 expected collisions at 640k keys), silently giving
    colliding images bit-identical noise fields."""
    d = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    return jnp.stack([d[0], d[-1]])


def _hash_words(shape, salt: int, seed) -> jnp.ndarray:
    """uint32 avalanche hash of (flat counter, salt, seed64) over
    `shape`; seed is the (2,) word pair from _seed_from_key.

    seed[1] enters AFTER the first avalanche stage rather than being
    folded into the initial XOR: an initial-stage fold would collapse the
    64-bit seed to the single word `seed0*C3 ^ seed1*C4`, restoring the
    2^-32 pairwise full-stream birthday collision _seed_from_key exists
    to avoid.  Injected mid-finalizer, two distinct seed pairs produce
    identical streams only if both words match (the mul stages are odd,
    hence bijective), at the cost of one extra XOR (~9 -> ~10 ops/word)."""
    n = 1
    for s in shape:
        n *= s
    idx = jax.lax.iota(jnp.uint32, n).reshape(shape)
    h = (idx * jnp.uint32(0x9E3779B9)
         ^ jnp.uint32(salt) * jnp.uint32(0x85EBCA6B)
         ^ seed[0] * jnp.uint32(0xC2B2AE35))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ seed[1] * jnp.uint32(0x27D4EB2F)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


def _u01(shape, salt: int, seed) -> jnp.ndarray:
    """f32 uniform in (0, 1): 24 hash bits (top bits; the u32->f32 cast
    routes through int32 — Mosaic/XLA-TPU has no unsigned->float path),
    offset by half an ulp so 0 is excluded (log-safe)."""
    bits = (_hash_words(shape, salt, seed) >> 8).astype(jnp.int32)
    return (bits.astype(jnp.float32) + 0.5) * jnp.float32(2.0 ** -24)


def _normal(shape, salt: int, seed) -> jnp.ndarray:
    """Standard normal via Box-Muller from two hash words."""
    u1 = _u01(shape, salt, seed)
    u2 = _u01(shape, salt + 1, seed)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
        jnp.float32(2.0 * jnp.pi) * u2)


def stirling_lgamma(z: jnp.ndarray) -> jnp.ndarray:
    """lgamma(z) for z >= ~0.5 via an 8-step recurrence lift + Stirling.

    `jax.lax.lgamma` costs ~30x a log on the TPU VPU and the PTRS
    acceptance test needs one per round (4 per poisson field — ~0.4 ms
    of the 1.65 ms/img poisson-in-mix cost at 600x1000).  Here:
    lgamma(z) = lgamma(z+8) - log(z (z+1) ... (z+7)), with lgamma(t)
    for t >= 8.5 from the Stirling series
        (t-1/2) ln t - t + ln(2 pi)/2 + 1/(12 t) - 1/(360 t^3);
    the next term is 1/(1260 t^5) <= 4e-9 at t = 8.5 — below f32
    resolution of lgamma(8.5) ~ 9.6.  Two logs + ~16 flops total.
    Max deviation vs lax.lgamma over [0.5, 1e6]: a few f32 ulps
    (tests/test_noise.py pins it).  Negative/zero z produce garbage the
    callers mask out (PTRS guards with `safe`, matching lax.lgamma's
    pole behavior there).
    """
    z = z.astype(jnp.float32)
    t = z + 8.0
    inv = 1.0 / t
    # product (z)(z+1)...(z+7) scaled by t^-8 so it never overflows f32
    # (the t^8 rejoins the Stirling term as -8 ln t); guard z<=0 lanes
    # against log(<=0) -> nan propagating into masked lanes' comparisons
    pr = z * inv
    for i in range(1, 8):
        pr = pr * ((z + float(i)) * inv)
    pr = jnp.maximum(pr, jnp.float32(1e-30))
    inv2 = inv * inv
    series = inv * (jnp.float32(1.0 / 12.0)
                    - inv2 * jnp.float32(1.0 / 360.0))
    half_log_2pi = jnp.float32(0.91893853320467274178)
    return ((t - 8.5) * jnp.log(t) - t + half_log_2pi + series
            - jnp.log(pr))


def _poisson_inv_cdf(u: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Exact Poisson sampling by CDF inversion, valid for small lam.

    k = min{n : sum_{i<=n} pmf(i) > u}, computed with the stable
    recurrence p_{k} = p_{k-1} * lam / k starting at p_0 = e^-lam
    (e^-10 ~ 4.5e-5 — comfortably inside f32).
    """
    p = jnp.exp(-lam)
    cdf = p
    k = jnp.zeros_like(u)
    for n in range(1, _N_INV):
        k = jnp.where(u > cdf, jnp.float32(n), k)
        p = p * lam / jnp.float32(n)
        cdf = cdf + p
    return k


def _poisson_ptrs(key, lam: jnp.ndarray, fast_bits: bool = False,
                  seed=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """PTRS transformed rejection, _PTRS_ROUNDS fixed rounds.

    Returns (k, ok); pixels with ok=False failed every round.
    """
    b = 0.931 + 2.53 * jnp.sqrt(lam)
    a = -0.059 + 0.02483 * b
    inv_alpha = 1.1239 + 1.1328 / (b - 3.4)
    v_r = 0.9277 - 3.6224 / (b - 2.0)
    log_lam = jnp.log(lam)

    k = jnp.zeros_like(lam)
    ok = jnp.zeros(lam.shape, jnp.bool_)
    for r in range(_PTRS_ROUNDS):
        if fast_bits:
            # one hash word per round: u rides the high 16 bits, v the
            # low 16 (the acceptance geometry tolerates 2^-16 coordinate
            # quantization — chi-square-pinned in tests)
            w = _hash_words(lam.shape, 16 + r, seed)
            u = ((w >> 16).astype(jnp.int32).astype(jnp.float32) + 0.5) \
                * jnp.float32(2.0 ** -16) - 0.5
            v = ((w & jnp.uint32(0xFFFF)).astype(jnp.int32)
                 .astype(jnp.float32) + 0.5) * jnp.float32(2.0 ** -16)
        else:
            ku, kv = jax.random.split(jax.random.fold_in(key, r))
            u = jax.random.uniform(ku, lam.shape, lam.dtype) - 0.5
            v = jax.random.uniform(kv, lam.shape, lam.dtype)
        us = 0.5 - jnp.abs(u)
        cand = jnp.floor((2.0 * a / us + b) * u + lam + 0.43)
        # fast acceptance region
        accept = (us >= 0.07) & (v <= v_r)
        # full acceptance test (guarded against us ~ 0 and cand < 0)
        safe = (cand >= 0.0) & ((us >= 0.013) | (v <= us))
        lhs = jnp.log(v * inv_alpha / (a / (us * us) + b))
        # stream-preserving lgamma swap: same draws, acceptance boundary
        # moves by a few f32 ulps (flips outcomes on ~1e-7 of lanes)
        rhs = -lam + cand * log_lam - stirling_lgamma(cand + 1.0)
        accept = accept | (safe & (lhs <= rhs))
        take = accept & ~ok
        k = jnp.where(take, cand, k)
        ok = ok | accept
    return k, ok


def poisson_fixed(key, lam: jnp.ndarray,
                  fast_bits: bool = False) -> jnp.ndarray:
    """Poisson(lam) draws, float32 counts, lam >= 0 elementwise.

    Exact inverse-CDF for lam < _SPLIT; PTRS (4 fixed rounds) above, with
    a rounded-normal fallback on the ~1e-5 residual.  fast_bits swaps the
    threefry draws for the counter-hash bitstream (see module doc).
    """
    lam = lam.astype(jnp.float32)
    small = lam < _SPLIT

    if fast_bits:
        seed = _seed_from_key(key)
        u = _u01(lam.shape, 1, seed)
        z = _normal(lam.shape, 8, seed)
        k_ptrs_key = key
    else:
        seed = None
        k_inv_key, k_ptrs_key, k_norm_key = jax.random.split(key, 3)
        u = jax.random.uniform(k_inv_key, lam.shape, jnp.float32)
        z = jax.random.normal(k_norm_key, lam.shape, jnp.float32)

    # clamp the inverse-CDF lam so the large-lam lanes don't overflow the
    # 42-term recurrence (their value is discarded by the select)
    k_small = _poisson_inv_cdf(u, jnp.minimum(lam, _SPLIT))

    lam_big = jnp.maximum(lam, _SPLIT)  # keep PTRS constants in-domain
    k_big, ok = _poisson_ptrs(k_ptrs_key, lam_big, fast_bits, seed)
    k_fallback = jnp.maximum(jnp.round(lam + jnp.sqrt(lam) * z), 0.0)
    k_big = jnp.where(ok, k_big, k_fallback)

    return jnp.where(small, k_small, k_big)


def gamma_fixed(key, a: float, shape, dtype=jnp.float32,
                fast_bits: bool = False) -> jnp.ndarray:
    """Gamma(a, 1) draws for static shape parameter a > 1.

    Marsaglia-Tsang (2000) squeeze with 4 fixed rounds: d = a - 1/3,
    c = 1/sqrt(9d); x ~ N(0,1), v = (1+cx)^3, accept v > 0 and
    ln U < x^2/2 + d - dv + d ln v.  Residual failures (~1e-6 of lanes
    for a ~ 2) keep the last round's d*v.  fast_bits swaps the threefry
    draws for the counter-hash bitstream (see module doc).
    """
    if not a > 1.0:
        raise ValueError(f'gamma_fixed requires shape a > 1, got {a}')
    d = jnp.asarray(a - 1.0 / 3.0, dtype)
    c = 1.0 / jnp.sqrt(9.0 * d)
    seed = _seed_from_key(key) if fast_bits else None

    out = jnp.zeros(shape, dtype)        # overwritten on any accept
    last = d * jnp.ones(shape, dtype)    # most recent positive candidate
    ok = jnp.zeros(shape, jnp.bool_)
    for r in range(4):
        if fast_bits:
            x = _normal(shape, 32 + 3 * r, seed)
            u = _u01(shape, 34 + 3 * r, seed)
        else:
            kx, ku = jax.random.split(jax.random.fold_in(key, r))
            x = jax.random.normal(kx, shape, dtype)
            u = jax.random.uniform(ku, shape, dtype,
                                   jnp.finfo(dtype).tiny, 1.0)
        v = (1.0 + c * x) ** 3
        pos = v > 0.0
        vs = jnp.where(pos, v, 1.0)  # guard log of non-positive
        accept = pos & (jnp.log(u) <
                        0.5 * x * x + d * (1.0 - vs + jnp.log(vs)))
        cand = d * vs
        out = jnp.where(accept & ~ok, cand, out)
        ok = ok | accept
        last = jnp.where(pos, cand, last)
    return jnp.where(ok, out, last)  # residual: last positive candidate
