"""Single-pass Pallas sun-flare ("bloom") compositor.

The XLA bloom (noise/generators.bloom, ref tools/Automold.py:588-627 via
lib/model/test.py:1590-1594) scans 48 compositing steps, each touching the
full image twice — ~96 HBM passes.  Here the whole overlay/output
recurrence runs in registers per tile: the 48 steps consume only per-step
scalars (center, radius^2, color, alpha — drawn OUTSIDE the kernel with
the exact jax.random ops of the XLA version, generators.bloom_params), so
one HBM read + one write per pixel replaces the pass storm.

Channel-planar layout: grid (3, row_tiles); each instance composites one
channel plane (masks are recomputed per channel — 3x negligible ALU for
fully 2D tiles)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_STEPS = 48
N_CIRC = 8   # random flare circles; rows N_CIRC.. share the source center
_TILE = 64


def _bloom_kernel(params_ref, img_ref, out_ref):
    # params_ref is the scalar-prefetch arg (SMEM): Mosaic only allows
    # the program_id-dependent color-column index on a scalar ref (a
    # dynamic lane index into a VMEM block fails to lower)
    cid = pl.program_id(0)
    t, wdt = img_ref.shape[1], img_ref.shape[2]
    y0 = pl.program_id(1) * t
    yy = (y0 + jax.lax.broadcasted_iota(jnp.int32, (t, wdt), 0)
          ).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (t, wdt), 1).astype(
        jnp.float32)
    # steps N_CIRC.. are the flare-source rings: bloom_params guarantees
    # they share one center, so their squared-distance field computes
    # ONCE (the per-step mask collapses to a single compare) — ~40% less
    # VPU work than re-deriving (xx-cx)^2+(yy-cy)^2 per step, with
    # bit-identical masks (same subtract/square/add on the same values)
    dsrc = ((xx - params_ref[N_CIRC, 0]) ** 2
            + (yy - params_ref[N_CIRC, 1]) ** 2)
    overlay = img_ref[0]
    output = img_ref[0]
    for s in range(N_STEPS):
        r2 = params_ref[s, 2]
        col = params_ref[s, 3 + cid]
        a = params_ref[s, 6]
        if s < N_CIRC:
            cx = params_ref[s, 0]
            cy = params_ref[s, 1]
            mask = (xx - cx) ** 2 + (yy - cy) ** 2 <= r2
        else:
            mask = dsrc <= r2
        overlay = jnp.where(mask, col, overlay)
        # saturate_u8: round half-even then clamp (generators.saturate_u8)
        output = jnp.clip(jnp.round(a * overlay + (1.0 - a) * output),
                          0.0, 255.0)
    out_ref[0] = output


@functools.partial(jax.jit, static_argnames=('interpret',))
def bloom_pallas(img_u8: jnp.ndarray, params: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """img_u8: (H, W, 3) float32 u8-domain; params: (48, 8) from
    generators.bloom_params.  Returns the composited image, equal to
    generators.bloom_apply_scan (bit-exact in interpret mode; FMA-level
    float differences possible on hardware)."""
    h, w, _ = img_u8.shape
    hp = -(-h // _TILE) * _TILE
    planar = jnp.transpose(img_u8.astype(jnp.float32), (2, 0, 1))
    planar = jnp.pad(planar, ((0, 0), (0, hp - h), (0, 0)))
    out = pl.pallas_call(
        _bloom_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(3, hp // _TILE),
            in_specs=[
                pl.BlockSpec((1, _TILE, w), lambda c, i, p: (c, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, _TILE, w),
                                   lambda c, i, p: (c, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((3, hp, w), jnp.float32),
        interpret=interpret,
    )(params.astype(jnp.float32), planar)
    return jnp.transpose(out[:, :h, :], (1, 2, 0))
