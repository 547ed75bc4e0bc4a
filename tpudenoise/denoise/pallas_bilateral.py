"""Pallas bilateral filter — the heaviest classical filter (XLA path:
~257 img/s for 600x1000; the 69-tap disk with per-tap exp dominates).

Same math as denoise.stencils.bilateral (cv2 d=9 sigmaColor=20
sigmaSpace=100 BORDER_CONSTANT semantics): disk taps, shared 3-channel
color weight exp(-(|dB|+|dG|+|dR|)^2 / 2 sigma_c^2), constant-zero padding
participating in the sums.

Layout: PLANAR (3, H, W) per image with one pixel per lane, so the
3-channel diff sum is a plain reduction over the leading axis — one lane
roll per tap total (the interleaved (H, W*3) layout needed ~5 rolls per
tap and blew past Mosaic's program-size limits at d=9).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudenoise.noise.pallas_kernels import HALO, LANES

_D = 9
_R = _D // 2  # 4


def _shift_x_const0(tile: jnp.ndarray, lanes, w: int,
                    dx: int) -> jnp.ndarray:
    """Value of the x+dx neighbor per lane (planar: 1 px/lane), 0 outside
    the true image (BORDER_CONSTANT).  When the lane padding holds >= _R
    zero columns (lanes is None), the circular roll wraps only zeros into
    the true-image lanes, so no mask is needed — bit-identical to the
    masked form and ~2 ops/tap cheaper."""
    wp = tile.shape[-1]
    if dx == 0:
        return tile
    if dx > 0:
        v = pltpu.roll(tile, shift=wp - dx, axis=2)   # roll by -dx
        return v if lanes is None else jnp.where(lanes >= w - dx, 0.0, v)
    v = pltpu.roll(tile, shift=-dx, axis=2)
    return v if lanes is None else jnp.where(lanes < -dx, 0.0, v)


def _bilateral_body(tile, tile_h, w, sigma_color, sigma_space, out_ref):
    """tile: (3, tile_h + 2*HALO, Wp) with zero-padded halos AND zeroed
    lanes beyond `w` (both kernels guarantee this: bilateral_pallas
    zero-pads the planar input, the fused mix kernel zeroes invalid
    elements of the noisy tile).

    The BORDER_CONSTANT lane mask is skipped when the lane padding has
    >= _R zero columns (see _shift_x_const0) — bit-identical, ~2 ops/tap
    cheaper.  Loop order stays dy-outer with per-band rolls: a dx-outer
    variant shifting the whole halo window once per dx (9 rolls instead
    of 69) measured SLOWER — the live full-window values grew the
    scoped-VMEM frame past the spill wall (fused mix+bilateral 1834 ->
    1448 img/s; standalone th=40 compile-OOM'd at 19M scoped)."""
    _, rows, wp = tile.shape
    out_rows = tile_h
    need_mask = (wp - w) < _R
    lanes = (jax.lax.broadcasted_iota(jnp.int32, (1, out_rows, wp), 2)
             if need_mask else None)
    center = tile[:, HALO:HALO + out_rows]
    gc = -0.5 / (sigma_color * sigma_color)
    gs = -0.5 / (sigma_space * sigma_space)

    num = jnp.zeros_like(center)
    den = jnp.zeros((1, out_rows, wp), jnp.float32)
    for dy in range(-_R, _R + 1):
        band = tile[:, HALO + dy: HALO + dy + out_rows]
        for dx in range(-_R, _R + 1):
            r2 = dy * dy + dx * dx
            if math.sqrt(r2) > _R:
                continue
            sw = math.exp(gs * r2)
            v = _shift_x_const0(band, lanes, w, dx)
            diff = jnp.sum(jnp.abs(v - center), axis=0, keepdims=True)
            wgt = sw * jnp.exp(gc * diff * diff)
            num = num + wgt * v
            den = den + wgt
    out_ref[0] = jnp.round(num / den)


def _bilateral_kernel(img_hbm, out_ref, scratch, sems, *, tile_h: int,
                      n_tiles: int, batch: int, w: int,
                      sigma_color: float, sigma_space: float):
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
    _bilateral_body(scratch[slot], tile_h, w, sigma_color, sigma_space,
                    out_ref)


@functools.partial(jax.jit, static_argnames=('sigma_color', 'sigma_space',
                                             'tile_h', 'interpret'))
def bilateral_pallas(images: jnp.ndarray, sigma_color: float = 20.0,
                     sigma_space: float = 100.0, tile_h: int = 40,
                     interpret: bool = False) -> jnp.ndarray:
    """Batched cv2-style bilateral (d=9) in one HBM pass per image.
    images: (B, H, W, 3) f32 u8-domain.  Matches denoise.stencils.bilateral
    (same f32 math) and therefore cv2 within +/-1 LUT step."""
    assert tile_h % 8 == 0
    bsz, h, w, _ = images.shape
    wp = ((w + LANES - 1) // LANES) * LANES
    n_tiles = (h + tile_h - 1) // tile_h
    hp = n_tiles * tile_h
    planar = jnp.transpose(images, (0, 3, 1, 2))        # (B, 3, H, W)
    # BORDER_CONSTANT: zero rows in the halo + zero x padding
    planar = jnp.pad(planar, ((0, 0), (0, 0),
                              (HALO, hp - h + HALO), (0, wp - w)))
    kernel = functools.partial(
        _bilateral_kernel, tile_h=tile_h, n_tiles=n_tiles, batch=bsz,
        w=w, sigma_color=sigma_color, sigma_space=sigma_space)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(bsz, n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((1, 3, tile_h, wp),
                                   lambda b, i: (b, 0, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 3, tile_h + 2 * HALO, wp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, 3, hp, wp), jnp.float32),
        interpret=interpret,
    )(planar)
    return jnp.transpose(out[:, :, :h, :w], (0, 2, 3, 1))
