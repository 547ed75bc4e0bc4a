"""Pallas TPU kernels for the hot fused noise+denoise paths.

The XLA pipeline materializes a full-image temporary per stage (noise
masks, each median, casts) — ~6 HBM round-trips for sap+median^2.  The
fused kernel here does ONE read + ONE write per image: salt&pepper noise is
generated in-register from a coordinate-stable counter hash (so tile halos
see identical noise regardless of the grid partition), and both 3x3 medians
run on VMEM tiles with a 4-row halo DMA'd from HBM (overlapping windows via
manual async copy — BlockSpecs can't express overlap; window height is kept
a multiple of the f32 sublane tiling (8) for the DMA slicer).

This is the TPU re-expression of the reference's hottest per-image path
(s&p synthesis + cv2.medianBlur, ref lib/roi_data_layer/minibatch.py /
lib/model/test.py) and the headline bench config (BASELINE.json config 2).

Semantics vs the XLA pipeline: median/border behavior bit-exact
(BORDER_REPLICATE incl. replicating the *noisy* border rows — hash
coordinates are clamped to the image extent — and, for the second median,
the *filtered* border rows, as cv2 re-pads between calls); the RNG stream
differs (counter hash vs threefry) with the same Bernoulli(amount) x
Bernoulli(1/2) law — statistical parity tested in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
HALO = 4  # rows each side; window = tile_h + 2*HALO is 8-aligned


def _load_f32(tile: jnp.ndarray) -> jnp.ndarray:
    """VMEM tile -> f32 u8-domain registers.  uint8 tiles hop through int32
    (Mosaic has no unsigned->float cast); values 0..255 are exact."""
    if tile.dtype == jnp.uint8:
        return tile.astype(jnp.int32).astype(jnp.float32)
    return tile


def _store_row_block(out_ref, x: jnp.ndarray) -> None:
    """Write an integral-valued f32 u8-domain block, casting to the output
    ref's dtype (uint8 via the int32 hop)."""
    if out_ref.dtype == jnp.uint8:
        x = x.astype(jnp.int32).astype(jnp.uint8)
    out_ref[0] = x


def _hash2d(iy: jnp.ndarray, ix: jnp.ndarray, seed: jnp.ndarray
            ) -> jnp.ndarray:
    """Coordinate-stable uint32 hash (splitmix-style avalanche)."""
    h = (iy.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
         ^ ix.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
         ^ seed.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


def _med3(a, b, c):
    """Median of three: max(min(a,b), min(max(a,b), c))."""
    return jnp.maximum(jnp.minimum(a, b),
                       jnp.minimum(jnp.maximum(a, b), c))


def _median3_tile(t: jnp.ndarray, w3: int) -> jnp.ndarray:
    """3x3 median over a tile with one halo row each side:
    (R+2, W3p) -> (R, W3p).

    Uses the Smith column-sort decomposition: sort each vertical triple
    once (shared across the three x-shifts), then
    med9 = med3(max(lo_l, lo_c, lo_r), med3(mid_*), min(hi_l, hi_c, hi_r))
    — ~half the min/max ops of the 19-exchange network.  x-neighbors are
    +/-3 lane rolls with BORDER_REPLICATE fixes at the true image edges.
    """
    rows, w3p = t.shape
    out_rows = rows - 2
    lanes = jax.lax.broadcasted_iota(jnp.int32, (out_rows, w3p), 1)

    a = t[0:out_rows]
    b = t[1:out_rows + 1]
    c = t[2:out_rows + 2]
    # vertical sort3
    lo = jnp.minimum(a, b)
    hi = jnp.maximum(a, b)
    mid = jnp.minimum(hi, c)
    hi = jnp.maximum(hi, c)
    lo2 = jnp.minimum(lo, mid)
    mid = jnp.maximum(lo, mid)
    lo = lo2

    def shifts(x):
        left = pltpu.roll(x, shift=3, axis=1)
        left = jnp.where(lanes < 3, x, left)
        # negative shifts rejected; circular roll by (len - 3) == -3
        right = pltpu.roll(x, shift=w3p - 3, axis=1)
        right = jnp.where(lanes >= w3 - 3, x, right)
        return left, x, right

    lo_l, lo_c, lo_r = shifts(lo)
    mid_l, mid_c, mid_r = shifts(mid)
    hi_l, hi_c, hi_r = shifts(hi)
    maxlo = jnp.maximum(jnp.maximum(lo_l, lo_c), lo_r)
    minhi = jnp.minimum(jnp.minimum(hi_l, hi_c), hi_r)
    medmid = _med3(mid_l, mid_c, mid_r)
    return _med3(maxlo, medmid, minhi)


def _u01(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 random bits -> uniform [0,1) float32.  Mosaic has no
    uint32->f32 cast: drop to 31 bits and go through int32."""
    i31 = pltpu.bitcast(bits >> 1, jnp.int32)
    return i31.astype(jnp.float32) * jnp.float32(1.0 / 2147483648.0)


def _gauss_from_hash(iy, ix, seed, sigma):
    """Standard-normal noise from two coordinate hashes via Box-Muller
    (deterministic per absolute coordinate, so tile halos agree)."""
    u1 = jnp.maximum(_u01(_hash2d(iy, ix, seed)), jnp.float32(1e-12))
    u2 = _u01(_hash2d(iy, ix, seed + jnp.int32(0x2545F491)))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return sigma * r * jnp.cos(jnp.float32(2.0 * 3.14159265358979) * u2)


def _blur3_tile(t: jnp.ndarray, w3: int) -> jnp.ndarray:
    """cv2.GaussianBlur((3,3),0) over a tile with one halo row each side:
    (R+2, W3p) -> (R, W3p), taps [1,2,1]/4 separable, REFLECT_101 at the
    true x edges, half-up rounding (matches denoise.stencils)."""
    rows, w3p = t.shape
    out_rows = rows - 2
    v = (0.25 * t[0:out_rows] + 0.5 * t[1:out_rows + 1]
         + 0.25 * t[2:out_rows + 2])
    lanes = jax.lax.broadcasted_iota(jnp.int32, (out_rows, w3p), 1)
    left = pltpu.roll(v, shift=3, axis=1)          # value from x-1
    right = pltpu.roll(v, shift=w3p - 3, axis=1)   # value from x+1
    # REFLECT_101: x=-1 mirrors x=1, x=w-1's right mirrors x=w-2
    left = jnp.where(lanes < 3, right, left)
    right2 = jnp.where(lanes >= w3 - 3, left, right)
    out = 0.25 * left + 0.5 * v + 0.25 * right2
    return jnp.floor(out + 0.5)


def _gauss_blur_body(tile, i, tile_h, h, w3, seed, sigma, apply_noise,
                     double_filter, out_ref):
    """Gaussian noise (skimage semantics on [0,1], clipped) + uint8 cast +
    3x3 gaussian blur (x2 for the TRAIN double-filter) on one tile.

    sigma is a traced per-image scalar (from the scalar-prefetch array) so
    the randomized-level quirk (ref test.py:1678-1682) draws per IMAGE, not
    per batch; apply_noise is the static skip for var == 0."""
    rows, w3p = tile.shape
    iy = (i * tile_h - HALO
          + jax.lax.broadcasted_iota(jnp.int32, (rows, w3p), 0))
    # REFLECT_101 halos contain the MIRRORED noisy rows: the noise drawn
    # for a halo row must be the mirrored row's noise, not a clamp
    iy = jnp.where(iy < 0, -iy, iy)
    iy = jnp.where(iy > h - 1, 2 * (h - 1) - iy, iy)
    ix = jax.lax.broadcasted_iota(jnp.int32, (rows, w3p), 1)
    ix = jnp.minimum(ix, w3 - 1)

    if apply_noise:
        z = _gauss_from_hash(iy, ix, seed, sigma)
        x01 = tile * jnp.float32(1.0 / 255.0) + z
        noisy = jnp.trunc(jnp.clip(x01, 0.0, 1.0) * 255.0)
    else:
        noisy = tile

    b1 = _blur3_tile(noisy, w3)          # rows: win - 2
    if double_filter:
        # cv2 re-pads the blurred image (REFLECT_101 rows) before the
        # second GaussianBlur: row -1 mirrors row 1, row h mirrors h-2
        rows1 = b1.shape[0]
        vr = (i * tile_h - (HALO - 1)
              + jax.lax.broadcasted_iota(jnp.int32, (rows1, w3p), 0))
        up2 = pltpu.roll(b1, shift=rows1 - 2, axis=0)    # row r <- r+2
        down2 = pltpu.roll(b1, shift=2, axis=0)          # row r <- r-2
        b1 = jnp.where(vr == -1, up2, b1)
        b1 = jnp.where(vr == h, down2, b1)
        _store_row_block(out_ref,
                         _blur3_tile(b1, w3)[HALO - 2:HALO - 2 + tile_h])
    else:
        _store_row_block(out_ref, b1[HALO - 1:HALO - 1 + tile_h])


def _fused_gauss_batched_kernel(seed_ref, sigma_ref, img_hbm, out_ref,
                                scratch, sems,
                                *, tile_h: int, n_tiles: int, batch: int,
                                h: int, w3: int, apply_noise: bool,
                                double_filter: bool):
    """Batch-grid gaussian+blur with double-buffered input DMA."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    k = b * n_tiles + i
    total = batch * n_tiles
    win = tile_h + 2 * HALO
    slot = jax.lax.rem(k, 2)
    nxt_slot = jax.lax.rem(k + 1, 2)

    def dma_for(step, slot_idx):
        bb = step // n_tiles
        ii = jax.lax.rem(step, n_tiles)
        return pltpu.make_async_copy(
            img_hbm.at[bb, pl.ds(ii * tile_h, win), :],
            scratch.at[slot_idx], sems.at[slot_idx])

    @pl.when(k == 0)
    def _():
        dma_for(0, slot).start()

    @pl.when(k + 1 < total)
    def _():
        dma_for(k + 1, nxt_slot).start()

    dma_for(k, slot).wait()
    _gauss_blur_body(_load_f32(scratch[slot]), i, tile_h, h, w3, seed_ref[b],
                     sigma_ref[b], apply_noise, double_filter, out_ref)


@functools.partial(jax.jit, static_argnames=('var', 'double_filter',
                                             'tile_h', 'interpret'))
def fused_gaussian_blur(images: jnp.ndarray, seeds: jnp.ndarray,
                        var: float = 0.1, double_filter: bool = True,
                        tile_h: int | None = None, interpret: bool = False,
                        sigmas: jnp.ndarray | None = None) -> jnp.ndarray:
    """Fused gaussian noise + GaussianBlur3 (x2) in one HBM pass — the
    BASELINE.json config-1 path ('gaussian_gaus_blur_varX').

    images: (B, H, W, 3) f32 u8-domain or uint8 (output dtype matches;
    uint8 I/O moves 4x fewer HBM bytes, compute stays f32 in registers).
    Noise follows skimage random_noise semantics (add N(0, var) in [0,1],
    clip, cast); the blur pair matches cv2 bit-exactly given the same
    noise.

    sigmas: optional (B,) f32 per-image noise std — pass
    sqrt(level) drawn per image for the randomized-level quirk
    (ref test.py:1678-1682); overrides `var`.
    """
    u8_io = images.dtype == jnp.uint8
    if tile_h is None:
        tile_h = 120 if u8_io else 88
    assert tile_h % 8 == 0
    io_dtype = jnp.uint8 if u8_io else jnp.float32
    bsz, h, w, _ = images.shape
    apply_noise = sigmas is not None or var > 0
    if sigmas is None:
        sigmas = jnp.full((bsz,), float(var) ** 0.5, jnp.float32)
    w3 = w * 3
    w3p = ((w3 + LANES - 1) // LANES) * LANES
    n_tiles = (h + tile_h - 1) // tile_h
    hp = n_tiles * tile_h
    flat = images.reshape(bsz, h, w3)
    # REFLECT_101 halo rows (np 'reflect'), pad-to-tiles + x pad
    flat = jnp.pad(flat, ((0, 0), (HALO, 0), (0, 0)), mode='reflect')
    flat = jnp.pad(flat, ((0, 0), (0, hp - h + HALO), (0, w3p - w3)),
                   mode='reflect')
    kernel = functools.partial(
        _fused_gauss_batched_kernel, tile_h=tile_h, n_tiles=n_tiles,
        batch=bsz, h=h, w3=w3, apply_noise=apply_noise,
        double_filter=double_filter)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bsz, n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((1, tile_h, w3p),
                                   lambda b, i, s, sg: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, tile_h + 2 * HALO, w3p), io_dtype),
                pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, w3p), io_dtype),
        interpret=interpret,
    )(seeds.astype(jnp.int32), sigmas.astype(jnp.float32), flat)
    return out[:, :h, :w3].reshape(bsz, h, w, 3)


def _fused_kernel(seed_ref, img_hbm, out_ref, scratch, sem, *,
                  tile_h: int, h: int, w3: int, amount: float,
                  double_filter: bool):
    """One grid step: DMA a (tile_h + 2*HALO)-row overlapping window,
    apply in-register s&p, one or two 3x3 medians, write tile_h rows."""
    i = pl.program_id(0)
    win = tile_h + 2 * HALO
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * tile_h, win), :], scratch, sem)
    dma.start()
    dma.wait()

    tile = scratch[:]
    rows, w3p = tile.shape
    # absolute image coordinates, clamped so edge-replicated halo rows and
    # the x padding draw the SAME noise as the pixel they replicate
    iy = (i * tile_h - HALO
          + jax.lax.broadcasted_iota(jnp.int32, (rows, w3p), 0))
    iy = jnp.clip(iy, 0, h - 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (rows, w3p), 1)
    ix = jnp.minimum(ix, w3 - 1)

    seed = seed_ref[0]
    bits = _hash2d(iy, ix, seed)
    thresh = (jnp.uint32(int(amount * 4294967296.0)) if amount < 1.0
              else jnp.uint32(0xFFFFFFFF))
    # one hash per pixel: the comparison consumes the high bits; bit 0 is
    # an independent fair coin for salt-vs-pepper
    flipped = bits < thresh
    salted = (bits & jnp.uint32(1)) == jnp.uint32(1)
    noisy = jnp.where(flipped & salted, 255.0, tile)
    noisy = jnp.where(flipped & ~salted, 0.0, noisy)

    m1 = _median3_tile(noisy, w3)        # rows: win - 2
    if double_filter:
        # cv2 re-pads the FILTERED image before the second medianBlur:
        # m1 rows at virtual image rows -1 / h must replicate the
        # filtered rows 0 / h-1
        rows1 = m1.shape[0]
        vr = (i * tile_h - (HALO - 1)
              + jax.lax.broadcasted_iota(jnp.int32, (rows1, w3p), 0))
        up = pltpu.roll(m1, shift=rows1 - 1, axis=0)    # row r <- r+1
        down = pltpu.roll(m1, shift=1, axis=0)          # row r <- r-1
        m1 = jnp.where(vr == -1, up, m1)
        m1 = jnp.where(vr == h, down, m1)
        m2 = _median3_tile(m1, w3)       # rows: win - 4
        out_ref[:] = m2[HALO - 2:HALO - 2 + tile_h]
    else:
        out_ref[:] = m1[HALO - 1:HALO - 1 + tile_h]


def _build_call(kernel, n_tiles: int, tile_h: int, hp: int, w3p: int,
                interpret: bool):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((tile_h, w3p), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tile_h + 2 * HALO, w3p), jnp.float32),
                pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((hp, w3p), jnp.float32),
        interpret=interpret,
    )


def _sap_median_body(tile, i, tile_h, h, w3, seed, amount, double_filter,
                     out_ref):
    """Shared compute body: s&p + median(s) on one halo'd tile."""
    rows, w3p = tile.shape
    iy = (i * tile_h - HALO
          + jax.lax.broadcasted_iota(jnp.int32, (rows, w3p), 0))
    iy = jnp.clip(iy, 0, h - 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (rows, w3p), 1)
    ix = jnp.minimum(ix, w3 - 1)

    bits = _hash2d(iy, ix, seed)
    thresh = (jnp.uint32(int(amount * 4294967296.0)) if amount < 1.0
              else jnp.uint32(0xFFFFFFFF))
    flipped = bits < thresh
    salted = (bits & jnp.uint32(1)) == jnp.uint32(1)
    noisy = jnp.where(flipped & salted, 255.0, tile)
    noisy = jnp.where(flipped & ~salted, 0.0, noisy)

    m1 = _median3_tile(noisy, w3)
    if double_filter:
        rows1 = m1.shape[0]
        vr = (i * tile_h - (HALO - 1)
              + jax.lax.broadcasted_iota(jnp.int32, (rows1, w3p), 0))
        up = pltpu.roll(m1, shift=rows1 - 1, axis=0)
        down = pltpu.roll(m1, shift=1, axis=0)
        m1 = jnp.where(vr == -1, up, m1)
        m1 = jnp.where(vr == h, down, m1)
        _store_row_block(out_ref,
                         _median3_tile(m1, w3)[HALO - 2:HALO - 2 + tile_h])
    else:
        _store_row_block(out_ref, m1[HALO - 1:HALO - 1 + tile_h])


def _fused_batched_kernel(seed_ref, img_hbm, out_ref, scratch, sems, *,
                          tile_h: int, n_tiles: int, batch: int, h: int,
                          w3: int, amount: float, double_filter: bool):
    """Batch-grid variant with double-buffered input DMA: grid =
    (batch, n_tiles); while tile k computes, tile k+1's window streams in."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    k = b * n_tiles + i
    total = batch * n_tiles
    win = tile_h + 2 * HALO
    slot = jax.lax.rem(k, 2)
    nxt_slot = jax.lax.rem(k + 1, 2)

    def dma_for(step, slot_idx):
        bb = step // n_tiles
        ii = jax.lax.rem(step, n_tiles)
        return pltpu.make_async_copy(
            img_hbm.at[bb, pl.ds(ii * tile_h, win), :],
            scratch.at[slot_idx], sems.at[slot_idx])

    @pl.when(k == 0)
    def _():
        dma_for(0, slot).start()

    @pl.when(k + 1 < total)
    def _():
        dma_for(k + 1, nxt_slot).start()

    dma_for(k, slot).wait()
    _sap_median_body(_load_f32(scratch[slot]), i, tile_h, h, w3, seed_ref[b],
                     amount, double_filter, out_ref)


@functools.partial(jax.jit, static_argnames=('amount', 'double_filter',
                                             'tile_h', 'interpret'))
def fused_sap_median_batched(images: jnp.ndarray, seeds: jnp.ndarray,
                             amount: float = 0.4,
                             double_filter: bool = True,
                             tile_h: int | None = None,
                             interpret: bool = False) -> jnp.ndarray:
    """One pallas_call for the whole batch with DMA/compute overlap.
    Same semantics as fused_sap_median (tested equal); faster dispatch.

    Accepts f32 u8-domain OR uint8 images; the output dtype matches the
    input.  uint8 I/O moves 4x fewer HBM bytes each way (the loader ships
    uint8 batches) — compute stays f32 in registers via the int32 hop, so
    results are bit-identical across the two dtypes.  The uint8 default
    tile is taller because the 1-byte scratch frees VMEM stack.
    """
    u8_io = images.dtype == jnp.uint8
    if tile_h is None:
        tile_h = 120 if u8_io else 56
    assert tile_h % 8 == 0
    io_dtype = jnp.uint8 if u8_io else jnp.float32
    bsz, h, w, _ = images.shape
    w3 = w * 3
    w3p = ((w3 + LANES - 1) // LANES) * LANES
    n_tiles = (h + tile_h - 1) // tile_h
    hp = n_tiles * tile_h
    flat = images.reshape(bsz, h, w3)
    flat = jnp.pad(flat, ((0, 0), (HALO, hp - h + HALO), (0, w3p - w3)),
                   mode='edge')
    kernel = functools.partial(
        _fused_batched_kernel, tile_h=tile_h, n_tiles=n_tiles, batch=bsz,
        h=h, w3=w3, amount=amount, double_filter=double_filter)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((1, tile_h, w3p),
                                   lambda b, i, s: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, tile_h + 2 * HALO, w3p), io_dtype),
                pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, w3p), io_dtype),
        interpret=interpret,
    )(seeds.astype(jnp.int32), flat)
    return out[:, :h, :w3].reshape(bsz, h, w, 3)


@functools.partial(jax.jit, static_argnames=('amount', 'double_filter',
                                             'tile_h', 'interpret'))
def fused_sap_median(images: jnp.ndarray, seeds: jnp.ndarray,
                     amount: float = 0.4, double_filter: bool = True,
                     tile_h: int = 120, interpret: bool = False
                     ) -> jnp.ndarray:
    """Fused s&p noise + median3 (x2) over a batch in one HBM pass.

    images: (B, H, W, 3) float32 u8-domain; seeds: (B,) int32 (one RNG
    stream per image).  double_filter=True matches the pipeline's TRAIN
    semantics for 'sap_median_varX' (generator median + standalone
    post-pass median, ref minibatch.py:1636-1663).  tile_h must be a
    multiple of 8 (f32 sublane tiling).
    """
    assert tile_h % 8 == 0
    b, h, w, _ = images.shape
    w3 = w * 3
    w3p = ((w3 + LANES - 1) // LANES) * LANES
    n_tiles = (h + tile_h - 1) // tile_h
    hp = n_tiles * tile_h

    flat = images.reshape(b, h, w3)
    # HALO edge-replicated rows top/bottom + pad to whole tiles
    flat = jnp.pad(flat, ((0, 0), (HALO, hp - h + HALO), (0, w3p - w3)),
                   mode='edge')

    kernel = functools.partial(_fused_kernel, tile_h=tile_h, h=h, w3=w3,
                               amount=amount, double_filter=double_filter)
    call = _build_call(kernel, n_tiles, tile_h, hp, w3p, interpret)

    def one(img2d, seed):
        return call(jnp.asarray([seed], jnp.int32), img2d)

    out = jax.vmap(one)(flat, seeds.astype(jnp.int32))
    return out[:, :h, :w3].reshape(b, h, w, 3)
