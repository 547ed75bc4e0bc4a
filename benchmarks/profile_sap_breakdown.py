"""Micro-profile the fused sap+median kernel: which stage costs what.

NOTE: this intentionally forks the production kernel's DMA scaffold so
each compute stage can be ablated in place — keep the DMA loop in sync
with pallas_kernels._fused_batched_kernel when that changes.

Measures images/sec for ablations of fused_sap_median_batched:
  copy      — DMA in + write out, no compute
  noise     — + s&p hash/select
  med1      — + one 3x3 median
  full      — + second median (the production config-2 path)
across tile heights.  Run on the real chip:  python benchmarks/profile_sap_breakdown.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudenoise.noise.pallas_kernels import (
    HALO, LANES, _hash2d, _median3_tile)

H, W = 600, 1000
BATCH = 128
INNER = 8


def _body(tile, i, tile_h, h, w3, seed, out_ref, mode):
    rows, w3p = tile.shape
    if mode == 'copy':
        out_ref[0] = tile[HALO:HALO + tile_h]
        return
    iy = (i * tile_h - HALO
          + jax.lax.broadcasted_iota(jnp.int32, (rows, w3p), 0))
    iy = jnp.clip(iy, 0, h - 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (rows, w3p), 1)
    ix = jnp.minimum(ix, w3 - 1)
    bits = _hash2d(iy, ix, seed)
    thresh = jnp.uint32(int(0.4 * 4294967296.0))
    flipped = bits < thresh
    salted = (bits & jnp.uint32(1)) == jnp.uint32(1)
    noisy = jnp.where(flipped & salted, 255.0, tile)
    noisy = jnp.where(flipped & ~salted, 0.0, noisy)
    if mode == 'noise':
        out_ref[0] = noisy[HALO:HALO + tile_h]
        return
    m1 = _median3_tile(noisy, w3)
    if mode == 'med1':
        out_ref[0] = m1[HALO - 1:HALO - 1 + tile_h]
        return
    rows1 = m1.shape[0]
    vr = (i * tile_h - (HALO - 1)
          + jax.lax.broadcasted_iota(jnp.int32, (rows1, w3p), 0))
    up = pltpu.roll(m1, shift=rows1 - 1, axis=0)
    down = pltpu.roll(m1, shift=1, axis=0)
    m1 = jnp.where(vr == -1, up, m1)
    m1 = jnp.where(vr == h, down, m1)
    out_ref[0] = _median3_tile(m1, w3)[HALO - 2:HALO - 2 + tile_h]


def _kernel(seed_ref, img_hbm, out_ref, scratch, sems, *,
            tile_h, n_tiles, batch, h, w3, mode):
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
            img_hbm.at[bb, pl.ds(ii * tile_h, win), :],
            scratch.at[slot_idx], sems.at[slot_idx])

    @pl.when(k == 0)
    def _():
        dma_for(0, slot).start()

    @pl.when(k + 1 < total)
    def _():
        dma_for(k + 1, nxt).start()

    dma_for(k, slot).wait()
    _body(scratch[slot], i, tile_h, h, w3, seed_ref[b], out_ref, mode)


@functools.partial(jax.jit, static_argnames=('tile_h', 'mode'))
def run(images, seeds, tile_h, mode):
    bsz, h, w, _ = images.shape
    w3 = w * 3
    w3p = ((w3 + LANES - 1) // LANES) * LANES
    n_tiles = (h + tile_h - 1) // tile_h
    hp = n_tiles * tile_h
    flat = images.reshape(bsz, h, w3)
    flat = jnp.pad(flat, ((0, 0), (HALO, hp - h + HALO), (0, w3p - w3)),
                   mode='edge')
    kernel = functools.partial(_kernel, tile_h=tile_h, n_tiles=n_tiles,
                               batch=bsz, h=h, w3=w3, mode=mode)
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
                pltpu.VMEM((2, tile_h + 2 * HALO, w3p), jnp.float32),
                pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, w3p), jnp.float32),
    )(seeds.astype(jnp.int32), flat)
    return out[:, :h, :w3].reshape(bsz, h, w, 3)


def bench(fn):
    @jax.jit
    def many(images, seeds):
        def step(c, i):
            out = fn(images, seeds + i)
            return c + jnp.sum(out[0, ::97, ::89].astype(jnp.float32)), None
        c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(INNER))
        return c
    float(many(images, seeds))
    float(many(images, seeds + 7))
    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        float(many(images, seeds + 1000 * r))
    dt = (time.perf_counter() - t0) / reps
    return BATCH * INNER / dt


def _u8_run(images, seeds, tile_h, mode):
    # uint8-I/O variant of the ablation: same stages, u8 DMA + casts
    from tpudenoise.noise.pallas_kernels import _load_f32
    bsz, h, w, _ = images.shape
    w3 = w * 3
    w3p = ((w3 + LANES - 1) // LANES) * LANES
    n_tiles = (h + tile_h - 1) // tile_h
    hp = n_tiles * tile_h
    flat = images.reshape(bsz, h, w3)
    flat = jnp.pad(flat, ((0, 0), (HALO, hp - h + HALO), (0, w3p - w3)),
                   mode='edge')

    def kern(seed_ref, img_hbm, out_ref, scratch, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        k = b * n_tiles + i
        total = bsz * n_tiles
        win = tile_h + 2 * HALO
        slot = jax.lax.rem(k, 2)
        nxt = jax.lax.rem(k + 1, 2)

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
            dma_for(k + 1, nxt).start()

        dma_for(k, slot).wait()

        class _Out:
            def __setitem__(self, idx, v):
                out_ref[0] = v.astype(jnp.int32).astype(jnp.uint8)
            dtype = jnp.uint8
        if mode == 'copy':
            out_ref[0] = scratch[slot][HALO:HALO + tile_h]
        else:
            _body(_load_f32(scratch[slot]), i, tile_h, h, w3,
                  seed_ref[b], _Out(), mode)

    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((1, tile_h, w3p),
                                   lambda b, i, s: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, tile_h + 2 * HALO, w3p), jnp.uint8),
                pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, w3p), jnp.uint8),
    )(seeds.astype(jnp.int32), flat)
    return out[:, :h, :w3].reshape(bsz, h, w, 3)


_u8_run_jit = functools.partial(jax.jit, static_argnames=('tile_h', 'mode'))(_u8_run)


if __name__ == '__main__':
    import sys as _sys
    jax.config.update('jax_threefry_partitionable', True)
    rng = np.random.RandomState(3)
    seeds = jnp.arange(BATCH, dtype=jnp.int32)
    if '--u8' in _sys.argv:
        images = jax.device_put(jnp.asarray(
            rng.randint(0, 256, (BATCH, H, W, 3)).astype(np.uint8)))
        for tile_h in (88, 104, 120, 136):
            for mode in ('copy', 'noise', 'med1', 'full'):
                try:
                    ips = bench(lambda im, s, t=tile_h, m=mode:
                                _u8_run_jit(im, s, t, m))
                    print(f'u8 tile_h={tile_h:4d} mode={mode:6s} '
                          f'{ips:8.1f} img/s')
                except Exception as e:
                    print(f'u8 tile_h={tile_h:4d} mode={mode:6s} FAIL '
                          f'{str(e)[:80]}')
    else:
        images = jax.device_put(jnp.asarray(
            rng.randint(0, 256, (BATCH, H, W, 3)).astype(np.float32)))
        for tile_h in (40, 56, 88, 120, 152):
            for mode in ('copy', 'noise', 'med1', 'full'):
                ips = bench(lambda im, s, t=tile_h, m=mode: run(im, s, t, m))
                print(f'tile_h={tile_h:4d} mode={mode:6s} {ips:8.1f} img/s')
