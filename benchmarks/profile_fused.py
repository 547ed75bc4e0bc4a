"""Where does the fused sap+median time go? Kernel-only vs pad/slice vs
dispatch. Run on the real TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpudenoise.noise.pallas_kernels import (
    fused_sap_median_batched, LANES, HALO, _fused_batched_kernel)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

H, W, B = 600, 1000, 128


def timeit(fn, *args, reps=3, inner=4):
    @jax.jit
    def many(*a):
        def step(c, i):
            out = fn(*a)
            return c + jnp.sum(out[0, ::97, ::89].astype(jnp.float32)), None
        c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(inner))
        return c
    float(many(*args))
    float(many(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(many(*args))
    dt = (time.perf_counter() - t0) / reps
    return B * inner / dt


def kernel_only(tile_h):
    """pallas_call on a PRE-padded image: isolates the kernel itself."""
    w3 = W * 3
    w3p = ((w3 + LANES - 1) // LANES) * LANES
    n_tiles = (H + tile_h - 1) // tile_h
    hp = n_tiles * tile_h
    rng = np.random.RandomState(0)
    flat = jax.device_put(jnp.asarray(
        rng.randint(0, 256, (B, hp + 2 * HALO, w3p)).astype(np.float32)))
    seeds = jnp.arange(B, dtype=jnp.int32)
    kernel = functools.partial(
        _fused_batched_kernel, tile_h=tile_h, n_tiles=n_tiles, batch=B,
        h=H, w3=w3, amount=0.4, double_filter=True)
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, tile_h, w3p),
                                   lambda b, i, s: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, tile_h + 2 * HALO, w3p), jnp.float32),
                pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((B, hp, w3p), jnp.float32),
    )
    def f(flat, seeds):
        return call(seeds, flat)
    return timeit(f, flat, seeds)


def main():
    rng = np.random.RandomState(3)
    images = jax.device_put(jnp.asarray(
        rng.randint(0, 256, (B, H, W, 3)).astype(np.float32)))
    seeds = jnp.arange(B, dtype=jnp.int32)

    for th in (56, 88, 120):
        r = timeit(lambda im, s: fused_sap_median_batched(
            im, s, amount=0.4, double_filter=True, tile_h=th),
            images, seeds)
        print(f'full path tile_h={th}: {r:.0f} img/s', flush=True)

    r = timeit(lambda im, s: fused_sap_median_batched(
        im, s, amount=0.4, double_filter=False, tile_h=56),
        images, seeds)
    print(f'full path single median tile_h=56: {r:.0f} img/s', flush=True)

    for th in (56, 88, 120):
        r = kernel_only(th)
        print(f'kernel-only tile_h={th}: {r:.0f} img/s', flush=True)

    # pure HBM copy ceiling: read+write same bytes
    flat = jax.device_put(jnp.asarray(
        rng.randint(0, 256, (B, 608, 3072)).astype(np.float32)))
    r = timeit(lambda x: x + 1.0, flat)
    print(f'x+1 (read+write same bytes): {r:.0f} img/s', flush=True)


if __name__ == '__main__':
    main()
