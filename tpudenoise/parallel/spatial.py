"""Spatial (image-plane) sharding for stencil kernels — the TPU analogue
of sequence/context parallelism for this CNN workload (SURVEY.md §2.3:
"spatial sharding of the image plane for stencil kernels (halo exchange)"
when images exceed per-chip memory, e.g. the res101-lg 800x1333 regime).

Images are sharded along H over a mesh axis; each device filters its row
block using halo rows fetched from its neighbours with `lax.ppermute` over
ICI, with BORDER_REPLICATE semantics at the global image edges.  Everything
runs under `shard_map`, so XLA sees the communication explicitly and the
stencil math stays the bit-exact single-device implementations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _exchange_halo(block: jnp.ndarray, axis: str, halo: int,
                   border: str = 'edge'):
    """block: (B, Hloc, W, C).  Returns (above, below) halo rows of size
    `halo` from the neighbouring shards.  Global image edges follow
    `border`: 'edge' (cv2 BORDER_REPLICATE, median) or 'reflect101'
    (cv2 default for blur/box: virtual row -1 mirrors row 1)."""
    n = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    # my bottom rows go DOWN to (i+1); my top rows go UP to (i-1)
    down = [(i, i + 1) for i in range(n - 1)]
    up = [(i, i - 1) for i in range(1, n)]
    above = jax.lax.ppermute(block[:, -halo:], axis, down)  # from i-1
    below = jax.lax.ppermute(block[:, :halo], axis, up)     # from i+1
    if border == 'edge':
        edge_top = jnp.repeat(block[:, :1], halo, axis=1)
        edge_bot = jnp.repeat(block[:, -1:], halo, axis=1)
    else:  # reflect101: rows halo..1 above, rows -2..-halo-1 below
        edge_top = block[:, halo:0:-1] if halo > 1 else block[:, 1:2]
        edge_bot = (block[:, -2:-halo - 2:-1] if halo > 1
                    else block[:, -2:-1])
    above = jnp.where(idx == 0, edge_top, above)
    below = jnp.where(idx == n - 1, edge_bot, below)
    return above, below


def _stencil_with_halo(block, above, below, stencil_rows_fn):
    """Concatenate halo rows and run a row-stencil that consumes one halo
    row per side, returning the local rows only."""
    x = jnp.concatenate([above, block, below], axis=1)
    return stencil_rows_fn(x)


def _median3_rows(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 median over (B, R+2, W, C) with explicit row halos; W edges
    replicate (matches denoise.stencils.median3)."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode='edge')
    rows = x.shape[1] - 2
    a = xp[:, 0:rows]
    b = xp[:, 1:rows + 1]
    c = xp[:, 2:rows + 2]
    lo = jnp.minimum(a, b)
    hi = jnp.maximum(a, b)
    mid = jnp.minimum(hi, c)
    hi = jnp.maximum(hi, c)
    lo2 = jnp.minimum(lo, mid)
    mid = jnp.maximum(lo, mid)
    lo = lo2
    w = x.shape[2]

    def med3(p, q, r):
        return jnp.maximum(jnp.minimum(p, q),
                           jnp.minimum(jnp.maximum(p, q), r))

    maxlo = jnp.maximum(jnp.maximum(lo[:, :, 0:w], lo[:, :, 1:w + 1]),
                        lo[:, :, 2:w + 2])
    minhi = jnp.minimum(jnp.minimum(hi[:, :, 0:w], hi[:, :, 1:w + 1]),
                        hi[:, :, 2:w + 2])
    medmid = med3(mid[:, :, 0:w], mid[:, :, 1:w + 1], mid[:, :, 2:w + 2])
    return med3(maxlo, medmid, minhi)


def _sep3_rows(x: jnp.ndarray, k0: float, k1: float) -> jnp.ndarray:
    """Separable [k0,k1,k0] stencil over (B, R+2, W, C) with explicit row
    halos; REFLECT_101 at W edges (matches denoise.stencils)."""
    rows = x.shape[1] - 2
    v = k0 * x[:, 0:rows] + k1 * x[:, 1:rows + 1] + k0 * x[:, 2:rows + 2]
    vp = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (0, 0)), mode='reflect')
    w = v.shape[2]
    return k0 * vp[:, :, 0:w] + k1 * vp[:, :, 1:w + 1] \
        + k0 * vp[:, :, 2:w + 2]


def make_spatial_filter(mesh: Mesh, kind: str = 'median',
                        axis: str = 'data', batch_axis: str | None = None):
    """Build `fn(images)` filtering (B, H, W, 3) images H-sharded over
    `axis`.  kind: 'median' | 'mean' | 'gaussian'.  Output sharding matches
    the input.  H must divide by the axis size.

    batch_axis: optional SECOND mesh axis to shard B over — the 2-D
    spatial x data layout (SURVEY §2.3 "design the mesh axis anyway"):
    halo ppermutes ride `axis` independently within each `batch_axis`
    slice, so e.g. a (2, 4) ('data', 'spatial') mesh runs 2-way batch
    parallelism with each image's rows split over 4 devices."""
    if kind == 'median':
        local = _median3_rows
        rounder = None  # value-selecting: already integer-valued
    elif kind == 'mean':
        def local(x):
            return _sep3_rows(x, 1.0, 1.0) * (1.0 / 9.0)
        rounder = jnp.round
    elif kind == 'gaussian':
        def local(x):
            return _sep3_rows(x, 0.25, 0.5)
        rounder = lambda v: jnp.floor(v + 0.5)  # cv2 half-up (stencils.py)
    else:
        raise ValueError(
            f"unknown spatial filter kind {kind!r}: expected "
            f"'median', 'mean' or 'gaussian'")

    border = 'edge' if kind == 'median' else 'reflect101'

    def shard_fn(block):
        above, below = _exchange_halo(block, axis, 1, border)
        out = _stencil_with_halo(block, above, below, local)
        return rounder(out) if rounder is not None else out

    spec = P(batch_axis, axis, None, None)  # (B over batch_axis, H over axis)
    fn = shard_map(shard_fn, mesh=mesh, in_specs=(spec,), out_specs=spec)

    @jax.jit
    def run(images):
        sh = NamedSharding(mesh, spec)
        images = jax.lax.with_sharding_constraint(images, sh)
        return fn(images)

    return run
