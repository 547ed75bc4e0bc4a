"""Data-parallel execution helpers.

The reference has no multi-device support at all (SURVEY.md §2.3:
single tf.Session, CUDA_VISIBLE_DEVICES pinning).  Here DP is the default
scaling axis: params replicate, the batch dim shards over the 'data' mesh
axis, XLA inserts gradient/metric psums over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/state) over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def shard_batch(mesh: Mesh, tree, axis: str = 'data'):
    """Shard the leading dim of each leaf over `axis`."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def dp_inference(model, mesh: Mesh):
    """Batched data-parallel inference: fn(params, images, im_infos) with
    the batch sharded over 'data'.  Each image runs the full single-image
    forward (vmap inside the sharded program)."""

    @jax.jit
    def run(params, images, im_infos):
        return jax.vmap(lambda im, info:
                        model.forward_test(params, im, info))(images,
                                                              im_infos)

    def wrapped(params, images, im_infos):
        params = replicate(mesh, params)
        images, im_infos = shard_batch(mesh, (images, im_infos))
        return run(params, images, im_infos)

    return wrapped


def dp_noise_pipeline(pipe, mesh: Mesh):
    """Wrap a make_pipeline() fn for multi-chip batches."""

    def wrapped(key, images):
        images = shard_batch(mesh, images)
        return pipe(key, images)

    return wrapped
