"""Device-mesh plumbing.

The reference is strictly single-process / single-GPU (SURVEY.md §2.3); the
TPU build scales via a `jax.sharding.Mesh`.  Default: a 1-D `data` axis for
batch data-parallelism; the helpers below are the single place mesh topology
is decided so larger meshes (e.g. ('data','model')) slot in without touching
call sites.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Multi-host bring-up (SURVEY.md §5: the TPU-native replacement for
    a communication backend the reference never had).  Call ONCE per
    host process, before any other jax call, on every host of a
    multi-host pod slice; afterwards `jax.devices()` spans the slice and
    `make_mesh`/`production_mesh` lay the global mesh over it (XLA
    collectives ride ICI within the slice).

    With no arguments this defers to `jax.distributed.initialize()`'s
    cluster auto-detection (TPU pod metadata); explicit
    coordinator/num_processes/process_id serve non-auto environments.
    Returns True when distributed mode was initialized.  Single-host
    runs (this repo's test/dev environment) never need it — the CLIs
    call this only behind `--distributed`."""
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_mesh(mesh_shape=None, axis_names=None, devices=None) -> Mesh:
    """Build a Mesh.  mesh_shape entries of -1 absorb remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = [-1]
    if axis_names is None:
        axis_names = ['data'] if len(mesh_shape) == 1 else [
            f'axis{i}' for i in range(len(mesh_shape))]
    shape = list(mesh_shape)
    known = int(np.prod([s for s in shape if s != -1])) or 1
    shape = [n // known if s == -1 else s for s in shape]
    assert int(np.prod(shape)) == n, (
        f'mesh shape {shape} does not cover {n} devices')
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def production_mesh(cfg, batch_size: int | None = None,
                    quiet: bool = False) -> Mesh | None:
    """The mesh the production entry points (Solver.train_model,
    test_net_batched) run on: cfg.TPU.MESH_SHAPE over all visible devices
    when there is more than one AND the batch divides evenly; otherwise
    None (single-device execution, the reference's regime).

    A user running cli/trainval.py on an 8-chip pod slice with --batch 8
    gets true data parallelism without further flags."""
    devices = jax.devices()
    if len(devices) <= 1:
        return None
    mesh = make_mesh(cfg.TPU.MESH_SHAPE, cfg.TPU.MESH_AXES, devices)
    n = mesh.devices.size
    if batch_size is not None and batch_size % n != 0:
        if not quiet:
            print(f'NOTE: batch size {batch_size} does not divide the '
                  f'{n}-device mesh — running single-device. Use a batch '
                  f'that is a multiple of {n} for data parallelism.')
        return None
    return mesh


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the 'data' axis."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device_put a pytree of batched arrays with batch-dim sharding."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
