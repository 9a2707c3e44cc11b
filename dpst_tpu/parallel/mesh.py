"""Device mesh helpers for data-parallel stylization.

The reference is single-process/single-GPU (SURVEY.md §2 "Parallelism
strategies"); the one real parallel axis in this workload is independent
image pairs (and autotune's Γ candidates). TPU-native plan: a 1-D
`jax.sharding.Mesh` over all chips, batch axis sharded with
`NamedSharding` — XLA inserts the (trivial) collectives, ICI carries any
result gathers. No NCCL/MPI analogue is needed or built.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"
ROW_AXIS = "rows"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first `n_devices` devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (BATCH_AXIS,))


def make_mesh_2d(n_batch: int, n_rows: int) -> Mesh:
    """2-D (pairs × image rows) mesh: data parallelism over pairs AND
    spatial row sharding within each pair (XLA halo exchanges through
    the convs/stencils — see parallel/spatial.py)."""
    devs = jax.devices()
    need = n_batch * n_rows
    if need > len(devs):
        raise ValueError(f"requested {need} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:need]).reshape(n_batch, n_rows),
                (BATCH_AXIS, ROW_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for per-pair data."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def has_row_axis(mesh: Mesh) -> bool:
    return ROW_AXIS in mesh.axis_names and dict(
        zip(mesh.axis_names, mesh.devices.shape))[ROW_AXIS] > 1


def image_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) stacks: pair axis + row axis when the mesh has one."""
    if has_row_axis(mesh):
        return NamedSharding(mesh, P(BATCH_AXIS, ROW_AXIS))
    return NamedSharding(mesh, P(BATCH_AXIS))


def mask_sharding(mesh: Mesh) -> NamedSharding:
    """(B, K, H, W) mask stacks: rows are axis 2."""
    if has_row_axis(mesh):
        return NamedSharding(mesh, P(BATCH_AXIS, None, ROW_AXIS))
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (VGG weights, config scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """device_put every leaf with its leading axis sharded over the mesh."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(tree, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
