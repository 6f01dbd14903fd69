"""Device-mesh data parallelism.

The reference is single-process single-device (train.py:196,279 — no
torch.distributed anywhere, SURVEY.md §2c). The TPU-native design scales by
construction: a 1-D ``data`` mesh over ICI, batches sharded on their leading
axis, params/opt-state replicated, and XLA inserting the psum grad
all-reduce during jit sharding propagation. The mesh axes are kept
extensible ('data' today; model axes can be added without touching the
train step).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = "data",
) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def create_hybrid_mesh(
    num_slices: int,
    devices: Optional[Sequence[jax.Device]] = None,
    slice_axis: str = "dcn",
    data_axis: str = "data",
) -> Mesh:
    """2-D (slice, data) mesh for multi-slice training: the outer axis
    crosses slices over DCN, the inner axis rides ICI within a slice.
    Gradient all-reduces decompose hierarchically (reduce within slice
    over ICI first, then across slices over DCN) when batches are sharded
    over BOTH axes — the standard multi-slice recipe. Single-slice setups
    should keep the 1-D `create_mesh`."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % num_slices == 0, (n, num_slices)
    grid = np.asarray(devices).reshape(num_slices, n // num_slices)
    return Mesh(grid, (slice_axis, data_axis))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis; all other axes replicated. For a
    hybrid mesh, shard over every mesh axis (slice outermost)."""
    if len(mesh.axis_names) > 1:
        return NamedSharding(mesh, P(tuple(mesh.axis_names)))
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place every leaf of a batch pytree with its leading axis sharded over
    the mesh. Batch size must divide the mesh size."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
