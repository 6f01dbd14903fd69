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


def local_batch_size(global_batch_size: int) -> int:
    """Per-process share of a global batch (multi-host data loading: each
    host's generator pool produces only its own rows)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch size {global_batch_size} not divisible by "
            f"process count {n}"
        )
    return global_batch_size // n


def per_process_seed(seed: int) -> int:
    """Decorrelate per-host generator streams: each process offsets its rng
    seed so the global batch is drawn from process_count independent
    streams instead of process_count copies of one stream."""
    return seed + 7919 * jax.process_index()


def assemble_batch(local_batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Build global sharded arrays from THIS process's local batch rows
    (``jax.make_array_from_process_local_data``): the multi-host input path
    where no host ever materializes the full global batch. Single-process
    it is equivalent to ``shard_batch``."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place a batch pytree with its leading axis sharded over the mesh.

    Single-process: ``batch`` is the full global batch (device_put with a
    sharding). Multi-host: ``batch`` is this process's LOCAL shard
    (``local_batch_size`` rows) and the global array is assembled from the
    per-process pieces without gathering them anywhere."""
    if jax.process_count() > 1:
        return assemble_batch(batch, mesh, axis_name)
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
