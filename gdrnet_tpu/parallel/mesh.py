"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's torch.distributed/NCCL layer (core/utils/my_comm.py, SURVEY.md
§2.9: the reference is pure data-parallel DDP).

Design: a 1-D `data` mesh over all chips (ICI within a slice, DCN across
slices — jax orders devices so a 1-D mesh rides ICI first). The train step is
jit-compiled with the ROI batch sharded on `data` and params replicated;
XLA/GSPMD inserts the gradient all-reduces that DDP did by hand. Loss scalars
come out replicated — no explicit `reduce_dict` needed.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D data mesh over the first n (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (ROI batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place a host batch dict onto the mesh, leading dim sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def local_batch_size(global_batch: int, mesh: Mesh, axis_name: str = "data") -> int:
    n = mesh.shape[axis_name]
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by mesh axis {axis_name}={n} "
            f"(reference asserts the same, core/utils/dataset_utils.py:196-198)")
    return global_batch // n
