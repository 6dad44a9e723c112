"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's torch.distributed/NCCL layer (core/utils/my_comm.py, SURVEY.md
§2.9: the reference is pure data-parallel DDP).

Design: a 1-D `data` mesh over all chips (ICI within a slice, DCN across
slices — jax orders devices so a 1-D mesh rides ICI first). The train step is
jit-compiled with the ROI batch sharded on `data` and params replicated;
XLA/GSPMD inserts the gradient all-reduces that DDP did by hand. Loss scalars
come out replicated — no explicit `reduce_dict` needed.

Optionally a second `model` axis (PARALLEL.MODEL_PARALLEL > 1) tensor-shards
the large kernels' output dim: `param_partition_spec` picks eligible leaves,
the train step constrains them with `with_sharding_constraint`, and GSPMD
propagates the sharding through grads and optimizer state (all-gathers for
activations ride ICI). The reference has no model parallelism at all; for a
CNN of this size DP alone is usually right — the axis exists for
HBM-constrained configs (huge PNP FCs / many-class class-aware heads).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data",
              model_parallel: int = 1, model_axis_name: str = "model") -> Mesh:
    """1-D data mesh over the first n (default: all) devices; with
    model_parallel > 1, a 2-D (data, model) mesh — the model axis is the
    fastest-varying (innermost ICI neighbors)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if model_parallel > 1:
        if len(devices) % model_parallel != 0:
            raise ValueError(f"{len(devices)} devices not divisible by "
                             f"model_parallel={model_parallel}")
        arr = np.asarray(devices).reshape(-1, model_parallel)
        return Mesh(arr, (axis_name, model_axis_name))
    return Mesh(np.asarray(devices), (axis_name,))


def param_partition_spec(path_leaf, mesh: Mesh,
                         model_axis_name: str = "model",
                         min_size: int = 1 << 16) -> P:
    """PartitionSpec for one param leaf: shard the LAST dim (flax kernels are
    [..., in, out]) over the model axis when present, divisible and the leaf
    is large enough; everything else replicates."""
    if model_axis_name not in mesh.shape:
        return P()
    mp = mesh.shape[model_axis_name]
    x = path_leaf
    if (x.ndim >= 2 and x.size >= min_size and x.shape[-1] % mp == 0):
        return P(*([None] * (x.ndim - 1) + [model_axis_name]))
    return P()


def constrain_params(params, mesh: Mesh, model_axis_name: str = "model"):
    """with_sharding_constraint over eligible kernels (no-op on 1-D meshes).
    Call inside jit; GSPMD propagates to grads/optimizer state."""
    if model_axis_name not in mesh.shape:
        return params
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, param_partition_spec(
                x, mesh, model_axis_name))),
        params)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (ROI batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place a host batch dict onto the mesh, leading dim sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def local_dp_setup(variables, bucket: int, n_want=-1):
    """Local data-parallel serving/eval setup (TEST.LOCAL_DEVICES).

    Picks the largest divisor of `bucket` no greater than the requested
    device count, builds a 1-D data mesh over this process's ADDRESSABLE
    devices (multi-host safe: each eval/serving shard runs on its own
    host's chips — a mesh over jax.devices() would include other hosts'
    non-addressable devices and device_put would fail on ranks > 0), and
    replicates `variables` onto it.

    Returns (mesh, variables); mesh is None when only one device is used
    (callers then run un-sharded, exactly as before).
    """
    n_want = int(n_want if n_want is not None else -1) or -1
    avail = jax.local_devices()
    n = len(avail) if n_want < 0 else max(1, min(n_want, len(avail)))
    n_loc = max(d for d in range(1, n + 1) if bucket % d == 0)
    if n_loc <= 1:
        return None, variables
    mesh = Mesh(np.asarray(avail[:n_loc]), ("data",))
    variables = jax.device_put(variables, replicated_sharding(mesh))
    return mesh, variables


def local_batch_size(global_batch: int, mesh: Mesh, axis_name: str = "data") -> int:
    n = mesh.shape[axis_name]
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by mesh axis {axis_name}={n} "
            f"(reference asserts the same, core/utils/dataset_utils.py:196-198)")
    return global_batch // n
