"""Multi-host helpers: distributed init, cross-process gather, barriers.

TPU-native equivalents of the reference's comm layer (core/utils/my_comm.py:
8-49 over torch.distributed/NCCL): `jax.distributed` + multihost_utils
(SURVEY.md §5 "Distributed communication backend"). In a single-process run
every function degrades to the identity, so the same engine code serves
1-chip dev boxes and multi-host pods.
"""

from __future__ import annotations

import jax
import numpy as np


def maybe_init_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """jax.distributed.initialize when env/args indicate a multi-process run
    (the reference's --num-machines/--dist-url TCP rendezvous,
    default_args_setup.py:52-64)."""
    import os

    if coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Global barrier (reference comm.synchronize / engine.py:292)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("gdrnet_tpu_barrier")


def all_gather_objects(obj) -> list:
    """Gather arbitrary picklable objects from all processes (reference
    comm.all_gather, my_comm.py — pickle-based object gather used for
    evaluator predictions, gdrn_evaluator.py:439-444)."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    # pad to the global max length
    n = np.asarray([len(payload)], np.int32)
    all_n = multihost_utils.process_allgather(n).reshape(-1)
    max_n = int(all_n.max())
    padded = np.zeros(max_n, np.uint8)
    padded[:len(payload)] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, :int(all_n[i])].tobytes())
            for i in range(jax.process_count())]


def reduce_dict_mean(metrics: dict) -> dict:
    """Cross-process mean of scalar metrics (reference comm.reduce_dict,
    my_comm.py:8). Under pjit with replicated outputs this is already done
    by GSPMD; this path covers host-side scalars."""
    if jax.process_count() == 1:
        return metrics
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    vals = np.asarray([float(metrics[k]) for k in keys], np.float32)
    all_vals = multihost_utils.process_allgather(vals)
    mean = np.mean(all_vals, axis=0)
    return {k: float(v) for k, v in zip(keys, mean)}
