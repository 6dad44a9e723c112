"""Train state: params + BN stats + optimizer state + step, as one pytree.

The reference's checkpointables are model/optimizer/scheduler/gradscaler
(engine.py:191-204); here the schedule is a pure function of `step` and bf16
needs no grad scaler, so the state collapses to this struct. Orbax
checkpointing operates on it directly (engine/checkpoint.py).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class GDRNTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(model, optimizer: optax.GradientTransformation,
                       sample_batch: dict, rng: jax.Array) -> GDRNTrainState:
    """Initialize params/BN stats from a sample batch and build opt state."""
    rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    variables = model.init(
        rngs,
        sample_batch["roi_img"],
        roi_classes=sample_batch.get("roi_classes"),
        roi_coord_2d=sample_batch.get("roi_coord_2d"),
        roi_cams=sample_batch.get("roi_cams"),
        roi_centers=sample_batch.get("roi_centers"),
        roi_whs=sample_batch.get("roi_whs"),
        roi_extents=sample_batch.get("roi_extents"),
        resize_ratios=sample_batch.get("resize_ratios"),
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return GDRNTrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
    )
