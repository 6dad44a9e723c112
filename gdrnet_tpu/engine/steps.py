"""Jitted train / predict steps over a data mesh.

One compiled XLA program replaces the reference's per-iteration python
(engine.py:228-333): forward + loss + grad + optimizer + BN-stat update all
fuse; sharding the ROI batch on the mesh's `data` axis makes GSPMD insert
the gradient all-reduce the reference got from DDP (engine.py:279). Losses
come out as replicated scalars — the analogue of comm.reduce_dict
(engine.py:273) is free.

bf16 policy: model compute dtype comes from the module (PARALLEL.DTYPE);
params, optimizer state and loss math stay f32 (reference AMP analogue,
main_gdrn.py:141).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gdrnet_tpu.engine.train_state import GDRNTrainState
from gdrnet_tpu.losses import gdrn_loss

_MODEL_KWARG_KEYS = (
    "roi_classes", "roi_coord_2d", "roi_cams", "roi_centers", "roi_whs",
    "roi_extents", "resize_ratios",
)


def _model_kwargs(batch: dict) -> dict:
    return {k: batch[k] for k in _MODEL_KWARG_KEYS if k in batch}


def make_train_step(cfg, model, optimizer: optax.GradientTransformation,
                    mesh: Mesh | None = None,
                    dropblock_nr_steps: int = 5000) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics)."""

    def loss_fn(params, batch_stats, batch, rng, step):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out, mutated = model.apply(
            variables,
            batch["roi_img"],
            **_model_kwargs(batch),
            train=True,
            dropblock_progress=step.astype(jnp.float32) / dropblock_nr_steps,
            mutable=["batch_stats"] if batch_stats else [],
            rngs={"dropout": rng},
        )
        loss_dict = gdrn_loss(cfg, out, batch)
        total = sum(jax.tree.leaves(loss_dict))
        new_stats = mutated.get("batch_stats", batch_stats) if batch_stats else {}
        return total, (loss_dict, new_stats, out)

    skip_nonfinite = bool(cfg.SOLVER.get("SKIP_NONFINITE", True))

    def train_step(state: GDRNTrainState, batch: dict, rng: jax.Array):
        (total, (loss_dict, new_stats, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rng, state.step)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(loss_dict)
        if skip_nonfinite:
            # reference AMP GradScaler semantics (main_gdrn.py:141): a step
            # whose loss/grads are inf/nan is skipped wholesale — params,
            # optimizer state AND the forward's mutated BN stats (a
            # non-finite forward poisons those too). One poisoned batch
            # (e.g. a torn pool-refresh upload) then costs one step, not
            # the run; the trainer watches metrics["nonfinite_skip"].
            finite = jnp.isfinite(total)
            for g in jax.tree.leaves(grads):
                finite = finite & jnp.all(jnp.isfinite(g))
            keep = lambda new, old: jax.tree.map(
                lambda n, o: jnp.where(finite, n, o), new, old)
            new_params = keep(new_params, state.params)
            new_opt_state = keep(new_opt_state, state.opt_state)
            new_stats = keep(new_stats, state.batch_stats)
            metrics["nonfinite_skip"] = (~finite).astype(jnp.float32)
        new_state = GDRNTrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics["total_loss"] = total
        # train-time pose error vis (reference compute_mean_re_te, GDRN.py:246)
        from gdrnet_tpu.ops.rotation import rot_angle_deg

        metrics["vis/error_R"] = jnp.mean(
            rot_angle_deg(out["rot"], batch["gt_ego_rot"]))
        metrics["vis/error_t"] = jnp.mean(
            jnp.linalg.norm(out["trans"] - batch["gt_trans"], axis=-1)) * 100.0
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=0)

    data = NamedSharding(mesh, P(mesh.axis_names[0]))
    if "model" in mesh.shape:
        # 2-D (data, model) mesh: batch sharded on data, large kernels
        # constrained onto the model axis — GSPMD propagates through grads
        # and optimizer state (parallel/mesh.py). No explicit in/out
        # shardings: the second call (sharded state in) re-specializes.
        from gdrnet_tpu.parallel.mesh import constrain_params

        def train_step_mp(state, batch, rng):
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, data), batch)
            state = state.replace(
                params=constrain_params(state.params, mesh))
            new_state, metrics = train_step(state, batch, rng)
            return new_state.replace(
                params=constrain_params(new_state.params, mesh)), metrics

        return jax.jit(train_step_mp, donate_argnums=0)

    repl = NamedSharding(mesh, P())
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=0,
    )


def make_predict_step(model, mesh: Mesh | None = None,
                      with_maps: bool = False,
                      int8_scales: dict | None = None) -> Callable:
    """Returns predict(variables, batch) -> {"rot", "trans", ...} — the
    test-time forward (reference GDRN.forward with do_loss=False,
    GDRN.py:234-240); with_maps additionally returns mask/coor/region for
    the PnP refinement paths (TEST.USE_PNP). int8_scales (from
    models.quantize.calibrate_act_scales) runs the calibrated convs on the
    int8 MXU path (~1.5x on v5e; TEST.INT8)."""

    def predict(variables, batch):
        if int8_scales:
            from gdrnet_tpu.models.quantize import quantized_scope

            ctx = quantized_scope(int8_scales)
        else:
            import contextlib

            ctx = contextlib.nullcontext()
        with ctx:
            out = model.apply(variables, batch["roi_img"],
                              **_model_kwargs(batch), train=False)
        keep = {"rot": out["rot"], "trans": out["trans"]}
        if with_maps:
            for k in ("mask", "coor_x", "coor_y", "coor_z", "region"):
                keep[k] = out[k]
        return keep

    if mesh is None:
        return jax.jit(predict)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.jit(predict, in_shardings=(repl, data), out_shardings=data)
