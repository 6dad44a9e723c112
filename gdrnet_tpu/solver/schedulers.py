"""LR schedules as pure step->factor functions (optax-style schedules).

flat_and_anneal matches the reference's flat_and_anneal_lr_scheduler
(lib/torch_utils/solver/lr_scheduler.py:177-265): optional warmup, flat at
base LR until anneal_point*total_iters, then cosine/linear/poly/exp/step
anneal to target_lr_factor. Written branch-free in jnp so the schedule can
live inside the jitted train step (the step counter is a traced scalar).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def flat_and_anneal_schedule(
    base_lr: float,
    total_iters: int,
    warmup_iters: int = 0,
    warmup_factor: float = 0.1,
    warmup_method: str = "linear",
    anneal_point: float = 0.72,
    anneal_method: str = "cosine",
    target_lr_factor: float = 0.0,
    poly_power: float = 1.0,
    step_gamma: float = 0.1,
    steps=(2 / 3.0, 8 / 9.0),
):
    """Returns schedule(step) -> lr (jnp scalar)."""
    if warmup_method not in ("constant", "linear"):
        raise ValueError(f"bad warmup_method {warmup_method}")
    if anneal_method not in ("cosine", "linear", "poly", "exp", "step", "none"):
        raise ValueError(f"bad anneal_method {anneal_method}")

    if anneal_method == "step":
        if any(s < warmup_iters / max(total_iters, 1) or s > 1 for s in steps):
            raise ValueError(f"steps {steps} out of range")
        if list(steps) != sorted(steps):
            raise ValueError(f"steps {steps} not ascending")
        anneal_start = steps[0] * total_iters
        milestones = np.asarray([s * total_iters for s in steps])
    else:
        if not 0 <= anneal_point <= 1:
            raise ValueError(f"anneal_point {anneal_point} not in [0,1]")
        anneal_start = anneal_point * total_iters
        milestones = None

    def schedule(step):
        x = jnp.asarray(step, jnp.float32)

        # warmup factor
        if warmup_method == "linear" and warmup_iters > 0:
            alpha = x / warmup_iters
            wf = warmup_factor * (1 - alpha) + alpha
        else:
            wf = jnp.asarray(warmup_factor, jnp.float32)

        # anneal factor
        denom = max(total_iters - anneal_start, 1e-8)
        frac = (x - anneal_start) / denom
        if anneal_method == "cosine":
            af = target_lr_factor + 0.5 * (1 - target_lr_factor) * (1 + jnp.cos(jnp.pi * frac))
        elif anneal_method == "linear":
            af = target_lr_factor + (1 - target_lr_factor) * (1 - frac)
        elif anneal_method == "poly":
            af = target_lr_factor + (1 - target_lr_factor) * jnp.power(
                jnp.maximum(1 - frac, 0.0), poly_power)
        elif anneal_method == "exp":
            tf = max(target_lr_factor, 5e-3)
            af = jnp.power(tf, frac)
        elif anneal_method == "step":
            af = jnp.power(step_gamma, jnp.sum(x >= jnp.asarray(milestones, jnp.float32)))
        else:
            af = jnp.asarray(1.0, jnp.float32)

        factor = jnp.where(
            x < warmup_iters, wf, jnp.where(x >= anneal_start, af, 1.0))
        return base_lr * factor

    return schedule


def warmup_multistep_schedule(base_lr: float, milestones, gamma: float = 0.1,
                              warmup_iters: int = 1000,
                              warmup_factor: float = 1e-3,
                              warmup_method: str = "linear"):
    """detectron2 WarmupMultiStepLR semantics (reference solver default,
    core/utils/solver_utils.py:100)."""
    ms = np.asarray(sorted(milestones), np.float32)

    def schedule(step):
        x = jnp.asarray(step, jnp.float32)
        if warmup_method == "linear" and warmup_iters > 0:
            alpha = x / warmup_iters
            wf = warmup_factor * (1 - alpha) + alpha
        else:
            wf = jnp.asarray(warmup_factor, jnp.float32)
        factor = jnp.power(gamma, jnp.sum(x >= ms))
        return base_lr * jnp.where(x < warmup_iters, wf * factor, factor)

    return schedule


def warmup_cosine_schedule(base_lr: float, total_iters: int,
                           warmup_iters: int = 1000, warmup_factor: float = 1e-3):
    def schedule(step):
        x = jnp.asarray(step, jnp.float32)
        alpha = jnp.where(warmup_iters > 0, x / max(warmup_iters, 1), 1.0)
        wf = warmup_factor * (1 - alpha) + alpha
        cf = 0.5 * (1 + jnp.cos(jnp.pi * x / max(total_iters, 1)))
        return base_lr * jnp.where(x < warmup_iters, wf, cf)

    return schedule


def build_lr_schedule(cfg, base_lr: float, total_iters: int,
                      steps_per_update: int = 1):
    """SOLVER config -> schedule fn (reference build_lr_scheduler,
    core/utils/solver_utils.py:100-137).

    steps_per_update: gradient-accumulation factor. The returned schedule is
    in OPTIMIZER-UPDATE steps (optax.MultiSteps advances once per k train
    iterations), so both total_iters and the iteration-denominated
    WARMUP_ITERS are divided by k; relative knobs (REL_STEPS, ANNEAL_POINT)
    are unaffected."""
    k = max(int(steps_per_update), 1)
    total_iters = -(-total_iters // k)

    def _w():
        return max(1, cfg.SOLVER.WARMUP_ITERS // k) if cfg.SOLVER.WARMUP_ITERS else 0

    name = cfg.SOLVER.LR_SCHEDULER_NAME
    if name == "flat_and_anneal":
        rel_steps = tuple(cfg.SOLVER.REL_STEPS)
        return flat_and_anneal_schedule(
            base_lr, total_iters,
            warmup_iters=_w(),
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
            warmup_method=cfg.SOLVER.WARMUP_METHOD,
            anneal_point=cfg.SOLVER.ANNEAL_POINT,
            anneal_method=cfg.SOLVER.ANNEAL_METHOD,
            # the reference misspells this key (solver_utils.py:133
            # "TARTGET_LR_FACTOR") — accept both so its configs port 1:1
            target_lr_factor=cfg.SOLVER.get(
                "TARGET_LR_FACTOR", cfg.SOLVER.get("TARTGET_LR_FACTOR", 0.0)),
            poly_power=cfg.SOLVER.POLY_POWER,
            step_gamma=cfg.SOLVER.GAMMA,
            steps=rel_steps,
        )
    if name == "WarmupMultiStepLR":
        milestones = [s * total_iters for s in cfg.SOLVER.REL_STEPS]
        return warmup_multistep_schedule(
            base_lr, milestones, gamma=cfg.SOLVER.GAMMA,
            warmup_iters=_w(),
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
            warmup_method=cfg.SOLVER.WARMUP_METHOD)
    if name == "WarmupCosineLR":
        return warmup_cosine_schedule(
            base_lr, total_iters, warmup_iters=_w(),
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR)
    raise ValueError(f"Unknown LR scheduler: {name}")
