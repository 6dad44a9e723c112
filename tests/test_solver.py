"""Solver tests: flat_and_anneal parity with the reference formula
(lr_scheduler.py:221-262 lambda, checked at sampled iterations) and
optimizer sanity (Ranger/RAdam/SGD_GC converge on a quadratic; lookahead
sync matches the slow/fast algebra; GC zeroes channel means)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gdrnet_tpu.config import base_config
from gdrnet_tpu.solver import (
    flat_and_anneal_schedule,
    build_lr_schedule,
    ranger,
    radam,
    sgd_gc,
    build_optimizer,
)
from gdrnet_tpu.solver.optimizers import centralize_gradients, with_lookahead


def _ref_flat_and_anneal(x, total, warmup_iters, warmup_factor, anneal_point,
                         anneal_method, target=0.0, poly_power=1.0,
                         step_gamma=0.1, steps=(2/3, 8/9)):
    """Direct transcription of the reference lambda for golden values."""
    anneal_start = (steps[0] if anneal_method == "step" else anneal_point) * total
    if x < warmup_iters:
        a = x / warmup_iters
        return warmup_factor * (1 - a) + a
    if x >= anneal_start:
        if anneal_method == "cosine":
            return target + 0.5 * (1 - target) * (1 + math.cos(math.pi * (x - anneal_start) / (total - anneal_start)))
        if anneal_method == "linear":
            return target + (1 - target) * (total - x) / (total - anneal_start)
        if anneal_method == "poly":
            return target + (1 - target) * ((total - x) / (total - anneal_start)) ** poly_power
        if anneal_method == "exp":
            return max(target, 5e-3) ** ((x - anneal_start) / (total - anneal_start))
        if anneal_method == "step":
            ms = [s * total for s in steps]
            return step_gamma ** sum(1 for m in ms if x >= m)
    return 1.0


@pytest.mark.parametrize("method", ["cosine", "linear", "poly", "exp", "step"])
def test_flat_and_anneal_matches_reference(method):
    total, warmup = 10000, 800
    sched = flat_and_anneal_schedule(
        1e-3, total, warmup_iters=warmup, warmup_factor=1e-3,
        anneal_point=0.72, anneal_method=method, poly_power=0.9)
    for x in [0, 1, 400, 799, 800, 3000, 7199, 7200, 8000, 9000, 9999]:
        got = float(sched(x)) / 1e-3
        want = _ref_flat_and_anneal(x, total, warmup, 1e-3, 0.72, method, poly_power=0.9)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7, err_msg=f"{method}@{x}")


def test_build_lr_schedule_from_cfg():
    cfg = base_config()
    sched = build_lr_schedule(cfg, 1e-4, 10000)
    assert float(sched(5000)) == pytest.approx(1e-4)
    assert float(sched(9999)) < 1e-6


def _converges(opt, steps=300):
    target = jnp.asarray([1.0, -2.0, 3.0])
    params = {"w": jnp.zeros(3)}
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(lambda p: jnp.sum((p["w"] - target) ** 2))(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(steps):
        params, state = step(params, state)
    return float(jnp.max(jnp.abs(params["w"] - target)))


def test_ranger_converges():
    assert _converges(ranger(0.05), steps=600) < 0.05


def test_radam_converges():
    assert _converges(radam(0.05), steps=600) < 0.05


def test_sgd_gc_converges():
    # GC is a no-op on 1-d params; plain momentum SGD must converge
    assert _converges(sgd_gc(0.05, momentum=0.9), steps=400) < 0.01


def test_gradient_centralization():
    gc = centralize_gradients(conv_only=False)
    g = {"conv": jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 2, 2),
         "bias": jnp.ones(4)}
    out, _ = gc.update(g, gc.init(g))
    # per-output-channel (last axis) mean removed for ndim>1
    np.testing.assert_allclose(np.asarray(out["conv"]).reshape(-1, 2).mean(0), 0, atol=1e-6)
    np.testing.assert_allclose(out["bias"], g["bias"])  # 1-d untouched


def test_lookahead_sync_algebra():
    k, alpha = 3, 0.5
    inner = optax.sgd(0.1)
    opt = with_lookahead(inner, alpha=alpha, k=k)
    params = {"w": jnp.ones(2)}
    state = opt.init(params)
    slow0 = np.asarray(state.slow["w"])
    grads = {"w": jnp.full(2, 0.5)}
    fasts = [np.asarray(params["w"])]
    for i in range(k):
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        fasts.append(np.asarray(params["w"]))
    # after k steps the params must equal slow + alpha*(fast_pre_sync - slow)
    fast_pre = fasts[k - 1] - 0.1 * 0.5  # fast after inner update at step k
    expect = slow0 + alpha * (fast_pre - slow0)
    np.testing.assert_allclose(np.asarray(params["w"]), expect, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state.slow["w"]), expect, rtol=1e-6)


def test_build_optimizer_with_lr_mult():
    cfg = base_config()
    cfg.SOLVER.OPTIMIZER_CFG = {"type": "Ranger", "lr": 1e-4, "weight_decay": 0.0}
    cfg.MODEL.CDPN.PNP_NET.LR_MULT = 0.1
    params = {"backbone": {"w": jnp.ones(3)}, "pnp_net": {"w": jnp.ones(3)}}
    opt = build_optimizer(cfg, params=params)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    # pnp update must be ~0.1x the backbone update
    ratio = float(jnp.abs(updates["pnp_net"]["w"][0] / updates["backbone"]["w"][0]))
    np.testing.assert_allclose(ratio, 0.1, rtol=1e-4)


@pytest.mark.parametrize("name", ["AdamP", "SGDP", "Ralamb", "over9000",
                                  "RMSprop_tf", "Ranger2020", "AdaBelief"])
def test_optimizer_zoo_converges(name):
    from gdrnet_tpu.solver.optimizers import _BUILDERS
    opt = _BUILDERS[name.lower()](0.05, {"weight_decay": 0.0, "momentum": 0.9})
    # LARS-style trust ratios (Ralamb/over9000) step ~lr*|p| near the optimum
    # and plateau rather than converge tightly on a tiny quadratic
    tol = 0.5 if name.lower() in ("ralamb", "over9000") else 0.1
    assert _converges(opt, steps=600) < tol, name


def test_ranger2020_matches_reference_trajectory():
    """ranger2020 vs a numpy transcription of the reference step
    (lib/torch_utils/solver/ranger2020.py:135-240): GC on raw grad
    (gc_loc=True), wd added to G BEFORE the rectified step size, lookahead
    sync every k. 20 steps cross the SMA threshold (first rectified step)
    and three lookahead syncs; trajectories must agree to f32 eps."""
    from gdrnet_tpu.solver.optimizers import ranger2020

    b1, b2, eps, wd, lr, alpha, k, thr = 0.95, 0.999, 1e-5, 0.1, 0.05, 0.5, 6, 5.0
    rng = np.random.RandomState(3)
    # 2-d param exercises GC (all-but-last axes, flax layout); 1-d skips it
    p0 = {"w": rng.randn(3, 4).astype(np.float32),
          "b": rng.randn(4).astype(np.float32)}
    grads = [{"w": rng.randn(3, 4).astype(np.float32),
              "b": rng.randn(4).astype(np.float32)} for _ in range(20)]

    # --- numpy twin
    p = {n: v.copy() for n, v in p0.items()}
    slow = {n: v.copy() for n, v in p0.items()}
    mu = {n: np.zeros_like(v) for n, v in p0.items()}
    nu = {n: np.zeros_like(v) for n, v in p0.items()}
    for t, g in enumerate(grads, start=1):
        beta2_t = b2 ** t
        sma_max = 2 / (1 - b2) - 1
        sma = sma_max - 2 * t * beta2_t / (1 - beta2_t)
        if sma > thr:
            step_size = np.sqrt((1 - beta2_t) * (sma - 4) / (sma_max - 4)
                                * (sma - 2) / sma * sma_max / (sma_max - 2)
                                ) / (1 - b1 ** t)
        else:
            step_size = 1.0 / (1 - b1 ** t)
        for n in p:
            gi = g[n]
            if gi.ndim > 1:  # GC on raw grad (gc_loc=True)
                gi = gi - gi.mean(axis=tuple(range(gi.ndim - 1)), keepdims=True)
            mu[n] = b1 * mu[n] + (1 - b1) * gi
            nu[n] = b2 * nu[n] + (1 - b2) * gi * gi
            G = mu[n] / (np.sqrt(nu[n]) + eps) if sma > thr else mu[n]
            G = G + wd * p[n]
            p[n] = p[n] - step_size * lr * G
            if t % k == 0:
                slow[n] = slow[n] + alpha * (p[n] - slow[n])
                p[n] = slow[n].copy()

    # --- ours
    opt = ranger2020(lr, alpha=alpha, k=k, b1=b1, b2=b2, eps=eps,
                     weight_decay=wd)
    params = {n: jnp.asarray(v) for n, v in p0.items()}
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update(
            {n: jnp.asarray(v) for n, v in g.items()}, state, params)
        params = optax.apply_updates(params, updates)

    for n in p:
        np.testing.assert_allclose(np.asarray(params[n]), p[n], atol=2e-6), n


def test_ranger2020_differs_from_ranger():
    """The alias would have passed convergence tests; the wd-inside-stepsize
    semantics must actually diverge from ranger() on identical inputs."""
    from gdrnet_tpu.solver.optimizers import ranger, ranger2020

    p0 = {"w": jnp.asarray(np.linspace(-1, 1, 8).astype(np.float32))}
    g = {"w": jnp.asarray(np.ones(8, np.float32))}
    outs = []
    for opt in (ranger(0.1, weight_decay=0.3), ranger2020(0.1, weight_decay=0.3)):
        params, state = p0, opt.init(p0)
        for _ in range(3):
            updates, state = opt.update(g, state, params)
            params = optax.apply_updates(params, updates)
        outs.append(np.asarray(params["w"]))
    assert np.abs(outs[0] - outs[1]).max() > 1e-4


def test_grad_clip_wired():
    cfg = base_config()
    cfg.SOLVER.OPTIMIZER_CFG = {"type": "Adam", "lr": 1.0}
    cfg.SOLVER.GRAD_CLIP = 1e-6  # clip everything to ~0
    opt = build_optimizer(cfg)
    params = {"w": jnp.zeros(3)}
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.full(3, 100.0)}, state, params)
    # adam normalizes, but the clipped grad going in is ~1e-6 -> first-step
    # update magnitude is still ~lr; instead verify the clip transform exists
    # by comparing against unclipped behavior on the raw update chain
    cfg2 = base_config()
    cfg2.SOLVER.OPTIMIZER_CFG = {"type": "SGD", "lr": 1.0, "momentum": 0.0}
    cfg2.SOLVER.GRAD_CLIP = 0.5
    opt2 = build_optimizer(cfg2)
    s2 = opt2.init(params)
    u2, _ = opt2.update({"w": jnp.full(3, 100.0)}, s2, params)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(u2["w"])), 0.5, rtol=1e-5)


def test_grad_accumulation_matches_full_batch():
    """SOLVER.GRAD_ACCUM_STEPS=k: k micro-batch steps == one full-batch step
    (optax.MultiSteps averages grads; exact for SGD on mean-reduced loss)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gdrnet_tpu.config import base_config
    from gdrnet_tpu.solver import build_optimizer

    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(8, 4), jnp.float32)
    y = jnp.asarray(rng.randn(8), jnp.float32)
    w0 = {"backbone": jnp.asarray(rng.randn(4), jnp.float32)}

    def loss(w, xb, yb):
        return jnp.mean((xb @ w["backbone"] - yb) ** 2)

    cfg = base_config()
    cfg.SOLVER.OPTIMIZER_CFG = dict(type="SGD", lr=0.1, momentum=0.0,
                                    weight_decay=0.0)
    # full batch, no accumulation
    tx = build_optimizer(cfg)
    st = tx.init(w0)
    g = jax.grad(loss)(w0, X, y)
    up, _ = tx.update(g, st, w0)
    w_full = jax.tree_util.tree_map(lambda a, b: a + b, w0, up)

    # two half batches with accumulation
    cfg.SOLVER.GRAD_ACCUM_STEPS = 2
    tx2 = build_optimizer(cfg)
    st2 = tx2.init(w0)
    w = w0
    for lo, hi in ((0, 4), (4, 8)):
        g = jax.grad(loss)(w, X[lo:hi], y[lo:hi])
        up, st2 = tx2.update(g, st2, w)
        w = jax.tree_util.tree_map(lambda a, b: a + b, w, up)
    np.testing.assert_allclose(np.asarray(w["backbone"]),
                               np.asarray(w_full["backbone"]), atol=1e-6)


def test_schedule_steps_per_update():
    """With gradient accumulation k, the schedule horizon and WARMUP_ITERS
    compress by k so warmup/anneal land at the configured train iterations
    (optax.MultiSteps advances the inner schedule once per k iters)."""
    from gdrnet_tpu.config import base_config
    from gdrnet_tpu.solver.schedulers import build_lr_schedule

    cfg = base_config()
    cfg.SOLVER.LR_SCHEDULER_NAME = "flat_and_anneal"
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.SOLVER.ANNEAL_POINT = 0.5
    cfg.SOLVER.ANNEAL_METHOD = "cosine"
    sk = build_lr_schedule(cfg, 1.0, 1000, steps_per_update=4)  # 250 updates
    # warmup done by update 25 (= train iter 100)
    assert float(sk(25)) == pytest.approx(1.0)
    assert float(sk(10)) < 1.0
    # anneal completes by the last update (the unscaled schedule would still
    # be flat at step 249 of 1000)
    assert float(sk(249)) < 0.01
    s1 = build_lr_schedule(cfg, 1.0, 1000)
    assert float(s1(249)) == pytest.approx(1.0)
