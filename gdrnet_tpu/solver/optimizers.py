"""Optimizer zoo as optax transforms.

The reference ships ~15 custom torch optimizers (lib/torch_utils/solver/);
the ones its GDR-Net configs actually use are Ranger (RAdam + Lookahead +
gradient centralization, ranger.py) and plain Adam/SGD/RMSprop. Here each
piece is an independent optax GradientTransformation so they compose:

  ranger = chain(centralize, scale_by_radam, add_wd, scale_by_lr) + lookahead

All state lives in optax tuples -> checkpointable with orbax and shardable
under pjit (the states follow param sharding).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import chex
import jax
import jax.numpy as jnp
import optax


ScalarOrSchedule = Union[float, Callable]


# ---------------------------------------------------------------------------
# gradient centralization (https://arxiv.org/abs/2004.01461; ranger.py:163-165)
# ---------------------------------------------------------------------------


def centralize_gradients(conv_only: bool = False) -> optax.GradientTransformation:
    """Subtract the per-output-channel mean from multi-dim gradients.

    torch applies GC to grads with ndim > threshold (1 = conv+fc, 3 = conv
    only) averaging over dims 1.. (output-channel leading). flax kernels are
    [*spatial, in, out] (output-channel LAST), so the mean is over all dims
    but the last.
    """
    thresh = 3 if conv_only else 1

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def gc(g):
            if g.ndim > thresh:
                axes = tuple(range(g.ndim - 1))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree.map(gc, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# RAdam core (rectified Adam; ranger.py:147-189, radam.py)
# ---------------------------------------------------------------------------


def _radam_step_scalars(count, b1: float, b2: float, sma_threshold: float):
    """RAdam rectification scalars (rect, plain, use_rect) at step `count`.
    1 - b^t via expm1: the naive form cancels catastrophically in f32 at
    small t (~2e-5 relative at t=6 for b2=0.999) — the torch reference
    computes these scalars in f64 python floats."""
    import math as _math

    t = count.astype(jnp.float32)
    one_m_beta2_t = -jnp.expm1(t * _math.log(b2))
    one_m_beta1_t = -jnp.expm1(t * _math.log(b1))
    beta2_t = 1.0 - one_m_beta2_t
    sma_max = 2.0 / (1 - b2) - 1.0
    sma = sma_max - 2.0 * t * beta2_t / one_m_beta2_t
    rect = jnp.sqrt(
        jnp.maximum(one_m_beta2_t * (sma - 4) / (sma_max - 4) * (sma - 2)
                    / jnp.maximum(sma, 1e-8) * sma_max / (sma_max - 2), 0.0)
    ) / one_m_beta1_t
    plain = 1.0 / one_m_beta1_t
    return rect, plain, sma > sma_threshold


class ScaleByRAdamState(NamedTuple):
    count: chex.Array
    mu: Any
    nu: Any


def scale_by_radam(b1: float = 0.95, b2: float = 0.999, eps: float = 1e-5,
                   sma_threshold: float = 5.0) -> optax.GradientTransformation:
    """RAdam: rectified adaptive step when the variance estimate is
    tractable (SMA > threshold), else plain (bias-corrected) momentum SGD."""

    def init_fn(params):
        return ScaleByRAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)

        rect, plain, use_rect = _radam_step_scalars(
            count, b1, b2, sma_threshold)

        def _upd(m, v):
            adaptive = rect * m / (jnp.sqrt(v) + eps)
            momentum = plain * m
            return jnp.where(use_rect, adaptive, momentum)

        new_updates = jax.tree.map(_upd, mu, nu)
        return new_updates, ScaleByRAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Lookahead wrapper (ranger.py:193-203, lookahead.py)
# ---------------------------------------------------------------------------


class LookaheadState(NamedTuple):
    inner: Any
    slow: Any
    count: chex.Array


def with_lookahead(inner: optax.GradientTransformation, alpha: float = 0.5,
                   k: int = 6) -> optax.GradientTransformation:
    """Every k steps pull fast weights toward the slow buffer:
    slow += alpha (fast - slow); fast = slow. Implemented by adjusting the
    emitted update so it is compatible with plain `optax.apply_updates`."""

    def init_fn(params):
        return LookaheadState(
            inner=inner.init(params),
            slow=jax.tree.map(jnp.copy, params),
            count=jnp.zeros([], jnp.int32),
        )

    def update_fn(updates, state, params):
        assert params is not None, "lookahead requires params"
        inner_updates, inner_state = inner.update(updates, state.inner, params)
        count = state.count + 1
        sync = (count % k) == 0

        def _new_update(u, p, s):
            slow_new = s + alpha * (p + u - s)
            return jnp.where(sync, slow_new - p, u)

        def _new_slow(u, p, s):
            slow_new = s + alpha * (p + u - s)
            return jnp.where(sync, slow_new, s)

        new_updates = jax.tree.map(_new_update, inner_updates, params, state.slow)
        new_slow = jax.tree.map(_new_slow, inner_updates, params, state.slow)
        return new_updates, LookaheadState(inner=inner_state, slow=new_slow, count=count)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# assembled optimizers
# ---------------------------------------------------------------------------


def _lr_scale(learning_rate: ScalarOrSchedule) -> optax.GradientTransformation:
    if callable(learning_rate):
        return optax.scale_by_schedule(lambda c: -learning_rate(c))
    return optax.scale(-learning_rate)


def ranger(learning_rate: ScalarOrSchedule, alpha: float = 0.5, k: int = 6,
           b1: float = 0.95, b2: float = 0.999, eps: float = 1e-5,
           weight_decay: float = 0.0, use_gc: bool = True,
           gc_conv_only: bool = False,
           sma_threshold: float = 5.0) -> optax.GradientTransformation:
    """Ranger = GC -> RAdam -> decoupled WD -> lr, wrapped in Lookahead
    (reference lib/torch_utils/solver/ranger.py)."""
    chain = [centralize_gradients(gc_conv_only)] if use_gc else []
    chain.append(scale_by_radam(b1=b1, b2=b2, eps=eps, sma_threshold=sma_threshold))
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(_lr_scale(learning_rate))
    return with_lookahead(optax.chain(*chain), alpha=alpha, k=k)


class ScaleByRadam2020State(NamedTuple):
    count: chex.Array
    mu: Any
    nu: Any


def scale_by_radam2020(b1: float = 0.95, b2: float = 0.999, eps: float = 1e-5,
                       sma_threshold: float = 5.0, weight_decay: float = 0.0,
                       use_gc: bool = True, gc_conv_only: bool = False,
                       gc_loc: bool = True) -> optax.GradientTransformation:
    """Ranger2020's inner update (reference lib/torch_utils/solver/
    ranger2020.py:135-240). Differs from the original ranger.py in two ways:

    1. weight decay joins the update BEFORE the rectified step size
       (`G += wd*p; p -= step_size*lr*G`, :228-236) — so wd is scaled by the
       RAdam rectifier, where ranger.py applies `p -= wd*lr*p` unscaled
       (:178-179).
    2. `gc_loc` picks where gradient centralization runs: on the raw
       gradient (True, default) or on the adaptive update G (False,
       :181-182, :237-239).
    """
    thresh = 3 if gc_conv_only else 1

    def _gc_tree(t):
        def gc(g):
            if g.ndim > thresh:
                axes = tuple(range(g.ndim - 1))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g
        return jax.tree.map(gc, t)

    def init_fn(params):
        return ScaleByRadam2020State(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        if weight_decay > 0:
            assert params is not None, "ranger2020 weight decay needs params"
        if use_gc and gc_loc:
            updates = _gc_tree(updates)
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)

        rect, plain, use_rect = _radam_step_scalars(
            count, b1, b2, sma_threshold)
        step_size = jnp.where(use_rect, rect, plain)

        g_tree = jax.tree.map(
            lambda m, v: jnp.where(use_rect, m / (jnp.sqrt(v) + eps), m),
            mu, nu)
        if weight_decay > 0:
            g_tree = jax.tree.map(lambda g, p: g + weight_decay * p,
                                  g_tree, params)
        if use_gc and not gc_loc:
            g_tree = _gc_tree(g_tree)
        new_updates = jax.tree.map(lambda g: step_size * g, g_tree)
        return new_updates, ScaleByRadam2020State(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def ranger2020(learning_rate: ScalarOrSchedule, alpha: float = 0.5, k: int = 6,
               b1: float = 0.95, b2: float = 0.999, eps: float = 1e-5,
               weight_decay: float = 0.0, use_gc: bool = True,
               gc_conv_only: bool = False, gc_loc: bool = True,
               sma_threshold: float = 5.0) -> optax.GradientTransformation:
    """Ranger2020 (reference ranger2020.py): radam2020 core -> lr, wrapped
    in Lookahead. See scale_by_radam2020 for the deltas vs ranger()."""
    return with_lookahead(optax.chain(
        scale_by_radam2020(b1=b1, b2=b2, eps=eps, sma_threshold=sma_threshold,
                           weight_decay=weight_decay, use_gc=use_gc,
                           gc_conv_only=gc_conv_only, gc_loc=gc_loc),
        _lr_scale(learning_rate)), alpha=alpha, k=k)


def radam(learning_rate: ScalarOrSchedule, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, weight_decay: float = 0.0) -> optax.GradientTransformation:
    chain = [scale_by_radam(b1=b1, b2=b2, eps=eps, sma_threshold=4.0)]
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(_lr_scale(learning_rate))
    return optax.chain(*chain)


def adabelief(learning_rate: ScalarOrSchedule, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-16, weight_decay: float = 0.0) -> optax.GradientTransformation:
    chain = [optax.scale_by_belief(b1=b1, b2=b2, eps=eps)]
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(_lr_scale(learning_rate))
    return optax.chain(*chain)


def sgd_gc(learning_rate: ScalarOrSchedule, momentum: float = 0.9,
           weight_decay: float = 0.0, nesterov: bool = False,
           gc_conv_only: bool = False) -> optax.GradientTransformation:
    """SGD with gradient centralization (reference sgd_gc.py)."""
    chain = [centralize_gradients(gc_conv_only)]
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    if momentum > 0:
        chain.append(optax.trace(decay=momentum, nesterov=nesterov))
    chain.append(_lr_scale(learning_rate))
    return optax.chain(*chain)


# ---------------------------------------------------------------------------
# projection-based optimizers (AdamP/SGDP, reference adamp.py / sgdp.py)
# ---------------------------------------------------------------------------


def project_scale_invariant(delta: float = 0.1, wd_ratio: float = 0.1,
                            weight_decay: float = 0.0) -> optax.GradientTransformation:
    """AdamP/SGDP projection: for scale-invariant params (cosine similarity
    between param and update below delta/sqrt(dim)), remove the radial
    component of the update so the effective step does not inflate the norm
    (Heo et al. 2021; reference lib/torch_utils/solver/adamp.py)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params):
        assert params is not None

        def proj(u, p):
            if u.ndim < 1:
                return u
            pv = p.reshape(-1)
            uv = u.reshape(-1)
            pn = pv / (jnp.linalg.norm(pv) + 1e-12)
            cos = jnp.abs(jnp.dot(pn, uv)) / (jnp.linalg.norm(uv) + 1e-12)
            thresh = delta / jnp.sqrt(pv.shape[0])
            u_proj = uv - jnp.dot(uv, pn) * pn
            wd = jnp.where(cos < thresh, wd_ratio, 1.0)
            out = jnp.where(cos < thresh, u_proj, uv).reshape(u.shape)
            if weight_decay > 0:
                out = out + weight_decay * wd * p
            return out

        return jax.tree.map(proj, updates, params), state

    return optax.GradientTransformation(init_fn, update_fn)


def adamp(learning_rate: ScalarOrSchedule, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, weight_decay: float = 0.0, delta: float = 0.1,
          wd_ratio: float = 0.1) -> optax.GradientTransformation:
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        project_scale_invariant(delta, wd_ratio, weight_decay),
        _lr_scale(learning_rate))


def sgdp(learning_rate: ScalarOrSchedule, momentum: float = 0.9,
         weight_decay: float = 0.0, nesterov: bool = False,
         delta: float = 0.1, wd_ratio: float = 0.1) -> optax.GradientTransformation:
    return optax.chain(
        optax.trace(decay=momentum, nesterov=nesterov),
        project_scale_invariant(delta, wd_ratio, weight_decay),
        _lr_scale(learning_rate))


def layerwise_trust_ratio(eps: float = 1e-8) -> optax.GradientTransformation:
    """LARS-style per-tensor trust ratio |p| / |u| (reference ralamb.py)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params):
        assert params is not None

        def scale(u, p):
            if u.ndim < 1:
                return u
            pn = jnp.clip(jnp.linalg.norm(p), 0.0, 10.0)  # ralamb.py:93 clamp
            un = jnp.linalg.norm(u)
            trust = jnp.where((pn > 0) & (un > 0), pn / (un + eps), 1.0)
            return u * trust

        return jax.tree.map(scale, updates, params), state

    return optax.GradientTransformation(init_fn, update_fn)


def ralamb(learning_rate: ScalarOrSchedule, b1: float = 0.95, b2: float = 0.999,
           eps: float = 1e-5, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """RAdam + LAMB trust ratio (reference ralamb.py)."""
    chain = [scale_by_radam(b1=b1, b2=b2, eps=eps)]
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(layerwise_trust_ratio())
    chain.append(_lr_scale(learning_rate))
    return optax.chain(*chain)


def over9000(learning_rate: ScalarOrSchedule, alpha: float = 0.5, k: int = 6,
             weight_decay: float = 0.0) -> optax.GradientTransformation:
    """RangerLars = Ralamb inside Lookahead (reference over9000.py)."""
    return with_lookahead(ralamb(learning_rate, weight_decay=weight_decay),
                          alpha=alpha, k=k)


_BUILDERS: dict[str, Callable] = {}


def _register(*names):
    def deco(fn):
        for n in names:
            _BUILDERS[n.lower()] = fn
        return fn
    return deco


def _scale_by_lr(lr) -> optax.GradientTransformation:
    """-lr scaling for a float or schedule (the final step of an update)."""
    if callable(lr):
        return optax.scale_by_schedule(lambda count: -lr(count))
    return optax.scale(-lr)


@_register("ranger")
def _b_ranger(lr, oc):
    return ranger(lr, weight_decay=oc.get("weight_decay", 0.0),
                  b1=oc.get("betas", (0.95, 0.999))[0],
                  b2=oc.get("betas", (0.95, 0.999))[1],
                  use_gc=oc.get("use_gc", True),
                  gc_conv_only=oc.get("gc_conv_only", False))


@_register("radam")
def _b_radam(lr, oc):
    return radam(lr, weight_decay=oc.get("weight_decay", 0.0))


@_register("adabelief", "rangeradabelief")
def _b_adabelief(lr, oc):
    return adabelief(lr, weight_decay=oc.get("weight_decay", 0.0))


@_register("adam")
def _b_adam(lr, oc):
    # torch.optim.Adam couples weight decay as L2 added to the gradient
    # BEFORE the moment estimates (not adamw's decoupled decay)
    wd = oc.get("weight_decay", 0.0)
    if wd > 0:
        return optax.chain(optax.add_decayed_weights(wd),
                           optax.scale_by_adam(),
                           _scale_by_lr(lr))
    return optax.adam(lr)


@_register("adamw")
def _b_adamw(lr, oc):
    return optax.adamw(lr, weight_decay=oc.get("weight_decay", 1e-4))


@_register("sgd")
def _b_sgd_plain(lr, oc):
    # plain torch.optim.SGD: coupled L2 (grad += wd*p), NO gradient
    # centralization — that belongs to SGD_GC/SGD_GCC only
    wd = oc.get("weight_decay", 0.0)
    tx = optax.sgd(lr, momentum=oc.get("momentum", 0.9),
                   nesterov=oc.get("nesterov", False))
    if wd > 0:
        tx = optax.chain(optax.add_decayed_weights(wd), tx)
    return tx


@_register("sgd_gc", "sgd_gcc")
def _b_sgd(lr, oc):
    return sgd_gc(lr, momentum=oc.get("momentum", 0.9),
                  weight_decay=oc.get("weight_decay", 0.0),
                  nesterov=oc.get("nesterov", False),
                  gc_conv_only=oc.get("type", "SGD_GC").lower() == "sgd_gcc")


@_register("rmsprop", "rmsprop_tf")
def _b_rmsprop(lr, oc):
    # optax scale_by_rms defaults to eps-inside-sqrt, i.e. the TF semantics
    # the reference's rmsprop_tf.py reimplements for torch
    return optax.rmsprop(lr, decay=oc.get("alpha", 0.99),
                         momentum=oc.get("momentum", 0.0),
                         eps=oc.get("eps", 1e-8))


@_register("adamp")
def _b_adamp(lr, oc):
    return adamp(lr, weight_decay=oc.get("weight_decay", 0.0),
                 delta=oc.get("delta", 0.1), wd_ratio=oc.get("wd_ratio", 0.1))


@_register("sgdp")
def _b_sgdp(lr, oc):
    return sgdp(lr, momentum=oc.get("momentum", 0.9),
                weight_decay=oc.get("weight_decay", 0.0),
                nesterov=oc.get("nesterov", False))


@_register("ralamb")
def _b_ralamb(lr, oc):
    return ralamb(lr, weight_decay=oc.get("weight_decay", 0.0))


@_register("over9000", "rangerlars")
def _b_over9000(lr, oc):
    return over9000(lr, weight_decay=oc.get("weight_decay", 0.0))


@_register("ranger2020")
def _b_ranger2020(lr, oc):
    return ranger2020(lr, weight_decay=oc.get("weight_decay", 0.0),
                      use_gc=oc.get("use_gc", True),
                      gc_conv_only=oc.get("gc_conv_only", False),
                      gc_loc=oc.get("gc_loc", True))


def build_optimizer(cfg, lr_schedule: Optional[Callable] = None,
                    params=None) -> optax.GradientTransformation:
    """SOLVER.OPTIMIZER_CFG -> optax transform; optional per-submodule LR
    multipliers (reference GDRN.build_model_optimizer param groups,
    GDRN.py:550-711) via optax.multi_transform keyed on the top-level
    module name in the param tree.
    """
    oc = dict(cfg.SOLVER.OPTIMIZER_CFG)
    opt_type = oc.get("type", "Ranger").lower()
    base_lr = oc.get("lr", 1e-4)
    lr = lr_schedule if lr_schedule is not None else base_lr
    if opt_type not in _BUILDERS:
        raise ValueError(f"Unknown optimizer type: {oc.get('type')}")

    grad_clip = cfg.SOLVER.get("GRAD_CLIP", 0.0)
    accum = int(cfg.SOLVER.get("GRAD_ACCUM_STEPS", 1) or 1)

    def _with_clip(tx: optax.GradientTransformation) -> optax.GradientTransformation:
        if grad_clip and grad_clip > 0:
            tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
        if accum > 1:
            # TPU-first addition (no reference analogue): average grads over
            # k micro-batches before one optimizer step — IMS_PER_BATCH
            # beyond HBM at the same update semantics (optax.MultiSteps)
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        return tx

    net_cfg = cfg.MODEL.CDPN
    mults = {
        "backbone": 1.0,
        "rot_head": 1.0,
        "pnp_net": net_cfg.PNP_NET.get("LR_MULT", 1.0),
        "trans_head": net_cfg.TRANS_HEAD.get("LR_MULT", 1.0),
    }
    uniform = all(abs(m - 1.0) < 1e-12 for m in mults.values())
    if uniform:
        return _with_clip(_BUILDERS[opt_type](lr, oc))

    def scaled(mult):
        if callable(lr):
            return _BUILDERS[opt_type](lambda c: lr(c) * mult, oc)
        return _BUILDERS[opt_type](lr * mult, oc)

    transforms = {name: scaled(m) for name, m in mults.items()}
    transforms["_default"] = _BUILDERS[opt_type](lr, oc)

    def label_fn(tree):
        def label_path(path):
            top = path[0].key if hasattr(path[0], "key") else str(path[0])
            return top if top in mults else "_default"
        return jax.tree_util.tree_map_with_path(lambda p, _: label_path(p), tree)

    return _with_clip(optax.multi_transform(transforms, label_fn))
