"""Elementary losses (pure jnp), semantics matched to the reference:

  * L2Loss (core/gdrn_modeling/losses/l2_loss.py:30): per-sample L2 norm of
    the elementwise difference, i.e. sqrt(sum_i d_i^2), then reduced.
  * smooth_l1 (fvcore.nn.smooth_l1_loss semantics used by pm_loss.py:71).
  * CrossEntropyHeatmapLoss (coor_cross_entropy.py:12-26): CE over the channel
    axis of a heatmap with integer targets.
  * angular_distance / rot_l2 (rot_loss.py:4-48).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gdrnet_tpu.ops import rotation as R


def _reduce(x: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


def l1_loss(pred, target, reduction: str = "mean"):
    return _reduce(jnp.abs(pred - target), reduction)


def mse_loss(pred, target, reduction: str = "mean"):
    return _reduce(jnp.square(pred - target), reduction)


def l2_loss(pred, target, reduction: str = "mean"):
    """Per-sample (batch-leading) L2 norm of the difference, then reduce.
    Matches reference L2Loss (l2_loss.py:30): sqrt over all non-batch dims."""
    d = (pred - target).reshape(pred.shape[0], -1)
    per = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(d), axis=-1), 1e-12))
    return _reduce(per, reduction)


def smooth_l1_loss(pred, target, beta: float = 1.0, reduction: str = "mean"):
    """fvcore smooth_l1: 0.5 d^2 / beta if |d| < beta else |d| - 0.5 beta."""
    d = jnp.abs(pred - target)
    if beta < 1e-5:
        loss = d
    else:
        loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return _reduce(loss, reduction)


def cross_entropy_heatmap_loss(logits: jnp.ndarray, target: jnp.ndarray,
                               reduction: str = "sum") -> jnp.ndarray:
    """CE over the LAST axis of [..., C] logits with int targets [...].

    Reference CrossEntropyHeatmapLoss (coor_cross_entropy.py:12-26) is
    nn.CrossEntropyLoss over the channel dim of NCHW; here channels-last.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return _reduce(nll, reduction)


def angular_distance_loss(pred, target, reduction: str = "mean"):
    """Rotation angular distance in [0,1]; quat [B,4] or mat [B,3,3]
    (reference rot_loss.angular_distance, rot_loss.py:4)."""
    if pred.shape[-1] == 4 and pred.ndim == 2:
        d = R.angular_distance_quat(pred, target)
    else:
        d = R.angular_distance_mat(pred, target)
    return _reduce(d, reduction)


def rot_l2_loss(pred_mat, gt_mat):
    """Mean squared frobenius error (rot_loss.rot_l2_loss:43-48)."""
    return mse_loss(pred_mat, gt_mat, reduction="mean")


LOSS_FUNCS = {
    "L1": l1_loss,
    "MSE": mse_loss,
    "L2": l2_loss,
    "SMOOTH_L1": smooth_l1_loss,
}


def get_loss_func(name: str):
    key = name.upper()
    if key not in LOSS_FUNCS:
        raise ValueError(f"loss type {name} not supported")
    return LOSS_FUNCS[key]
