"""Point-Matching (ADD-style) loss — batched jnp, symmetry via padded sets.

Reference PyPMLoss (core/gdrn_modeling/losses/pm_loss.py:20-173). The whole
loss is einsum + elementwise on [B, N, 3] point clouds, so it fuses into the
backward graph on TPU; the symmetric variant replaces the reference's ragged
python sym_infos list with identity-padded [B, K, 3, 3] + mask (see
gdrnet_tpu.ops.symmetry.get_closest_rot_batch).

The reference multiplies mean-reduced point losses by 3 ("3 is for mean
reduction on the point dim", pm_loss.py:172) — kept for parity.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from gdrnet_tpu.losses.basic import get_loss_func, smooth_l1_loss
from gdrnet_tpu.ops.pose import transform_pts
from gdrnet_tpu.ops.symmetry import get_closest_rot_batch
from gdrnet_tpu.ops import rotation as R


def point_matching_loss(
    pred_rots: jnp.ndarray,
    gt_rots: jnp.ndarray,
    points: jnp.ndarray,
    pred_transes: jnp.ndarray | None = None,
    gt_transes: jnp.ndarray | None = None,
    extents: jnp.ndarray | None = None,
    sym_rots: jnp.ndarray | None = None,
    sym_mask: jnp.ndarray | None = None,
    *,
    loss_type: str = "L1",
    beta: float = 1.0,
    loss_weight: float = 1.0,
    norm_by_extent: bool = False,
    symmetric: bool = False,
    disentangle_t: bool = False,
    disentangle_z: bool = False,
    t_loss_use_points: bool = False,
    r_only: bool = False,
) -> dict[str, jnp.ndarray]:
    """pred_rots [B,3,3]; gt_rots [B,3,3] or [B,4]; points [B,N,3];
    sym_rots [B,K,3,3] identity-padded + sym_mask [B,K] when symmetric."""
    if loss_type.upper() == "SMOOTH_L1":
        loss_func = partial(smooth_l1_loss, beta=beta, reduction="mean")
    else:
        loss_func = partial(get_loss_func(loss_type), reduction="mean")

    if gt_rots.shape[-1] == 4:
        gt_rots = R.quat_to_mat(gt_rots)

    if symmetric:
        assert sym_rots is not None
        gt_rots = get_closest_rot_batch(pred_rots, gt_rots, sym_rots, sym_mask)

    points_est = transform_pts(points, pred_rots)
    points_tgt = transform_pts(points, gt_rots)

    if norm_by_extent:
        assert extents is not None
        weights = (1.0 / jnp.max(extents, axis=1, keepdims=True))[:, :, None]  # [B,1,1]
    else:
        weights = 1.0

    if disentangle_z and not disentangle_t:
        disentangle_t = True
    if not disentangle_t and not disentangle_z:
        t_loss_use_points = True

    if r_only:
        loss = loss_func(weights * points_est, weights * points_tgt)
        return {"loss_PM_R": 3.0 * loss * loss_weight}

    assert pred_transes is not None and gt_transes is not None

    if disentangle_z:  # R / xy / z
        if t_loss_use_points:
            tgt_RT = points_tgt + gt_transes[:, None, :]
            est_R = points_est + gt_transes[:, None, :]
            t_xy = jnp.concatenate([pred_transes[:, :2], gt_transes[:, 2:]], axis=1)
            est_xy = points_tgt + t_xy[:, None, :]
            t_z = jnp.concatenate([gt_transes[:, :2], pred_transes[:, 2:]], axis=1)
            est_z = points_tgt + t_z[:, None, :]
            return {
                "loss_PM_R": 3.0 * loss_func(weights * est_R, weights * tgt_RT) * loss_weight,
                "loss_PM_xy": 3.0 * loss_func(weights * est_xy, weights * tgt_RT) * loss_weight,
                "loss_PM_z": 3.0 * loss_func(weights * est_z, weights * tgt_RT) * loss_weight,
            }
        return {
            "loss_PM_R": 3.0 * loss_func(weights * points_est, weights * points_tgt) * loss_weight,
            "loss_PM_xy_noP": loss_func(pred_transes[:, :2], gt_transes[:, :2]),
            "loss_PM_z_noP": loss_func(pred_transes[:, 2], gt_transes[:, 2]),
        }
    if disentangle_t:  # R / t
        if t_loss_use_points:
            tgt_RT = points_tgt + gt_transes[:, None, :]
            est_R = points_est + gt_transes[:, None, :]
            est_T = points_tgt + pred_transes[:, None, :]
            return {
                "loss_PM_R": 3.0 * loss_func(weights * est_R, weights * tgt_RT) * loss_weight,
                "loss_PM_T": 3.0 * loss_func(weights * est_T, weights * tgt_RT) * loss_weight,
            }
        return {
            "loss_PM_R": 3.0 * loss_func(weights * points_est, weights * points_tgt) * loss_weight,
            "loss_PM_T_noP": loss_func(pred_transes, gt_transes),
        }
    # fully entangled
    tgt_RT = points_tgt + gt_transes[:, None, :]
    est_RT = points_est + pred_transes[:, None, :]
    return {"loss_PM_RT": 3.0 * loss_func(weights * est_RT, weights * tgt_RT) * loss_weight}
