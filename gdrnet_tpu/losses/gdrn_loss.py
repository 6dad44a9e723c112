"""Full GDR-Net loss assembly — pure function over (model outputs, GT batch).

Mirrors GDRN.gdrn_loss (reference core/gdrn_modeling/models/GDRN.py:308-521)
with channels-last layouts. Loss gating/weights come from the MODEL.CDPN
config subtree; everything runs inside the jitted train step, and the MTL
uncertainty reweighting (GDRN.py:516-520) applies exp(-log_var)*L +
log(1+exp(log_var)) using the log_var params returned by the model.
"""

from __future__ import annotations

import jax.numpy as jnp

from gdrnet_tpu.losses.basic import (
    cross_entropy_heatmap_loss,
    angular_distance_loss,
    rot_l2_loss,
    l1_loss,
    l2_loss,
    mse_loss,
)
from gdrnet_tpu.losses.pm_loss import point_matching_loss

_SIMPLE = {"L1": l1_loss, "L2": l2_loss, "MSE": mse_loss}


def gdrn_loss(cfg, out: dict, batch: dict) -> dict[str, jnp.ndarray]:
    """cfg: full config; out: GDRN.__call__ output dict; batch keys (all
    channels-last, see engine.batching): gt_xyz [B,H,W,3], gt_xyz_bin
    [B,H,W,3] int, gt_mask_{trunc,visib,obj} [B,H,W], gt_region [B,H,W] int,
    gt_ego_rot [B,3,3], gt_trans [B,3], gt_trans_ratio [B,3], gt_points
    [B,N,3], sym_rots [B,K,3,3] + sym_mask [B,K], roi_extents [B,3]."""
    net_cfg = cfg.MODEL.CDPN
    rh = net_cfg.ROT_HEAD
    pnp = net_cfg.PNP_NET
    loss_dict: dict[str, jnp.ndarray] = {}

    gt_masks = {
        "trunc": batch["gt_mask_trunc"],
        "visib": batch["gt_mask_visib"],
        "obj": batch["gt_mask_obj"],
        "gt": batch["gt_mask_trunc"],  # reference MASK_LOSS_GT="gt" aliases trunc-style GT
    }

    out_mask = out["mask"]
    coor_x, coor_y, coor_z = out["coor_x"], out["coor_y"], out["coor_z"]
    out_region = out["region"]
    out_rot, out_trans = out["rot"], out["trans"]
    pred_t_ = out["pred_t_"]

    # xyz loss (GDRN.py:341-372) — masked, normalized by mask pixel count
    if not rh.FREEZE:
        gt_mask_xyz = gt_masks[rh.XYZ_LOSS_MASK_GT]  # [B,H,W]
        denom = jnp.maximum(jnp.sum(gt_mask_xyz), 1.0)
        m = gt_mask_xyz[..., None]
        if rh.XYZ_LOSS_TYPE == "L1":
            gt_xyz = batch["gt_xyz"]
            loss_dict["loss_coor_x"] = jnp.sum(jnp.abs(coor_x * m - gt_xyz[..., 0:1] * m)) / denom
            loss_dict["loss_coor_y"] = jnp.sum(jnp.abs(coor_y * m - gt_xyz[..., 1:2] * m)) / denom
            loss_dict["loss_coor_z"] = jnp.sum(jnp.abs(coor_z * m - gt_xyz[..., 2:3] * m)) / denom
        elif rh.XYZ_LOSS_TYPE == "CE_coor":
            gt_bin = batch["gt_xyz_bin"].astype(jnp.int32)
            mi = gt_mask_xyz.astype(jnp.int32)
            # reference multiplies logits AND targets by the mask (GDRN.py:359-366)
            loss_dict["loss_coor_x"] = cross_entropy_heatmap_loss(
                coor_x * m, gt_bin[..., 0] * mi, reduction="sum") / denom
            loss_dict["loss_coor_y"] = cross_entropy_heatmap_loss(
                coor_y * m, gt_bin[..., 1] * mi, reduction="sum") / denom
            loss_dict["loss_coor_z"] = cross_entropy_heatmap_loss(
                coor_z * m, gt_bin[..., 2] * mi, reduction="sum") / denom
        else:
            raise NotImplementedError(f"unknown xyz loss type: {rh.XYZ_LOSS_TYPE}")
        for k in ("loss_coor_x", "loss_coor_y", "loss_coor_z"):
            loss_dict[k] = loss_dict[k] * rh.XYZ_LW

    # mask loss (GDRN.py:374-386)
    if not rh.FREEZE:
        gt_mask = gt_masks[rh.MASK_LOSS_GT]
        if rh.MASK_LOSS_TYPE == "L1":
            loss_dict["loss_mask"] = l1_loss(out_mask[..., 0], gt_mask)
        elif rh.MASK_LOSS_TYPE == "BCE":
            z = out_mask[..., 0]
            bce = jnp.maximum(z, 0) - z * gt_mask + jnp.log1p(jnp.exp(-jnp.abs(z)))
            loss_dict["loss_mask"] = jnp.mean(bce)
        elif rh.MASK_LOSS_TYPE == "CE":
            loss_dict["loss_mask"] = cross_entropy_heatmap_loss(
                out_mask, gt_mask.astype(jnp.int32), reduction="mean")
        else:
            raise NotImplementedError(f"unknown mask loss type: {rh.MASK_LOSS_TYPE}")
        loss_dict["loss_mask"] = loss_dict["loss_mask"] * rh.MASK_LW

    # region CE (GDRN.py:388-400). NOTE the reference-faithful floor: bg
    # pixels keep their mask-zeroed (uniform) logits in the sum but only
    # visible pixels are in the denominator, so loss_region converges to
    # ~ln(R+1) * (total_px / visib_px), not 0 — e.g. ~16 for 64 regions at
    # ~25% visibility. Expected; not a training defect.
    if not rh.FREEZE:
        gt_mask_region = gt_masks[rh.REGION_LOSS_MASK_GT]
        if rh.REGION_LOSS_TYPE == "CE":
            denom_r = jnp.maximum(jnp.sum(gt_mask_region), 1.0)
            loss_dict["loss_region"] = cross_entropy_heatmap_loss(
                out_region * gt_mask_region[..., None],
                batch["gt_region"].astype(jnp.int32) * gt_mask_region.astype(jnp.int32),
                reduction="sum") / denom_r
        else:
            raise NotImplementedError(f"unknown region loss type: {rh.REGION_LOSS_TYPE}")
        loss_dict["loss_region"] = loss_dict["loss_region"] * rh.REGION_LW

    # point-matching (GDRN.py:402-426)
    if pnp.PM_LW > 0:
        pm = point_matching_loss(
            out_rot, batch["gt_ego_rot"], batch["gt_points"],
            pred_transes=out_trans, gt_transes=batch["gt_trans"],
            extents=batch.get("roi_extents"),
            sym_rots=batch.get("sym_rots"), sym_mask=batch.get("sym_mask"),
            loss_type=pnp.PM_LOSS_TYPE, beta=pnp.PM_SMOOTH_L1_BETA,
            loss_weight=pnp.PM_LW, norm_by_extent=pnp.PM_NORM_BY_EXTENT,
            symmetric=pnp.PM_LOSS_SYM, disentangle_t=pnp.PM_DISENTANGLE_T,
            disentangle_z=pnp.PM_DISENTANGLE_Z,
            t_loss_use_points=pnp.PM_T_USE_POINTS, r_only=pnp.PM_R_ONLY)
        loss_dict.update(pm)

    # rot loss (GDRN.py:432-440)
    if pnp.ROT_LW > 0:
        if pnp.ROT_LOSS_TYPE == "angular":
            loss_dict["loss_rot"] = angular_distance_loss(out_rot, batch["gt_ego_rot"])
        elif pnp.ROT_LOSS_TYPE == "L2":
            loss_dict["loss_rot"] = rot_l2_loss(out_rot, batch["gt_ego_rot"])
        else:
            raise ValueError(f"Unknown rot loss type: {pnp.ROT_LOSS_TYPE}")
        loss_dict["loss_rot"] = loss_dict["loss_rot"] * pnp.ROT_LW

    # centroid loss (GDRN.py:442-452)
    if pnp.CENTROID_LW > 0:
        assert pnp.TRANS_TYPE == "centroid_z"
        fn = _SIMPLE[pnp.CENTROID_LOSS_TYPE]
        loss_dict["loss_centroid"] = fn(pred_t_[:, :2], batch["gt_trans_ratio"][:, :2]) * pnp.CENTROID_LW

    # z loss (GDRN.py:454-471)
    if pnp.Z_LW > 0:
        gt_z = batch["gt_trans_ratio"][:, 2] if pnp.Z_TYPE == "REL" else batch["gt_trans"][:, 2]
        fn = _SIMPLE[pnp.Z_LOSS_TYPE]
        loss_dict["loss_z"] = fn(pred_t_[:, 2], gt_z) * pnp.Z_LW

    # trans loss (GDRN.py:473-500)
    if pnp.TRANS_LW > 0:
        fn = _SIMPLE[pnp.TRANS_LOSS_TYPE]
        if pnp.TRANS_LOSS_DISENTANGLE:
            loss_dict["loss_trans_xy"] = fn(out_trans[:, :2], batch["gt_trans"][:, :2]) * pnp.TRANS_LW
            loss_dict["loss_trans_z"] = fn(out_trans[:, 2], batch["gt_trans"][:, 2]) * pnp.TRANS_LW
        else:
            loss_dict["loss_trans_LPnP"] = fn(out_trans, batch["gt_trans"]) * pnp.TRANS_LW

    # bind loss R^T t (GDRN.py:502-514)
    if pnp.get("BIND_LW", 0.0) > 0.0:
        pred_bind = jnp.einsum("bji,bj->bi", out_rot, out_trans, precision="highest")
        gt_bind = jnp.einsum("bji,bj->bi", batch["gt_ego_rot"], batch["gt_trans"], precision="highest")
        fn = _SIMPLE[pnp.BIND_LOSS_TYPE]
        loss_dict["loss_bind"] = fn(pred_bind, gt_bind) * pnp.BIND_LW

    # MTL uncertainty reweighting (GDRN.py:516-520)
    if net_cfg.USE_MTL and "log_vars" in out:
        log_vars = out["log_vars"]
        for k in list(loss_dict.keys()):
            name = k.replace("loss_", "")
            if name in log_vars:
                lv = log_vars[name][0]
                loss_dict[k] = loss_dict[k] * jnp.exp(-lv) + jnp.log1p(jnp.exp(lv))

    return loss_dict
