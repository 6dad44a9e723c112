"""TEST.USE_PNP post-processing for one padded ROI bucket.

One call refines the whole bucket's net poses from the decoded geometry maps,
either on device (TEST.DEVICE_PNP: ops/device_pnp.pnp_from_maps_batch — the
bucket solves as a single XLA program) or on host (the reference's per-ROI
cv2.solvePnP / solvePnPRansac loop, core/gdrn_modeling/gdrn_evaluator.py
:187-435, via eval/pnp.py). Shared by the test driver (engine/tester.do_test)
and the serving CLI (tools/predict.py).
"""

from __future__ import annotations

import numpy as np

from gdrnet_tpu.engine.decode import get_out_coor, get_out_mask
from gdrnet_tpu.eval.pnp import (
    correspondences_from_maps,
    pnp_ransac,
    pnp_refine_from_net,
)


def refine_bucket_poses(cfg, models, batch: dict, dev_batch: dict, out: dict,
                        seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Decoded model outputs -> refined (rot [B,3,3], trans [B,3]) numpy.

    `batch` is the mapper's full bucket (incl. host-only keys valid / obj_ids
    / im_hws), `dev_batch` the device view fed to the model, `out` the model
    outputs with geometry maps (make_predict_step(..., with_maps=True)).
    Invalid (padding) rows keep their net pose. `seed` folds into the RANSAC
    key so every bucket draws distinct hypotheses.
    """
    pnp_type = cfg.TEST.PNP_TYPE  # ransac_pnp | net_iter_pnp | net_ransac_pnp
    mask_thr = float(cfg.MODEL.CDPN.ROT_HEAD.MASK_THR_TEST)
    xyz_dec = get_out_coor(
        out["coor_x"], out["coor_y"], out["coor_z"],
        cfg.MODEL.CDPN.ROT_HEAD.XYZ_BIN,
        decode_type=cfg.TEST.get("CE_DECODE_TYPE", "center"))
    mask_dec = get_out_mask(out["mask"], cfg.MODEL.CDPN.ROT_HEAD.MASK_LOSS_TYPE)

    if bool(cfg.TEST.get("DEVICE_PNP")):
        import jax

        from gdrnet_tpu.ops.device_pnp import pnp_from_maps_batch

        im_wh = np.asarray(batch["im_hws"], np.float32)[:, ::-1]
        R_ref, t_ref = pnp_from_maps_batch(
            jax.random.fold_in(jax.random.PRNGKey(0), seed),
            mask_dec, xyz_dec, dev_batch["roi_coord_2d"], im_wh,
            dev_batch["roi_extents"], dev_batch["roi_cams"],
            out["rot"], out["trans"], np.asarray(batch["valid"]),
            mode=pnp_type, mask_thr=mask_thr)
        return np.array(R_ref), np.array(t_ref)

    rot = np.array(out["rot"])  # writable: host PnP refines rows in place
    trans = np.array(out["trans"])
    xyz_dec = np.asarray(xyz_dec)
    mask_dec = np.asarray(mask_dec)
    for j in np.flatnonzero(np.asarray(batch["valid"])):
        name = models.meta.id2obj[int(batch["obj_ids"][j])]
        im_h, im_w = int(batch["im_hws"][j][0]), int(batch["im_hws"][j][1])
        img_pts, mdl_pts = correspondences_from_maps(
            mask_dec[j], xyz_dec[j], batch["roi_coord_2d"][j],
            im_w, im_h, models.extents[name], mask_thr=mask_thr)
        K = np.asarray(batch["roi_cams"][j])
        if pnp_type == "ransac_pnp":
            pose = pnp_ransac(mdl_pts, img_pts, K, method="epnp", ransac=True)
            if pose is not None:
                rot[j], trans[j] = pose[:, :3], pose[:, 3]
        else:  # net_iter_pnp | net_ransac_pnp
            ptype = "ransac" if "ransac" in pnp_type else "iter"
            rot[j], trans[j] = pnp_refine_from_net(
                rot[j], trans[j], mdl_pts, img_pts, K, pnp_type=ptype)
    return rot, trans
