"""RANSAC/iterative PnP refinement from predicted dense correspondences.

The reference's three test-time post-processing modes (gdrn_evaluator.py):
  * direct net pose  — no PnP (process :128-185); handled by the tester
  * net init + iter/RANSAC-EPnP refinement (process_net_and_pnp :187-314)
  * pure RANSAC-EPnP (process_pnp_ransac :316-435, misc.pnp_v2 :145)

Correspondences come from the predicted XYZ map + mask
(get_img_model_points_with_coords2d :89-126): select crop pixels where the
mask prob > thr and |xyz| > 1e-4 * extent on all axes, denormalize xyz to
object-metric 3D model points and the crop's 2D coord map to image pixels.
cv2.solvePnP runs on host (same as the reference — it is a per-instance
CPU hot spot by design; TEST.USE_PNP defaults off).
"""

from __future__ import annotations

import cv2
import numpy as np


def correspondences_from_maps(mask_prob: np.ndarray, xyz_norm: np.ndarray,
                              coord2d: np.ndarray, im_w: int, im_h: int,
                              extent: np.ndarray, mask_thr: float = 0.5,
                              max_num_points: int = -1,
                              rng: np.random.RandomState | None = None):
    """mask_prob [H,W]; xyz_norm [H,W,3] in [0,1]; coord2d [H,W,2] in [0,1]
    (fractions of the full image, the test mapper's roi_coord_2d). Returns
    (image_points [N,2], model_points [N,3])."""
    xyz = (np.asarray(xyz_norm, np.float64) - 0.5) * np.asarray(extent, np.float64)
    img_pts = np.asarray(coord2d, np.float64) * np.asarray([im_w, im_h], np.float64)
    sel = (
        (np.asarray(mask_prob) > mask_thr)
        & (np.abs(xyz[..., 0]) > 1e-4 * extent[0])
        & (np.abs(xyz[..., 1]) > 1e-4 * extent[1])
        & (np.abs(xyz[..., 2]) > 1e-4 * extent[2])
    )
    model_points = xyz[sel].reshape(-1, 3)
    image_points = img_pts[sel].reshape(-1, 2)
    if max_num_points >= 4 and len(image_points) > max_num_points:
        rng = rng or np.random.RandomState(0)
        idx = rng.permutation(len(image_points))[:max_num_points]
        model_points, image_points = model_points[idx], image_points[idx]
    return image_points, model_points


def pnp_ransac(model_points: np.ndarray, image_points: np.ndarray,
               K: np.ndarray, method: str = "epnp", ransac: bool = True,
               reproj_err: float = 3.0, iterations: int = 100) -> np.ndarray | None:
    """Pure PnP (misc.pnp_v2, lib/pysixd/misc.py:145-196). Returns [3,4]
    pose or None on failure."""
    if len(model_points) < 4:
        return None
    flags = {"epnp": cv2.SOLVEPNP_EPNP, "iterative": cv2.SOLVEPNP_ITERATIVE,
             "p3p": cv2.SOLVEPNP_P3P,
             "dls": getattr(cv2, "SOLVEPNP_DLS", cv2.SOLVEPNP_EPNP)}[method]
    p3 = np.ascontiguousarray(model_points, np.float64)
    p2 = np.ascontiguousarray(image_points, np.float64)
    dist = np.zeros((8, 1), np.float64)
    K = np.asarray(K, np.float64)
    if flags == cv2.SOLVEPNP_EPNP:
        p3, p2 = p3[None], p2[None]
    try:
        if ransac:
            ok, rvec, tvec, _ = cv2.solvePnPRansac(
                p3, p2, K, dist, flags=flags,
                reprojectionError=reproj_err, iterationsCount=iterations)
        else:
            ok, rvec, tvec = cv2.solvePnP(p3, p2, K, dist, flags=flags)
    except cv2.error:
        return None
    if not ok:
        return None
    R, _ = cv2.Rodrigues(rvec)
    return np.concatenate([R, tvec.reshape(3, 1)], axis=-1)


def pnp_refine_from_net(rot_net: np.ndarray, trans_net: np.ndarray,
                        model_points: np.ndarray, image_points: np.ndarray,
                        K: np.ndarray, pnp_type: str = "iter",
                        reproj_err: float = 3.0, iterations: int = 20
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Net-initialized refinement (process_net_and_pnp, gdrn_evaluator.py
    :255-296): warm-start solvePnP (iterative) or solvePnPRansac (EPnP) from
    the net pose; keep the net translation if |Δt| > 1 m (:293-296)."""
    if len(model_points) < 4:
        return rot_net, trans_net
    p3 = np.ascontiguousarray(model_points, np.float64)
    p2 = np.ascontiguousarray(image_points, np.float64)
    dist = np.zeros((8, 1), np.float64)
    K = np.asarray(K, np.float64)
    rvec0, _ = cv2.Rodrigues(np.asarray(rot_net, np.float64))
    tvec0 = np.asarray(trans_net, np.float64).reshape(3, 1).copy()
    try:
        if pnp_type == "ransac":
            ok, rvec, tvec, _ = cv2.solvePnPRansac(
                p3[None], p2[None], K, dist, flags=cv2.SOLVEPNP_EPNP,
                useExtrinsicGuess=True, rvec=rvec0, tvec=tvec0,
                reprojectionError=reproj_err, iterationsCount=iterations)
        else:
            ok, rvec, tvec = cv2.solvePnP(
                p3, p2, K, dist, flags=cv2.SOLVEPNP_ITERATIVE,
                useExtrinsicGuess=True, rvec=rvec0, tvec=tvec0)
    except cv2.error:
        return rot_net, trans_net
    if not ok:
        return rot_net, trans_net
    R, _ = cv2.Rodrigues(rvec)
    t = tvec.reshape(3)
    if np.linalg.norm(t - trans_net) > 1.0:  # te > 1m fallback
        t = trans_net
    return R, t
