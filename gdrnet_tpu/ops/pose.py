"""Pose decoding and 3D point transforms (batched jnp).

TPU-native equivalents of the reference's pose recovery
(core/gdrn_modeling/models/pose_from_pred_centroid_z.py,
pose_from_pred_centroid_z_abs.py, pose_from_pred.py) and point transforms
(lib/pysixd/misc.py: transform_pts_batch :930, points_to_2D :265,
calc_xyz_bp_fast :288-316).

The train decode is fully differentiable. The reference uses a separate
float64 numpy path at test time "since it is more accurate"
(pose_from_pred_centroid_z.py:107); here the same jnp function can be run in
float64 on host (``jax.experimental.enable_x64``) or the f32 TPU path — parity
is validated in tests/test_pose.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from gdrnet_tpu.ops import rotation as R


def transform_pts(pts: jnp.ndarray, rot: jnp.ndarray, t: jnp.ndarray | None = None) -> jnp.ndarray:
    """Apply [..., 3, 3] rotation (+ optional [..., 3] translation) to
    [..., N, 3] points. Ref transform_pts_batch (lib/pysixd/misc.py:930)."""
    out = jnp.einsum("...ij,...nj->...ni", rot, pts, precision="highest")
    if t is not None:
        out = out + t[..., None, :]
    return out


def project_points(pts: jnp.ndarray, K: jnp.ndarray, rot: jnp.ndarray | None = None,
                   t: jnp.ndarray | None = None) -> jnp.ndarray:
    """Project [..., N, 3] camera/object-frame points through [..., 3, 3] K.

    Ref points_to_2D (lib/pysixd/misc.py:265). Returns [..., N, 2] pixels.
    """
    if rot is not None:
        pts = transform_pts(pts, rot, t)
    uvw = jnp.einsum("...ij,...nj->...ni", K, pts, precision="highest")
    return uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-8)


def backproject_depth_to_xyz(depth: jnp.ndarray, rot: jnp.ndarray, t: jnp.ndarray,
                             K: jnp.ndarray) -> jnp.ndarray:
    """Depth map [H, W] + GT pose -> object-frame XYZ map [H, W, 3].

    x_obj = R^T (K^{-1} * d * (u, v, 1) - t); zeros where depth == 0.
    Ref calc_xyz_bp_fast (lib/pysixd/misc.py:288-316).
    """
    H, W = depth.shape
    vs, us = jnp.mgrid[0:H, 0:W]
    uv1 = jnp.stack([us.astype(depth.dtype), vs.astype(depth.dtype), jnp.ones_like(depth)], axis=-1)
    cam_pts = depth[..., None] * jnp.einsum("ij,hwj->hwi", jnp.linalg.inv(K).astype(depth.dtype), uv1, precision="highest")
    obj_pts = jnp.einsum("ji,hwj->hwi", rot.astype(depth.dtype), cam_pts - t.astype(depth.dtype), precision="highest")
    return jnp.where(depth[..., None] > 0, obj_pts, 0.0)


# ---------------------------------------------------------------------------
# SITE decode (scale-invariant translation estimation)
# ---------------------------------------------------------------------------


def translation_from_centroid_z(pred_centroids: jnp.ndarray, pred_z: jnp.ndarray,
                                roi_cams: jnp.ndarray, roi_centers: jnp.ndarray,
                                resize_ratios: jnp.ndarray, roi_whs: jnp.ndarray,
                                z_type: str = "REL") -> jnp.ndarray:
    """Recover camera-frame translation from predicted (dx, dy, z_rel).

    pred_centroids [B, 2]: centroid offset relative to bbox, in units of bbox
    w/h. pred_z [B] or [B, 1]. roi_cams [B, 3, 3]. roi_centers [B, 2] absolute
    bbox centers. resize_ratios [B]. roi_whs [B, 2].

    Ref pose_from_predictions_train (pose_from_pred_centroid_z.py:144-227):
        cx = dx * bw + bx;  cy = dy * bh + by
        z  = z_rel * resize_ratio              (REL) | z_abs (ABS)
        t  = (z (cx - px) / fx,  z (cy - py) / fy,  z)
    """
    pred_z = pred_z.reshape(pred_z.shape[0])
    cx = pred_centroids[:, 0] * roi_whs[:, 0] + roi_centers[:, 0]
    cy = pred_centroids[:, 1] * roi_whs[:, 1] + roi_centers[:, 1]
    if z_type == "ABS":
        z = pred_z
    elif z_type == "REL":
        z = pred_z * resize_ratios
    else:
        raise ValueError(f"Unknown z_type: {z_type}")
    tx = z * (cx - roi_cams[:, 0, 2]) / roi_cams[:, 0, 0]
    ty = z * (cy - roi_cams[:, 1, 2]) / roi_cams[:, 1, 1]
    return jnp.stack([tx, ty, z], axis=1)


def pose_from_centroid_z(pred_rots: jnp.ndarray, pred_centroids: jnp.ndarray,
                         pred_z: jnp.ndarray, roi_cams: jnp.ndarray,
                         roi_centers: jnp.ndarray, resize_ratios: jnp.ndarray,
                         roi_whs: jnp.ndarray, eps: float = 1e-4,
                         is_allo: bool = True, z_type: str = "REL") -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full differentiable pose decode. pred_rots: [B, 3, 3] or [B, 4] quat.

    Returns (rot_ego [B, 3, 3], translation [B, 3]). Ref
    pose_from_pred_centroid_z.py:144-227 (train) / :52-141 (test — same math).
    """
    translation = translation_from_centroid_z(
        pred_centroids, pred_z, roi_cams, roi_centers, resize_ratios, roi_whs, z_type=z_type)

    if pred_rots.ndim == 2 and pred_rots.shape[-1] == 4:
        q = pred_rots / R.safe_norm(pred_rots, eps=eps)
        q = R.allo_to_ego_quat(translation, q, eps=eps) if is_allo else q
        rot_ego = R.quat_to_mat(q)
    elif pred_rots.ndim == 3 and pred_rots.shape[-1] == 3:
        rot_ego = R.allo_to_ego_mat(translation, pred_rots, eps=eps) if is_allo else pred_rots
    else:
        raise ValueError(f"Bad pred_rots shape {pred_rots.shape}")
    return rot_ego, translation


def pose_from_centroid_z_abs(pred_rots: jnp.ndarray, pred_centroids: jnp.ndarray,
                             pred_z: jnp.ndarray, roi_cams: jnp.ndarray,
                             eps: float = 1e-4, is_allo: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Variant with absolute centroid pixels + absolute z.

    Ref pose_from_pred_centroid_z_abs.py:1-140.
    """
    pred_z = pred_z.reshape(pred_z.shape[0])
    cx, cy = pred_centroids[:, 0], pred_centroids[:, 1]
    tx = pred_z * (cx - roi_cams[:, 0, 2]) / roi_cams[:, 0, 0]
    ty = pred_z * (cy - roi_cams[:, 1, 2]) / roi_cams[:, 1, 1]
    translation = jnp.stack([tx, ty, pred_z], axis=1)
    if pred_rots.ndim == 2 and pred_rots.shape[-1] == 4:
        q = pred_rots / R.safe_norm(pred_rots, eps=eps)
        q = R.allo_to_ego_quat(translation, q, eps=eps) if is_allo else q
        rot_ego = R.quat_to_mat(q)
    else:
        rot_ego = R.allo_to_ego_mat(translation, pred_rots, eps=eps) if is_allo else pred_rots
    return rot_ego, translation


def pose_from_pred(pred_rots: jnp.ndarray, pred_transes: jnp.ndarray,
                   eps: float = 1e-4, is_allo: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Direct-translation variant (ref pose_from_pred.py:14-88)."""
    if pred_rots.ndim == 2 and pred_rots.shape[-1] == 4:
        q = pred_rots / R.safe_norm(pred_rots, eps=eps)
        q = R.allo_to_ego_quat(pred_transes, q, eps=eps) if is_allo else q
        rot_ego = R.quat_to_mat(q)
    else:
        rot_ego = R.allo_to_ego_mat(pred_transes, pred_rots, eps=eps) if is_allo else pred_rots
    return rot_ego, pred_transes


def centroids_from_poses(trans: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Project [B, 3] translations through [B, 3, 3] K -> [B, 2] pixel
    centroids (ref lm_dataset_d2.py:153-154)."""
    uvw = jnp.einsum("bij,bj->bi", K, trans, precision="highest")
    return uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-8)
