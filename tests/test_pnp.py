"""PnP refinement tests: perfect synthetic XYZ/mask maps must let RANSAC-EPnP
recover the exact pose, and net-init refinement must improve a perturbed
net pose (reference process_net_and_pnp / process_pnp_ransac semantics,
gdrn_evaluator.py:187-435)."""

import numpy as np
import pytest

from gdrnet_tpu.eval.pnp import (
    correspondences_from_maps, pnp_ransac, pnp_refine_from_net)
from gdrnet_tpu.ops.rasterizer import render_xyz
from gdrnet_tpu.data.mapper import roi_coord_2d as make_roi_coord_2d
from gdrnet_tpu.data.mapper import crop_resize
import cv2

K = np.array([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1.0]], np.float32)
W, H = 320, 240


def _cube(half=0.04):
    v = np.array([[sx, sy, sz] for sx in (-half, half) for sy in (-half, half)
                  for sz in (-half, half)], np.float32)
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
        [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return v, f


@pytest.fixture
def scene(rng):
    v, f = _cube()
    A = rng.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    R = (Q * np.sign(np.linalg.det(Q))).astype(np.float32)
    t = np.array([0.02, -0.01, 0.55], np.float32)
    depth, xyz = render_xyz(v, f, K, R, t, height=H, width=W)
    depth, xyz = np.asarray(depth), np.asarray(xyz)
    mask = (depth > 0).astype(np.float32)
    ys, xs = np.nonzero(mask)
    center = np.array([(xs.min() + xs.max()) / 2, (ys.min() + ys.max()) / 2], np.float32)
    scale = max(xs.max() - xs.min(), ys.max() - ys.min()) * 1.5
    out_res = 64
    extent = np.array([0.08, 0.08, 0.08], np.float32)
    roi_xyz = crop_resize(xyz, center, scale, out_res, cv2.INTER_NEAREST)
    roi_mask = crop_resize(mask, center, scale, out_res, cv2.INTER_NEAREST)
    xyz_norm = roi_xyz / extent + 0.5
    coord2d = make_roi_coord_2d(W, H, center, scale, out_res)
    return R, t, xyz_norm, roi_mask, coord2d, extent


def test_pure_ransac_pnp_recovers_pose(scene):
    R, t, xyz_norm, mask, coord2d, extent = scene
    img_pts, mdl_pts = correspondences_from_maps(
        mask, xyz_norm, coord2d, W, H, extent)
    assert len(img_pts) > 50
    pose = pnp_ransac(mdl_pts, img_pts, K, method="epnp", ransac=True)
    assert pose is not None
    # rotation within ~3 deg, translation within 1 cm
    cos = np.clip((np.trace(pose[:, :3] @ R.T) - 1) / 2, -1, 1)
    assert np.degrees(np.arccos(cos)) < 3.0
    assert np.linalg.norm(pose[:, 3] - t) < 0.01


def test_net_init_refinement_improves(scene, rng):
    R, t, xyz_norm, mask, coord2d, extent = scene
    img_pts, mdl_pts = correspondences_from_maps(mask, xyz_norm, coord2d, W, H, extent)
    # perturb the "net" pose by ~8 degrees and 3 cm
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)
    ang = np.radians(8.0)
    Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                   [-axis[1], axis[0], 0]])
    Rp = (np.eye(3) + np.sin(ang) * Kx + (1 - np.cos(ang)) * Kx @ Kx) @ R
    tp = t + np.array([0.02, -0.01, 0.015], np.float32)
    R2, t2 = pnp_refine_from_net(Rp.astype(np.float32), tp, mdl_pts, img_pts, K,
                                 pnp_type="iter")
    err_before = np.degrees(np.arccos(np.clip((np.trace(Rp @ R.T) - 1) / 2, -1, 1)))
    err_after = np.degrees(np.arccos(np.clip((np.trace(R2 @ R.T) - 1) / 2, -1, 1)))
    assert err_after < err_before * 0.5
    assert np.linalg.norm(t2 - t) < np.linalg.norm(tp - t) * 0.5


def test_refinement_te_fallback(scene, rng):
    """If PnP lands >1 m from the net translation, keep the net t
    (gdrn_evaluator.py:293-296)."""
    R, t, *_ = scene
    # correspondences consistent with a pose 2.5 m behind the net pose:
    # refinement would jump there -> fallback must keep the net t
    t_far = t + np.array([0, 0, 2.5], np.float32)
    mdl_pts = (rng.rand(50, 3) - 0.5) * 0.08
    cam = mdl_pts @ R.T + t_far
    uv = cam @ K.T
    img_pts = uv[:, :2] / uv[:, 2:3]
    R2, t2 = pnp_refine_from_net(R, t, mdl_pts, img_pts, K, pnp_type="iter")
    np.testing.assert_allclose(t2, t, atol=1e-6)


def test_too_few_points_returns_net_pose(scene):
    R, t, *_ = scene
    R2, t2 = pnp_refine_from_net(R, t, np.zeros((2, 3)), np.zeros((2, 2)), K)
    np.testing.assert_allclose(R2, R)
    np.testing.assert_allclose(t2, t)
