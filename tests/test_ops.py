"""Tests for pose decode, warps, region assignment, symmetry, FPS."""

import numpy as np
import pytest

import jax.numpy as jnp
from gdrnet_tpu.ops import pose as P
from gdrnet_tpu.ops import warp as W
from gdrnet_tpu.ops import fps as F
from gdrnet_tpu.ops import symmetry as S
from gdrnet_tpu.ops import rotation as R

cv2 = pytest.importorskip("cv2")


# ---------------------------------------------------------------- pose decode

def test_translation_from_centroid_z_backprojection(rng):
    B = 16
    K = np.tile(np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1.0]], np.float32), (B, 1, 1))
    t_gt = np.stack([rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B), rng.uniform(0.6, 1.5, B)], 1).astype(np.float32)
    # project centroid
    uvw = np.einsum("bij,bj->bi", K, t_gt)
    c2d = uvw[:, :2] / uvw[:, 2:3]
    centers = c2d + rng.uniform(-20, 20, (B, 2)).astype(np.float32)  # bbox centers near centroid
    whs = rng.uniform(60, 140, (B, 2)).astype(np.float32)
    ratios = rng.uniform(0.2, 0.9, B).astype(np.float32)
    pred_centroids = (c2d - centers) / whs
    pred_z = t_gt[:, 2] / ratios
    out = np.asarray(P.translation_from_centroid_z(
        jnp.asarray(pred_centroids), jnp.asarray(pred_z), jnp.asarray(K),
        jnp.asarray(centers), jnp.asarray(ratios), jnp.asarray(whs)))
    np.testing.assert_allclose(out, t_gt, atol=1e-4)


def test_pose_from_centroid_z_mat_and_quat_agree(rng):
    B = 8
    K = np.tile(np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1.0]], np.float32), (B, 1, 1))
    q = rng.randn(B, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    mats = np.asarray(R.quat_to_mat(jnp.asarray(q)))
    args = dict(
        pred_centroids=jnp.asarray(rng.uniform(-0.1, 0.1, (B, 2)).astype(np.float32)),
        pred_z=jnp.asarray(rng.uniform(0.8, 1.8, B).astype(np.float32)),
        roi_cams=jnp.asarray(K),
        roi_centers=jnp.asarray(rng.uniform(200, 400, (B, 2)).astype(np.float32)),
        resize_ratios=jnp.asarray(rng.uniform(0.3, 0.8, B).astype(np.float32)),
        roi_whs=jnp.asarray(rng.uniform(60, 120, (B, 2)).astype(np.float32)),
    )
    r1, t1 = P.pose_from_centroid_z(jnp.asarray(mats), **args)
    r2, t2 = P.pose_from_centroid_z(jnp.asarray(q), **args)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)


def test_backproject_depth_roundtrip(rng):
    """Render a synthetic depth from points, backproject, compare object coords."""
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
    rot = np.asarray(R.quat_to_mat(jnp.asarray([[0.9, 0.1, -0.2, 0.3]], jnp.float32)))[0]
    t = np.array([0.02, -0.01, 0.5], np.float32)
    H = W_ = 64
    depth = np.zeros((H, W_), np.float32)
    depth[20:40, 25:45] = 0.5
    xyz = np.asarray(P.backproject_depth_to_xyz(jnp.asarray(depth), jnp.asarray(rot), jnp.asarray(t), jnp.asarray(K)))
    # forward-project an xyz sample back through the pose: should land on its pixel
    v, u = 30, 35
    p_obj = xyz[v, u]
    p_cam = rot @ p_obj + t
    uv = K @ p_cam
    uv = uv[:2] / uv[2]
    np.testing.assert_allclose(uv, [u, v], atol=1e-3)
    assert xyz[0, 0].sum() == 0  # bg stays zero


# ---------------------------------------------------------------- warp/affine

def test_affine_params_matches_cv2_getAffineTransform(rng):
    # replicate the reference 3-point construction and compare
    import sys
    for _ in range(10):
        center = rng.uniform(100, 400, 2).astype(np.float32)
        scale = float(rng.uniform(50, 200))
        rot = float(rng.uniform(-90, 90))
        out = 64
        ours = W.affine_params(center, scale, rot, out)
        # reference construction (data_utils.get_affine_transform:96-138)
        rot_rad = np.pi * rot / 180
        sn, cs = np.sin(rot_rad), np.cos(rot_rad)
        src_dir = np.array([0 * cs - (-0.5 * scale) * sn, 0 * sn + (-0.5 * scale) * cs])
        dst_dir = np.array([0, out * -0.5])
        def third(a, b):
            d = a - b
            return b + np.array([-d[1], d[0]])
        src = np.zeros((3, 2), np.float32)
        dst = np.zeros((3, 2), np.float32)
        src[0] = center
        src[1] = center + src_dir
        dst[0] = [out * 0.5, out * 0.5]
        dst[1] = dst[0] + dst_dir
        src[2] = third(src[0], src[1])
        dst[2] = third(dst[0], dst[1])
        ref = cv2.getAffineTransform(np.float32(src), np.float32(dst))
        np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_warp_matches_cv2_warpAffine(rng):
    img = rng.uniform(0, 255, (120, 160, 3)).astype(np.float32)
    center = np.array([80.0, 60.0], np.float32)
    scale = 90.0
    out = 64
    M = W.affine_params(center, scale, 0, out)
    ref = cv2.warpAffine(img, M, (out, out), flags=cv2.INTER_LINEAR)
    M_inv = W.affine_params(center, scale, 0, out, inv=True)
    ours = np.asarray(W.warp_affine_batch(jnp.asarray(img[None]), jnp.asarray(M_inv[None]), (out, out)))[0]
    np.testing.assert_allclose(ours, ref, atol=0.5, rtol=1e-3)


def test_warp_nearest_matches_cv2(rng):
    img = (rng.uniform(0, 5, (100, 100, 1))).astype(np.float32)
    center = np.array([50.0, 50.0], np.float32)
    scale, out = 70.0, 64
    M = W.affine_params(center, scale, 0, out)
    ref = cv2.warpAffine(img, M, (out, out), flags=cv2.INTER_NEAREST)
    M_inv = W.affine_params(center, scale, 0, out, inv=True)
    ours = np.asarray(W.warp_affine_batch(jnp.asarray(img[None]), jnp.asarray(M_inv[None]), (out, out), interp="nearest"))[0, ..., 0]
    assert (np.abs(ours - ref) > 0).mean() < 0.02  # tie-breaking at .5 may differ on a sparse set


def test_affine_params_batch_matches_host(rng):
    centers = rng.uniform(50, 300, (6, 2)).astype(np.float32)
    scales = rng.uniform(40, 150, 6).astype(np.float32)
    out = 256
    batched = np.asarray(W.affine_params_batch(jnp.asarray(centers), jnp.asarray(scales), out))
    batched_inv = np.asarray(W.affine_params_batch(jnp.asarray(centers), jnp.asarray(scales), out, inv=True))
    for i in range(6):
        np.testing.assert_allclose(batched[i], W.affine_params(centers[i], scales[i], 0, out), atol=1e-3)
        np.testing.assert_allclose(batched_inv[i], W.affine_params(centers[i], scales[i], 0, out, inv=True), atol=1e-3)


def test_get_2d_coord(rng):
    xy = np.asarray(W.get_2d_coord(64, 64))
    assert xy.shape == (64, 64, 2)
    assert xy[0, 0, 0] == 0 and xy[0, -1, 0] == 1
    assert xy[0, 0, 1] == 0 and xy[-1, 0, 1] == 1


def test_xyz_to_region_matches_reference(rng):
    from scipy.spatial.distance import cdist
    xyz = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    xyz[:8] = 0  # bg
    fps_points = rng.uniform(-1, 1, (9, 3)).astype(np.float32)
    # reference impl (data_utils.py:213-220)
    mask = ((xyz[:, :, 0] != 0) | (xyz[:, :, 1] != 0) | (xyz[:, :, 2] != 0)).astype("uint8")
    dists = cdist(xyz.reshape(-1, 3), fps_points)
    ref = mask * (np.argmin(dists, axis=1).reshape(32, 32) + 1)
    ours = np.asarray(W.xyz_to_region(jnp.asarray(xyz), jnp.asarray(fps_points)))
    np.testing.assert_array_equal(ours, ref)


# ---------------------------------------------------------------- symmetry

def test_closest_rot_batch_matches_loop(rng):
    from scipy.spatial.transform import Rotation as Rsp
    def axangle2mat(axis, angle):
        axis = np.asarray(axis, dtype=np.float64)
        return Rsp.from_rotvec(axis / np.linalg.norm(axis) * angle).as_matrix()
    B = 12
    qs = rng.randn(B, 4)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    gt = np.asarray(R.quat_to_mat(jnp.asarray(qs, jnp.float32)))
    pred = np.asarray(R.quat_to_mat(jnp.asarray(rng.randn(B, 4).astype(np.float32))))
    # z-flip symmetry for half the batch
    sym = np.stack([np.eye(3), axangle2mat([0, 0, 1], np.pi)]).astype(np.float32)
    sym_list = [sym if i % 2 == 0 else None for i in range(B)]
    rots_pad, mask = S.pad_symmetry_sets(sym_list)
    ours = np.asarray(S.get_closest_rot_batch(jnp.asarray(pred), jnp.asarray(gt),
                                              jnp.asarray(rots_pad), jnp.asarray(mask)))
    # reference loop
    def re_err(r1, r2):
        c = np.clip((np.trace(r1 @ r2.T) - 1) / 2, -1, 1)
        return np.arccos(c)
    for i in range(B):
        if sym_list[i] is None:
            np.testing.assert_allclose(ours[i], gt[i], atol=1e-5)
        else:
            best, berr = gt[i], re_err(pred[i], gt[i])
            for s in sym_list[i]:
                cand = gt[i] @ s
                if re_err(pred[i], cand) < berr:
                    best, berr = cand, re_err(pred[i], cand)
            np.testing.assert_allclose(ours[i], best, atol=1e-5)


def test_symmetry_transformations_continuous():
    info = {"symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]}
    trans = S.get_symmetry_transformations(info, max_sym_disc_step=0.5)
    # ceil(pi/0.5)=7 steps, range(1,7) -> 6 non-identity rotations
    # (the reference drops identity here, misc.py:238; get_closest_rot adds
    # the raw GT back as a candidate, which pad_symmetry_sets slot 0 mirrors)
    assert len(trans) == 6
    rots = S.get_symmetry_rotations(info, 0.5)
    assert rots.shape == (6, 3, 3)
    assert S.get_symmetry_rotations({}) is None


# ---------------------------------------------------------------- fps

def test_fps_jax_matches_numpy(rng):
    pts = rng.randn(500, 3).astype(np.float32)
    ref = F.farthest_point_sampling_np(pts, 8, init_center=True)
    ours = np.asarray(F.farthest_point_sampling(pts, 8, init_center=True))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_fps_spread(rng):
    """FPS samples should be far apart (min pairwise dist >> random sampling)."""
    pts = rng.randn(2000, 3).astype(np.float32)
    fps_pts = np.asarray(F.farthest_point_sampling(pts, 16))
    d = np.linalg.norm(fps_pts[:, None] - fps_pts[None], axis=-1)
    d += np.eye(16) * 1e9
    rand_pts = pts[:16]
    d_rand = np.linalg.norm(rand_pts[:, None] - rand_pts[None], axis=-1) + np.eye(16) * 1e9
    assert d.min() > d_rand.min()


def test_get_fps_and_center(rng):
    pts = rng.randn(300, 3).astype(np.float32)
    out = np.asarray(F.get_fps_and_center(pts, num_fps=8))
    assert out.shape == (9, 3)
    np.testing.assert_allclose(out[-1], pts.mean(0), atol=1e-5)


def test_warp_separable_matches_gather():
    """Axis-aligned separable warp (MXU matmuls) must equal the gather warp
    bit-for-bit-ish on random rot-free crops, including out-of-bounds zeros."""
    from gdrnet_tpu.ops.warp import affine_params_batch, warp_affine_batch

    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.rand(3, 40, 56, 2).astype(np.float32) * 255)
    centers = jnp.asarray(rng.uniform(-10, 70, (3, 2)).astype(np.float32))
    scales = jnp.asarray(np.array([15.0, 60.0, 200.0], np.float32))
    M = affine_params_batch(centers, scales, 32, inv=True)
    g = np.asarray(warp_affine_batch(imgs, M, (32, 32), "bilinear"))
    s = np.asarray(warp_affine_batch(imgs, M, (32, 32), "bilinear",
                                     axis_aligned=True))
    np.testing.assert_allclose(s, g, atol=1e-3)
    # huge scale crops mostly out of bounds -> zeros in both paths
    assert (s[2] == 0).mean() > 0.1


def test_warp_separable_nearest_exact():
    """Nearest via selection matmul must be EXACT vs the gather path (region
    labels / xyz GT depend on it)."""
    from gdrnet_tpu.ops.warp import affine_params_batch, warp_affine_batch

    rng = np.random.RandomState(6)
    imgs = jnp.asarray(rng.rand(3, 40, 56, 3).astype(np.float32))
    centers = jnp.asarray(rng.uniform(0, 60, (3, 2)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(10, 120, 3).astype(np.float32))
    M = affine_params_batch(centers, scales, 16, inv=True)
    g = np.asarray(warp_affine_batch(imgs, M, (16, 16), "nearest"))
    s = np.asarray(warp_affine_batch(imgs, M, (16, 16), "nearest",
                                     axis_aligned=True))
    np.testing.assert_array_equal(s, g)
