"""Device PnP tests: the batched EPnP/RANSAC/LM programs (ops/device_pnp.py)
must match the cv2 host path's accuracy (eval/pnp.py — reference
gdrn_evaluator.py:187-435, misc.pnp_v2) on synthetic scenes, be invariant to
zero-weight padding (the static-shape contract), and the TEST.DEVICE_PNP
bucket entry point must mirror every mode's fallback semantics."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdrnet_tpu.ops.device_pnp import (
    pnp_from_maps_batch,
    ransac_epnp,
    refine_pose_lm,
    reprojection_errors,
    weighted_epnp,
)

K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1.0]], np.float32)


def _rand_rot(rng):
    Q, _ = np.linalg.qr(rng.randn(3, 3))
    return (Q * np.sign(np.linalg.det(Q))).astype(np.float64)


def _scene(rng, n=300, noise=0.0, outlier_frac=0.0):
    R = _rand_rot(rng)
    t = np.array([0.05, -0.03, 0.9]) + rng.randn(3) * 0.05
    p3 = (rng.rand(n, 3) - 0.5) * 0.2
    uv = (p3 @ R.T + t) @ K.T.astype(np.float64)
    uv = uv[:, :2] / uv[:, 2:3]
    uv += rng.randn(n, 2) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        uv[n - n_out:] = rng.rand(n_out, 2) * [640, 480]
    return R, t, p3.astype(np.float32), uv.astype(np.float32)


def _re_deg(Ra, Rb):
    cos = np.clip((np.trace(np.asarray(Ra).T @ np.asarray(Rb)) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(cos))


def test_weighted_epnp_clean_exact(rng):
    R, t, p3, uv = _scene(rng)
    Rd, td, err = weighted_epnp(jnp.asarray(p3), jnp.asarray(uv),
                                jnp.asarray(K), jnp.ones(len(p3)))
    assert _re_deg(Rd, R) < 0.05  # f32 eigh round-off floor
    assert np.linalg.norm(np.asarray(td) - t) < 5e-4
    assert float(err) < 0.05  # mean reprojection px


def test_weighted_epnp_matches_cv2_on_noise(rng):
    """1 px pixel noise: the device solver must be as accurate as cv2 EPnP
    (both land ~0.1-0.3 deg; allow 1.5x + a small absolute floor)."""
    worse = 0
    for _ in range(5):
        R, t, p3, uv = _scene(rng, noise=1.0)
        Rd, td, _ = weighted_epnp(jnp.asarray(p3), jnp.asarray(uv),
                                  jnp.asarray(K), jnp.ones(len(p3)))
        ok, rvec, tvec = cv2.solvePnP(p3[None].astype(np.float64),
                                      uv[None].astype(np.float64),
                                      K.astype(np.float64),
                                      np.zeros((8, 1)),
                                      flags=cv2.SOLVEPNP_EPNP)
        assert ok
        Rcv, _ = cv2.Rodrigues(rvec)
        if _re_deg(Rd, R) > 1.5 * _re_deg(Rcv, R) + 0.05:
            worse += 1
        assert _re_deg(Rd, R) < 1.0
        assert np.linalg.norm(np.asarray(td) - t) < 0.01
    assert worse <= 1  # at most one unlucky draw


def test_padding_invariance(rng):
    """Zero-weight rows must not change the solution — the static-shape
    contract the tester relies on (padded 64x64 correspondence sets)."""
    R, t, p3, uv = _scene(rng, n=200, noise=0.5)
    w = np.ones(len(p3), np.float32)
    Rd, td, _ = weighted_epnp(jnp.asarray(p3), jnp.asarray(uv),
                              jnp.asarray(K), jnp.asarray(w))
    pad3 = np.concatenate([p3, rng.rand(100, 3).astype(np.float32) * 9])
    pad2 = np.concatenate([uv, rng.rand(100, 2).astype(np.float32) * 9])
    wp = np.concatenate([w, np.zeros(100, np.float32)])
    Rp, tp, _ = weighted_epnp(jnp.asarray(pad3), jnp.asarray(pad2),
                              jnp.asarray(K), jnp.asarray(wp))
    np.testing.assert_allclose(np.asarray(Rp), np.asarray(Rd), atol=2e-5)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(td), atol=2e-5)


def test_ransac_rejects_outliers(rng):
    R, t, p3, uv = _scene(rng, noise=0.5, outlier_frac=0.3)
    w = jnp.ones(len(p3))
    Rr, tr, ok, w_in = ransac_epnp(jax.random.PRNGKey(0), jnp.asarray(p3),
                                   jnp.asarray(uv), jnp.asarray(K), w)
    assert bool(ok)
    assert _re_deg(Rr, R) < 1.0
    assert np.linalg.norm(np.asarray(tr) - t) < 0.005
    # the inlier set excludes (almost all) planted outliers
    assert int(jnp.sum(w_in[-90:] > 0)) < 5
    # plain EPnP on the same contaminated set is garbage — RANSAC earns it
    Rp, tp, _ = weighted_epnp(jnp.asarray(p3), jnp.asarray(uv),
                              jnp.asarray(K), w)
    assert _re_deg(Rp, R) > 5 * _re_deg(Rr, R)


def test_refine_lm_converges(rng):
    R, t, p3, uv = _scene(rng, noise=0.5)
    w = jnp.ones(len(p3))
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)
    Rp = cv2.Rodrigues(axis * np.radians(8.0))[0] @ R
    tp = t + [0.03, -0.02, 0.05]
    Rr, tr = refine_pose_lm(jnp.asarray(Rp, dtype=jnp.float32),
                            jnp.asarray(tp, dtype=jnp.float32),
                            jnp.asarray(p3), jnp.asarray(uv),
                            jnp.asarray(K), w)
    assert _re_deg(Rr, R) < _re_deg(Rp, R) / 10
    assert np.linalg.norm(np.asarray(tr) - t) < np.linalg.norm(tp - t) / 10


def test_reprojection_errors_behind_camera(rng):
    """Points behind the camera never count as inliers."""
    R, t, p3, uv = _scene(rng, n=10)
    errs = reprojection_errors(jnp.asarray(R, dtype=jnp.float32),
                               jnp.asarray(-t, dtype=jnp.float32),
                               jnp.asarray(p3), jnp.asarray(uv),
                               jnp.asarray(K))
    assert float(jnp.min(errs)) >= 1e6


def _maps_from_scene(rng, h=64, w=64, mask_frac=0.6):
    """Single synthetic decoded-maps scene in the tester's contract — thin
    wrapper over the shared builder (data/synthetic.synthetic_decoded_maps,
    also used by tools/bench_pnp.py) so the map conventions live in one
    place."""
    from gdrnet_tpu.data.synthetic import synthetic_decoded_maps

    mask, xyz_norm, coord2d, R, t, K_, extent, im_wh = synthetic_decoded_maps(
        rng, 1, h=h, w=w, mask_frac=mask_frac)
    np.testing.assert_array_equal(K_, K)  # module-level K is the same camera
    return R[0], t[0], xyz_norm[0], mask[0], coord2d[0], extent, im_wh


@pytest.mark.parametrize("mode", ["ransac_pnp", "net_iter_pnp",
                                  "net_ransac_pnp"])
def test_pnp_from_maps_batch_modes(rng, mode):
    R, t, xyz_norm, mask, coord2d, extent, (im_w, im_h) = _maps_from_scene(rng)
    B = 3
    Rn = np.stack([_rand_rot(rng).astype(np.float32) for _ in range(B)])
    tn = np.tile(np.array([0.0, 0.0, 0.5], np.float32), (B, 1))
    batch = dict(
        mask_prob=jnp.asarray(np.stack([mask] * B)),
        xyz_norm=jnp.asarray(np.stack([xyz_norm] * B)),
        coord2d=jnp.asarray(np.stack([coord2d] * B)),
        im_wh=jnp.asarray(np.tile([[im_w, im_h]], (B, 1)), jnp.float32),
        extents=jnp.asarray(np.stack([extent] * B)),
        Ks=jnp.asarray(np.stack([K] * B)),
        rot_net=jnp.asarray(Rn),
        trans_net=jnp.asarray(tn),
        roi_valid=jnp.asarray([True, True, False]),
    )
    Ro, to = pnp_from_maps_batch(jax.random.PRNGKey(1), **batch, mode=mode,
                                 n_hyp=64)
    Ro, to = np.asarray(Ro), np.asarray(to)
    for j in range(2):
        if mode == "net_iter_pnp":
            # LM from a random far init may stall in a local basin, but the
            # te > 1 m net-translation fallback must keep t sane
            assert np.linalg.norm(to[j] - tn[j]) <= 1.0 + 1e-5
        else:
            assert _re_deg(Ro[j], R) < 1.0
            assert np.linalg.norm(to[j] - t) < 0.01
    # the invalid ROI keeps its net pose untouched
    np.testing.assert_allclose(Ro[2], Rn[2], atol=1e-6)
    np.testing.assert_allclose(to[2], tn[2], atol=1e-6)


def test_net_iter_mode_refines_nearby_init(rng):
    """Warm-started LM (the reference's net_iter_pnp case) from a realistic
    ~8 deg / 3 cm net error must land on the true pose."""
    R, t, xyz_norm, mask, coord2d, extent, (im_w, im_h) = _maps_from_scene(rng)
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)
    Rn = (cv2.Rodrigues(axis * np.radians(8.0))[0] @ R).astype(np.float32)
    tn = (t + [0.02, -0.01, 0.02]).astype(np.float32)
    Ro, to = pnp_from_maps_batch(
        jax.random.PRNGKey(1),
        jnp.asarray(mask[None]), jnp.asarray(xyz_norm[None]),
        jnp.asarray(coord2d[None]),
        jnp.asarray([[im_w, im_h]], jnp.float32),
        jnp.asarray(extent[None]), jnp.asarray(K[None]),
        jnp.asarray(Rn[None]), jnp.asarray(tn[None]),
        jnp.asarray([True]), mode="net_iter_pnp")
    assert _re_deg(np.asarray(Ro)[0], R) < 0.5
    assert np.linalg.norm(np.asarray(to)[0] - t) < 0.005


def test_too_few_points_keeps_net_pose(rng):
    R, t, xyz_norm, mask, coord2d, extent, (im_w, im_h) = _maps_from_scene(rng)
    Rn = _rand_rot(rng).astype(np.float32)
    tn = np.array([0.0, 0.0, 0.5], np.float32)
    Ro, to = pnp_from_maps_batch(
        jax.random.PRNGKey(1),
        jnp.zeros((1,) + mask.shape),          # empty mask -> no points
        jnp.asarray(xyz_norm[None]), jnp.asarray(coord2d[None]),
        jnp.asarray([[im_w, im_h]], jnp.float32),
        jnp.asarray(extent[None]), jnp.asarray(K[None]),
        jnp.asarray(Rn[None]), jnp.asarray(tn[None]),
        jnp.asarray([True]), mode="ransac_pnp")
    np.testing.assert_allclose(np.asarray(Ro)[0], Rn, atol=1e-6)
    np.testing.assert_allclose(np.asarray(to)[0], tn, atol=1e-6)


def test_device_matches_host_ransac_accuracy(rng):
    """Same maps through the device bucket program and the host cv2 loop:
    both must land within tight bounds of the true pose (the parity the
    TEST.DEVICE_PNP flag promises)."""
    from gdrnet_tpu.eval.pnp import correspondences_from_maps, pnp_ransac

    R, t, xyz_norm, mask, coord2d, extent, (im_w, im_h) = _maps_from_scene(rng)
    img_pts, mdl_pts = correspondences_from_maps(
        mask, xyz_norm, coord2d, im_w, im_h, extent)
    pose = pnp_ransac(mdl_pts, img_pts, K, method="epnp", ransac=True)
    assert pose is not None
    Ro, to = pnp_from_maps_batch(
        jax.random.PRNGKey(1),
        jnp.asarray(mask[None]), jnp.asarray(xyz_norm[None]),
        jnp.asarray(coord2d[None]),
        jnp.asarray([[im_w, im_h]], jnp.float32),
        jnp.asarray(extent[None]), jnp.asarray(K[None]),
        jnp.asarray(np.eye(3, dtype=np.float32)[None]),
        jnp.asarray(np.array([[0, 0, 0.5]], np.float32)),
        jnp.asarray([True]), mode="ransac_pnp")
    assert _re_deg(np.asarray(Ro)[0], R) < max(0.5, 2 * _re_deg(pose[:, :3], R))
    err_host = np.linalg.norm(pose[:, 3] - t)
    assert np.linalg.norm(np.asarray(to)[0] - t) < max(0.003, 2 * err_host)
