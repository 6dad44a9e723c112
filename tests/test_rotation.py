"""Geometry-core unit tests, golden-checked against scipy/numpy — the pytest
suite the reference lacks (SURVEY.md §4: inline __main__ checks in
core/utils/rot_reps.py:572-624 and core/utils/pose_utils.py:770-944 are the
model for these). scipy.spatial.transform.Rotation is the golden oracle
(transforms3d-equivalent; scipy quats are xyzw, ours/reference are wxyz)."""

import numpy as np
from scipy.spatial.transform import Rotation as Rsp

import jax.numpy as jnp
from gdrnet_tpu.ops import rotation as R


def wxyz(q_xyzw):
    return np.concatenate([q_xyzw[..., 3:4], q_xyzw[..., :3]], axis=-1)


def random_rotations(rng, n):
    r = Rsp.random(n, random_state=rng)
    return r.as_matrix(), wxyz(r.as_quat())


def axangle2mat(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    return Rsp.from_rotvec(axis / np.linalg.norm(axis) * angle).as_matrix()


def test_quat_to_mat_golden(rng):
    mats, qs = random_rotations(rng, 32)
    ours = np.asarray(R.quat_to_mat(jnp.asarray(qs, jnp.float32)))
    np.testing.assert_allclose(ours, mats, atol=1e-5)


def test_quat_to_mat_unnormalized(rng):
    mats, qs = random_rotations(rng, 8)
    ours = np.asarray(R.quat_to_mat(jnp.asarray(qs * 2.3, jnp.float32)))
    np.testing.assert_allclose(ours, mats, atol=1e-5)


def test_mat_to_quat_roundtrip(rng):
    mats, qs = random_rotations(rng, 64)
    q_out = np.asarray(R.mat_to_quat(jnp.asarray(mats, jnp.float32)))
    for q_ref, q_o in zip(qs, q_out):
        s = np.sign(np.dot(q_ref, q_o))
        np.testing.assert_allclose(s * q_o, q_ref, atol=1e-4)


def test_mat_to_quat_edge_cases():
    """180-degree rotations hit the low-trace branch."""
    for axis in np.eye(3):
        m = axangle2mat(axis, np.pi)
        q = np.asarray(R.mat_to_quat(jnp.asarray(m[None], jnp.float32)))[0]
        back = np.asarray(R.quat_to_mat(jnp.asarray(q[None])))[0]
        np.testing.assert_allclose(back, m, atol=1e-5)
    q_id = np.asarray(R.mat_to_quat(jnp.asarray(np.eye(3)[None], jnp.float32)))[0]
    np.testing.assert_allclose(q_id, [1, 0, 0, 0], atol=1e-6)


def test_ortho6d_roundtrip(rng):
    mats, _ = random_rotations(rng, 32)
    six = R.mat_to_ortho6d(jnp.asarray(mats, jnp.float32))
    back = np.asarray(R.ortho6d_to_mat(six))
    np.testing.assert_allclose(back, mats, atol=1e-5)


def test_ortho6d_unnormalized_input(rng):
    """Gram-Schmidt must recover R from scaled 6d (the net outputs raw
    values; rot_reps.py:34 normalizes)."""
    mats, _ = random_rotations(rng, 16)
    six = np.asarray(R.mat_to_ortho6d(jnp.asarray(mats, jnp.float32))) * 3.7
    back = np.asarray(R.ortho6d_to_mat(jnp.asarray(six)))
    np.testing.assert_allclose(back, mats, atol=1e-5)


def test_quat_mul_golden(rng):
    r1 = Rsp.random(8, random_state=rng)
    r2 = Rsp.random(8, random_state=rng)
    ref = wxyz((r1 * r2).as_quat())
    ours = np.asarray(R.quat_mul(jnp.asarray(wxyz(r1.as_quat()), jnp.float32),
                                 jnp.asarray(wxyz(r2.as_quat()), jnp.float32)))
    for a, b in zip(ours, ref):
        s = np.sign(np.dot(a, b))
        np.testing.assert_allclose(s * a, b, atol=1e-5)


def test_axangle_to_mat_golden(rng):
    for _ in range(8):
        axis = rng.randn(3)
        angle = rng.uniform(-np.pi, np.pi)
        ref = axangle2mat(axis, angle)
        ours = np.asarray(R.axangle_to_mat(jnp.asarray(axis[None], jnp.float32),
                                           jnp.asarray([angle], jnp.float32)))[0]
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_axangle_to_quat_matches_mat(rng):
    axis = rng.randn(8, 3).astype(np.float32)
    angle = rng.uniform(-np.pi, np.pi, 8).astype(np.float32)
    m1 = np.asarray(R.axangle_to_mat(jnp.asarray(axis), jnp.asarray(angle)))
    m2 = np.asarray(R.quat_to_mat(R.axangle_to_quat(jnp.asarray(axis), jnp.asarray(angle))))
    np.testing.assert_allclose(m1, m2, atol=1e-5)


def test_euler_to_mat_golden(rng):
    angles = rng.uniform(-np.pi, np.pi, size=(16, 3))
    # static sxyz == scipy extrinsic 'xyz'
    ref = Rsp.from_euler("xyz", angles).as_matrix()
    ours = np.asarray(R.euler_to_mat(jnp.asarray(angles[:, 0], jnp.float32),
                                     jnp.asarray(angles[:, 1], jnp.float32),
                                     jnp.asarray(angles[:, 2], jnp.float32)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mat_to_euler_roundtrip(rng):
    mats, _ = random_rotations(rng, 32)
    ax, ay, az = R.mat_to_euler(jnp.asarray(mats, jnp.float32))
    back = np.asarray(R.euler_to_mat(ax, ay, az))
    np.testing.assert_allclose(back, mats, atol=1e-4)


def test_so3_exp_log_roundtrip(rng):
    w = rng.randn(16, 3) * 0.8
    mats = np.asarray(R.so3_exp(jnp.asarray(w, jnp.float32)))
    ref = Rsp.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(mats, ref, atol=1e-5)
    back = np.asarray(R.so3_log(jnp.asarray(mats)))
    np.testing.assert_allclose(back, w, atol=1e-4)


def test_so3_exp_small_angle():
    w = jnp.asarray([[1e-8, 0, 0], [0.0, 0, 0]], jnp.float32)
    m = np.asarray(R.so3_exp(w))
    np.testing.assert_allclose(m, np.tile(np.eye(3), (2, 1, 1)), atol=1e-6)


def test_allo_ego_golden_vs_reference_numpy(rng):
    """Check batched jnp allo->ego against the reference's scalar numpy
    formula (core/utils/utils.py:39-95)."""
    import math

    def allo_to_ego_ref(allo_R, trans):
        cam_ray = np.array([0, 0, 1.0])
        obj_ray = trans / np.linalg.norm(trans)
        angle = math.acos(np.clip(cam_ray.dot(obj_ray), -1, 1))
        if angle > 0:
            rot_mat = axangle2mat(np.cross(cam_ray, obj_ray), angle)
            return rot_mat @ allo_R
        return allo_R

    mats, _ = random_rotations(rng, 16)
    trans = rng.uniform(-0.3, 0.3, size=(16, 3))
    trans[:, 2] = rng.uniform(0.5, 2.0, size=16)
    ref = np.stack([allo_to_ego_ref(m, t) for m, t in zip(mats, trans)])
    ours = np.asarray(R.allo_to_ego_mat(jnp.asarray(trans, jnp.float32),
                                        jnp.asarray(mats, jnp.float32)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_allo_ego_inverse(rng):
    mats, _ = random_rotations(rng, 8)
    trans = rng.uniform(-0.2, 0.2, size=(8, 3))
    trans[:, 2] = 1.0
    ego = R.allo_to_ego_mat(jnp.asarray(trans, jnp.float32), jnp.asarray(mats, jnp.float32))
    back = np.asarray(R.ego_to_allo_mat(jnp.asarray(trans, jnp.float32), ego))
    np.testing.assert_allclose(back, mats, atol=1e-4)


def test_allo_ego_quat_matches_mat(rng):
    mats, qs = random_rotations(rng, 8)
    trans = rng.uniform(-0.2, 0.2, size=(8, 3)).astype(np.float32)
    trans[:, 2] = 1.0
    ego_m = np.asarray(R.allo_to_ego_mat(jnp.asarray(trans), jnp.asarray(mats, jnp.float32)))
    q_ego = R.allo_to_ego_quat(jnp.asarray(trans), jnp.asarray(qs, jnp.float32))
    ego_q = np.asarray(R.quat_to_mat(q_ego))
    np.testing.assert_allclose(ego_q, ego_m, atol=1e-4)


def test_qrot_points_matches_mat(rng):
    mats, qs = random_rotations(rng, 4)
    pts = rng.randn(4, 10, 3).astype(np.float32)
    ref = np.einsum("bij,bnj->bni", mats, pts)
    ours = np.asarray(R.qrot_points(jnp.asarray(qs, jnp.float32), jnp.asarray(pts)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_angular_distance(rng):
    mats, qs = random_rotations(rng, 8)
    d_mat = np.asarray(R.angular_distance_mat(jnp.asarray(mats, jnp.float32), jnp.asarray(mats, jnp.float32)))
    np.testing.assert_allclose(d_mat, 0.0, atol=1e-5)
    mats2, qs2 = random_rotations(rng, 8)
    # quat vs mat distance consistency (rot_loss.py:51-76 cross-check)
    d_q = np.asarray(R.angular_distance_quat(jnp.asarray(qs, jnp.float32), jnp.asarray(qs2, jnp.float32)))
    d_m = np.asarray(R.angular_distance_mat(jnp.asarray(mats, jnp.float32), jnp.asarray(mats2, jnp.float32)))
    np.testing.assert_allclose(d_q, d_m, atol=1e-4)


def test_rot_angle_deg(rng):
    mats, _ = random_rotations(rng, 8)
    z = np.asarray(R.rot_angle_deg(jnp.asarray(mats, jnp.float32), jnp.asarray(mats, jnp.float32)))
    np.testing.assert_allclose(z, 0.0, atol=0.2)
    rot90 = axangle2mat([0, 0, 1], np.pi / 2)
    m2 = np.einsum("ij,bjk->bik", rot90, mats)
    d = np.asarray(R.rot_angle_deg(jnp.asarray(mats, jnp.float32), jnp.asarray(m2, jnp.float32)))
    np.testing.assert_allclose(d, 90.0, atol=0.1)


def test_exp_maps_grad_finite_at_zero():
    """so3_exp / quat_exp gradients at an exactly-zero input must be finite
    (nets emit zero rot params at init; jnp.linalg.norm grads NaN at 0)."""
    import jax
    import jax.numpy as jnp
    from gdrnet_tpu.ops.rotation import so3_exp, quat_exp

    g = jax.grad(lambda w: jnp.sum(so3_exp(w)))(jnp.zeros((2, 3)))
    assert np.isfinite(np.asarray(g)).all(), g
    # value still exact at 0
    np.testing.assert_allclose(np.asarray(so3_exp(jnp.zeros(3))), np.eye(3),
                               atol=1e-6)
    gq = jax.grad(lambda v: jnp.sum(quat_exp(v)))(jnp.zeros((2, 3)))
    assert np.isfinite(np.asarray(gq)).all(), gq
    np.testing.assert_allclose(np.asarray(quat_exp(jnp.zeros(3))),
                               [1, 0, 0, 0], atol=1e-6)
