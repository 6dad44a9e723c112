"""Batched rotation representations for TPU (pure jnp, jit/vmap-friendly).

Covers the reference's rotation math surface (core/utils/rot_reps.py,
core/utils/pose_utils.py, core/utils/utils.py in /root/reference) with
everything written as batched, branch-free jnp so it traces once under jit:

  * ortho6d (continuous 6D)  <-> rotation matrix
  * quaternion (w,x,y,z)     <-> rotation matrix
  * axis-angle               <-> rotation matrix / quaternion
  * so(3) log/exp (Lie algebra)
  * euler (static sxyz)      <-> rotation matrix
  * allocentric <-> egocentric corrections (batched; the reference's
    allo_to_ego_mat_torch, core/utils/utils.py:208)

All functions take a leading batch dimension; use ``vmap`` for other layouts.
Quaternions are scalar-first (w, x, y, z), matching transforms3d and the
reference.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8

# TPU matmuls default to bf16 inputs; 3x3 rotation algebra needs full f32.
def _mm(a, b):
    return jnp.matmul(a, b, precision="highest")


def safe_norm(v: jnp.ndarray, eps: float = _EPS, axis: int = -1) -> jnp.ndarray:
    """L2 norm floored at eps, with finite gradient at v == 0 (jnp.linalg.norm
    has NaN grad there; nets can emit exactly-zero rot6d at init)."""
    return jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(v), axis=axis, keepdims=True), eps * eps))


def normalize_vector(v: jnp.ndarray, eps: float = _EPS, axis: int = -1) -> jnp.ndarray:
    """L2-normalize along ``axis`` (value- and gradient-safe at 0)."""
    return v / safe_norm(v, eps=eps, axis=axis)


# ---------------------------------------------------------------------------
# ortho6d (Zhou et al. continuous rotation representation)
# ---------------------------------------------------------------------------


def ortho6d_to_mat(poses: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3, 3] via Gram-Schmidt on the two raw columns.

    Semantics of reference ortho6d_to_mat_batch (core/utils/rot_reps.py:34):
    the 6 numbers are the first two *columns* of R.
    """
    x_raw = poses[..., 0:3]
    y_raw = poses[..., 3:6]
    x = normalize_vector(x_raw)
    z = normalize_vector(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)  # columns


def mat_to_ortho6d(rots: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 6]: first two columns concatenated."""
    return jnp.concatenate([rots[..., :, 0], rots[..., :, 1]], axis=-1)


# ---------------------------------------------------------------------------
# quaternion
# ---------------------------------------------------------------------------


def quat_to_mat(quat: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """[..., 4] (w,x,y,z, possibly unnormalized) -> [..., 3, 3].

    Matches quat2mat_torch (core/utils/pose_utils.py:323).
    """
    q = quat / safe_norm(quat, eps=eps)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    xw, yw, zw = x * w, y * w, z * w
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - zw), 2 * (xz + yw),
            2 * (xy + zw), 1 - 2 * (xx + zz), 2 * (yz - xw),
            2 * (xz - yw), 2 * (yz + xw), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] (w,x,y,z), branch-free "best of four" method.

    Numerically stable for all inputs (no trace>0 branch), suitable for jit.
    """
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]

    # 4 squared magnitudes (times 4): qw, qx, qy, qz
    qw2 = jnp.maximum(0.0, 1 + m00 + m11 + m22)
    qx2 = jnp.maximum(0.0, 1 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1 - m00 - m11 + m22)

    # candidate quaternions, each valid when its pivot is the largest
    def _safe_div(a, b):
        return a / jnp.maximum(b, _EPS)

    qw = jnp.sqrt(qw2)
    qx = jnp.sqrt(qx2)
    qy = jnp.sqrt(qy2)
    qz = jnp.sqrt(qz2)

    cand_w = jnp.stack([qw, _safe_div(m21 - m12, qw), _safe_div(m02 - m20, qw), _safe_div(m10 - m01, qw)], -1)
    cand_x = jnp.stack([_safe_div(m21 - m12, qx), qx, _safe_div(m01 + m10, qx), _safe_div(m02 + m20, qx)], -1)
    cand_y = jnp.stack([_safe_div(m02 - m20, qy), _safe_div(m01 + m10, qy), qy, _safe_div(m12 + m21, qy)], -1)
    cand_z = jnp.stack([_safe_div(m10 - m01, qz), _safe_div(m02 + m20, qz), _safe_div(m12 + m21, qz), qz], -1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :] * 0.5
    q = normalize_vector(q)
    # canonical sign: w >= 0 (transforms3d convention up to sign)
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of [..., 4] quats (w,x,y,z). Ref quatmul_torch
    (core/utils/utils.py:144)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_exp(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Quaternion exponential, [..., 4] (s; v) or [..., 3] (pure v) -> [..., 4].

    exp(s; v) = e^s (cos|v|, v/|v| sin|v|). Ref quaternion_lf.qexp
    (core/utils/quaternion_lf.py:286-310) — the "log_quat" rot type decode.
    """
    if q.shape[-1] == 4:
        s, v = q[..., :1], q[..., 1:]
    else:
        s, v = jnp.zeros_like(q[..., :1]), q
    theta = safe_norm(v, eps=eps)  # finite grad at v == 0 (linalg.norm NaNs)
    w = jnp.cos(theta)
    xyz = v * jnp.sin(theta) / theta
    return jnp.exp(s) * jnp.concatenate([w, xyz], axis=-1)


def qrot_points(q: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Rotate [..., N, 3] points by [..., 4] quaternions.

    Matches the reference's qrot semantics (core/utils/pose_utils.py test
    test_qrot_points): p' = q p q*.
    """
    qv = q[..., None, 1:4]  # [..., 1, 3]
    qw = q[..., None, 0:1]  # [..., 1, 1]
    t = 2.0 * jnp.cross(qv, pts)
    return pts + qw * t + jnp.cross(qv, t)


# ---------------------------------------------------------------------------
# axis-angle / so(3)
# ---------------------------------------------------------------------------


def axangle_to_mat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues. axis [..., 3] (need not be unit), angle [...]."""
    axis = normalize_vector(axis)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    C = 1 - c
    m = jnp.stack(
        [
            x * x * C + c, x * y * C - z * s, x * z * C + y * s,
            y * x * C + z * s, y * y * C + c, y * z * C - x * s,
            z * x * C - y * s, z * y * C + x * s, z * z * C + c,
        ],
        axis=-1,
    )
    return m.reshape(axis.shape[:-1] + (3, 3))


def axangle_to_quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    axis = normalize_vector(axis)
    half = angle[..., None] / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """so(3) vector [..., 3] -> SO(3) matrix, Taylor-safe at 0.

    Reference lie-algebra path: core/utils/lie_algebra.py.
    """
    # grad-safe at omega == 0: theta_sq has a clean gradient and the floored
    # sqrt in safe_norm keeps the non-Taylor branch's derivative finite
    # (jnp.linalg.norm's grad at 0 is NaN and poisons the where)
    theta_sq = jnp.sum(jnp.square(omega), axis=-1)
    theta = safe_norm(omega)[..., 0]
    small = theta_sq < 1e-12

    # Use sinc-style stable coefficients
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1 - jnp.cos(theta)) / jnp.maximum(theta_sq, _EPS * _EPS))

    K = skew(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * _mm(K, K)


def so3_log(rot: jnp.ndarray) -> jnp.ndarray:
    """SO(3) matrix [..., 3, 3] -> so(3) vector [..., 3] (via quaternion)."""
    q = mat_to_quat(rot)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:4]
    vn = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(vn, w)
    axis = v / jnp.maximum(vn, _EPS)[..., None]
    return axis * angle[..., None]


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# euler (static sxyz, the transforms3d default used by the reference)
# ---------------------------------------------------------------------------


def euler_to_mat(ai: jnp.ndarray, aj: jnp.ndarray, ak: jnp.ndarray) -> jnp.ndarray:
    """Static sxyz euler angles -> [..., 3, 3] (transforms3d euler2mat 'sxyz')."""
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    m = jnp.stack(
        [
            cj * ck, sj * sc - cs, sj * cc + ss,
            cj * sk, sj * ss + cc, sj * cs - sc,
            -sj, cj * si, cj * ci,
        ],
        axis=-1,
    )
    return m.reshape(jnp.shape(ai) + (3, 3))


def mat_to_euler(rot: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[..., 3, 3] -> static sxyz euler angles (gimbal-safe via where)."""
    cy = jnp.sqrt(rot[..., 0, 0] ** 2 + rot[..., 1, 0] ** 2)
    safe = cy > 1e-6
    ax = jnp.where(safe, jnp.arctan2(rot[..., 2, 1], rot[..., 2, 2]),
                   jnp.arctan2(-rot[..., 1, 2], rot[..., 1, 1]))
    ay = jnp.arctan2(-rot[..., 2, 0], cy)
    az = jnp.where(safe, jnp.arctan2(rot[..., 1, 0], rot[..., 0, 0]), jnp.zeros_like(cy))
    return ax, ay, az


# ---------------------------------------------------------------------------
# allocentric <-> egocentric
# ---------------------------------------------------------------------------


def allo_to_ego_quat(translation: jnp.ndarray, q_allo: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Batched allocentric->egocentric on quaternions.

    Semantics of allocentric_to_egocentric_torch (core/utils/utils.py:166):
    rotate by the angle between the camera ray (0,0,1) and the
    object-centroid ray. translation [..., 3], q_allo [..., 4].

    NOTE: norms are floored at eps (max) rather than the reference's additive
    ``norm + eps`` — the additive form biases the angle by ~eps*cot(angle)
    (mrad-level for near-axis objects); the reference's own "more accurate"
    numpy test path (pose_from_pred_centroid_z.py:107) has no such bias and is
    the golden this matches.
    """
    obj_ray = translation / safe_norm(translation, eps=eps)
    angle = jnp.arccos(jnp.clip(obj_ray[..., 2:3], -1.0, 1.0))
    cam_ray = jnp.asarray([0.0, 0.0, 1.0], dtype=translation.dtype)
    axis = jnp.cross(jnp.broadcast_to(cam_ray, obj_ray.shape), obj_ray)
    axis = axis / safe_norm(axis, eps=eps)
    q_allo_to_ego = jnp.concatenate([jnp.cos(angle / 2.0), axis * jnp.sin(angle / 2.0)], axis=-1)
    return quat_mul(q_allo_to_ego, q_allo)


def allo_to_ego_mat(translation: jnp.ndarray, rot_allo: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Batched allocentric->egocentric on matrices (allo_to_ego_mat_torch,
    core/utils/utils.py:208). translation [..., 3], rot_allo [..., 3, 3]."""
    obj_ray = translation / safe_norm(translation, eps=eps)
    angle = jnp.arccos(jnp.clip(obj_ray[..., 2:3], -1.0, 1.0))
    cam_ray = jnp.asarray([0.0, 0.0, 1.0], dtype=translation.dtype)
    axis = jnp.cross(jnp.broadcast_to(cam_ray, obj_ray.shape), obj_ray)
    axis = axis / safe_norm(axis, eps=eps)
    q = jnp.concatenate([jnp.cos(angle / 2.0), axis * jnp.sin(angle / 2.0)], axis=-1)
    return _mm(quat_to_mat(q), rot_allo)


def ego_to_allo_mat(translation: jnp.ndarray, rot_ego: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Inverse correction (egocentric_to_allocentric, core/utils/utils.py:98)."""
    obj_ray = translation / safe_norm(translation, eps=eps)
    angle = jnp.arccos(jnp.clip(obj_ray[..., 2:3], -1.0, 1.0))
    cam_ray = jnp.asarray([0.0, 0.0, 1.0], dtype=translation.dtype)
    axis = jnp.cross(jnp.broadcast_to(cam_ray, obj_ray.shape), obj_ray)
    axis = axis / safe_norm(axis, eps=eps)
    q = jnp.concatenate([jnp.cos(-angle / 2.0), axis * jnp.sin(-angle / 2.0)], axis=-1)
    return _mm(quat_to_mat(q), rot_ego)


# rotation distance (also used by losses/rot_loss)

def angular_distance_mat(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """(1 - (tr(R1 R2^T) - 1)/2) / 2 in [0, 1]; reference
    angular_distance_rot (core/gdrn_modeling/losses/rot_loss.py:26)."""
    tr = jnp.trace(_mm(r1, jnp.swapaxes(r2, -1, -2)), axis1=-2, axis2=-1)
    return (3.0 - tr) / 4.0


def angular_distance_quat(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """1 - <q1,q2>^2 in [0, 1] (rot_loss.py:16)."""
    return 1.0 - jnp.square(jnp.sum(q1 * q2, axis=-1))


def rot_angle_deg(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between rotations in degrees (pose_error.re,
    lib/pysixd/pose_error.py:400)."""
    tr = jnp.trace(_mm(r1, jnp.swapaxes(r2, -1, -2)), axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))
