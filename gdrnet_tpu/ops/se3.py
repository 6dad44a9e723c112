"""SE(3) / homogeneous-transform utilities (batched jnp).

Covers the reference's lib/pysixd/transform.py + RT_transform.py surface
that the framework actually uses: compose/invert rigid transforms, RT <->
4x4, pose interpolation, random rotations, and pose blending. Fresh batched
implementations (the reference files are a ~1.9k-line general homogeneous-
matrix library; the pose-estimation subset is what matters here).
"""

from __future__ import annotations

import jax.numpy as jnp

from gdrnet_tpu.ops import rotation as R_ops


def rt_to_mat4(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3], [..., 3] -> [..., 4, 4]."""
    batch = R.shape[:-2]
    m = jnp.zeros(batch + (4, 4), R.dtype)
    m = m.at[..., :3, :3].set(R)
    m = m.at[..., :3, 3].set(t)
    return m.at[..., 3, 3].set(1.0)


def mat4_to_rt(m: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    return m[..., :3, :3], m[..., :3, 3]


def se3_mul(R1, t1, R2, t2):
    """(R1, t1) ∘ (R2, t2): first apply 2 then 1 (reference se3_mul,
    lib/pysixd/RT_transform.py)."""
    R = jnp.matmul(R1, R2, precision="highest")
    t = jnp.einsum("...ij,...j->...i", R1, t2, precision="highest") + t1
    return R, t


def se3_inverse(R, t):
    """Inverse rigid transform: (R^T, -R^T t)."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision="highest")


def relative_pose(R_src, t_src, R_tgt, t_tgt):
    """Delta pose taking src to tgt: tgt = delta ∘ src (reference
    calc_RT_delta, RT_transform.py)."""
    R_inv, t_inv = se3_inverse(R_src, t_src)
    return se3_mul(R_tgt, t_tgt, R_inv, t_inv)


def interpolate_poses(R1, t1, R2, t2, alpha):
    """Geodesic interpolation between two poses (quaternion slerp + linear
    translation), alpha in [0, 1]."""
    q1 = R_ops.mat_to_quat(R1)
    q2 = R_ops.mat_to_quat(R2)
    # shortest arc
    dot = jnp.sum(q1 * q2, axis=-1, keepdims=True)
    q2 = jnp.where(dot < 0, -q2, q2)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.maximum(jnp.sin(theta), 1e-7)
    w1 = jnp.sin((1 - alpha) * theta) / sin_theta
    w2 = jnp.sin(alpha * theta) / sin_theta
    # fall back to lerp for tiny angles
    small = theta[..., 0] < 1e-4
    q = jnp.where(small[..., None], (1 - alpha) * q1 + alpha * q2,
                  w1 * q1 + w2 * q2)
    q = R_ops.normalize_vector(q)
    return R_ops.quat_to_mat(q), (1 - alpha) * t1 + alpha * t2


def random_rotations(key, n: int) -> jnp.ndarray:
    """Uniform random rotations via quaternion sampling (reference
    transform.random_rotation_matrix semantics, batched)."""
    import jax

    u = jax.random.uniform(key, (n, 3))
    r1 = jnp.sqrt(1 - u[:, 0])
    r2 = jnp.sqrt(u[:, 0])
    t1 = 2 * jnp.pi * u[:, 1]
    t2 = 2 * jnp.pi * u[:, 2]
    q = jnp.stack([r2 * jnp.cos(t2), r1 * jnp.sin(t1),
                   r1 * jnp.cos(t1), r2 * jnp.sin(t2)], axis=-1)
    return R_ops.quat_to_mat(q)
