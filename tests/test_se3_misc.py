"""SE(3) utilities + SSD aug + precise-BN tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gdrnet_tpu.ops.se3 import (
    rt_to_mat4, mat4_to_rt, se3_mul, se3_inverse, relative_pose,
    interpolate_poses, random_rotations)


def _rand_rt(rng, n):
    A = rng.randn(n, 3, 3)
    Q, _ = np.linalg.qr(A)
    Q = Q * np.sign(np.linalg.det(Q))[:, None, None]
    return Q.astype(np.float32), rng.rand(n, 3).astype(np.float32)


def test_se3_roundtrip_and_inverse(rng):
    R, t = _rand_rt(rng, 4)
    m = rt_to_mat4(R, t)
    R2, t2 = mat4_to_rt(m)
    np.testing.assert_allclose(R2, R)
    np.testing.assert_allclose(t2, t)
    Ri, ti = se3_inverse(R, t)
    Rc, tc = se3_mul(Ri, ti, R, t)
    np.testing.assert_allclose(Rc, np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(tc, 0, atol=1e-5)


def test_relative_pose(rng):
    R1, t1 = _rand_rt(rng, 3)
    R2, t2 = _rand_rt(rng, 3)
    Rd, td = relative_pose(R1, t1, R2, t2)
    Rc, tc = se3_mul(Rd, td, R1, t1)
    np.testing.assert_allclose(Rc, R2, atol=1e-5)
    np.testing.assert_allclose(tc, t2, atol=1e-5)


def test_interpolate_poses_endpoints(rng):
    R1, t1 = _rand_rt(rng, 3)
    R2, t2 = _rand_rt(rng, 3)
    R0, t0 = interpolate_poses(R1, t1, R2, t2, 0.0)
    np.testing.assert_allclose(np.abs(np.einsum("bij,bij->b", R0, R1)), 3.0, atol=1e-4)
    np.testing.assert_allclose(t0, t1, atol=1e-5)
    Rh, th = interpolate_poses(R1, t1, R2, t2, 0.5)
    # midpoint is a valid rotation
    rtr = np.einsum("bij,bkj->bik", Rh, Rh)
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (3, 1, 1)), atol=1e-4)


def test_random_rotations_valid():
    R = np.asarray(random_rotations(jax.random.PRNGKey(0), 16))
    rtr = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_ssd_aug(rng):
    from gdrnet_tpu.data.augment import build_color_augmentor

    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    out = build_color_augmentor("SSD")(img, np.random.RandomState(1))
    assert out.shape == img.shape and out.dtype == np.uint8


def test_precise_bn(rng):
    import flax.linen as nn
    from gdrnet_tpu.engine.precise_bn import update_bn_stats

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)

    m = M()
    x0 = jnp.asarray(rng.randn(8, 4).astype(np.float32) * 2 + 3)
    variables = m.init(jax.random.PRNGKey(0), x0)
    batches = [{"roi_img": x0} for _ in range(5)]
    out = update_bn_stats(m, variables, batches, num_iters=5)
    # true average of per-batch stats == the batch stats of x0 itself
    np.testing.assert_allclose(out["batch_stats"]["BatchNorm_0"]["mean"],
                               np.mean(np.asarray(x0), 0), atol=1e-4)
    np.testing.assert_allclose(out["batch_stats"]["BatchNorm_0"]["var"],
                               np.var(np.asarray(x0), 0), rtol=2e-2)
