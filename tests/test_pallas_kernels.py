"""Pallas kernel tests (interpreter mode on CPU; real-TPU runs covered by the
verify drives): nn_min_dist vs scipy cKDTree goldens."""

import numpy as np
import pytest
from scipy import spatial

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def _golden(query, ref):
    out = []
    for q, r in zip(query, ref):
        d, _ = spatial.cKDTree(r).query(q, k=1)
        out.append(d.mean())
    return np.asarray(out)


def test_nn_min_dist_fallback_matches_kdtree(rng):
    from gdrnet_tpu.ops.pallas_kernels import nn_min_dist

    q = rng.randn(3, 700, 3).astype(np.float32) * 0.1
    r = rng.randn(3, 500, 3).astype(np.float32) * 0.1
    got = np.asarray(nn_min_dist(q, r))  # CPU -> jnp fallback
    np.testing.assert_allclose(got, _golden(q, r), rtol=1e-4)


def test_nn_min_dist_pallas_interpret(rng):
    """Run the actual Pallas kernel in interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu
    from gdrnet_tpu.ops.pallas_kernels import nn_min_dist_pallas

    q = rng.randn(2, 300, 3).astype(np.float32) * 0.1  # pads to 512-tile
    r = rng.randn(2, 400, 3).astype(np.float32) * 0.1
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(nn_min_dist_pallas(jnp.asarray(q), jnp.asarray(r),
                                            tile_q=128))
    np.testing.assert_allclose(got, _golden(q, r), rtol=1e-4, atol=1e-6)


def test_adi_batch_matmul_form_matches_kdtree(rng):
    """The rewritten matmul-expansion adi_batch must stay exact."""
    from gdrnet_tpu.eval.pose_errors import adi_batch

    B, N = 3, 800
    A = rng.randn(B, 3, 3)
    Q, _ = np.linalg.qr(A)
    Q = Q * np.sign(np.linalg.det(Q))[:, None, None]
    Re = Q.astype(np.float32)
    Rg = np.roll(Re, 1, axis=0)
    te = (rng.rand(B, 3) * 0.1 + [0, 0, 0.6]).astype(np.float32)
    tg = te + rng.randn(B, 3).astype(np.float32) * 0.01
    pts = ((rng.rand(N, 3) - 0.5) * 0.1).astype(np.float32)
    got = np.asarray(adi_batch(Re, te, Rg, tg, pts, chunk=256))
    pe = np.einsum("bij,nj->bni", Re, pts) + te[:, None]
    pg = np.einsum("bij,nj->bni", Rg, pts) + tg[:, None]
    want = _golden(pg, pe)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)


def test_rasterize_xyz_pallas_interpret():
    """Pallas z-buffer kernel vs the XLA scan rasterizer: exact depth + xyz
    on the cube fixture (interpreter mode on CPU)."""
    import numpy as np

    from gdrnet_tpu.ops.rasterizer import render_xyz, _pad_faces
    from gdrnet_tpu.ops.pallas_kernels import rasterize_xyz_pallas
    from test_rasterizer import make_cube, K

    v, f = make_cube(0.05)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.02, -0.01, 0.5], np.float32)
    d_ref, x_ref = render_xyz(v, f, K, R, t, height=96, width=128)
    fp = _pad_faces(f, 128)
    with pltpu.force_tpu_interpret_mode():
        d, x = rasterize_xyz_pallas(v, fp, K, R, t, height=96, width=128,
                                    tile_p=256, chunk_f=128)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x_ref))

    # with a pixel-window origin: matches the windowed XLA render
    from gdrnet_tpu.ops.rasterizer import rasterize_attr
    import jax.numpy as jnp
    d_w, x_w = rasterize_attr(
        jnp.asarray(v), jnp.asarray(v), jnp.asarray(fp),
        jnp.asarray(K), jnp.asarray(R), jnp.asarray(t),
        height=64, width=64, chunk=128,
        origin=(jnp.float32(40), jnp.float32(20)))
    with pltpu.force_tpu_interpret_mode():
        d2, x2 = rasterize_xyz_pallas(v, fp, K, R, t, height=64, width=64,
                                      origin=(jnp.float32(40), jnp.float32(20)),
                                      tile_p=256, chunk_f=128)
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d_w))
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x_w))
