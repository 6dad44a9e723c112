"""Farthest point sampling — TPU-native replacement for the reference C++
cffi extension (core/csrc/fps/src/farthest_point_sampling.cpp:77-186,
wrapper core/csrc/fps/fps_utils.py:6-21).

The O(KN) iterative max-min loop maps to a K-step ``lax.scan`` whose body is
one fused distance update + argmax over all N points — each step is pure VPU
work on a [N, 3] block, so the whole sampling jit-compiles and vmaps over
batches of point clouds. A C++ host tool with identical semantics lives in
gdrnet_tpu/csrc/fps for offline mesh preprocessing.

Semantics (init_center=True, the variant used for fps_points.pkl):
  * seed min-dist with squared distance to the bbox center ((max+min)/2)
  * first sample = farthest point from that center
  * then repeat: update min-dist, pick argmax among unselected points.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "init_center"))
def farthest_point_sampling_idx(pts: jnp.ndarray, k: int, init_center: bool = True,
                                start_idx: int = 0) -> jnp.ndarray:
    """pts [N, 3] -> int32 [k] indices of farthest-point samples."""
    n = pts.shape[0]
    if init_center:
        center = (jnp.max(pts, axis=0) + jnp.min(pts, axis=0)) * 0.5
        min_d = jnp.sum(jnp.square(pts - center), axis=-1)
        first = jnp.argmax(min_d).astype(jnp.int32)
    else:
        min_d = jnp.full((n,), jnp.inf, dtype=pts.dtype)
        first = jnp.asarray(start_idx, dtype=jnp.int32)

    def step(carry, _):
        cur, min_d = carry
        d = jnp.sum(jnp.square(pts - pts[cur]), axis=-1)
        min_d = jnp.minimum(min_d, d)
        min_d = min_d.at[cur].set(-jnp.inf)  # mask selected
        nxt = jnp.argmax(min_d).astype(jnp.int32)
        return (nxt, min_d), cur

    (_, _), idxs = jax.lax.scan(step, (first, min_d), None, length=k)
    return idxs


def farthest_point_sampling(pts, k: int, init_center: bool = True):
    """pts [N, 3] -> [k, 3] sampled points (ref fps_utils.py:6-21)."""
    pts = jnp.asarray(pts)
    idx = farthest_point_sampling_idx(pts, k, init_center=init_center)
    return pts[idx]


def get_fps_and_center(pts, num_fps: int = 8, init_center: bool = True):
    """FPS points + mean center appended — layout of fps_points.pkl entries
    (ref core/utils/data_utils.py:201-210)."""
    pts = jnp.asarray(pts)
    fps_pts = farthest_point_sampling(pts, num_fps, init_center=init_center)
    center = jnp.mean(pts, axis=0, keepdims=True)
    return jnp.concatenate([fps_pts, center], axis=0)


# native C++ twin (gdrnet_tpu/csrc/fps/fps.cpp) — OpenMP host kernel for
# offline mesh tools; same semantics as the JAX/numpy paths

def farthest_point_sampling_cpp(pts: np.ndarray, k: int, init_center: bool = True,
                                start_idx: int = 0) -> np.ndarray:
    import ctypes

    from gdrnet_tpu.csrc import load_library

    lib = load_library("fps")
    lib.fps_sample.restype = ctypes.c_int
    pts = np.ascontiguousarray(pts, np.float32)
    n = pts.shape[0]
    out = np.empty(k, np.int64)
    ret = lib.fps_sample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_int64(k), ctypes.c_int(int(init_center)),
        ctypes.c_int64(start_idx),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if ret != 0:
        raise ValueError(f"fps_sample failed: n={n}, k={k}")
    return pts[out]


# host/numpy twin (bit-exact with the C++ tool; used by offline tools when
# spinning up a TPU context is overkill)

def farthest_point_sampling_np(pts: np.ndarray, k: int, init_center: bool = True,
                               start_idx: int = 0) -> np.ndarray:
    pts = np.asarray(pts, dtype=np.float32)
    n = pts.shape[0]
    if init_center:
        center = (pts.max(0) + pts.min(0)) * 0.5
        min_d = np.square(pts - center).sum(-1)
        cur = int(np.argmax(min_d))
    else:
        min_d = np.full((n,), np.inf, dtype=np.float32)
        cur = start_idx
    idxs = np.empty((k,), dtype=np.int64)
    for i in range(k):
        idxs[i] = cur
        d = np.square(pts - pts[cur]).sum(-1)
        np.minimum(min_d, d, out=min_d)
        min_d[cur] = -np.inf
        cur = int(np.argmax(min_d))
    return pts[idxs]
