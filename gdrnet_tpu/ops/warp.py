"""ROI crop / affine warp / coordinate maps / region assignment.

TPU-native replacement for the reference's cv2-based ROI pipeline
(core/utils/data_utils.py:80-250). The reference builds a CenterNet-style
affine from 3 point pairs and calls cv2.warpAffine per instance on CPU
workers; that transform is a *similarity* (uniform scale dst_w/src_w, rotation
``rot``, recentering), so here it is computed in closed form and the warp is a
batched bilinear/nearest gather that runs under jit on device — the whole ROI
batch is cropped in one fused XLA op instead of a Python loop.

Conventions match cv2.warpAffine with borderValue=0: dst pixel (x, y) samples
the source at ``A_inv @ (x, y, 1)`` where integer coordinates are pixel
positions; out-of-bounds taps contribute 0.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# affine construction (closed form of data_utils.get_affine_transform:96-138)
# ---------------------------------------------------------------------------


def affine_params(center, scale, rot_deg, output_size, shift=(0.0, 0.0), inv=False):
    """2x3 affine mapping the (center, scale)-square to output_size.

    center (cx, cy); scale scalar or (w, h) — only w sets the zoom (the
    reference's src_w, data_utils.py:113); rot in degrees; output_size scalar
    or (w, h). Returns numpy [2, 3] equal to the reference's
    cv2.getAffineTransform result.
    """
    center = np.asarray(center, dtype=np.float64)
    if np.isscalar(scale):
        scale = (float(scale), float(scale))
    scale = np.asarray(scale, dtype=np.float64)
    if np.isscalar(output_size):
        output_size = (int(output_size), int(output_size))
    dst_w, dst_h = float(output_size[0]), float(output_size[1])

    theta = math.pi * float(rot_deg) / 180.0
    k = dst_w / scale[0]
    cs, sn = math.cos(theta), math.sin(theta)
    # forward: dst = k * R(-theta) @ (src - center - scale*shift) + (dst_w/2, dst_h/2)
    lin = k * np.array([[cs, sn], [-sn, cs]], dtype=np.float64)
    src0 = center + scale * np.asarray(shift, dtype=np.float64)
    if inv:
        lin_inv = np.linalg.inv(lin)
        t = src0 - lin_inv @ np.array([dst_w * 0.5, dst_h * 0.5])
        return np.concatenate([lin_inv, t[:, None]], axis=1).astype(np.float32)
    t = np.array([dst_w * 0.5, dst_h * 0.5]) - lin @ src0
    return np.concatenate([lin, t[:, None]], axis=1).astype(np.float32)


def affine_params_batch(centers: jnp.ndarray, scales: jnp.ndarray, output_size: int,
                        rot_deg: jnp.ndarray | None = None, inv: bool = False) -> jnp.ndarray:
    """Batched jnp version: centers [B, 2], scales [B] (square ROIs),
    optional rot [B] degrees -> [B, 2, 3] forward (or inverse) affines."""
    B = centers.shape[0]
    scales = scales.reshape(B)
    theta = jnp.zeros(B, centers.dtype) if rot_deg is None else jnp.radians(rot_deg)
    k = output_size / scales
    cs, sn = jnp.cos(theta), jnp.sin(theta)
    if inv:
        # src = (1/k) R(theta) (dst - dst0) + center
        r00, r01 = cs / k, -sn / k
        r10, r11 = sn / k, cs / k
        d0 = output_size * 0.5
        t0 = centers[:, 0] - (r00 * d0 + r01 * d0)
        t1 = centers[:, 1] - (r10 * d0 + r11 * d0)
    else:
        r00, r01 = k * cs, k * sn
        r10, r11 = -k * sn, k * cs
        t0 = output_size * 0.5 - (r00 * centers[:, 0] + r01 * centers[:, 1])
        t1 = output_size * 0.5 - (r10 * centers[:, 0] + r11 * centers[:, 1])
    row0 = jnp.stack([r00, r01, t0], axis=-1)
    row1 = jnp.stack([r10, r11, t1], axis=-1)
    return jnp.stack([row0, row1], axis=1)


def affine_apply(pts: jnp.ndarray, M: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 2, 3] affine to [..., N, 2] points
    (ref affine_transform, data_utils.py:141)."""
    return jnp.einsum("...ij,...nj->...ni", M[..., :2], pts, precision="highest") + M[..., None, :, 2]


# ---------------------------------------------------------------------------
# batched device warp
# ---------------------------------------------------------------------------


def _gather_hw(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """img [H, W, C], integer xs/ys [h, w] -> [h, w, C], 0 outside."""
    H, W = img.shape[0], img.shape[1]
    inb = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    xc = jnp.clip(xs, 0, W - 1)
    yc = jnp.clip(ys, 0, H - 1)
    vals = img[yc, xc]
    return jnp.where(inb[..., None], vals, 0)


def _warp_one(img: jnp.ndarray, M_inv: jnp.ndarray, out_hw: tuple[int, int],
              interp: str) -> jnp.ndarray:
    oh, ow = out_hw
    dy, dx = jnp.mgrid[0:oh, 0:ow]
    dx = dx.astype(jnp.float32)
    dy = dy.astype(jnp.float32)
    sx = M_inv[0, 0] * dx + M_inv[0, 1] * dy + M_inv[0, 2]
    sy = M_inv[1, 0] * dx + M_inv[1, 1] * dy + M_inv[1, 2]
    if interp == "nearest":
        xs = jnp.round(sx).astype(jnp.int32)
        ys = jnp.round(sy).astype(jnp.int32)
        return _gather_hw(img, xs, ys)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    v00 = _gather_hw(img, x0i, y0i).astype(jnp.float32)
    v01 = _gather_hw(img, x0i + 1, y0i).astype(jnp.float32)
    v10 = _gather_hw(img, x0i, y0i + 1).astype(jnp.float32)
    v11 = _gather_hw(img, x0i + 1, y0i + 1).astype(jnp.float32)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def warp_affine_batch(imgs: jnp.ndarray, M_inv: jnp.ndarray, out_hw: tuple[int, int],
                      interp: str = "bilinear",
                      axis_aligned: bool = False) -> jnp.ndarray:
    """Batched inverse-map affine warp: imgs [B, H, W, C], M_inv [B, 2, 3]
    (dst->src), returns [B, oh, ow, C]. Device-side replacement for per-ROI
    cv2.warpAffine (data_utils.crop_resize_by_warp_affine:80-93).

    axis_aligned=True asserts M_inv has zero off-diagonals (every crop in the
    pipeline: DZI/test ROIs never rotate) and routes bilinear through the
    separable MXU formulation — two interpolation matmuls instead of 4
    gathers, ~100x faster on TPU for 256^2 crops from full frames (gathers
    don't vectorize on the VPU; see docs/performance.md)."""
    if axis_aligned:
        return _warp_separable_batch(imgs, M_inv, out_hw, interp)
    return jax.vmap(lambda im, m: _warp_one(im, m, out_hw, interp))(imgs, M_inv)


def _interp_matrix(scale: jnp.ndarray, offset: jnp.ndarray, out_n: int,
                   src_n: int, interp: str) -> jnp.ndarray:
    """[B, out_n, src_n] sampling matrix for s = scale*o + offset per batch
    row; out-of-range taps get weight 0 (cv2 borderValue=0). bilinear = two
    weighted taps; nearest = one exact selection tap (round, like the gather
    path)."""
    o = jnp.arange(out_n, dtype=jnp.float32)
    s = scale[:, None] * o[None, :] + offset[:, None]          # [B, out_n]
    if interp == "nearest":
        # one_hot yields all-zero rows for out-of-range indices
        return jax.nn.one_hot(jnp.round(s).astype(jnp.int32), src_n,
                              dtype=jnp.float32)
    lo = jnp.floor(s)
    w = (s - lo).astype(jnp.float32)
    lo_i = lo.astype(jnp.int32)
    return (jax.nn.one_hot(lo_i, src_n, dtype=jnp.float32) * (1.0 - w)[..., None]
            + jax.nn.one_hot(lo_i + 1, src_n, dtype=jnp.float32) * w[..., None])


def _warp_separable_batch(imgs: jnp.ndarray, M_inv: jnp.ndarray,
                          out_hw: tuple[int, int],
                          interp: str = "bilinear") -> jnp.ndarray:
    oh, ow = out_hw
    B, H, W = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    R = _interp_matrix(M_inv[:, 1, 1], M_inv[:, 1, 2], oh, H, interp)
    C = _interp_matrix(M_inv[:, 0, 0], M_inv[:, 0, 2], ow, W, interp)
    tmp = jnp.einsum("boh,bhwc->bowc", R, imgs.astype(jnp.float32),
                     precision="highest")
    return jnp.einsum("bowc,bpw->bopc", tmp, C, precision="highest")


def crop_resize_batch(imgs: jnp.ndarray, centers: jnp.ndarray, scales: jnp.ndarray,
                      out_size: int, interp: str = "bilinear") -> jnp.ndarray:
    """Crop square ROIs (centers [B, 2], scales [B]) from imgs [B, H, W, C]
    and resize to out_size (no rotation -> separable MXU path for bilinear)."""
    M_inv = affine_params_batch(centers, scales, out_size, inv=True)
    return warp_affine_batch(imgs, M_inv, (out_size, out_size), interp=interp,
                             axis_aligned=True)


def crop_resize_from_single_image(img: jnp.ndarray, centers: jnp.ndarray,
                                  scales: jnp.ndarray, out_size: int,
                                  interp: str = "bilinear") -> jnp.ndarray:
    """All ROIs of one image [H, W, C] -> [B, out, out, C] (the test-time
    layout, data_loader.py:389-451, without replicating the image)."""
    M_inv = affine_params_batch(centers, scales, out_size, inv=True)
    return jax.vmap(lambda m: _warp_one(img, m, (out_size, out_size), interp))(M_inv)


# ---------------------------------------------------------------------------
# coordinate maps & region assignment
# ---------------------------------------------------------------------------


def get_2d_coord(width: int, height: int, low: float = 0.0, high: float = 1.0,
                 fmt: str = "HWC", dtype=jnp.float32) -> jnp.ndarray:
    """Normalized pixel-coordinate map (ref get_2d_coord_np,
    data_utils.py:222-241). Returns [H, W, 2] (HWC) or [2, H, W] (CHW)."""
    x = jnp.linspace(low, high, width, dtype=dtype)
    y = jnp.linspace(low, high, height, dtype=dtype)
    xm, ym = jnp.meshgrid(x, y)
    xy = jnp.stack([xm, ym], axis=-1)
    return xy if fmt == "HWC" else jnp.moveaxis(xy, -1, 0)


def xyz_to_region(xyz: jnp.ndarray, fps_points: jnp.ndarray) -> jnp.ndarray:
    """Nearest-FPS-anchor region labels. xyz [..., H, W, 3] object-frame
    coords (0 = background), fps_points [..., F, 3] -> int32 [..., H, W] in
    {0..F} where 0 = bg. Ref xyz_to_region (data_utils.py:213-220)."""
    mask = jnp.any(xyz != 0, axis=-1)
    d2 = jnp.sum(
        jnp.square(xyz[..., None, :] - fps_points[..., None, None, :, :]), axis=-1
    )  # [..., H, W, F]
    region = jnp.argmin(d2, axis=-1).astype(jnp.int32) + 1
    return jnp.where(mask, region, 0)


def mask_from_xyz(xyz: jnp.ndarray) -> jnp.ndarray:
    """Visible-object mask from an XYZ map (nonzero anywhere), float32.
    Ref data_loader.py:468 (mask_obj = (x!=0)|(y!=0)|(z!=0))."""
    return jnp.any(xyz != 0, axis=-1).astype(jnp.float32)
