"""BOP pose-error metrics, batched over [B] poses in one jit (jnp).

TPU-native replacements for lib/pysixd/pose_error.py in the reference —
the per-instance python loops + cKDTree become one batched einsum/min-reduce
program. Semantics per function docstrings (file:line citations into the
reference). vsd needs a depth renderer and is provided via the XLA rasterizer
(gdrnet_tpu.ops.rasterizer) in eval/vsd.py.

All functions take stacked [B, ...] inputs and return [B] errors; use the
same model-point array for a whole object batch (pts [N, 3]) or per-sample
points (pts [B, N, 3]).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _tp(pts, R, t):
    """[B?, N, 3] object points -> camera frame with [B, 3, 3], [B, 3]."""
    if pts.ndim == 2:
        pts = pts[None]
    return jnp.einsum("bij,bnj->bni", R, pts, precision="highest") + t[:, None, :]


@jax.jit
def add_batch(R_est, t_est, R_gt, t_gt, pts):
    """ADD (pose_error.py:297-313): mean L2 between correspondingly
    transformed model points."""
    pe = _tp(pts, R_est, t_est)
    pg = _tp(pts, R_gt, t_gt)
    return jnp.linalg.norm(pe - pg, axis=-1).mean(axis=-1)


@partial(jax.jit, static_argnames=("chunk",))
def adi_batch(R_est, t_est, R_gt, t_gt, pts, chunk: int = 1024):
    """ADD-S / ADI (pose_error.py:315-337): mean over gt points of the
    nearest-neighbor distance to the estimated point set.

    The reference's cKDTree becomes a batched min-reduce with the MXU-friendly
    expansion |a-b|^2 = |a|^2 + |b|^2 - 2 a.b — the cross term is one
    [n_gt, 3] x [3, n_est] matmul per sample instead of materializing
    [B, n_gt, n_est, 3] differences; chunking over gt points bounds the live
    [B, chunk, n_est] buffer. A Pallas kernel variant lives in
    gdrnet_tpu.ops.pallas_kernels.nn_min_dist."""
    pe = _tp(pts, R_est, t_est)  # [B, N, 3]
    pg = _tp(pts, R_gt, t_gt)
    n = pg.shape[1]
    if jax.devices()[0].platform in ("tpu", "axon") and n * 128 < 2 ** 21:
        from gdrnet_tpu.ops.pallas_kernels import nn_min_dist_pallas

        return nn_min_dist_pallas(pg, pe)
    pe_n2 = jnp.sum(jnp.square(pe), axis=-1)  # [B, N]

    def min_dists(seg):
        # seg [B, c, 3] -> [B, c] min distance to pe
        cross = jnp.einsum("bcd,bnd->bcn", seg, pe, precision="highest")
        d2 = (jnp.sum(jnp.square(seg), -1)[:, :, None] + pe_n2[:, None, :]
              - 2.0 * cross)
        return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))

    def body(i, acc):
        seg = jax.lax.dynamic_slice_in_dim(pg, i * chunk, chunk, axis=1)
        return acc + jnp.sum(min_dists(seg), axis=-1)

    n_chunks = n // chunk
    acc = jnp.zeros(pe.shape[0], pe.dtype)
    if n_chunks > 0:
        acc = jax.lax.fori_loop(0, n_chunks, body, acc)
    if n - n_chunks * chunk > 0:
        acc = acc + jnp.sum(min_dists(pg[:, n_chunks * chunk:]), axis=-1)
    return acc / n


@jax.jit
def re_batch(R_est, R_gt):
    """Geodesic rotation error in degrees (pose_error.re:400-423)."""
    tr = jnp.einsum("bij,bij->b", R_est, R_gt, precision="highest")
    cos = jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


@jax.jit
def te_batch(t_est, t_gt):
    """Translation error (pose_error.te:425-437)."""
    return jnp.linalg.norm(t_est - t_gt, axis=-1)


@jax.jit
def proj_batch(R_est, t_est, R_gt, t_gt, K, pts):
    """Mean 2D projection error in px (pose_error.proj/arp_2d:439-464)."""
    pe = _tp(pts, R_est, t_est)
    pg = _tp(pts, R_gt, t_gt)

    def proj2d(p):
        uvw = jnp.einsum("bij,bnj->bni", K, p, precision="highest")
        return uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-12)

    return jnp.linalg.norm(proj2d(pe) - proj2d(pg), axis=-1).mean(axis=-1)


@jax.jit
def mssd_batch(R_est, t_est, R_gt, t_gt, pts, sym_rots, sym_mask):
    """Maximum symmetry-aware surface distance (pose_error.mssd:131-154):
    min over symmetry transforms of the MAX point distance. sym_rots
    [B, K, 3, 3] identity-padded, sym_mask [B, K]."""
    pe = _tp(pts, R_est, t_est)  # [B, N, 3]
    if pts.ndim == 2:
        pts = jnp.broadcast_to(pts[None], (R_est.shape[0],) + pts.shape)
    # gt pose composed with each symmetry: R_gt @ S_k
    Rk = jnp.einsum("bij,bkjl->bkil", R_gt, sym_rots, precision="highest")
    pg = jnp.einsum("bkij,bnj->bkni", Rk, pts, precision="highest") + t_gt[:, None, None, :]
    maxd = jnp.max(jnp.linalg.norm(pe[:, None] - pg, axis=-1), axis=-1)  # [B, K]
    maxd = jnp.where(sym_mask, maxd, jnp.inf)
    return jnp.min(maxd, axis=-1)


@jax.jit
def mspd_batch(R_est, t_est, R_gt, t_gt, K, pts, sym_rots, sym_mask):
    """Maximum symmetry-aware projection distance (pose_error.mspd:156-182)."""
    pe = _tp(pts, R_est, t_est)
    uvw = jnp.einsum("bij,bnj->bni", K, pe, precision="highest")
    proj_e = uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-12)
    if pts.ndim == 2:
        pts = jnp.broadcast_to(pts[None], (R_est.shape[0],) + pts.shape)
    Rk = jnp.einsum("bij,bkjl->bkil", R_gt, sym_rots, precision="highest")
    pg = jnp.einsum("bkij,bnj->bkni", Rk, pts, precision="highest") + t_gt[:, None, None, :]
    uvwg = jnp.einsum("bij,bknj->bkni", K, pg, precision="highest")
    proj_g = uvwg[..., :2] / jnp.maximum(uvwg[..., 2:3], 1e-12)
    maxd = jnp.max(jnp.linalg.norm(proj_e[:, None] - proj_g, axis=-1), axis=-1)
    maxd = jnp.where(sym_mask, maxd, jnp.inf)
    return jnp.min(maxd, axis=-1)


@jax.jit
def adi_sym_batch(R_est, t_est, R_gt, t_gt, pts, sym_rots, sym_mask):
    """ADD with the closest symmetric gt rotation — the evaluator's
    sym-object path (gdrn_custom_evaluator.py:565-575 uses get_closest_rot
    for re/proj and adi for ad). Returns (closest R_gt [B,3,3])."""
    from gdrnet_tpu.ops.symmetry import get_closest_rot_batch

    return get_closest_rot_batch(R_est, R_gt, sym_rots, sym_mask)


@jax.jit
def cou_mask_batch(mask_est, mask_gt):
    """Complement-over-Union of binary masks (pose_error.py:466-485), batched
    over [B, H, W]. Empty-union samples score 1.0 like the reference."""
    me = mask_est.astype(bool).reshape(mask_est.shape[0], -1)
    mg = mask_gt.astype(bool).reshape(mask_gt.shape[0], -1)
    inter = jnp.sum(me & mg, axis=-1).astype(jnp.float32)
    union = jnp.sum(me | mg, axis=-1).astype(jnp.float32)
    return jnp.where(union > 0, 1.0 - inter / jnp.maximum(union, 1.0), 1.0)


@jax.jit
def cou_bb_batch(bb_est, bb_gt):
    """Complement-over-Union of 2D xywh boxes (pose_error.py:534-544 via
    misc.iou, misc.py:809-837), batched over [B, 4]."""
    tl = jnp.maximum(bb_est[:, :2], bb_gt[:, :2])
    br = jnp.minimum(bb_est[:, :2] + bb_est[:, 2:], bb_gt[:, :2] + bb_gt[:, 2:])
    wh = br - tl
    inter = jnp.where(jnp.all(wh > 0, axis=-1), wh[:, 0] * wh[:, 1], 0.0)
    area = bb_est[:, 2] * bb_est[:, 3] + bb_gt[:, 2] * bb_gt[:, 3] - inter
    return 1.0 - inter / jnp.maximum(area, 1e-12)


# ---------------------------------------------------------------------------
# score aggregation
# ---------------------------------------------------------------------------


def vocap_auc(errors: np.ndarray, max_val: float = 0.1) -> float:
    """AUC of the error-recall curve up to max_val (YCB-Video VOCap — the
    reference's AUCadd/AUCadi/AUCad metrics, eval_pose_results_more.py:79-83,
    computed as in pysixd scripts' ycbv AUC)."""
    errors = np.sort(np.asarray(errors, np.float64))
    n = len(errors)
    if n == 0:
        return 0.0
    rec = np.arange(1, n + 1) / n
    # clip errors at max_val; integrate recall over error
    valid = errors < max_val
    if not np.any(valid):
        return 0.0
    e = np.concatenate([[0.0], errors[valid], [max_val]])
    r = np.concatenate([[0.0], rec[valid], [rec[valid][-1]]])
    return float(np.trapezoid(r, e) / max_val)


def recall_at(errors: np.ndarray, threshold: float) -> float:
    errors = np.asarray(errors)
    if errors.size == 0:
        return 0.0
    return float(np.mean(errors < threshold))
