"""Batched EPnP + RANSAC + Gauss-Newton pose refinement, fully on device.

The reference's PnP post-processing runs cv2.solvePnP / solvePnPRansac once
per ROI on host CPU (core/gdrn_modeling/gdrn_evaluator.py:187-435 and
lib/pysixd/misc.py pnp_v2 :145-196) — its eval-time CPU hot spot by design.
Here the whole ROI bucket solves as ONE jitted XLA program:

  * weighted EPnP (Lepetit et al.): PCA control points, barycentric lift,
    null-space of the 12x12 normal matrix via eigh, betas from the three
    cv2-style approximations + Gauss-Newton on the control-point distance
    residuals, absolute orientation by weighted Kabsch;
  * fixed-iteration RANSAC with Gumbel-top-k minimal sets (static shapes —
    the padded correspondence set carries a weight per point, so invalid /
    masked-out pixels never enter a hypothesis or an inlier count);
  * Levenberg-Marquardt polish on reprojection error (the cv2 ITERATIVE
    equivalent) for the net-initialized refinement mode.

All geometry matmuls use precision="highest" (TPU bf16 default is not
accurate enough for pose math). Agreement with the cv2 host path is tested
in tests/test_device_pnp.py; the tester routes through this module when
TEST.DEVICE_PNP is on.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gdrnet_tpu.ops.rotation import skew, so3_exp

_HI = "highest"
# the 6 unordered control-point pairs (i < j) of the 4 EPnP control points
# (numpy on purpose: no backend init at import time)
_PAIRS_I = np.array([0, 0, 0, 1, 1, 2])
_PAIRS_J = np.array([1, 2, 3, 2, 3, 3])


def _project(R, t, p3, K):
    """[3,3],[3],[N,3],[3,3] -> pixel coords [N,2] and depth [N]."""
    pc = jnp.einsum("ij,nj->ni", R, p3, precision=_HI) + t
    z = jnp.maximum(jnp.abs(pc[:, 2]), 1e-9) * jnp.sign(
        jnp.where(pc[:, 2] == 0, 1.0, pc[:, 2]))
    u = K[0, 0] * pc[:, 0] / z + K[0, 2]
    v = K[1, 1] * pc[:, 1] / z + K[1, 2]
    return jnp.stack([u, v], axis=1), pc[:, 2]


def reprojection_errors(R, t, p3, p2, K):
    """Per-point pixel reprojection error [N]; points behind the camera get
    a large error so they never count as inliers."""
    uv, z = _project(R, t, p3, K)
    err = jnp.linalg.norm(uv - p2, axis=1)
    return jnp.where(z > 1e-6, err, 1e6)


def _kabsch(src, dst, w):
    """Weighted absolute orientation: R, t with dst ~= R @ src + t."""
    sw = jnp.maximum(jnp.sum(w), 1e-9)
    mu_s = jnp.einsum("n,ni->i", w, src, precision=_HI) / sw
    mu_d = jnp.einsum("n,ni->i", w, dst, precision=_HI) / sw
    H = jnp.einsum("ni,nj->ij", (src - mu_s) * w[:, None], dst - mu_d,
                   precision=_HI)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(jnp.matmul(Vt.T, U.T, precision=_HI)))
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
    R = jnp.matmul(jnp.matmul(Vt.T, S, precision=_HI), U.T, precision=_HI)
    return R, mu_d - jnp.matmul(R, mu_s, precision=_HI)


def _betas_approx(LL, rho):
    """The three cv2 beta initializations (epnp.cpp find_betas_approx_{1,2,3}).

    LL [6,10] are the quadratic terms b_kl = v_k . v_l of the pairwise
    control-point differences for the 4 null-space vectors, columns ordered
    [b11,b12,b22,b13,b23,b33,b14,b24,b34,b44]; rho [6] the squared world
    distances. Returns [3,4] candidate betas."""
    # case 1: unknowns [b11, b12, b13, b14]
    L1 = LL[:, jnp.array([0, 1, 3, 6])]
    x1 = jnp.linalg.lstsq(L1, rho)[0]
    b1 = jnp.sqrt(jnp.abs(x1[0]))
    c1 = jnp.where(x1[0] < 0, -1.0, 1.0)
    betas1 = jnp.array([1.0, 0.0, 0.0, 0.0]) * b1 * c1 + jnp.where(
        x1[0] != 0,
        jnp.array([0.0, 1.0, 1.0, 1.0]) * jnp.concatenate(
            [jnp.zeros(1), x1[1:] / jnp.where(b1 * c1 == 0, 1.0, b1 * c1)]),
        0.0)
    # case 2: unknowns [b11, b12, b22]
    L2 = LL[:, jnp.array([0, 1, 2])]
    x2 = jnp.linalg.lstsq(L2, rho)[0]
    s2 = jnp.where((x2[0] < 0) & (x2[2] < 0), -1.0, 1.0)
    y11, y12, y22 = x2[0] * s2, x2[1], x2[2] * s2
    b21 = jnp.sqrt(jnp.maximum(y11, 0.0))
    b22_ = jnp.sqrt(jnp.maximum(y22, 0.0)) * jnp.where(y12 < 0, -1.0, 1.0)
    betas2 = jnp.array([0.0, 0.0, 0.0, 0.0]).at[0].set(b21).at[1].set(b22_)
    # case 3: unknowns [b11, b12, b22, b13, b23]
    L3 = LL[:, jnp.array([0, 1, 2, 3, 4])]
    x3 = jnp.linalg.lstsq(L3, rho)[0]
    s3 = jnp.where((x3[0] < 0) & (x3[2] < 0), -1.0, 1.0)
    z11, z12, z22 = x3[0] * s3, x3[1], x3[2] * s3
    b31 = jnp.sqrt(jnp.maximum(z11, 0.0))
    b32 = jnp.sqrt(jnp.maximum(z22, 0.0)) * jnp.where(z12 < 0, -1.0, 1.0)
    b33 = jnp.where(b31 > 1e-12, x3[3] / jnp.maximum(b31, 1e-12), 0.0)
    betas3 = jnp.zeros(4).at[0].set(b31).at[1].set(b32).at[2].set(b33)
    return jnp.stack([betas1, betas2, betas3])


def _gauss_newton_betas(betas, dv, rho, iters: int = 8):
    """Refine betas so || sum_k beta_k dv[k,pair] ||^2 matches rho.

    dv [4, 6, 3] null-space control-point pair differences; betas [4]."""

    def step(_, b):
        x = jnp.einsum("k,kpi->pi", b, dv, precision=_HI)    # [6,3]
        e = rho - jnp.sum(x * x, axis=1)                      # residuals [6]
        J = 2.0 * jnp.einsum("pi,kpi->pk", x, dv, precision=_HI)  # [6,4]
        JtJ = jnp.matmul(J.T, J, precision=_HI) + 1e-9 * jnp.eye(4)
        return b + jnp.linalg.solve(JtJ, jnp.matmul(J.T, e, precision=_HI))

    return jax.lax.fori_loop(0, iters, step, betas)


def weighted_epnp(p3, p2, K, w):
    """Weighted EPnP: [N,3] object points, [N,2] pixels, [3,3] K, [N] weights
    (0 = padded/ignored) -> (R [3,3], t [3]). Needs >= 4 effective points and
    non-degenerate (non-collinear) geometry; callers guard via the weight sum
    and the returned reprojection error."""
    p3 = p3.astype(jnp.float32)
    p2 = p2.astype(jnp.float32)
    w = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.sum(w), 1e-9)
    mu = jnp.einsum("n,ni->i", w, p3, precision=_HI) / sw
    A = p3 - mu
    cov = jnp.einsum("ni,nj->ij", A * w[:, None], A, precision=_HI) / sw
    lam, V = jnp.linalg.eigh(cov)                      # ascending
    lam = jnp.maximum(lam, jnp.maximum(lam[2] * 1e-8, 1e-12))
    basis = V * jnp.sqrt(lam)[None, :]                 # columns c_i - c0
    ctrl = jnp.concatenate([mu[None], mu[None] + basis.T])  # [4,3]
    a123 = jnp.linalg.solve(basis, A.T).T              # [N,3]
    alphas = jnp.concatenate([1.0 - jnp.sum(a123, 1, keepdims=True), a123], 1)

    fu, fv, uc, vc = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    au = jnp.stack([jnp.full_like(p2[:, 0], fu), jnp.zeros_like(p2[:, 0]),
                    uc - p2[:, 0]], axis=1)            # [N,3]
    av = jnp.stack([jnp.zeros_like(p2[:, 1]), jnp.full_like(p2[:, 1], fv),
                    vc - p2[:, 1]], axis=1)
    Ru = (alphas[:, :, None] * au[:, None, :]).reshape(-1, 12)
    Rv = (alphas[:, :, None] * av[:, None, :]).reshape(-1, 12)
    MtM = (jnp.einsum("ni,nj->ij", Ru * w[:, None], Ru, precision=_HI)
           + jnp.einsum("ni,nj->ij", Rv * w[:, None], Rv, precision=_HI))
    _, evec = jnp.linalg.eigh(MtM)
    Vn = evec[:, :4].T.reshape(4, 4, 3)                # [k, ctrl, xyz]

    dv = Vn[:, _PAIRS_I, :] - Vn[:, _PAIRS_J, :]       # [4, 6, 3]
    dw = ctrl[_PAIRS_I] - ctrl[_PAIRS_J]
    rho = jnp.sum(dw * dw, axis=1)                     # [6]
    # quadratic terms of ||sum beta_k dv_k||^2, cv2 column order
    kk = jnp.array([0, 0, 1, 0, 1, 2, 0, 1, 2, 3])
    ll = jnp.array([0, 1, 1, 2, 2, 2, 3, 3, 3, 3])
    dots = jnp.einsum("kpi,lpi->pkl", dv, dv, precision=_HI)  # [6,4,4]
    LL = dots[:, kk, ll] * jnp.where(kk == ll, 1.0, 2.0)

    def solve_case(b0):
        b = _gauss_newton_betas(b0, dv, rho)
        x_ctrl = jnp.einsum("k,kci->ci", b, Vn, precision=_HI)  # [4,3]
        pc = jnp.einsum("nc,ci->ni", alphas, x_ctrl, precision=_HI)
        flip = jnp.where(jnp.einsum("n,n->", w, pc[:, 2]) < 0, -1.0, 1.0)
        R, t = _kabsch(p3, pc * flip, w)
        err = jnp.einsum(
            "n,n->", w, reprojection_errors(R, t, p3, p2, K)) / sw
        return R, t, err

    Rs, ts, errs = jax.vmap(solve_case)(_betas_approx(LL, rho))
    best = jnp.argmin(errs)
    return Rs[best], ts[best], errs[best]


def refine_pose_lm(R0, t0, p3, p2, K, w, iters: int = 10):
    """Levenberg-Marquardt on weighted reprojection error from (R0, t0) —
    the cv2.solvePnP ITERATIVE / useExtrinsicGuess equivalent. Left-increment
    parameterization R <- exp(skew(dw)) @ R. Returns (R, t)."""
    p3 = p3.astype(jnp.float32)
    p2 = p2.astype(jnp.float32)
    w = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.sum(w), 1e-9)
    fu, fv = K[0, 0], K[1, 1]

    def cost(R, t):
        uv, z = _project(R, t, p3, K)
        r = (uv - p2) * jnp.sqrt(w)[:, None]
        return jnp.sum(r * r) / sw, (uv, z)

    def step(carry, _):
        R, t, lam = carry
        c0, (uv, z) = cost(R, t)
        pc = jnp.einsum("ij,nj->ni", R, p3, precision=_HI) + t
        zs = jnp.maximum(jnp.abs(pc[:, 2]), 1e-9)
        # d(uv)/d(pc): [N,2,3]
        Ju = jnp.stack([fu / zs, jnp.zeros_like(zs),
                        -fu * pc[:, 0] / (zs * zs)], axis=1)
        Jv = jnp.stack([jnp.zeros_like(zs), fv / zs,
                        -fv * pc[:, 1] / (zs * zs)], axis=1)
        Jp = jnp.stack([Ju, Jv], axis=1)
        # d(pc)/d(dw, dt) = [-skew(pc - t) ... wait: left increment moves
        # R p -> (I + skew(dw)) R p, so d(pc)/d(dw) = -skew(R p) = -skew(pc-t)
        Rp = pc - t
        Jw = -jax.vmap(skew)(Rp)                       # [N,3,3]
        Jt = jnp.broadcast_to(jnp.eye(3), Rp.shape[:1] + (3, 3))
        Jx = jnp.concatenate([Jw, Jt], axis=2)         # [N,3,6]
        J = jnp.einsum("nij,njk->nik", Jp, Jx, precision=_HI)  # [N,2,6]
        r = (uv - p2)                                  # [N,2]
        JtJ = jnp.einsum("nik,n,nil->kl", J, w, J, precision=_HI)
        Jtr = jnp.einsum("nik,n,ni->k", J, w, r, precision=_HI)
        dx = jnp.linalg.solve(JtJ + lam * jnp.eye(6), -Jtr)
        R_new = jnp.matmul(so3_exp(dx[:3]), R, precision=_HI)
        t_new = t + dx[3:]
        c1, _ = cost(R_new, t_new)
        ok = c1 < c0
        return (jnp.where(ok, R_new, R), jnp.where(ok, t_new, t),
                jnp.where(ok, lam * 0.5, lam * 4.0)), None

    (R, t, _), _ = jax.lax.scan(step, (R0.astype(jnp.float32),
                                       t0.astype(jnp.float32),
                                       jnp.float32(1e-3)),
                                None, length=iters)
    return R, t


def ransac_epnp(key, p3, p2, K, w, n_hyp: int = 128, sample_size: int = 6,
                reproj_thr: float = 3.0, refine: bool = True):
    """Fixed-iteration RANSAC-EPnP (cv2.solvePnPRansac flags=EPNP semantics,
    reprojectionError default 3 px). Static shapes: n_hyp Gumbel-top-k
    minimal sets drawn from the weight distribution, inliers counted over all
    points, best hypothesis refit on its inliers. Returns (R, t, ok,
    inlier_w); ok is False below 4 valid points — the host path's guard
    (eval/pnp.correspondences minimum; callers then keep the net pose,
    reference gdrn_evaluator.py:253-257)."""
    valid = w > 0
    n_valid = jnp.sum(valid)
    # Gumbel-top-k: k distinct indices per hypothesis, zero-weight (padding)
    # points rank below every valid one so they are only drawn when fewer
    # than sample_size valid points exist ...
    g = jax.random.gumbel(key, (n_hyp,) + w.shape) + jnp.log(w + 1e-30)
    _, idx = jax.lax.top_k(g, sample_size)             # [n_hyp, S]

    def hyp(i):
        # ... and then the hypothesis weights zero them out, so a 4-5-point
        # ROI still solves from exactly its valid points (host parity)
        R, t, _ = weighted_epnp(p3[idx[i]], p2[idx[i]], K,
                                (w[idx[i]] > 0).astype(jnp.float32))
        err = reprojection_errors(R, t, p3, p2, K)
        inl = (err < reproj_thr) & valid
        return R, t, jnp.sum(inl), inl

    Rs, ts, scores, inls = jax.vmap(hyp)(jnp.arange(n_hyp))
    best = jnp.argmax(scores)
    R_b, t_b, inl_b = Rs[best], ts[best], inls[best]
    w_in = jnp.where(inl_b, w, 0.0)
    if refine:
        R_r, t_r, _ = weighted_epnp(p3, p2, K, w_in)
        # keep the refit only if it does not lose inliers (cv2 refines on
        # the consensus set; a degenerate refit must not poison the result)
        n_new = jnp.sum((reprojection_errors(R_r, t_r, p3, p2, K)
                         < reproj_thr) & valid)
        take = (jnp.sum(w_in > 0) >= 4) & (n_new >= scores[best])
        R_b = jnp.where(take, R_r, R_b)
        t_b = jnp.where(take, t_r, t_b)
    ok = n_valid >= 4
    return R_b, t_b, ok, w_in


@partial(jax.jit, static_argnames=("mode", "n_hyp", "sample_size",
                                   "refine_iters"))
def pnp_from_maps_batch(key, mask_prob, xyz_norm, coord2d, im_wh, extents,
                        Ks, rot_net, trans_net, roi_valid,
                        mode: str = "ransac_pnp", mask_thr: float = 0.5,
                        reproj_thr: float = 3.0, n_hyp: int = 128,
                        sample_size: int = 6, refine_iters: int = 10):
    """Decoded maps -> refined poses for a whole ROI bucket, one XLA program.

    mask_prob [B,H,W], xyz_norm [B,H,W,3] in [0,1], coord2d [B,H,W,2] as
    full-image fractions (the test mapper's roi_coord_2d), im_wh [B,2],
    extents [B,3], Ks [B,3,3], net poses [B,3,3]/[B,3], roi_valid [B].
    Correspondence selection mirrors get_img_model_points_with_coords2d
    (gdrn_evaluator.py:89-126): mask prob > thr and |xyz| > 1e-4 * extent on
    every axis — but as weights over the static H*W set instead of a ragged
    gather (and no subsampling: the MXU eats all 4096 points).

    Modes (gdrn_evaluator.py): "ransac_pnp" = pure RANSAC-EPnP (:316-435);
    "net_iter_pnp" = LM refinement warm-started at the net pose (:255-296);
    "net_ransac_pnp" = RANSAC then LM polish, net fallback. The |dt| > 1 m
    net-translation fallback (:293-296) applies to the net_* modes.
    Returns (R [B,3,3], t [B,3])."""
    B, H, W, _ = xyz_norm.shape
    xyz = (xyz_norm.astype(jnp.float32) - 0.5) * extents[:, None, None, :]
    p3 = xyz.reshape(B, H * W, 3)
    p2 = (coord2d.astype(jnp.float32)
          * im_wh[:, None, None, :]).reshape(B, H * W, 2)
    sel = ((mask_prob.astype(jnp.float32) > mask_thr)
           & jnp.all(jnp.abs(xyz) > 1e-4 * extents[:, None, None, :], axis=-1))
    w = sel.reshape(B, H * W).astype(jnp.float32)
    keys = jax.random.split(key, B)

    def one(key_i, p3_i, p2_i, w_i, K_i, R_n, t_n, valid_i):
        n_pts = jnp.sum(w_i > 0)
        if mode == "ransac_pnp":
            R, t, ok, _ = ransac_epnp(key_i, p3_i, p2_i, K_i, w_i,
                                      n_hyp=n_hyp, sample_size=sample_size,
                                      reproj_thr=reproj_thr)
        elif mode == "net_iter_pnp":
            R, t = refine_pose_lm(R_n, t_n, p3_i, p2_i, K_i, w_i,
                                  iters=refine_iters)
            ok = n_pts >= 4
        elif mode == "net_ransac_pnp":
            R, t, ok, w_in = ransac_epnp(key_i, p3_i, p2_i, K_i, w_i,
                                         n_hyp=n_hyp,
                                         sample_size=sample_size,
                                         reproj_thr=reproj_thr)
            R, t = refine_pose_lm(R, t, p3_i, p2_i, K_i, w_in,
                                  iters=refine_iters)
        else:
            raise ValueError(f"unknown device PnP mode: {mode}")
        if mode != "ransac_pnp":  # net-translation fallback (te > 1 m)
            t = jnp.where(jnp.linalg.norm(t - t_n) > 1.0, t_n, t)
        use = ok & valid_i
        return (jnp.where(use, R, R_n), jnp.where(use, t, t_n))

    return jax.vmap(one)(keys, p3, p2, w, Ks.astype(jnp.float32),
                         rot_net.astype(jnp.float32),
                         trans_net.astype(jnp.float32),
                         roi_valid.astype(bool))
