"""Synthetic fixed-shape ROI batches with geometrically-consistent targets.

Used by tests, bench.py and __graft_entry__ to exercise the full train step
without BOP data on disk. The batch schema matches what the real data
pipeline emits (the reference's read_data outputs, data_loader.py:304-633,
transposed to channels-last): a random pose is sampled per ROI, a blocky
"object" XYZ map + masks + region labels are synthesized from it, and the
SITE ratios (gt_trans_ratio) are derived exactly as the reference does
(data_loader.py:628-632), so losses are non-degenerate and the pose decode
round-trips.
"""

from __future__ import annotations

import numpy as np


def _random_rotations(rng: np.random.RandomState, n: int) -> np.ndarray:
    """Uniform random rotations via QR of gaussian matrices."""
    A = rng.randn(n, 3, 3)
    Q, R = np.linalg.qr(A)
    d = np.sign(np.diagonal(R, axis1=-2, axis2=-1))
    Q = Q * d[:, None, :]
    det = np.linalg.det(Q)
    Q[:, :, 0] *= det[:, None]
    return Q.astype(np.float32)


def synthetic_roi_batch(batch_size: int = 8, input_res: int = 256,
                        out_res: int = 64, num_classes: int = 13,
                        num_points: int = 512, num_regions: int = 8,
                        sym_k: int = 4, seed: int = 0,
                        img_w: int = 640, img_h: int = 480) -> dict:
    """Returns a dict of numpy arrays (channels-last) covering every input
    of the GDRN train step."""
    rng = np.random.RandomState(seed)
    B = batch_size

    K = np.tile(np.asarray(
        [[572.4114, 0, 325.2611], [0, 573.5704, 242.0490], [0, 0, 1]],
        np.float32), (B, 1, 1))

    rot = _random_rotations(rng, B)
    z = rng.uniform(0.5, 1.2, B).astype(np.float32)
    cx = rng.uniform(200, 440, B).astype(np.float32)
    cy = rng.uniform(140, 340, B).astype(np.float32)
    tx = (cx - K[:, 0, 2]) * z / K[:, 0, 0]
    ty = (cy - K[:, 1, 2]) * z / K[:, 1, 1]
    trans = np.stack([tx, ty, z], axis=1)

    # DZI-style square ROI: center jittered off centroid, scale ~ bbox*1.5
    bw = rng.uniform(64, 160, B).astype(np.float32)
    bh = rng.uniform(64, 160, B).astype(np.float32)
    bx = cx + rng.uniform(-0.1, 0.1, B).astype(np.float32) * bw
    by = cy + rng.uniform(-0.1, 0.1, B).astype(np.float32) * bh
    scale = (np.maximum(bw, bh) * 1.5).astype(np.float32)
    resize_ratio = (out_res / scale).astype(np.float32)

    # SITE targets (reference data_loader.py:628-632)
    trans_ratio = np.stack(
        [(cx - bx) / bw, (cy - by) / bh, z / resize_ratio], axis=1).astype(np.float32)

    extents = rng.uniform(0.05, 0.15, (B, 3)).astype(np.float32)
    points = (rng.rand(B, num_points, 3).astype(np.float32) - 0.5) * extents[:, None, :]
    fps = (rng.rand(B, num_regions, 3).astype(np.float32) - 0.5) * extents[:, None, :]

    # blocky object mask in the center of the 64x64 ROI + consistent labels
    ys, xs = np.mgrid[0:out_res, 0:out_res]
    masks = np.zeros((B, out_res, out_res), np.float32)
    xyz = np.zeros((B, out_res, out_res, 3), np.float32)
    region = np.zeros((B, out_res, out_res), np.int32)
    for i in range(B):
        r = out_res // 4 + rng.randint(0, out_res // 4)
        c0 = out_res // 2 + rng.randint(-4, 4)
        m = ((np.abs(ys - c0) < r) & (np.abs(xs - c0) < r)).astype(np.float32)
        masks[i] = m
        # fake normalized xyz in [0,1] inside the mask
        g = np.stack([xs / out_res, ys / out_res,
                      0.5 + 0.2 * np.sin(xs / 7.0)], axis=-1).astype(np.float32)
        xyz[i] = g * m[..., None]
        # region = nearest fps point of the denormalized coords
        coords = (xyz[i] - 0.5) * extents[i]
        d = np.linalg.norm(coords[..., None, :] - fps[i][None, None], axis=-1)
        region[i] = (np.argmin(d, axis=-1) + 1) * m.astype(np.int32)

    xyz_bin = np.clip((xyz * 64).astype(np.int32), 0, 63)

    sym_rots = np.tile(np.eye(3, dtype=np.float32), (B, sym_k, 1, 1))
    sym_mask = np.zeros((B, sym_k), bool)
    sym_mask[:, 0] = True

    coord2d = np.stack(np.meshgrid(
        np.linspace(0, 1, out_res, dtype=np.float32),
        np.linspace(0, 1, out_res, dtype=np.float32)), axis=-1)

    return {
        "roi_img": rng.rand(B, input_res, input_res, 3).astype(np.float32),
        "roi_classes": rng.randint(0, num_classes, B).astype(np.int32),
        "roi_coord_2d": np.tile(coord2d[None], (B, 1, 1, 1)),
        "roi_cams": K,
        "roi_centers": np.stack([bx, by], axis=1),
        "roi_whs": np.stack([bw, bh], axis=1),
        "roi_extents": extents,
        "resize_ratios": resize_ratio,
        "gt_xyz": xyz,
        "gt_xyz_bin": xyz_bin,
        "gt_mask_trunc": masks,
        "gt_mask_visib": masks,
        "gt_mask_obj": masks,
        "gt_region": region,
        "gt_ego_rot": rot,
        "gt_trans": trans,
        "gt_trans_ratio": trans_ratio,
        "gt_points": points,
        "sym_rots": sym_rots,
        "sym_mask": sym_mask,
    }


def synthetic_raw_batch(batch_size: int = 8, img_h: int = 96, img_w: int = 128,
                        num_classes: int = 2, seed: int = 0) -> dict:
    """Raw full-frame batch in the GDRNRawTrainMapper contract (uint8 image,
    f16 xyz, uint8 masks, bbox/pose/K/class) plus the per-class stacks
    device_train_batch gathers from — for sharding dry-runs and tests."""
    rng = np.random.RandomState(seed)
    B = batch_size
    K = np.tile(np.asarray(
        [[120.0, 0, img_w / 2], [0, 120.0, img_h / 2], [0, 0, 1]],
        np.float32), (B, 1, 1))
    rot = _random_rotations(rng, B)
    trans = np.stack([rng.uniform(-0.02, 0.02, B), rng.uniform(-0.02, 0.02, B),
                      rng.uniform(0.5, 0.8, B)], axis=1).astype(np.float32)

    imgs = rng.randint(0, 255, (B, img_h, img_w, 3), np.uint8)
    xyz = np.zeros((B, img_h, img_w, 3), np.float16)
    mv = np.zeros((B, img_h, img_w), np.uint8)
    bbox = np.zeros((B, 4), np.float32)
    for i in range(B):
        x1 = rng.randint(8, img_w // 2)
        y1 = rng.randint(8, img_h // 2)
        x2 = x1 + rng.randint(16, img_w // 3)
        y2 = y1 + rng.randint(12, img_h // 3)
        xyz[i, y1:y2, x1:x2] = (rng.rand(y2 - y1, x2 - x1, 3) * 0.1 - 0.05
                                ).astype(np.float16)
        mv[i, y1:y2, x1:x2] = 1
        bbox[i] = [x1, y1, x2 - 1, y2 - 1]

    C, N, F, Ksym = num_classes, 64, 8, 4
    stacks = {
        "points_stack": (rng.rand(C, N, 3).astype(np.float32) - 0.5) * 0.1,
        "extents_stack": np.full((C, 3), 0.1, np.float32),
        "fps_stack": (rng.rand(C, F, 3).astype(np.float32) - 0.5) * 0.1,
        "sym_rots_stack": np.tile(np.eye(3, dtype=np.float32), (C, Ksym, 1, 1)),
        "sym_mask_stack": np.concatenate(
            [np.ones((C, 1), bool), np.zeros((C, Ksym - 1), bool)], axis=1),
    }
    raw = {
        "image": imgs, "xyz": xyz, "mask_visib": mv, "mask_trunc": mv.copy(),
        "bbox": bbox, "gt_ego_rot": rot, "gt_trans": trans, "roi_cams": K,
        "roi_classes": rng.randint(0, C, B).astype(np.int32),
    }
    return raw, stacks


def synthetic_decoded_maps(rng: np.random.RandomState, batch_size: int = 1,
                           h: int = 64, w: int = 64, mask_frac: float = 0.6,
                           noise_px: float = 0.0, t_jitter: float = 0.0):
    """Synthetic decoded geometry maps in the tester's contract: per-ROI
    xyz_norm ([0,1] over the extent), coord2d (full-image fraction) and a
    random visibility mask, with the true (R, t) that generated them.
    Shared by tests/test_device_pnp.py and tools/bench_pnp.py so the map
    conventions (coord2d normalization, xyz centering) live in one place.

    Returns (mask [B,h,w], xyz_norm [B,h,w,3], coord2d [B,h,w,2],
    R [B,3,3], t [B,3], K [3,3], extent [3], (im_w, im_h))."""
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1.0]],
                 np.float32)
    extent = np.array([0.2, 0.2, 0.2], np.float32)
    im_w, im_h = 640, 480
    B = batch_size
    R = _random_rotations(rng, B)
    t = (np.array([0.02, -0.01, 0.7], np.float32) +
         rng.randn(B, 3).astype(np.float32) * t_jitter)
    p3 = ((rng.rand(B, h * w, 3) - 0.5) * extent).astype(np.float32)
    pc = p3 @ np.swapaxes(R, 1, 2) + t[:, None]      # camera-frame points
    uv = pc @ K.T
    uv = uv[..., :2] / uv[..., 2:3]
    if noise_px:
        uv = uv + rng.randn(B, h * w, 2) * noise_px
    mask = (rng.rand(B, h, w) < mask_frac).astype(np.float32)
    xyz_norm = (p3 / extent + 0.5).reshape(B, h, w, 3).astype(np.float32)
    coord2d = (uv / [im_w, im_h]).reshape(B, h, w, 2).astype(np.float32)
    return mask, xyz_norm, coord2d, R, t, K, extent, (im_w, im_h)
