"""Device-side ROI preprocessing — the mapper as one XLA graph.

The reference preprocesses per-instance on CPU workers (cv2 warps + augs,
data_loader.py:304-633); BASELINE.json's north star asks for the dataloader
to become a host-side XLA preprocessing graph. This module is that graph: a
jitted function that takes RAW decoded per-instance inputs (full image, full
xyz map, masks, bbox, pose, K — stacked into fixed-shape batches) and emits
the complete ROI train batch on device:

  DZI bbox aug (jax.random)  ->  batched affine crops (ops/warp, one fused
  gather for img f32 / masks+xyz nearest)  ->  xyz normalize + optional CE
  binning  ->  region labels (argmin over FPS anchors)  ->  SITE ratios.

Host work reduces to image decode + stacking; everything else fuses into the
training step's program (can be jitted together with it). Parity with the
host mapper is tested in tests/test_device_pipeline.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gdrnet_tpu.ops.warp import affine_params_batch, warp_affine_batch


def dzi_aug_bbox_batch(key, bbox_xyxy, im_h, im_w, dzi_type: str = "uniform",
                       pad_scale: float = 1.5, scale_ratio: float = 0.25,
                       shift_ratio: float = 0.25):
    """Batched DZI (reference base_data_loader.aug_bbox:120-152: uniform,
    roi10d and none). bbox_xyxy [B, 4] -> (centers [B,2], scales [B])."""
    x1, y1, x2, y2 = [bbox_xyxy[:, i] for i in range(4)]
    cx, cy = 0.5 * (x1 + x2), 0.5 * (y1 + y2)
    bw, bh = x2 - x1, y2 - y1
    t = dzi_type.lower()
    if t == "uniform":
        ks, kx, ky = jax.random.split(key, 3)
        b = bbox_xyxy.shape[0]
        s = 1 + scale_ratio * (2 * jax.random.uniform(ks, (b,)) - 1)
        shx = shift_ratio * (2 * jax.random.uniform(kx, (b,)) - 1)
        shy = shift_ratio * (2 * jax.random.uniform(ky, (b,)) - 1)
        centers = jnp.stack([cx + bw * shx, cy + bh * shy], axis=1)
        scales = jnp.maximum(bh, bw) * s * pad_scale
    elif t == "roi10d":
        # independent +-15% jitter per box edge, clipped to the image
        # (mapper.dzi_aug_bbox roi10d branch / base_data_loader.py:132-145)
        b = bbox_xyxy.shape[0]
        j = jax.random.uniform(key, (b, 4), minval=-0.15, maxval=0.15)
        nx1 = jnp.clip(x1 + bw * j[:, 0], 0, im_w)
        nx2 = jnp.clip(x2 + bw * j[:, 1], 0, im_w)
        ny1 = jnp.clip(y1 + bh * j[:, 2], 0, im_h)
        ny2 = jnp.clip(y2 + bh * j[:, 3], 0, im_h)
        centers = jnp.stack([0.5 * (nx1 + nx2), 0.5 * (ny1 + ny2)], axis=1)
        scales = jnp.maximum(ny2 - ny1, nx2 - nx1) * pad_scale
    elif t in ("none", "truncnorm"):
        if t == "truncnorm":
            raise NotImplementedError(
                "DZI truncnorm not implemented (the reference raises too, "
                "base_data_loader.py:146-147)")
        centers = jnp.stack([cx, cy], axis=1)
        scales = jnp.maximum(bh, bw) * pad_scale
    else:
        raise ValueError(f"unknown DZI_TYPE for device preprocess: {dzi_type}")
    scales = jnp.minimum(scales, float(max(im_h, im_w)))
    return centers, scales


@partial(jax.jit, static_argnames=("input_res", "out_res", "xyz_bin",
                                   "with_bins", "dzi_type", "pad_scale",
                                   "scale_ratio", "shift_ratio", "xyz_mask_gt"))
def device_roi_pipeline(
    key,
    images: jnp.ndarray,        # [B, H, W, 3] uint8/f32 (bg already applied)
    xyz: jnp.ndarray,           # [B, H, W, 3] object-frame coords (0 = bg)
    mask_visib: jnp.ndarray,    # [B, H, W]
    bboxes_xyxy: jnp.ndarray,   # [B, 4]
    rots: jnp.ndarray,          # [B, 3, 3]
    trans: jnp.ndarray,         # [B, 3]
    K: jnp.ndarray,             # [B, 3, 3]
    extents: jnp.ndarray,       # [B, 3]
    fps_points: jnp.ndarray,    # [B, F, 3]
    pixel_mean: jnp.ndarray,    # [3]
    pixel_std: jnp.ndarray,     # [3]
    *,
    input_res: int = 256,
    out_res: int = 64,
    xyz_bin: int = 64,
    with_bins: bool = False,
    dzi_type: str = "uniform",
    pad_scale: float = 1.5,
    scale_ratio: float = 0.25,
    shift_ratio: float = 0.25,
    xyz_mask_gt: str = "visib",
    mask_trunc: jnp.ndarray | None = None,  # [B, H, W]; defaults to visib
) -> dict:
    B, H, W, _ = images.shape
    centers, scales = dzi_aug_bbox_batch(
        key, bboxes_xyxy, H, W, dzi_type, pad_scale, scale_ratio, shift_ratio)

    mask_obj = jnp.any(xyz != 0, axis=-1).astype(jnp.float32)
    mask_visib = mask_visib.astype(jnp.float32) * mask_obj
    # trunc differs from visib only after host-side bg TRUNCATE_FG
    # (base_data_loader.py:320-364)
    mask_trunc = (mask_visib if mask_trunc is None
                  else mask_trunc.astype(jnp.float32) * mask_obj)

    M_in = affine_params_batch(centers, scales, input_res, inv=True)
    M_out = affine_params_batch(centers, scales, out_res, inv=True)

    roi_img = warp_affine_batch(images.astype(jnp.float32), M_in,
                                (input_res, input_res), interp="bilinear",
                                axis_aligned=True)  # DZI never rotates
    roi_img = (roi_img - pixel_mean) / pixel_std

    nearest = lambda t: warp_affine_batch(t, M_out, (out_res, out_res),
                                          interp="nearest", axis_aligned=True)
    roi_xyz = nearest(xyz)
    roi_mv = nearest(mask_visib[..., None])[..., 0]
    roi_mt = nearest(mask_trunc[..., None])[..., 0]
    roi_mo = nearest(mask_obj[..., None])[..., 0]

    # region labels: nearest FPS anchor of the raw object coords, 0 = bg
    d2 = jnp.sum(jnp.square(roi_xyz[:, :, :, None, :]
                            - fps_points[:, None, None, :, :]), axis=-1)
    region = (jnp.argmin(d2, axis=-1).astype(jnp.int32) + 1) * (
        jnp.any(roi_xyz != 0, axis=-1).astype(jnp.int32))

    xyz_norm = roi_xyz / extents[:, None, None, :] + 0.5

    # full-image normalized coord map cropped to the ROI (mapper.roi_coord_2d)
    dy, dx = jnp.mgrid[0:out_res, 0:out_res]
    sx = (M_out[:, 0, 0, None, None] * dx + M_out[:, 0, 1, None, None] * dy
          + M_out[:, 0, 2, None, None])
    sy = (M_out[:, 1, 0, None, None] * dx + M_out[:, 1, 1, None, None] * dy
          + M_out[:, 1, 2, None, None])
    coord2d = jnp.stack([sx / max(W - 1, 1), sy / max(H - 1, 1)], axis=-1)

    # SITE ratios (data_loader.py:628-632)
    uvw = jnp.einsum("bij,bj->bi", K, trans, precision="highest")
    centroid = uvw[:, :2] / jnp.maximum(uvw[:, 2:3], 1e-12)
    bw = jnp.maximum(bboxes_xyxy[:, 2] - bboxes_xyxy[:, 0], 1.0)
    bh = jnp.maximum(bboxes_xyxy[:, 3] - bboxes_xyxy[:, 1], 1.0)
    dc = centroid - centers
    resize_ratio = out_res / scales
    trans_ratio = jnp.stack(
        [dc[:, 0] / bw, dc[:, 1] / bh, trans[:, 2] / resize_ratio], axis=1)

    batch = {
        "roi_img": roi_img.astype(jnp.float32),
        "roi_coord_2d": coord2d.astype(jnp.float32),
        "roi_cams": K,
        "roi_centers": centers.astype(jnp.float32),
        "roi_whs": jnp.stack([bw, bh], axis=1),
        "roi_extents": extents,
        "resize_ratios": resize_ratio.astype(jnp.float32),
        "gt_xyz": xyz_norm.astype(jnp.float32),
        "gt_mask_trunc": roi_mt,
        "gt_mask_visib": roi_mv,
        "gt_mask_obj": roi_mo,
        "gt_region": region,
        "gt_ego_rot": rots,
        "gt_trans": trans,
        "gt_trans_ratio": trans_ratio.astype(jnp.float32),
    }
    if with_bins:
        norm = jnp.clip(xyz_norm, 0.0, 0.999999)
        bins = (norm * xyz_bin).astype(jnp.int32)
        masks = {"trunc": roi_mt, "visib": roi_mv, "obj": roi_mo}
        m = masks[xyz_mask_gt]
        bins = jnp.where(m[..., None] == 0, xyz_bin, bins)
        batch["gt_xyz_bin"] = bins
    else:
        batch["gt_xyz_bin"] = jnp.zeros((B, out_res, out_res, 3), jnp.int32)
    return batch


def device_train_batch(
    key,
    raw: dict,
    points_stack: jnp.ndarray,    # [C, N, 3]
    extents_stack: jnp.ndarray,   # [C, 3]
    fps_stack: jnp.ndarray,       # [C, F, 3]
    sym_rots_stack: jnp.ndarray,  # [C, K, 3, 3]
    sym_mask_stack: jnp.ndarray,  # [C, K]
    pixel_mean: jnp.ndarray,
    pixel_std: jnp.ndarray,
    color_aug_type: str | None = None,
    color_aug_prob: float = 0.0,
    color_aug_code: str | None = None,
    color_aug_channel_order: str = "bgr",
    **pipeline_kwargs,
) -> dict:
    """Raw mapper batch -> full GDRN train batch, entirely on device.

    `raw` comes from data.mapper.GDRNRawTrainMapper: uint8 image, f16 xyz,
    uint8 masks, bbox/pose/K/class. Per-class constants (model points for the
    PM loss, extents, FPS anchors, padded symmetry sets) are gathered from
    the [C, ...] stacks by class index here, so the host ships 1 int instead
    of ~3k points per ROI. Everything the reference's read_data emits
    (data_loader.py:304-633) comes out of this one XLA program; jit it (or
    let the trainer fuse it ahead of the train step)."""
    cls = raw["roi_classes"].astype(jnp.int32)
    extents = extents_stack[cls]
    images = raw["image"].astype(jnp.float32)
    if color_aug_type and color_aug_prob > 0.0:
        # on-device color jitter (INPUT.DEVICE_COLOR_AUG; the host computed
        # each frame's eligibility flag) — see data/device_augment.py
        from gdrnet_tpu.data.device_augment import apply_color_aug_batch

        key, k_aug = jax.random.split(key)
        aug_ok = raw.get("aug_ok")
        if aug_ok is None:
            aug_ok = jnp.ones((images.shape[0],), jnp.uint8)
        images = apply_color_aug_batch(k_aug, images, aug_ok,
                                       aug_type=color_aug_type,
                                       prob=float(color_aug_prob),
                                       aug_code=color_aug_code or None,
                                       channel_order=color_aug_channel_order)
    batch = device_roi_pipeline(
        key,
        images,
        raw["xyz"].astype(jnp.float32),
        raw["mask_visib"],
        raw["bbox"].astype(jnp.float32),
        raw["gt_ego_rot"].astype(jnp.float32),
        raw["gt_trans"].astype(jnp.float32),
        raw["roi_cams"].astype(jnp.float32),
        extents,
        fps_stack[cls],
        pixel_mean,
        pixel_std,
        mask_trunc=raw.get("mask_trunc"),
        **pipeline_kwargs,
    )
    batch["roi_classes"] = cls
    batch["gt_points"] = points_stack[cls]
    batch["sym_rots"] = sym_rots_stack[cls]
    batch["sym_mask"] = sym_mask_stack[cls]
    return batch
