"""Device ROI pipeline parity vs the host cv2 mapper on the fixture dataset:
same DZI box (dzi_type none) must give near-identical targets, and the SITE
identity must hold exactly."""

import numpy as np
import pytest
import cv2
import jax
import jax.numpy as jnp

from gdrnet_tpu.config import base_config
from gdrnet_tpu.data.bop import load_bop_scene_dicts
from gdrnet_tpu.data.model_store import ObjectModels
from gdrnet_tpu.data.mapper import GDRNTrainMapper
from gdrnet_tpu.data.device_pipeline import device_roi_pipeline

from fixture_bop import build_fixture_dataset


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("devpipe")
    meta = build_fixture_dataset(str(root), n_images=2, seed=17)
    records = load_bop_scene_dicts(meta, "test")
    models = ObjectModels(meta, num_pm_points=64, num_fps=4)
    return meta, records, models


def _raw_inputs(meta, records, models):
    """Stack the raw full-frame inputs the device pipeline consumes."""
    import pickle

    imgs, xyzs, mvs, bboxes, Rs, ts, Ks, exts, fps = ([] for _ in range(9))
    for rec in records:
        img = cv2.imread(rec["rgb_path"], cv2.IMREAD_COLOR)
        with open(rec["xyz_path"], "rb") as f:
            info = pickle.load(f)
        x1, y1, x2, y2 = info["xyxy"]
        xyz = np.zeros((meta.height, meta.width, 3), np.float32)
        xyz[y1:y2 + 1, x1:x2 + 1] = np.asarray(info["xyz_crop"], np.float32)
        mv = (cv2.imread(rec["mask_visib_path"], cv2.IMREAD_GRAYSCALE) > 0)
        mask_obj = np.any(xyz != 0, axis=-1)
        ys, xs = np.nonzero(mask_obj)
        bbox = [xs.min(), ys.min(), xs.max(), ys.max()]
        imgs.append(img); xyzs.append(xyz); mvs.append(mv.astype(np.float32))
        bboxes.append(bbox); Rs.append(rec["R"]); ts.append(rec["t"])
        Ks.append(rec["K"])
        exts.append(models.extents[rec["label"]])
        fps.append(models.fps_points[rec["label"]])
    return tuple(np.stack(a).astype(np.float32) if np.asarray(a).dtype != np.int64
                 else np.stack(a) for a in (imgs, xyzs, mvs, bboxes, Rs, ts, Ks, exts, fps))


def test_device_pipeline_matches_host_mapper(env):
    meta, records, models = env
    cfg = base_config()
    cfg.MODEL.CDPN.ROT_HEAD.NUM_CLASSES = 2
    cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 4
    cfg.INPUT.DZI_TYPE = "none"
    cfg.INPUT.DZI_PAD_SCALE = 1.5
    mapper = GDRNTrainMapper(cfg, models)
    host = [mapper(rec, np.random.RandomState(0)) for rec in records]

    imgs, xyzs, mvs, bboxes, Rs, ts, Ks, exts, fps = _raw_inputs(meta, records, models)
    dev = device_roi_pipeline(
        jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(xyzs),
        jnp.asarray(mvs), jnp.asarray(bboxes), jnp.asarray(Rs), jnp.asarray(ts),
        jnp.asarray(Ks), jnp.asarray(exts), jnp.asarray(fps),
        jnp.zeros(3), jnp.full(3, 255.0),
        input_res=256, out_res=64, dzi_type="none", pad_scale=1.5)

    for i in range(len(records)):
        h = host[i]
        np.testing.assert_allclose(np.asarray(dev["roi_centers"][i]),
                                   h["roi_centers"], atol=0.6)
        np.testing.assert_allclose(np.asarray(dev["resize_ratios"][i]),
                                   h["resize_ratios"], rtol=0.02)
        # masks: overwhelming agreement (interpolation edges may differ)
        mv_d = np.asarray(dev["gt_mask_visib"][i])
        iou = (mv_d * h["gt_mask_visib"]).sum() / max(
            ((mv_d + h["gt_mask_visib"]) > 0).sum(), 1)
        assert iou > 0.9, iou
        # xyz agreement inside the intersection of masks
        both = (mv_d > 0) & (h["gt_mask_visib"] > 0)
        d = np.abs(np.asarray(dev["gt_xyz"][i]) - h["gt_xyz"])[both]
        assert np.median(d) < 0.02
        # image crop close (bilinear conventions match)
        di = np.asarray(dev["roi_img"][i])
        assert np.abs(di - h["roi_img"]).mean() < 0.02
        # region labels agree on the vast majority of object pixels
        r_d = np.asarray(dev["gt_region"][i])
        agree = (r_d == h["gt_region"])[both].mean()
        assert agree > 0.95

    # SITE identity on device outputs
    K = np.asarray(dev["roi_cams"])
    dxyz = np.asarray(dev["gt_trans_ratio"])
    cx = dxyz[:, 0] * np.asarray(dev["roi_whs"])[:, 0] + np.asarray(dev["roi_centers"])[:, 0]
    z = dxyz[:, 2] * np.asarray(dev["resize_ratios"])
    tx = z * (cx - K[:, 0, 2]) / K[:, 0, 0]
    np.testing.assert_allclose(tx, np.asarray(dev["gt_trans"])[:, 0], rtol=1e-4)


def test_device_host_residual_deltas_characterized(env):
    """Pin the CAUSE of host-vs-device preprocessing differences (the
    device-preprocess overfit envelope investigation, docs/training.md):

    1. roi_img: the host mapper's cv2.warpAffine emits uint8 (half-LSB
       rounding) and interpolates with 5-bit fixed-point coefficients; the
       device path keeps f32 everywhere. Residual bounded by ~1 uint8 LSB.
    2. gt_xyz / masks / region: nearest-neighbor sampling at mask boundaries
       can pick a different source pixel; every disagreeing GT pixel sits
       within 2 px of a mask edge and they are <1% of all pixels.

    Everything else (poses, ratios, coords, bins) is exact. So the two
    training paths see the same distribution up to half-LSB image noise and
    a sub-1% boundary-pixel band — there is no systematic shift.

    Uses the REAL device-preprocess train path (GDRNRawTrainMapper ->
    device_train_batch) so both paths share the same bbox extraction —
    feeding device_roi_pipeline a differently-derived bbox shifts crop
    centers sub-pixel and inflates edge residuals ~50x."""
    from gdrnet_tpu.data.mapper import GDRNRawTrainMapper, collate
    from gdrnet_tpu.data.device_pipeline import device_train_batch

    meta, records, models = env
    cfg = base_config()
    cfg.MODEL.CDPN.ROT_HEAD.NUM_CLASSES = 2
    cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 4
    cfg.INPUT.DZI_TYPE = "none"
    mapper = GDRNTrainMapper(cfg, models)
    host = [mapper(rec, np.random.RandomState(0)) for rec in records]

    raw_mapper = GDRNRawTrainMapper(cfg, models)
    raw = collate([raw_mapper(rec, np.random.RandomState(0))
                   for rec in records])
    dev = device_train_batch(
        jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in raw.items()},
        jnp.asarray(models.points_stack), jnp.asarray(models.extents_stack),
        jnp.asarray(models.fps_stack), jnp.asarray(models.sym_rots_stack),
        jnp.asarray(models.sym_mask_stack),
        jnp.asarray(cfg.MODEL.PIXEL_MEAN, jnp.float32),
        jnp.asarray(cfg.MODEL.PIXEL_STD, jnp.float32),
        dzi_type="none", pad_scale=cfg.INPUT.DZI_PAD_SCALE)

    kernel = np.ones((5, 5), np.uint8)  # 2 px boundary band
    for i, h in enumerate(host):
        # (1) image residual = uint8 half-LSB rounding + cv2's 5-bit
        # fixed-point bilinear coefficients; bounded by ~1 LSB
        d_img = np.abs(np.asarray(dev["roi_img"][i]) - h["roi_img"])
        assert d_img.max() <= 1.0 / 255.0, d_img.max()

        # (2) GT-map disagreements: boundary-band only, < 1% of pixels
        mask_h = (h["gt_mask_obj"] > 0).astype(np.uint8)
        band = (cv2.dilate(mask_h, kernel) - cv2.erode(mask_h, kernel)) > 0
        disagree = (
            (np.abs(np.asarray(dev["gt_xyz"][i]) - h["gt_xyz"]).max(-1) > 1e-3)
            | (np.asarray(dev["gt_mask_visib"][i]) != h["gt_mask_visib"])
            | (np.asarray(dev["gt_mask_obj"][i]) != h["gt_mask_obj"])
            | (np.asarray(dev["gt_region"][i]) != h["gt_region"]))
        assert disagree.mean() < 0.01, disagree.mean()
        assert not np.any(disagree & ~band), (
            f"sample {i}: GT disagreement outside the mask-boundary band")

        # everything else is exact
        for k in ("gt_trans_ratio", "roi_coord_2d", "resize_ratios",
                  "roi_centers", "roi_whs"):
            np.testing.assert_allclose(np.asarray(dev[k][i]), h[k], atol=1e-4,
                                       err_msg=k)


def test_device_pipeline_dzi_random(env):
    meta, records, models = env
    imgs, xyzs, mvs, bboxes, Rs, ts, Ks, exts, fps = _raw_inputs(meta, records, models)
    args = (jnp.asarray(imgs), jnp.asarray(xyzs), jnp.asarray(mvs),
            jnp.asarray(bboxes), jnp.asarray(Rs), jnp.asarray(ts),
            jnp.asarray(Ks), jnp.asarray(exts), jnp.asarray(fps),
            jnp.zeros(3), jnp.full(3, 255.0))
    d1 = device_roi_pipeline(jax.random.PRNGKey(1), *args, dzi_type="uniform",
                             with_bins=True)
    d2 = device_roi_pipeline(jax.random.PRNGKey(2), *args, dzi_type="uniform",
                             with_bins=True)
    assert not np.allclose(np.asarray(d1["roi_centers"]), np.asarray(d2["roi_centers"]))
    assert d1["gt_xyz_bin"].max() == 64  # bg bin present
    # all outputs finite
    for k, v in d1.items():
        assert np.all(np.isfinite(np.asarray(v, dtype=np.float64))), k


def test_device_test_mapper_matches_host(env):
    """GDRNDeviceTestMapper.map_flat: device crops must match the host
    mapper's cv2 crops; all metadata identical."""
    from gdrnet_tpu.config import base_config
    from gdrnet_tpu.data.mapper import GDRNTestMapper, GDRNDeviceTestMapper

    meta, records, models = env
    cfg = base_config()
    cfg.MODEL.CDPN.BACKBONE.INPUT_RES = 64
    cfg.MODEL.CDPN.BACKBONE.OUTPUT_RES = 16
    entries = [(r["rgb_path"], r["K"],
                {"obj_id": r["obj_id"], "bbox": r["bbox_visib"], "score": 0.9})
               for r in records[:4]]
    host = GDRNTestMapper(cfg, models, roi_batch_size=4).map_flat(entries)
    dev = GDRNDeviceTestMapper(cfg, models, roi_batch_size=4).map_flat(entries)

    for k in host:
        if k == "roi_img":
            continue
        np.testing.assert_allclose(np.asarray(dev[k]), host[k], atol=1e-5,
                                   err_msg=k)
    d_img = np.asarray(dev["roi_img"])
    h_img = host["roi_img"]
    # bilinear warps agree except at resampling edges; compare robustly
    diff = np.abs(d_img - h_img)
    assert np.quantile(diff, 0.99) < 2e-2, float(np.quantile(diff, 0.99))
    assert diff.mean() < 5e-3, float(diff.mean())
