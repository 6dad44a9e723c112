"""Tester USE_PNP wiring: do_test with ransac / net-init PnP paths must run
the full decode -> correspondences -> solvePnP flow on the fixture dataset
and produce finite poses + a valid CSV (quality needs a trained net; the
numeric PnP math itself is covered in test_pnp.py)."""

import os.path as osp

import jax
import numpy as np
import pytest

from gdrnet_tpu.config import base_config
from gdrnet_tpu.data import ObjectModels, synthetic_roi_batch
from gdrnet_tpu.data.bop import load_bop_scene_dicts
from gdrnet_tpu.engine.tester import do_test
from gdrnet_tpu.models import build_model

from fixture_bop import build_fixture_dataset


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("pnp_tester")
    meta = build_fixture_dataset(str(root), n_images=2, seed=31)
    records = load_bop_scene_dicts(meta, "test")
    models = ObjectModels(meta, num_pm_points=64, num_fps=4)
    return meta, records, models


@pytest.mark.parametrize("pnp_type,device_pnp", [
    ("ransac_pnp", False), ("net_iter_pnp", False), ("net_ransac_pnp", False),
    ("ransac_pnp", True), ("net_iter_pnp", True), ("net_ransac_pnp", True)])
def test_do_test_use_pnp(env, tmp_path, pnp_type, device_pnp):
    meta, records, models = env
    cfg = base_config()
    cfg.MODEL.CDPN.BACKBONE.NUM_LAYERS = 18
    cfg.MODEL.CDPN.BACKBONE.INPUT_RES = 64
    cfg.MODEL.CDPN.BACKBONE.OUTPUT_RES = 16
    cfg.MODEL.CDPN.ROT_HEAD.NUM_CLASSES = 2
    cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 4
    cfg.TEST.USE_PNP = True
    cfg.TEST.PNP_TYPE = pnp_type
    cfg.TEST.DEVICE_PNP = device_pnp  # batched on-device EPnP/RANSAC/LM
    cfg.TEST.ROI_BATCH_SIZE = 4
    model = build_model(cfg)
    sample = {k: __import__("jax.numpy", fromlist=["asarray"]).asarray(v)
              for k, v in synthetic_roi_batch(
                  batch_size=2, input_res=64, out_res=16).items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, sample["roi_img"],
        roi_classes=sample["roi_classes"], roi_coord_2d=sample["roi_coord_2d"],
        roi_cams=sample["roi_cams"], roi_centers=sample["roi_centers"],
        roi_whs=sample["roi_whs"], roi_extents=sample["roi_extents"],
        resize_ratios=sample["resize_ratios"], train=False)

    results = do_test(cfg, model, variables, models, records,
                      output_dir=str(tmp_path))
    assert "Avg" in results
    assert osp.exists(results["_csv_path"])
    from gdrnet_tpu.eval import load_bop_results
    rows = load_bop_results(results["_csv_path"])
    assert len(rows) == 4
    for r in rows:
        assert np.all(np.isfinite(r["R"])) and np.all(np.isfinite(r["t"]))


def test_do_test_sharded_partitions_rois(env, tmp_path):
    """Explicit shard/num_shards must partition the flat ROI stream: the two
    half-shards together cover exactly the rows of the unsharded run (the
    multi-process gather itself is identity in a 1-process test)."""
    meta, records, models = env
    cfg = base_config()
    cfg.MODEL.CDPN.BACKBONE.NUM_LAYERS = 18
    cfg.MODEL.CDPN.BACKBONE.INPUT_RES = 64
    cfg.MODEL.CDPN.BACKBONE.OUTPUT_RES = 16
    cfg.MODEL.CDPN.ROT_HEAD.NUM_CLASSES = 2
    cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 4
    cfg.TEST.ROI_BATCH_SIZE = 4
    model = build_model(cfg)
    sample = {k: __import__("jax.numpy", fromlist=["asarray"]).asarray(v)
              for k, v in synthetic_roi_batch(
                  batch_size=2, input_res=64, out_res=16).items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, sample["roi_img"],
        roi_classes=sample["roi_classes"], roi_coord_2d=sample["roi_coord_2d"],
        roi_cams=sample["roi_cams"], roi_centers=sample["roi_centers"],
        roi_whs=sample["roi_whs"], roi_extents=sample["roi_extents"],
        resize_ratios=sample["resize_ratios"], train=False)

    from gdrnet_tpu.eval import load_bop_results

    def rows_of(outdir, shard=None, num_shards=None):
        res = do_test(cfg, model, variables, models, records,
                      output_dir=str(outdir), shard=shard,
                      num_shards=num_shards)
        return load_bop_results(res["_csv_path"])

    full = rows_of(tmp_path / "full")
    half0 = rows_of(tmp_path / "s0", shard=0, num_shards=2)
    half1 = rows_of(tmp_path / "s1", shard=1, num_shards=2)
    key = lambda r: (r["scene_id"], r["im_id"], r["obj_id"])
    assert len(half0) + len(half1) == len(full)
    assert sorted(map(key, half0 + half1)) == sorted(map(key, full))


def test_do_test_duplicate_object_instances(tmp_path):
    """Two instances of the SAME object in one image must both count in the
    recall denominators: est<->gt matching is per (image, object, instance),
    not last-wins per object (the reference custom evaluator's
    file_name-keyed gts collapse these, gdrn_custom_evaluator.py:481-491)."""
    n_images = 2
    meta = build_fixture_dataset(str(tmp_path / "dup"), n_images=n_images,
                                 seed=13, duplicate_first_obj=True)
    records = load_bop_scene_dicts(meta, "test")
    # the fixture renders cube twice + brick once per image
    from collections import Counter
    per_img = Counter((r["im_id"], r["label"]) for r in records)
    assert per_img[(0, "cube")] == 2 and per_img[(0, "brick")] == 1

    models = ObjectModels(meta, num_pm_points=64, num_fps=4)
    cfg = base_config()
    cfg.MODEL.CDPN.BACKBONE.NUM_LAYERS = 18
    cfg.MODEL.CDPN.BACKBONE.INPUT_RES = 64
    cfg.MODEL.CDPN.BACKBONE.OUTPUT_RES = 16
    cfg.MODEL.CDPN.ROT_HEAD.NUM_CLASSES = 2
    cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 4
    cfg.TEST.ROI_BATCH_SIZE = 4
    model = build_model(cfg)
    import jax.numpy as jnp
    sample = {k: jnp.asarray(v) for k, v in synthetic_roi_batch(
        batch_size=2, input_res=64, out_res=16).items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, sample["roi_img"],
        roi_classes=sample["roi_classes"], roi_coord_2d=sample["roi_coord_2d"],
        roi_cams=sample["roi_cams"], roi_centers=sample["roi_centers"],
        roi_whs=sample["roi_whs"], roi_extents=sample["roi_extents"],
        resize_ratios=sample["resize_ratios"], train=False)

    results = do_test(cfg, model, variables, models, records,
                      output_dir=str(tmp_path / "out"))
    # every GT instance is a denominator entry: 2 cubes + 1 brick per image
    assert results["cube"]["count"] == 2 * n_images
    assert results["brick"]["count"] == 1 * n_images
    # CSV carries every estimate row too
    from gdrnet_tpu.eval import load_bop_results
    rows = load_bop_results(results["_csv_path"])
    assert len(rows) == 3 * n_images


def test_do_test_vsd_fails_fast_without_depth(env):
    """VAL.ERROR_TYPES with vsd on a split without depth/ must raise BEFORE
    inference, not after a full pass (tester.py pre-flight)."""
    meta, records, models = env
    stripped = [{k: v for k, v in r.items()
                 if k not in ("depth_path", "depth_scale")} for r in records]
    cfg = base_config()
    cfg.VAL.USE_BOP = True
    cfg.VAL.ERROR_TYPES = "vsd,mssd,mspd"
    with pytest.raises(ValueError, match="before inference"):
        do_test(cfg, None, None, models, stripped)


def test_decode_semantics():
    """get_out_coor: bin-center decode with bg-argmax pixels zeroed
    (engine_utils.py:92-105); get_out_mask L1: per-image min-max
    normalization (:115-117)."""
    import jax.numpy as jnp
    import numpy as np
    from gdrnet_tpu.engine.decode import get_out_coor, get_out_mask

    B = 4  # bins
    logits = np.full((1, 1, 2, B + 1), -10.0, np.float32)
    logits[0, 0, 0, 2] = 5.0    # pixel 0: fg bin 2
    logits[0, 0, 1, B] = 5.0    # pixel 1: bg wins
    c = jnp.asarray(logits)
    out = np.asarray(get_out_coor(c, c, c, xyz_bin=B))
    assert out[0, 0, 0, 0] == (2 + 0.5) / B
    assert out[0, 0, 1, 0] == 0.0  # bg-argmax pixel zeroed

    m = jnp.asarray(np.array([[[[2.0], [4.0]], [[6.0], [2.0]]]], np.float32))
    dm = np.asarray(get_out_mask(m, "L1"))
    np.testing.assert_allclose(dm[0], [[0.0, 0.5], [1.0, 0.0]], atol=1e-5)
