"""Aux subsystem tests: vis helpers, multihost degradations, profiler timer."""

import numpy as np

from gdrnet_tpu.utils.vis import (
    grid_show, vis_image_bboxes_cv2, vis_image_mask_cv2,
    draw_projected_box3d, vis_xyz_map, colormap)
from gdrnet_tpu.parallel.multihost import (
    get_rank, get_world_size, is_main_process, synchronize,
    all_gather_objects, reduce_dict_mean)
from gdrnet_tpu.engine.profiling import StepTimer, trace


def test_vis_helpers(rng, tmp_path):
    img = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
    out = vis_image_bboxes_cv2(img, [[5, 5, 40, 40]], labels=["ape"])
    assert out.shape == img.shape
    mask = np.zeros((60, 80), bool)
    mask[10:30, 10:30] = True
    out = vis_image_mask_cv2(img, mask, 1)
    assert out.dtype == np.uint8
    corners = rng.rand(8, 2) * 50
    out = draw_projected_box3d(img, corners)
    assert out.shape == img.shape
    xyz = vis_xyz_map(rng.rand(16, 16, 3))
    assert xyz.dtype == np.uint8
    fig = grid_show([img, mask.astype(np.float32)], ["img", "mask"], row=1,
                    save_path=str(tmp_path / "grid.png"))
    assert (tmp_path / "grid.png").exists()
    assert isinstance(colormap(3), list)


def test_multihost_single_process():
    assert get_rank() == 0
    assert get_world_size() == 1
    assert is_main_process()
    synchronize()  # no-op
    assert all_gather_objects({"a": 1}) == [{"a": 1}]
    assert reduce_dict_mean({"x": 2.0}) == {"x": 2.0}


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(3):
        t.start("compute")
        t.stop()
        t.start("process")
        t.stop()
        t.step_done()
    rep = t.report()
    assert set(rep) == {"compute_s_per_step", "process_s_per_step"}
    assert all(v >= 0 for v in rep.values())


def test_trace_noop():
    with trace(None):
        pass


def test_visualize_records(tmp_path):
    from fixture_bop import build_fixture_dataset
    from gdrnet_tpu.data.bop import load_bop_scene_dicts
    from gdrnet_tpu.data.model_store import ObjectModels
    from gdrnet_tpu.data.visualize import vis_records
    from gdrnet_tpu.config import base_config

    meta = build_fixture_dataset(str(tmp_path / "ds"), n_images=1, seed=13)
    records = load_bop_scene_dicts(meta, "test")
    models = ObjectModels(meta, num_pm_points=64)
    saved = vis_records(meta, records, models, n=1, save_dir=str(tmp_path / "v"))
    assert len(saved) == 1
    cfg = base_config()
    cfg.MODEL.CDPN.ROT_HEAD.NUM_CLASSES = 2
    saved = vis_records(meta, records, models, n=1, save_dir=str(tmp_path / "v2"),
                        mapped=True, cfg=cfg)
    assert len(saved) == 1


def test_io_depth_roundtrip(tmp_path, rng):
    from gdrnet_tpu.data.io import save_depth, load_depth, save_json, load_json

    d = (rng.rand(20, 30) * 2).astype(np.float32)
    p = str(tmp_path / "d.png")
    save_depth(p, d, depth_scale=0.1)
    d2 = load_depth(p, depth_scale=0.1)
    np.testing.assert_allclose(d2, d, atol=1e-4)
    jp = str(tmp_path / "x.json")
    save_json(jp, {"a": np.float32(1.5), "b": np.arange(3)})
    assert load_json(jp) == {"a": 1.5, "b": [0, 1, 2]}


def test_view_sampler():
    from gdrnet_tpu.ops.view_sampler import sample_views, icosphere_views

    views = sample_views(40, radius=0.5)
    assert len(views) >= 40
    for v in views[:5]:
        R, t = v["R"], v["t"]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        # camera at distance `radius` from origin: |R^T t| == radius
        np.testing.assert_allclose(np.linalg.norm(R.T @ t), 0.5, atol=1e-5)
    pts = icosphere_views(100)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-5)


def test_mask_rle_roundtrip():
    """COCO RLE codec (pure numpy maskApi port): mask -> compressed string ->
    mask is exact; string is printable ASCII; uncompressed counts too."""
    from gdrnet_tpu.utils.mask_utils import (
        binary_mask_to_rle, rle2mask, rle_decode_string, rle_encode_string,
        cocosegm2mask, mask2bbox_xyxy, get_edge)

    rng = np.random.RandomState(4)
    for _ in range(5):
        m = (rng.rand(37, 53) > 0.7).astype(np.uint8)
        rle = binary_mask_to_rle(m, compressed=True)
        assert isinstance(rle["counts"], str)
        assert all(48 <= ord(c) < 128 for c in rle["counts"])
        np.testing.assert_array_equal(rle2mask(rle), m)
        rle_u = binary_mask_to_rle(m, compressed=False)
        np.testing.assert_array_equal(rle2mask(rle_u), m)
        # counts-level roundtrip
        assert rle_decode_string(rle_encode_string(rle_u["counts"])) == \
            rle_u["counts"]

    # empty + full masks
    for m in (np.zeros((8, 8), np.uint8), np.ones((8, 8), np.uint8)):
        np.testing.assert_array_equal(rle2mask(binary_mask_to_rle(m)), m)

    # polygon -> mask (a filled square) and bbox/edge helpers
    poly = [[2, 2, 10, 2, 10, 10, 2, 10]]
    m = cocosegm2mask(poly, 16, 16)
    assert m[5, 5] == 1 and m[0, 0] == 0
    assert tuple(mask2bbox_xyxy(m)) == (2.0, 2.0, 10.0, 10.0)
    e = get_edge(m, bw=1)
    assert e.shape == (16, 16, 3) and e[..., 0].sum() > 0


def test_bbox_utils_conventions():
    """xyxy<->xywh round trip, inclusive-pixel areas, centers, clip, IoU
    (reference lib/utils/bbox_utils.py:26-130 conventions)."""
    import numpy as np
    from gdrnet_tpu.utils.bbox_utils import (
        bbox_center, boxes_area, clip_xyxy_to_im, iou_xyxy, xywh_to_xyxy,
        xyxy_to_xywh)

    xyxy = np.array([[10.0, 20.0, 19.0, 39.0], [0.0, 0.0, 0.0, 0.0]])
    xywh = xyxy_to_xywh(xyxy)
    np.testing.assert_allclose(xywh[0], [10, 20, 10, 20])  # w = x2-x1+1
    np.testing.assert_allclose(xywh[1], [0, 0, 1, 1])      # 1px box
    np.testing.assert_allclose(xywh_to_xyxy(xywh), xyxy)
    areas, neg = boxes_area(xyxy)
    np.testing.assert_allclose(areas, [200.0, 1.0])
    assert neg.size == 0
    np.testing.assert_allclose(bbox_center(xyxy[0]), [14.5, 29.5])
    np.testing.assert_allclose(bbox_center(xywh[0], fmt="xywh"),
                               [14.5, 29.5])  # same box, same center
    clipped = clip_xyxy_to_im(np.array([[-5.0, -5.0, 700.0, 500.0]]),
                              height=480, width=640)
    np.testing.assert_allclose(clipped[0], [0, 0, 639, 479])
    iou = iou_xyxy(xyxy[:1], xyxy[:1])
    np.testing.assert_allclose(iou, [[1.0]])
    assert iou_xyxy([[0, 0, 9, 9]], [[10, 10, 19, 19]])[0, 0] == 0.0


def test_dataset_params_layout(tmp_path):
    """BOP dataset_params parity: path templates, scene ids, model params
    (lib/pysixd/dataset_params.py:15-391)."""
    import json
    import os
    import numpy as np
    from gdrnet_tpu.data.dataset_params import (
        get_camera_params, get_model_params, get_present_scene_ids,
        get_split_params)

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "lm"))
    with open(os.path.join(root, "lm", "camera.json"), "w") as f:
        json.dump({"cx": 325.2611, "cy": 242.04899, "depth_scale": 1.0,
                   "fx": 572.4114, "fy": 573.57043,
                   "height": 480, "width": 640}, f)
    cam = get_camera_params(root, "lm")
    assert cam["im_size"] == (640, 480)
    np.testing.assert_allclose(cam["K"][0, 0], 572.4114)
    assert cam["depth_scale"] == 1.0

    mp = get_model_params(root, "lmo")
    assert mp["obj_ids"] == [1, 5, 6, 8, 9, 10, 11, 12]
    assert mp["symmetric_obj_ids"] == [10, 11]
    assert mp["model_tpath"].endswith("lmo/models/obj_{obj_id:06d}.ply")

    sp = get_split_params(root, "lm", "train", split_type="pbr")
    assert sp["rgb_tpath"].endswith(
        "lm/train_pbr/{scene_id:06d}/rgb/{im_id:06d}.jpg")
    assert sp["scene_gt_tpath"].endswith(
        "lm/train_pbr/{scene_id:06d}/scene_gt.json")
    # every pbr split enumerates scenes on disk (BOP ships 000000-000049)
    assert sp["scene_ids"] is None
    assert get_split_params(root, "itodd", "train",
                            split_type="pbr")["scene_ids"] is None
    assert get_split_params(root, "hb", "train",
                            split_type="pbr")["scene_ids"] is None
    sp_test = get_split_params(root, "lmo", "test")
    assert sp_test["scene_ids"] == [2]
    assert sp_test["depth_range"] == (346.31, 1499.84)
    sp_y = get_split_params(root, "ycbv", "train")  # default real
    assert sp_y["split_type"] == "real"
    assert 59 not in sp_y["scene_ids"] and 60 in sp_y["scene_ids"]

    # present-scene scan
    os.makedirs(os.path.join(root, "lm", "train_pbr", "000003"))
    os.makedirs(os.path.join(root, "lm", "train_pbr", "000001"))
    assert get_present_scene_ids(sp) == [1, 3]

    # Full-BOP family (dataset_params.py:77-345):
    # T-LESS defaults: cad models, primesense sensor, per-sensor im_size.
    mp_t = get_model_params(root, "tless")
    assert mp_t["model_tpath"].endswith("tless/models_cad/obj_{obj_id:06d}.ply")
    assert mp_t["symmetric_obj_ids"] == list(range(1, 31))
    sp_t = get_split_params(root, "tless", "test")
    assert sp_t["split_type"] == "primesense"
    assert sp_t["im_size"] == (720, 540)
    assert sp_t["split_path"].endswith("tless/test_primesense")
    assert get_split_params(root, "tless", "train")["im_size"] == (400, 400)
    # HBS (BOP'19 subset) aliases into the hb/ directory but keeps its
    # own obj/scene subsets and name.
    mp_h = get_model_params(root, "hbs")
    assert mp_h["model_tpath"].endswith("hb/models/obj_{obj_id:06d}.ply")
    assert 2 not in mp_h["obj_ids"] and 33 in mp_h["obj_ids"]
    sp_h = get_split_params(root, "hbs", "test")
    assert sp_h["name"] == "hbs"
    assert sp_h["base_path"].endswith("/hb")
    assert sp_h["scene_ids"] == [3, 5, 13]
    assert get_split_params(root, "hb", "val")["scene_ids"] == list(range(1, 14))
    # ITODD: gray+depth modalities, .tif images, 1280x960.
    sp_i = get_split_params(root, "itodd", "test")
    assert sp_i["im_modalities"] == ["gray", "depth"]
    assert sp_i["gray_tpath"].endswith("gray/{im_id:06d}.tif")
    assert sp_i["depth_tpath"].endswith("depth/{im_id:06d}.tif")
    assert sp_i["im_size"] == (1280, 960)
    # TUD-L train defaults to the 'render' split type.
    assert get_split_params(root, "tudl", "train")["split_type"] == "render"
    # IC-BIN has 3 test scenes but 2 train scenes.
    assert get_split_params(root, "icbin", "test")["scene_ids"] == [1, 2, 3]
    assert get_split_params(root, "icbin", "train")["scene_ids"] == [1, 2]
    # ycbvposecnn shares the ycbv directory with PoseCNN's symmetry list.
    mp_p = get_model_params(root, "ycbvposecnn")
    assert mp_p["model_tpath"].endswith("ycbv/models/obj_{obj_id:06d}.ply")
    assert mp_p["symmetric_obj_ids"] == [13, 16, 19, 20, 21]
    assert get_split_params(root, "ycbvposecnn", "test")["name"] == "ycbvposecnn"


def test_visibility_masks_bop():
    """estimate_visib_mask_gt/est vs a numpy reimplementation of
    lib/pysixd/visibility.py:9-71 on random depth images."""
    import numpy as np
    from gdrnet_tpu.eval.vsd import (
        estimate_visib_mask_est, estimate_visib_mask_gt)

    rng = np.random.RandomState(0)
    shape = (24, 32)
    d_test = rng.uniform(0, 2, shape) * (rng.rand(*shape) > 0.3)
    d_gt = rng.uniform(0, 2, shape) * (rng.rand(*shape) > 0.3)
    d_est = rng.uniform(0, 2, shape) * (rng.rand(*shape) > 0.3)
    delta = 0.15
    for mode in ("bop19", "bop18"):
        diff_gt = d_gt - d_test
        if mode == "bop18":
            ref_gt = (d_test > 0) & (d_gt > 0) & (diff_gt <= delta)
        else:
            ref_gt = ((diff_gt <= delta) | (d_test == 0)) & (d_gt > 0)
        got_gt = np.asarray(estimate_visib_mask_gt(d_test, d_gt, delta,
                                                   visib_mode=mode))
        np.testing.assert_array_equal(got_gt, ref_gt)
        diff_est = d_est - d_test
        if mode == "bop18":
            ref_est = (d_test > 0) & (d_est > 0) & (diff_est <= delta)
        else:
            ref_est = ((diff_est <= delta) | (d_test == 0)) & (d_est > 0)
        ref_est = ref_est | (ref_gt & (d_est > 0))
        got_est = np.asarray(estimate_visib_mask_est(
            d_test, d_est, got_gt, delta, visib_mode=mode))
        np.testing.assert_array_equal(got_est, ref_est)


def test_device_probe_require_semantics(monkeypatch):
    """Dead tunnel: require=True raises SystemExit (bench.py contract path),
    require=False only warns; a live accelerator returns after one probe."""
    import pytest

    from gdrnet_tpu.utils import device_probe as dp

    monkeypatch.setattr(dp, "_pinned_cpu", lambda: False)
    monkeypatch.setattr(dp.time, "sleep", lambda s: None)

    class R:
        def __init__(self, rc, out):
            self.returncode, self.stdout, self.stderr = rc, out, ""

    calls = []
    monkeypatch.setattr(dp.subprocess, "run",
                        lambda *a, **k: calls.append(1) or R(1, ""))
    with pytest.raises(SystemExit, match="never answered"):
        dp.probe_device(max_tries=2, probe_timeout=1, require=True)
    assert len(calls) == 2
    # warn-only default pins THIS process to host cpu instead of binding a
    # possibly-hung backend
    import jax

    pins = []
    monkeypatch.setattr(jax.config, "update",
                        lambda k, v: pins.append((k, v)))
    dp.probe_device(max_tries=2, probe_timeout=1)
    assert pins == [("jax_platforms", "cpu")]

    monkeypatch.setattr(dp.subprocess, "run",
                        lambda *a, **k: R(0, "PROBE tpu 128.0"))
    dp.probe_device(max_tries=1, probe_timeout=1, require=True)

    # a cpu fallback inside the probe subprocess is NOT a live accelerator
    monkeypatch.setattr(dp.subprocess, "run",
                        lambda *a, **k: R(0, "PROBE cpu 128.0"))
    with pytest.raises(SystemExit):
        dp.probe_device(max_tries=1, probe_timeout=1, require=True)
