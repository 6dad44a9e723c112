"""Tools + native kernel tests: C++ FPS bit-parity with the numpy twin,
fps_points.pkl generation, xyz_crop generation on the fixture dataset."""

import os.path as osp
import pickle

import numpy as np
import pytest

from gdrnet_tpu.ops.fps import farthest_point_sampling_np

from fixture_bop import build_fixture_dataset


def test_cpp_fps_matches_numpy(rng):
    from gdrnet_tpu.csrc import fps_native_available

    if not fps_native_available():
        pytest.skip("no C++ toolchain")
    from gdrnet_tpu.ops.fps import farthest_point_sampling_cpp

    pts = rng.rand(5000, 3).astype(np.float32)
    for init_center in (True, False):
        a = farthest_point_sampling_cpp(pts, 32, init_center=init_center)
        b = farthest_point_sampling_np(pts, 32, init_center=init_center)
        np.testing.assert_array_equal(a, b)


def test_jax_fps_matches_numpy(rng):
    from gdrnet_tpu.ops.fps import farthest_point_sampling

    pts = rng.rand(2000, 3).astype(np.float32)
    a = np.asarray(farthest_point_sampling(pts, 16, init_center=True))
    b = farthest_point_sampling_np(pts, 16, init_center=True)
    np.testing.assert_array_equal(a, b)


def test_compute_fps_tool(tmp_path):
    meta = build_fixture_dataset(str(tmp_path), n_images=1, seed=5)
    import sys
    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tools"))
    from compute_fps import compute_fps_dict

    d = compute_fps_dict(meta.model_dir, [1, 2], vertex_scale=0.001)
    # cube has 8 verts -> only fps4(5 rows incl center) and fps8 available
    assert "fps4_and_center" in d["1"]
    assert d["1"]["fps4_and_center"].shape == (5, 3)
    assert d["1"]["fps8_and_center"].shape == (9, 3)
    assert "fps16_and_center" not in d["1"]  # k > n verts skipped


def test_gen_xyz_tool(tmp_path):
    meta = build_fixture_dataset(str(tmp_path), n_images=2, seed=6)
    # wipe the fixture's own xyz crops, regenerate with the tool
    import shutil
    scene = osp.join(meta.data_root, "test", "000001")
    shutil.rmtree(osp.join(scene, "xyz_crop"))
    import sys
    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tools"))
    from gen_xyz import gen_split_xyz

    n = gen_split_xyz(meta, "test", chunk=64)
    assert n == 4  # 2 images x 2 instances
    with open(osp.join(scene, "xyz_crop", "000000_000000.pkl"), "rb") as f:
        info = pickle.load(f)
    assert info["xyz_crop"].dtype == np.float16
    x1, y1, x2, y2 = info["xyxy"]
    assert info["xyz_crop"].shape == (y2 - y1 + 1, x2 - x1 + 1, 3)
    # coords inside the cube bounds
    nz = info["xyz_crop"][np.any(info["xyz_crop"] != 0, axis=-1)]
    assert np.abs(nz).max() <= 0.05


def test_gen_det_fuse(tmp_path):
    meta = build_fixture_dataset(str(tmp_path / "ds"), n_images=2, seed=9)
    from gdrnet_tpu.data.bop import load_bop_scene_dicts
    from gdrnet_tpu.data.augment import BackgroundReplacer
    import sys, os.path as osp
    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tools"))
    from gen_det_fuse import fuse_images

    records = load_bop_scene_dicts(meta, "test", with_xyz=False)
    coco = fuse_images(records, str(tmp_path / "out"), num_images=3,
                       bg_replacer=BackgroundReplacer(""), wh=(320, 240), seed=1)
    assert len(coco["images"]) == 3
    assert len(coco["annotations"]) >= 3
    a = coco["annotations"][0]
    assert a["bbox"][2] > 0 and a["bbox"][3] > 0
    assert osp.exists(str(tmp_path / "out" / "images" / "000000.jpg"))
    assert osp.exists(str(tmp_path / "out" / "annotations.json"))


def test_gen_test_targets(tmp_path):
    """tools/gen_test_targets.py: BOP targets json from scene_gt, with
    keyframe filtering (gen_ycbv_test_targets_keyframe_json.py parity)."""
    import json

    from fixture_bop import build_fixture_dataset
    from gdrnet_tpu.data.ref_meta import get_meta
    import tools.gen_test_targets as gtt

    root = tmp_path / "ds"
    meta = build_fixture_dataset(str(root), n_images=3, seed=9)
    # monkeypatch get_meta to return the fixture meta
    import gdrnet_tpu.data.ref_meta as rm
    real_get_meta = rm.get_meta
    rm.get_meta = lambda name, data_root=None: meta
    try:
        out = str(tmp_path / "targets.json")
        gtt.main(["--dataset", "fixture", "--split", "test", "--out", out])
        rows = json.load(open(out))
        assert rows and all(set(r) == {"im_id", "inst_count", "obj_id",
                                       "scene_id"} for r in rows)
        n_all = len(rows)
        # keyframe filter: keep only image 0 of scene 1
        kf = tmp_path / "keyframe.txt"
        kf.write_text("0001/000000\n")
        out2 = str(tmp_path / "targets_kf.json")
        gtt.main(["--dataset", "fixture", "--split", "test", "--out", out2,
                  "--keyframe", str(kf)])
        rows2 = json.load(open(out2))
        assert 0 < len(rows2) < n_all
        assert all(r["im_id"] == 0 and r["scene_id"] == 1 for r in rows2)
    finally:
        rm.get_meta = real_get_meta


def test_predict_cli(tmp_path):
    """tools/predict.py: images + detections json + ckpt -> BOP pose CSV,
    no GT needed (serving path)."""
    import json

    import jax
    import jax.numpy as jnp

    from fixture_bop import build_fixture_dataset
    from gdrnet_tpu.config import base_config
    from gdrnet_tpu.data.bop import load_bop_scene_dicts
    from gdrnet_tpu.data.synthetic import synthetic_roi_batch
    from gdrnet_tpu.engine.checkpoint import CheckpointManager
    from gdrnet_tpu.engine.train_state import create_train_state
    from gdrnet_tpu.models import build_model
    from gdrnet_tpu.solver import build_optimizer
    import gdrnet_tpu.data.ref_meta as rm
    import tools.predict as predict_tool

    root = tmp_path / "ds"
    meta = build_fixture_dataset(str(root), n_images=2, seed=13)
    records = load_bop_scene_dicts(meta, "test")

    # config file matching the fixture shapes
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(
        "MODEL = dict(CDPN=dict(BACKBONE=dict(NUM_LAYERS=18, INPUT_RES=64, "
        "OUTPUT_RES=16), ROT_HEAD=dict(NUM_CLASSES=2, NUM_REGIONS=4)))\n"
        "TEST = dict(ROI_BATCH_SIZE=4)\n")

    # untrained ckpt (predict only needs weights to exist)
    cfg = base_config()
    cfg.MODEL.CDPN.BACKBONE.NUM_LAYERS = 18
    cfg.MODEL.CDPN.BACKBONE.INPUT_RES = 64
    cfg.MODEL.CDPN.BACKBONE.OUTPUT_RES = 16
    cfg.MODEL.CDPN.ROT_HEAD.NUM_CLASSES = 2
    cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 4
    model = build_model(cfg)
    sample = {k: jnp.asarray(v) for k, v in synthetic_roi_batch(
        batch_size=2, input_res=64, out_res=16).items()}
    state = create_train_state(model, build_optimizer(cfg), sample,
                               jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, 1)
    mgr.wait()

    # detections json from GT boxes (xywh)
    dets = {}
    for r in records:
        x, y, w, h = r["bbox_visib"]
        dets.setdefault(f"{r['scene_id']}/{r['im_id']}", []).append(
            {"obj_id": int(r["obj_id"]), "bbox_est": [float(x), float(y),
             float(w), float(h)], "score": 0.9})
    dets_path = tmp_path / "dets.json"
    dets_path.write_text(json.dumps(dets))

    out_csv = str(tmp_path / "poses.csv")
    real_get_meta = rm.get_meta
    rm.get_meta = lambda name, data_root=None: meta
    try:
        predict_tool.main([
            "--config-file", str(cfg_path), "--ckpt", str(tmp_path / "ckpt"),
            "--dataset", "fixture", "--dets", str(dets_path),
            "--image-root", osp.join(str(root), "test"),
            "--out", out_csv])
    finally:
        rm.get_meta = real_get_meta

    from gdrnet_tpu.eval import load_bop_results
    rows = load_bop_results(out_csv)
    assert len(rows) == len(records)
    for r in rows:
        assert np.all(np.isfinite(r["R"])) and np.all(np.isfinite(r["t"]))

    # int8 serving path (TEST.INT8): same CLI, poses must track bf16
    cfg8_path = tmp_path / "cfg8.py"
    cfg8_path.write_text(cfg_path.read_text().replace(
        "TEST = dict(ROI_BATCH_SIZE=4)",
        "TEST = dict(ROI_BATCH_SIZE=4, INT8=True, FOLD_BN=True)"))
    out8 = str(tmp_path / "poses_int8.csv")
    rm.get_meta = lambda name, data_root=None: meta
    try:
        predict_tool.main([
            "--config-file", str(cfg8_path), "--ckpt", str(tmp_path / "ckpt"),
            "--dataset", "fixture", "--dets", str(dets_path),
            "--image-root", osp.join(str(root), "test"),
            "--out", out8])
    finally:
        rm.get_meta = real_get_meta
    rows8 = load_bop_results(out8)
    assert len(rows8) == len(rows)
    from gdrnet_tpu.ops.rotation import rot_angle_deg
    for r, r8 in zip(rows, rows8):
        ang = float(np.asarray(rot_angle_deg(
            jnp.asarray(r["R"], jnp.float32)[None],
            jnp.asarray(r8["R"], jnp.float32)[None]))[0])
        assert ang < 2.0, ang
        assert np.linalg.norm(r8["t"] - r["t"]) < 0.05 * np.linalg.norm(r["t"])

    # PnP refinement in the serving CLI (TEST.USE_PNP + DEVICE_PNP): the
    # untrained net's maps are noise, so the net-translation fallback keeps
    # poses finite; this pins the predict->refine_bucket_poses wiring
    cfgp_path = tmp_path / "cfgp.py"
    cfgp_path.write_text(cfg_path.read_text().replace(
        "TEST = dict(ROI_BATCH_SIZE=4)",
        "TEST = dict(ROI_BATCH_SIZE=4, USE_PNP=True, DEVICE_PNP=True, "
        "PNP_TYPE='net_iter_pnp')"))
    outp = str(tmp_path / "poses_pnp.csv")
    rm.get_meta = lambda name, data_root=None: meta
    try:
        predict_tool.main([
            "--config-file", str(cfgp_path), "--ckpt", str(tmp_path / "ckpt"),
            "--dataset", "fixture", "--dets", str(dets_path),
            "--image-root", osp.join(str(root), "test"),
            "--out", outp])
    finally:
        rm.get_meta = real_get_meta
    rowsp = load_bop_results(outp)
    assert len(rowsp) == len(rows)
    for r in rowsp:
        assert np.all(np.isfinite(r["R"])) and np.all(np.isfinite(r["t"]))


def test_bench_ckpt_loading(tmp_path, capsys, monkeypatch):
    """bench.py --ckpt: benches (and int8-calibrates) real weights from an
    orbax checkpoint, with --config supplying non-flagship model dims
    (surrogate for the converted-reference-checkpoint bench)."""
    import json
    import sys

    import jax
    import jax.numpy as jnp

    from gdrnet_tpu.config import base_config
    from gdrnet_tpu.data import synthetic_roi_batch
    from gdrnet_tpu.engine import create_train_state
    from gdrnet_tpu.engine.checkpoint import CheckpointManager
    from gdrnet_tpu.models import build_model
    from gdrnet_tpu.solver import build_optimizer

    cfg = base_config()
    cfg.MODEL.CDPN.BACKBONE.NUM_LAYERS = 18
    cfg.MODEL.CDPN.BACKBONE.INPUT_RES = 32
    cfg.MODEL.CDPN.BACKBONE.OUTPUT_RES = 8
    cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 4
    # bench's flagship input assembly (2D coords + region attention)
    cfg.MODEL.CDPN.PNP_NET.WITH_2D_COORD = True
    cfg.MODEL.CDPN.PNP_NET.REGION_ATTENTION = True
    cfg.SOLVER.OPTIMIZER_CFG = {"type": "Adam", "lr": 1e-3}
    model = build_model(cfg)
    sample = {k: jnp.asarray(v) for k, v in synthetic_roi_batch(
        batch_size=2, input_res=32, out_res=8).items()}
    state = create_train_state(model, build_optimizer(cfg), sample,
                               jax.random.PRNGKey(7))
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(state, step=5)
    mgr.wait()

    # params-only restore (no optimizer template)
    from gdrnet_tpu.engine.checkpoint import load_variables_for_inference
    loaded = load_variables_for_inference(ckpt_dir)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["pnp_net"]["fc_r"]["kernel"]),
        np.asarray(state.params["pnp_net"]["fc_r"]["kernel"]))

    cfg_path = str(tmp_path / "bench_cfg.py")
    with open(cfg_path, "w") as f:
        f.write("MODEL = dict(CDPN=dict(BACKBONE=dict("
                "NUM_LAYERS=18, INPUT_RES=32, OUTPUT_RES=8), "
                "ROT_HEAD=dict(NUM_REGIONS=4)))\n")

    import bench
    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--ckpt", ckpt_dir, "--config", cfg_path,
        "--batch", "8", "--iters", "2", "--bf16"])
    bench.main()
    cap = capsys.readouterr()
    row = json.loads(cap.out.strip().splitlines()[-1])
    assert row["metric"] == "roi_pose_crops_per_sec_per_chip"
    assert row["value"] > 0 and np.isfinite(row["value"])
    assert "benching weights from" in cap.err

    # int8 path calibrates on the loaded weights too
    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--ckpt", ckpt_dir, "--config", cfg_path,
        "--batch", "8", "--iters", "2"])
    bench.main()
    row8 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row8["value"] > 0


def test_export_model_roundtrip(tmp_path):
    """tools/export_model.py: the serving forward serializes to a portable
    StableHLO artifact; deserializing WITHOUT the model code reproduces the
    in-process forward bitwise."""
    import json
    import sys

    import jax
    from jax import export as jex
    import jax.numpy as jnp

    cfg_path = str(tmp_path / "exp_cfg.py")
    with open(cfg_path, "w") as f:
        f.write("MODEL = dict(CDPN=dict(BACKBONE=dict("
                "NUM_LAYERS=18, INPUT_RES=32, OUTPUT_RES=8), "
                "ROT_HEAD=dict(NUM_REGIONS=4)))\n")
    out = str(tmp_path / "model.jaxexp")

    from tools.export_model import main as export_main
    export_main(["--out", out, "--config", cfg_path, "--batch", "4",
                 "--platforms", "cpu"])
    # int8 variant exports too (bitwise-identical to the in-process int8 run)
    export_main(["--out", str(tmp_path / "model_i8.jaxexp"), "--config",
                 cfg_path, "--batch", "4", "--platforms", "cpu", "--int8"])
    assert json.load(open(str(tmp_path / "model_i8.jaxexp.json")))["int8"]
    meta = json.load(open(out + ".json"))
    assert meta["arg_names"][0] == "roi_img"
    assert meta["shapes"]["roi_img"] == [4, 32, 32, 3]

    # loader side: raw jax.export only
    exp = jex.deserialize(open(out, "rb").read())
    from gdrnet_tpu.data import synthetic_roi_batch
    b = {k: jnp.asarray(v) for k, v in synthetic_roi_batch(
        batch_size=4, input_res=32, out_res=8).items()}
    args = [b[k] for k in meta["arg_names"]]
    rot, trans = exp.call(*args)
    assert rot.shape == (4, 3, 3) and trans.shape == (4, 3)
    assert np.isfinite(np.asarray(rot)).all()

    # matches the in-process forward (same random init seed 0)
    from gdrnet_tpu.config import base_config, load_config
    from gdrnet_tpu.config.config import Config, merge_dict
    from gdrnet_tpu.models import build_model
    cfg = base_config()
    cfg.MODEL.CDPN.PNP_NET.WITH_2D_COORD = True
    cfg.MODEL.CDPN.PNP_NET.REGION_ATTENTION = True
    cfg = Config(merge_dict(cfg.to_dict(), load_config(cfg_path).to_dict()))
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, b["roi_img"],
        roi_classes=b["roi_classes"], roi_coord_2d=b["roi_coord_2d"],
        roi_cams=b["roi_cams"], roi_centers=b["roi_centers"],
        roi_whs=b["roi_whs"], roi_extents=b["roi_extents"],
        resize_ratios=b["resize_ratios"], train=False)
    # jit the in-process forward too: the exported program is compiled, and
    # eager-vs-compiled bf16 rounding differences amplify ~100x through the
    # ortho6d normalize/cross on random weights
    @jax.jit
    def fwd(variables, b):
        out = model.apply(
            variables, b["roi_img"], roi_classes=b["roi_classes"],
            roi_coord_2d=b["roi_coord_2d"], roi_cams=b["roi_cams"],
            roi_centers=b["roi_centers"], roi_whs=b["roi_whs"],
            roi_extents=b["roi_extents"], resize_ratios=b["resize_ratios"],
            train=False)
        return out["rot"], out["trans"]

    want_rot, want_trans = fwd(variables, b)
    np.testing.assert_allclose(np.asarray(rot), np.asarray(want_rot),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(trans), np.asarray(want_trans),
                               atol=1e-6)
