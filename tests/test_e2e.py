"""End-to-end slice test (SURVEY.md §7 stage 4): on the tiny fixture BOP
dataset run the full train loop (loader -> pjit train step -> ckpt) for a few
dozen iterations, check the loss drops and resume works, then run the test
loop (padded ROI buckets -> predict -> CustomEvaluator -> BOP CSV)."""

import os.path as osp

import numpy as np
import pytest

from gdrnet_tpu.config import base_config
from gdrnet_tpu.data import ObjectModels
from gdrnet_tpu.data.bop import load_bop_scene_dicts
from gdrnet_tpu.data.dataset_factory import register, resolve
from gdrnet_tpu.models import build_model

from fixture_bop import build_fixture_dataset


@pytest.fixture(scope="module")
def fixture_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop_e2e")
    meta = build_fixture_dataset(str(root), n_images=4, seed=11)

    def _resolver():
        recs = load_bop_scene_dicts(meta, "test", img_type="real")
        return meta, recs

    register("fixture_train", _resolver)
    register("fixture_test", _resolver)
    return meta, root


def _tiny_cfg(out_dir):
    cfg = base_config()
    cfg.OUTPUT_DIR = str(out_dir)
    cfg.SEED = 1
    bb = cfg.MODEL.CDPN.BACKBONE
    bb.NUM_LAYERS = 18
    bb.INPUT_RES = 64
    bb.OUTPUT_RES = 16
    cfg.MODEL.CDPN.ROT_HEAD.NUM_CLASSES = 2
    cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 4
    pnp = cfg.MODEL.CDPN.PNP_NET
    pnp.WITH_2D_COORD = True
    pnp.REGION_ATTENTION = True
    pnp.PM_LOSS_SYM = True
    pnp.CENTROID_LW = 1.0
    pnp.Z_LW = 1.0
    pnp.NUM_PM_POINTS = 64
    cfg.SOLVER.IMS_PER_BATCH = 4
    # Adam here: Ranger's pre-rectification phase is deliberately slow and
    # this run is 60 iters (Ranger itself is covered in test_solver.py)
    cfg.SOLVER.OPTIMIZER_CFG = {"type": "Adam", "lr": 1e-3, "weight_decay": 0}
    cfg.SOLVER.WARMUP_ITERS = 5
    cfg.SOLVER.ANNEAL_POINT = 1.0  # stay flat for the whole tiny run
    cfg.SOLVER.CHECKPOINT_PERIOD = 1000  # only the final save
    cfg.SOLVER.CHECKPOINT_BY_EPOCH = False
    cfg.DATALOADER.NUM_WORKERS = 1  # deterministic batch order
    cfg.INPUT.DZI_TYPE = "none"  # fixed crops -> smooth overfit trajectory
    cfg.DATASETS.TRAIN = ("fixture_train",)
    cfg.DATASETS.TEST = ("fixture_test",)
    cfg.DATASETS.SYM_OBJS = ["brick"]
    cfg.TRAIN.PRINT_FREQ = 10
    cfg.TEST.ROI_BATCH_SIZE = 4
    return cfg


def test_train_eval_resume(fixture_env, tmp_path):
    from gdrnet_tpu.engine.trainer import do_train
    from gdrnet_tpu.engine.tester import do_test
    from gdrnet_tpu.engine.checkpoint import CheckpointManager

    meta, root = fixture_env
    cfg = _tiny_cfg(tmp_path / "out")
    # profiler window (TRAIN.PROFILE_*) piggybacks on this run
    cfg.TRAIN.PROFILE_DIR = str(tmp_path / "trace")
    cfg.TRAIN.PROFILE_START, cfg.TRAIN.PROFILE_STOP = 10, 12

    # --- train 40 iters, capture metrics.json for the loss trajectory
    state, models, preempted = do_train(cfg, max_iters_override=60)
    assert int(state.step) == 60 and not preempted

    import glob
    assert glob.glob(str(tmp_path / "trace" / "**" / "*.xplane.pb"),
                     recursive=True), "profiler trace not written"

    import json
    with open(osp.join(cfg.OUTPUT_DIR, "metrics.json")) as f:
        rows = [json.loads(l) for l in f]
    losses = [r["total_loss"] for r in rows]
    assert all(np.isfinite(losses))
    # threaded loaders assemble batches in nondeterministic order, so compare
    # window means rather than endpoints
    head = float(np.mean(losses[:3]))
    tail = float(np.mean(losses[-3:]))
    assert tail < head * 0.95, f"loss did not drop: {losses}"

    # --- checkpoint was written and resume restores the step
    mgr = CheckpointManager(osp.join(cfg.OUTPUT_DIR, "ckpt"))
    assert mgr.latest_step() == 60
    restored, start = mgr.resume_or_load(state, resume=True)
    assert start == 60
    np.testing.assert_allclose(
        np.asarray(restored.params["pnp_net"]["fc_r"]["kernel"]),
        np.asarray(state.params["pnp_net"]["fc_r"]["kernel"]))

    # --- test loop: inference + evaluator + BOP CSV (+ in-process BOP
    # scoring over VAL.ERROR_TYPES, reference VAL.USE_BOP)
    model = build_model(cfg)
    _, records = resolve("fixture_test")
    cfg.VAL.USE_BOP = True
    # vsd included: BOP19 AR = mean(vsd, mssd, mspd) end-to-end through
    # do_test (depth_path records -> eval/bop_score._vsd_errors_by_obj)
    cfg.VAL.ERROR_TYPES = "ad,rete,proj,vsd,mssd,mspd"
    results = do_test(cfg, model, state.variables(), models, records,
                      output_dir=cfg.OUTPUT_DIR)
    assert "Avg" in results
    assert set(results["_bop"]) == {"ad", "rete", "proj", "vsd", "mssd", "mspd"}
    assert 0.0 <= results["_bop"]["ad"]["avg"] <= 1.0
    assert 0.0 <= results["_bop"]["vsd"]["avg"] <= 1.0
    assert results["_bop_average_recall"] == pytest.approx(np.mean(
        [results["_bop"][k]["avg"] for k in ("vsd", "mssd", "mspd")]))
    for name in ("cube", "brick"):
        assert name in results
        assert 0.0 <= results[name]["ad_10"] <= 1.0
        assert results[name]["count"] == 4
    assert osp.exists(results["_csv_path"])
    from gdrnet_tpu.eval import load_bop_results
    loaded = load_bop_results(results["_csv_path"])
    assert len(loaded) == 8  # 4 images x 2 objects
    # official BOP toolkit requires one time value per image
    times_by_img: dict = {}
    for r in loaded:
        times_by_img.setdefault((r["scene_id"], r["im_id"]), set()).add(r["time"])
    assert all(len(v) == 1 for v in times_by_img.values())
    assert "objects" in results["_summary"]

    # --- local data-parallel inference (TEST.LOCAL_DEVICES): the run above
    # sharded each bucket over the virtual mesh (default -1 = all local
    # devices); forcing single-device must yield the same metrics up to f32
    # round-off (per-device conv batch blocking changes summation order by
    # ~1e-6 rel, amplified through acos in the rotation error)
    cfg.TEST.LOCAL_DEVICES = 1
    cfg.VAL.USE_BOP = False  # skip re-scoring; pose metrics are the signal
    r1 = do_test(cfg, model, state.variables(), models, records,
                 output_dir=None, save_csv=False)
    for name in ("cube", "brick"):
        for k, v in results[name].items():
            assert r1[name][k] == pytest.approx(v, rel=1e-4, abs=1e-6), (name, k)
    cfg.TEST.LOCAL_DEVICES = -1
    cfg.VAL.USE_BOP = True

    # --- est-detections eval: brick has no detections anywhere -> its GTs
    # are recall failures (reference gdrn_custom_evaluator.py:552-556)
    import json as _json
    det_path = osp.join(cfg.OUTPUT_DIR, "dets.json")
    cube_id = models.meta.obj2id["cube"]
    dets = [{"scene_id": r["scene_id"], "im_id": r["im_id"], "obj_id": cube_id,
             "bbox_est": [float(v) for v in r["bbox_visib"]], "score": 0.9}
            for r in records if r["obj_id"] == cube_id]
    with open(det_path, "w") as f:
        _json.dump(dets, f)
    cfg.DATASETS.DET_FILES_TEST = (det_path,)
    cfg.TEST.TEST_BBOX_TYPE = "est"
    cfg.MODEL.LOAD_DETS_TEST = True  # reference gate for loading det files
    rdet = do_test(cfg, model, state.variables(), models, records,
                   output_dir=osp.join(cfg.OUTPUT_DIR, "est"))
    assert rdet["cube"]["count"] == 4 and "n_missing" not in rdet["cube"]
    assert rdet["brick"]["n_missing"] == 4 and rdet["brick"]["ad_10"] == 0.0
    # precision mode ignores the undetected brick GTs entirely
    cfg.VAL.EVAL_PRECISION = True
    rprec = do_test(cfg, model, state.variables(), models, records,
                    output_dir=osp.join(cfg.OUTPUT_DIR, "est_prec"),
                    save_csv=False)
    assert "brick" not in rprec and rprec["cube"]["count"] == 4
    cfg.VAL.EVAL_PRECISION = False
    cfg.TEST.TEST_BBOX_TYPE = "gt"
    cfg.DATASETS.DET_FILES_TEST = ()

    # --- int8 serving x device-side cropping (full serving matrix): the
    # quantized convs must compose with TEST.DEVICE_PREPROCESS and produce
    # poses tracking the bf16 eval
    cfg.TEST.INT8 = True
    cfg.TEST.DEVICE_PREPROCESS = True
    cfg.TEST.FOLD_BN = True  # folded kernels must quantize cleanly too
    r8 = do_test(cfg, model, state.variables(), models, records,
                 output_dir=osp.join(cfg.OUTPUT_DIR, "int8"))
    loaded8 = load_bop_results(r8["_csv_path"])
    assert len(loaded8) == 8
    for a, b in zip(loaded, loaded8):
        assert np.isfinite(b["R"]).all() and np.isfinite(b["t"]).all()
        # same ROI order; int8 translation within 10% of bf16
        assert np.linalg.norm(b["t"] - a["t"]) < 0.1 * np.linalg.norm(a["t"])
    cfg.TEST.INT8 = False
    cfg.TEST.DEVICE_PREPROCESS = False


def test_train_device_preprocess(fixture_env, tmp_path):
    """INPUT.DEVICE_PREPROCESS=True: host ships raw frames, the XLA pipeline
    builds the train batch on device; loss must drop like the host path."""
    from gdrnet_tpu.engine.trainer import do_train

    cfg = _tiny_cfg(tmp_path / "out_devprep")
    cfg.INPUT.DEVICE_PREPROCESS = True
    state, models, preempted = do_train(cfg, max_iters_override=60)
    assert int(state.step) == 60 and not preempted

    import json
    with open(osp.join(cfg.OUTPUT_DIR, "metrics.json")) as f:
        rows = [json.loads(l) for l in f]
    losses = [r["total_loss"] for r in rows]
    assert all(np.isfinite(losses))
    head = float(np.mean(losses[:3]))
    tail = float(np.mean(losses[-3:]))
    assert tail < head * 0.95, f"loss did not drop (device preprocess): {losses}"


def test_train_preemption_checkpoint(fixture_env, tmp_path):
    """SIGTERM mid-train: trainer checkpoints the current step and returns;
    --resume continues from it (TPU-pod preemption path)."""
    import os
    import signal
    import threading

    from gdrnet_tpu.engine.trainer import do_train
    from gdrnet_tpu.engine.checkpoint import CheckpointManager

    cfg = _tiny_cfg(tmp_path / "out_preempt")
    cfg.TRAIN.PRINT_FREQ = 1
    metrics_path = osp.join(cfg.OUTPUT_DIR, "metrics.json")

    stop = threading.Event()

    def _fire_after_first_iter():
        # signal only once training demonstrably progressed
        import time as _t
        while not stop.is_set():
            if osp.exists(metrics_path) and os.path.getsize(metrics_path) > 0:
                os.kill(os.getpid(), signal.SIGTERM)
                return
            _t.sleep(0.2)

    t = threading.Thread(target=_fire_after_first_iter, daemon=True)
    t.start()
    try:
        state, models, preempted = do_train(cfg, max_iters_override=2000)
    finally:
        stop.set()
    assert preempted, "do_train must report the preemption"
    step = int(state.step)
    assert 0 < step < 2000, f"expected preemption mid-run, got step {step}"
    mgr = CheckpointManager(osp.join(cfg.OUTPUT_DIR, "ckpt"))
    assert mgr.latest_step() == step
    # resume restores the exact step
    restored, start = mgr.resume_or_load(state, resume=True)
    assert start == step


def test_graft_entry_forward_contract():
    """Driver contract: `entry()` returns (fn, example_args) that jit-lowers
    and compiles single-device (the driver compile-checks exactly this)."""
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    lowered = jax.jit(fn).lower(*args)
    rot_info, trans_info = jax.tree.leaves(
        lowered.out_info, is_leaf=lambda x: hasattr(x, "shape"))
    assert tuple(rot_info.shape) == (8, 3, 3)
    assert tuple(trans_info.shape) == (8, 3)
    lowered.compile()


def test_graft_entry_dryrun_multichip_inprocess():
    """Driver contract: `dryrun_multichip(8)` must pass when imported into a
    process that already has >=8 devices (round-1 regression: the import-path
    call assumed the CLI had pre-provisioned the virtual mesh)."""
    import jax

    import __graft_entry__

    assert len(jax.devices()) >= 8  # conftest provisions the virtual mesh
    __graft_entry__.dryrun_multichip(8)
