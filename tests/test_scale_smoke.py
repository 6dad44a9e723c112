"""Multi-device REAL-data-path smoke over the generated scale dataset
(datasets/BOP_DATASETS/synth, tools/gen_scale_dataset.py): short do_train on
the 8-device virtual mesh with the HBM-resident pool + background refresh ON,
then sharded do_test with ESTIMATED detections — proving sharded pool
gathers, refresh scatter and sharded bucket inference compose on the real
on-disk data path, not just fixture/synthetic batches.

The full-volume version of this (300 epochs + the whole 400-image held-out
split on the real chip) is SCALE_RUN.md; this test pins the composition in
the CI suite. Reference analogue: engine.py do_train + gdrn_evaluator
inference-on-dataset, exercised there by full LM/YCBV runs.

Skipped when the scale dataset has not been generated (it is 2.3 GB and
gitignored; `python tools/gen_scale_dataset.py` rebuilds it).
"""

import json
import os.path as osp

import numpy as np
import pytest

from gdrnet_tpu.config import base_config

_SYNTH_ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..",
                       "datasets", "BOP_DATASETS", "synth")

pytestmark = pytest.mark.skipif(
    not osp.isfile(osp.join(_SYNTH_ROOT, "meta.json")),
    reason="scale dataset not generated (tools/gen_scale_dataset.py)")


@pytest.fixture(scope="module")
def synth_subset():
    from gdrnet_tpu.data import ObjectModels
    from gdrnet_tpu.data.bop import load_bop_scene_dicts
    from gdrnet_tpu.data.dataset_factory import register
    from gdrnet_tpu.data.ref_meta import meta_from_json

    meta = meta_from_json(_SYNTH_ROOT)
    # deterministic small slices: one train scene capped at 16 images
    # (~100 ROIs), first 6 held-out test images
    train = [r for r in load_bop_scene_dicts(meta, "train", scenes=[1],
                                             visib_thr=0.1, img_type="syn_pbr")
             if r["im_id"] < 16]
    test = [r for r in load_bop_scene_dicts(meta, "test", visib_thr=0.1,
                                            img_type="real")
            if r["scene_id"] == 101 and r["im_id"] < 6]
    assert len(train) >= 48 and len(test) >= 12  # real multi-instance scenes
    register("synthmini_train", lambda: (meta, train))
    register("synthmini_test", lambda: (meta, test))
    models = ObjectModels(meta, num_pm_points=64, num_fps=8)
    return meta, train, test, models


def _cfg(tmp_path):
    cfg = base_config()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 3
    bb = cfg.MODEL.CDPN.BACKBONE
    bb.NUM_LAYERS = 18
    bb.INPUT_RES = 64
    bb.OUTPUT_RES = 16
    cfg.MODEL.CDPN.ROT_HEAD.NUM_CLASSES = 10
    cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 8
    pnp = cfg.MODEL.CDPN.PNP_NET
    pnp.WITH_2D_COORD = True
    pnp.REGION_ATTENTION = True
    pnp.PM_LOSS_SYM = True
    pnp.CENTROID_LW = 1.0
    pnp.Z_LW = 1.0
    pnp.NUM_PM_POINTS = 64
    cfg.SOLVER.IMS_PER_BATCH = 16
    cfg.SOLVER.OPTIMIZER_CFG = {"type": "Adam", "lr": 1e-3, "weight_decay": 0}
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.ANNEAL_POINT = 1.0
    cfg.SOLVER.CHECKPOINT_PERIOD = 1000
    cfg.SOLVER.CHECKPOINT_BY_EPOCH = False
    cfg.DATASETS.TRAIN = ("synthmini_train",)
    cfg.DATASETS.TEST = ("synthmini_test",)
    cfg.DATASETS.SYM_OBJS = ["brick", "tower", "bar", "hexprism"]
    cfg.TRAIN.PRINT_FREQ = 5
    cfg.TRAIN.DEVICE_RESIDENT_POOL = True
    cfg.TRAIN.POOL_REFRESH = True
    cfg.TRAIN.POOL_REFRESH_CHUNK = 8
    cfg.TEST.ROI_BATCH_SIZE = 16
    return cfg


def test_pool_train_then_sharded_est_eval(synth_subset, tmp_path):
    from gdrnet_tpu.engine.tester import do_test
    from gdrnet_tpu.engine.trainer import do_train
    from gdrnet_tpu.models import build_model

    meta, train, test, models = synth_subset
    cfg = _cfg(tmp_path)

    # --- train: HBM pool + refresh over the 8-device mesh on real data
    state, models_t, preempted = do_train(cfg, max_iters_override=14)
    assert int(state.step) == 14 and not preempted
    with open(osp.join(cfg.OUTPUT_DIR, "metrics.json")) as f:
        hist = [json.loads(l) for l in f if l.strip()]
    losses = [h["total_loss"] for h in hist if "total_loss" in h]
    assert len(losses) >= 3 and all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]

    # --- sharded eval (TEST.LOCAL_DEVICES=-1 -> all 8 virtual devices) with
    # estimated detections incl. jitter/dropouts/false positives
    cfg.TEST.TEST_BBOX_TYPE = "est"
    cfg.MODEL.LOAD_DETS_TEST = True
    cfg.DATASETS.DET_FILES_TEST = (
        osp.join(_SYNTH_ROOT, "test_bboxes", "est_dets.json"),)
    cfg.VAL.ERROR_TYPES = "ad,rete,proj"
    results = do_test(cfg, build_model(cfg), state.variables(), models_t,
                      test, output_dir=cfg.OUTPUT_DIR)
    assert "Avg" in results and osp.exists(results["_csv_path"])
    # every evaluated object reports sane bounded metrics; duplicates and
    # detection dropouts on this slice surface as counts/n_missing
    per_obj = {k: v for k, v in results.items()
               if not k.startswith("_") and k != "Avg"}
    assert per_obj, results
    n_scored = 0
    for name, row in per_obj.items():
        assert 0.0 <= row["ad_10"] <= 1.0, (name, row)
        n_scored += row.get("count", 0)
    assert n_scored >= len(test) // 2  # most GTs matched by an est det
