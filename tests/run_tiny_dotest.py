"""Shared helper: deterministic tiny-model do_test over the fixture dataset.
Used by test_multihost.py from the pytest process (1-process baseline) and
from spawned jax.distributed workers (sharded run) — identical PRNGKey(0)
init makes results comparable across processes."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gdrnet_tpu.config import base_config
from gdrnet_tpu.data import ObjectModels, synthetic_roi_batch
from gdrnet_tpu.data.bop import load_bop_scene_dicts
from gdrnet_tpu.data.ref_meta import DatasetMeta
from gdrnet_tpu.engine.tester import do_test
from gdrnet_tpu.models import build_model


def _fixture_meta(root: str) -> DatasetMeta:
    """Reconstruct the DatasetMeta of a build_fixture_dataset() dir (same
    fields as tests/fixture_bop.py:134-141) without rebuilding imagery."""
    import json
    import os.path as osp

    import numpy as np

    with open(osp.join(root, "models", "models_info.json")) as f:
        info = json.load(f)
    K = np.array([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1.0]],
                 np.float32)
    return DatasetMeta(
        name="fixture", objects=["cube", "brick"],
        id2obj={1: "cube", 2: "brick"},
        diameters_by_name={"cube": info["1"]["diameter"] / 1000.0,
                           "brick": info["2"]["diameter"] / 1000.0},
        camera_matrix=K, width=320, height=240, data_root=root,
        sym_objects=["brick"])


def run_tiny_do_test(fixture_root: str, outdir: str | None = None,
                     save_csv: bool = True) -> dict:
    meta = _fixture_meta(fixture_root)
    records = load_bop_scene_dicts(meta, "test")
    models = ObjectModels(meta, num_pm_points=64, num_fps=4)

    cfg = base_config()
    cfg.MODEL.CDPN.BACKBONE.NUM_LAYERS = 18
    cfg.MODEL.CDPN.BACKBONE.INPUT_RES = 32  # smallest res: fast CPU compile
    cfg.MODEL.CDPN.BACKBONE.OUTPUT_RES = 8
    cfg.MODEL.CDPN.ROT_HEAD.NUM_CLASSES = 2
    cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 4
    cfg.TEST.ROI_BATCH_SIZE = 4
    model = build_model(cfg)
    sample = {k: jnp.asarray(v) for k, v in synthetic_roi_batch(
        batch_size=2, input_res=32, out_res=8).items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, sample["roi_img"],
        roi_classes=sample["roi_classes"], roi_coord_2d=sample["roi_coord_2d"],
        roi_cams=sample["roi_cams"], roi_centers=sample["roi_centers"],
        roi_whs=sample["roi_whs"], roi_extents=sample["roi_extents"],
        resize_ratios=sample["resize_ratios"], train=False)
    return do_test(cfg, model, variables, models, records,
                   output_dir=outdir, save_csv=save_csv)
