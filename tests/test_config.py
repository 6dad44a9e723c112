"""Config-system tests: _base_ inheritance, _delete_ semantics, opts
overrides, and that the ported experiment configs load into the full default
tree (reference mmcv Config behaviours, main_gdrn.py:39-41)."""

import os.path as osp

import pytest

from gdrnet_tpu.config import base_config, load_config
from gdrnet_tpu.config.config import Config, apply_opts, merge_dict

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_base_config_tree():
    cfg = base_config()
    assert cfg.MODEL.CDPN.BACKBONE.NUM_LAYERS == 34
    assert cfg.MODEL.CDPN.PNP_NET.ROT_TYPE == "ego_rot6d"
    assert cfg.get_path("SOLVER.IMS_PER_BATCH") == 6
    assert cfg.get_path("NOPE.NOPE", 42) == 42


def test_merge_delete_semantics():
    base = {"A": {"x": 1, "y": 2}, "B": 1}
    over = {"A": {"_delete_": True, "z": 3}}
    out = merge_dict(base, over)
    assert out["A"] == {"z": 3}
    assert out["B"] == 1
    # without _delete_, dicts merge
    out2 = merge_dict(base, {"A": {"z": 3}})
    assert out2["A"] == {"x": 1, "y": 2, "z": 3}


def test_apply_opts():
    cfg = base_config()
    apply_opts(cfg, ["SOLVER.IMS_PER_BATCH=48", "MODEL.CDPN.PNP_NET.ROT_TYPE=allo_rot6d",
                     "DATASETS.TRAIN=('lm_13_train',)"])
    assert cfg.SOLVER.IMS_PER_BATCH == 48
    assert cfg.MODEL.CDPN.PNP_NET.ROT_TYPE == "allo_rot6d"
    assert cfg.DATASETS.TRAIN == ("lm_13_train",)


@pytest.mark.parametrize("path,checks", [
    ("configs/gdrn/lm/a6_cPnP_lm13.py",
     {"SOLVER.IMS_PER_BATCH": 24, "MODEL.CDPN.ROT_HEAD.NUM_REGIONS": 64,
      "MODEL.CDPN.PNP_NET.ROT_TYPE": "allo_rot6d"}),
    ("configs/gdrn/lmo/a6_cPnP_AugAAETrunc_BG0.5_lmo_real_pbr0.1_40e.py",
     {"SOLVER.TOTAL_EPOCHS": 40, "DATASETS.TRAIN2_RATIO": 0.1,
      "INPUT.TRUNCATE_FG": True}),
    ("configs/gdrn/ycbv/a6_cPnP_AugAAETrunc_BG0.5_Rsym_ycbv_real_pbr_visib20_10e.py",
     {"MODEL.CDPN.PNP_NET.PM_LOSS_SYM": True, "DATALOADER.FILTER_VISIB_THR": 0.2,
      "MODEL.CDPN.ROT_HEAD.NUM_CLASSES": 21}),
    ("configs/gdrn/lmoSO/a6_cPnP_AugAAETrunc_BG0.5_lmo_real_pbr0.1_80e_ape.py",
     {"SOLVER.TOTAL_EPOCHS": 80, "MODEL.CDPN.ROT_HEAD.NUM_CLASSES": 1,
      "DATASETS.TRAIN": ("lm_real_ape_all",),
      "DATASETS.TRAIN2": ("lmo_pbr_ape_train",)}),
    ("configs/gdrn/lmoSO/a6_cPnP_AugAAETrunc_BG0.5_lmoRealBl_160e_duck.py",
     {"SOLVER.TOTAL_EPOCHS": 160,
      "DATASETS.TRAIN": ("lm_real_duck_all", "lmo_blender_duck_train")}),
    ("configs/gdrn/ycbvSO/"
     "a6_cPnP_AugAAETrunc_BG0.5_ycbv_real_pbr_visib20_20e_024_bowl_Rsym.py",
     {"SOLVER.TOTAL_EPOCHS": 20, "MODEL.CDPN.PNP_NET.PM_LOSS_SYM": True,
      "DATASETS.TRAIN": ("ycbv_024_bowl_train_real", "ycbv_024_bowl_train_pbr")}),
    ("configs/gdrn/ycbvSO/"
     "a6_cPnP_AugAAETrunc_BG0.5_ycbv_real_pbr_visib20_20e_025_mug.py",
     {"MODEL.CDPN.PNP_NET.PM_LOSS_SYM": False}),
])
def test_experiment_configs_load(path, checks):
    file_cfg = load_config(osp.join(REPO, path))
    cfg = Config(merge_dict(base_config().to_dict(), file_cfg.to_dict()))
    for key, want in checks.items():
        got = cfg.get_path(key)
        assert got == want, f"{path}: {key} = {got}, want {want}"
    # the full default tree is still there
    assert cfg.MODEL.CDPN.BACKBONE.INPUT_RES == 256
    # _delete_ on OPTIMIZER_CFG replaced the dict wholesale
    assert set(dict(cfg.SOLVER.OPTIMIZER_CFG)) <= {"type", "lr", "weight_decay"}


def test_train_cli_setup(tmp_path, monkeypatch):
    from gdrnet_tpu.engine.train import parse_args, setup

    # setup() dumps config_dump.json into the (relative) OUTPUT_DIR; run in
    # a tmp cwd so the test never clobbers the repo's committed output/ dump
    monkeypatch.chdir(tmp_path)
    args = parse_args(["--config-file", osp.join(REPO, "configs/gdrn/lm/a6_cPnP_lm13.py"),
                       "SOLVER.IMS_PER_BATCH=8"])
    cfg = setup(args)
    assert cfg.SOLVER.IMS_PER_BATCH == 8
    assert cfg.OUTPUT_DIR == "output/gdrn/lm/a6_cPnP_lm13"
    assert (tmp_path / cfg.OUTPUT_DIR / "config_dump.json").exists()


def test_all_experiment_configs_load():
    import glob
    paths = glob.glob(osp.join(REPO, "configs/gdrn/**/*.py"), recursive=True)
    assert len(paths) >= 54  # lm + lmSO(13) + lmo(2) + lmoSO(16) + ycbv + ycbvSO(21)
    for p in paths:
        file_cfg = load_config(p)
        cfg = Config(merge_dict(base_config().to_dict(), file_cfg.to_dict()))
        assert cfg.OUTPUT_DIR, p
