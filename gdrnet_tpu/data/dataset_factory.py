"""Dataset-name registry: string names in configs -> record lists.

The reference registers named splits into detectron2's DatasetCatalog
(core/gdrn_modeling/dataset_factory.py:19-76 + SPLITS_* dicts in each
dataset module, e.g. lm_dataset_d2.py:303). Here a name resolves through
(a) explicit `register()` entries, then (b) a pattern parser covering the
reference's naming scheme:

  lm_13_train, lm_13_test, lm_real_<obj>_train, lm_pbr_13_train,
  lmo_train, lmo_test, lmo_pbr_train, ycbv_train_real, ycbv_train_pbr,
  ycbv_test, fixture_test (unit tests)
"""

from __future__ import annotations

from typing import Callable

import os.path as _osp

from gdrnet_tpu.data.ref_meta import get_meta, DatasetMeta
from gdrnet_tpu.data.bop import load_bop_scene_dicts


def osp_join_root(data_root: str, sub: str) -> str:
    """Renders live beside (not inside) BOP_DATASETS (reference layout:
    datasets/lm_renders_blender vs datasets/BOP_DATASETS/lm)."""
    parent = _osp.dirname(data_root.rstrip("/")) or "."
    return _osp.join(parent, sub)

_REGISTRY: dict[str, Callable[[], tuple[DatasetMeta, list[dict]]]] = {}


def register(name: str, fn: Callable[[], tuple[DatasetMeta, list[dict]]]) -> None:
    _REGISTRY[name] = fn


def resolve(name: str, data_root: str = "datasets/BOP_DATASETS",
            visib_thr: float = 0.0) -> tuple[DatasetMeta, list[dict]]:
    """name -> (meta, records)."""
    if name in _REGISTRY:
        return _REGISTRY[name]()

    parts = name.split("_")
    ds = parts[0]
    if ds == "lm" and ("blender" in parts or "imgn" in parts):
        # lm_blender_13_train | lm_imgn_13_train_1k_per_obj
        # (reference lm_blender.py:304 / lm_syn_imgn.py)
        from gdrnet_tpu.data.render_dataset import load_render_folder_dicts

        meta = get_meta("lm13" if "13" in parts else "lm", data_root)
        n_per_obj = -1
        for p in parts:
            if p.endswith("k") and p[:-1].isdigit():
                n_per_obj = int(p[:-1]) * 1000
        kind = "blender" if "blender" in parts else "imgn"
        sub = ("lm_renders_blender/renders" if kind == "blender"
               else "lm_imgn/imgn")
        renders_root = osp_join_root(data_root, sub)
        recs = load_render_folder_dicts(
            meta, renders_root, objs=meta.objects, n_per_obj=n_per_obj,
            img_type="syn_blender" if kind == "blender" else "syn",
            visib_thr=visib_thr)
        return meta, recs
    if ds == "lm":
        meta = get_meta("lm13" if "13" in parts else "lm", data_root)
        if "pbr" in parts:
            split, img_type = "train_pbr", "syn_pbr"
        elif "test" in parts:
            split, img_type = "test", "real"
        else:
            split, img_type = "train", "real"
        objs = None
        # per-object SO splits: lm_real_ape_train (lm_dataset_d2.py:303+)
        for p in parts[1:]:
            if p in meta.objects:
                objs = [p]
        recs = load_bop_scene_dicts(meta, split, objs=objs, visib_thr=visib_thr,
                                    img_type=img_type)
        return meta, recs
    if ds == "lmo":
        meta = get_meta("lmo", data_root)
        if "pbr" in parts:
            split, img_type = "train_pbr", "syn_pbr"
        elif "test" in parts or "bop" in parts:
            split, img_type = "test", "real"
        else:
            split, img_type = "train", "real"
        recs = load_bop_scene_dicts(meta, split, visib_thr=visib_thr, img_type=img_type)
        return meta, recs
    if ds == "ycbv":
        meta = get_meta("ycbv", data_root)
        if "pbr" in parts:
            split, img_type = "train_pbr", "syn_pbr"
        elif "real" in parts:
            split, img_type = "train_real", "real"
        elif "synt" in parts:
            split, img_type = "train_synt", "syn"
        elif "test" in parts or "bop" in parts:
            split, img_type = "test", "real"
        else:
            split, img_type = "train_pbr", "syn_pbr"
        recs = load_bop_scene_dicts(meta, split, visib_thr=visib_thr, img_type=img_type)
        if split == "test" and "bop" not in parts:
            # YCB-V keyframe test protocol (reference ycbv_d2.py keyframe
            # split: image_sets/keyframe.txt lines "scene/im_id")
            kf = _osp.join(meta.data_root, "image_sets", "keyframe.txt")
            if _osp.exists(kf):
                with open(kf) as f:
                    keep = {tuple(int(x) for x in ln.strip().split("/"))
                            for ln in f if ln.strip()}
                recs = [r for r in recs if (r["scene_id"], r["im_id"]) in keep]
        return meta, recs
    raise KeyError(f"Cannot resolve dataset name: {name}")
