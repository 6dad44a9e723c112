"""BOP dataset parameters for the datasets this framework targets (LM,
LM-O, YCB-V) — reference lib/pysixd/dataset_params.py:15-391 semantics:
the same dict keys and path templates over the standard BOP directory
layout, so tooling written against the reference's `dp_split`/`dp_model`
dicts ports unchanged.
"""

from __future__ import annotations

import glob
import math
import os
from os.path import join

from gdrnet_tpu.data.io import load_cam_params

_SUPPORTED = ("lm", "lmo", "ycbv", "ycbvposecnn")

OBJ_IDS = {
    "lm": list(range(1, 16)),
    "lmo": [1, 5, 6, 8, 9, 10, 11, 12],
    "ycbv": list(range(1, 22)),
    "ycbvposecnn": list(range(1, 22)),
}

SYMMETRIC_OBJ_IDS = {
    "lm": [3, 7, 10, 11],
    "lmo": [10, 11],
    "ycbv": [1, 13, 14, 16, 18, 19, 20, 21],
    "ycbvposecnn": [13, 16, 19, 20, 21],
}


def _check(dataset_name: str) -> None:
    if dataset_name not in _SUPPORTED:
        raise ValueError(f"unknown BOP dataset {dataset_name!r}; "
                         f"supported: {_SUPPORTED}")


def get_camera_params(datasets_path: str, dataset_name: str,
                      cam_type: str | None = None) -> dict:
    """Sensor-level camera parameters (dataset_params.py:15-67): K,
    im_size, depth_scale from the dataset's camera json."""
    _check(dataset_name)
    if dataset_name in ("ycbv", "ycbvposecnn"):
        dataset_name = "ycbv"
        cam_filename = f"camera_{cam_type or 'uw'}.json"
    else:
        cam_filename = "camera.json"
    path = join(datasets_path, dataset_name, cam_filename)
    p = {"cam_params_path": path}
    p.update(load_cam_params(path))
    return p


def get_model_params(datasets_path: str, dataset_name: str,
                     model_type: str | None = None) -> dict:
    """Object-model parameters (dataset_params.py:69-146): obj_ids,
    symmetric_obj_ids, model/models_info path templates."""
    _check(dataset_name)
    name = "ycbv" if dataset_name == "ycbvposecnn" else dataset_name
    models_folder = "models" if model_type is None else f"models_{model_type}"
    models_path = join(datasets_path, name, models_folder)
    return {
        "obj_ids": OBJ_IDS[dataset_name],
        "symmetric_obj_ids": SYMMETRIC_OBJ_IDS[dataset_name],
        "model_tpath": join(models_path, "obj_{obj_id:06d}.ply"),
        "models_info_path": join(models_path, "models_info.json"),
    }


def get_split_params(datasets_path: str, dataset_name: str, split: str,
                     split_type: str | None = None) -> dict:
    """Split-level parameters and path templates (dataset_params.py:148-380)."""
    _check(dataset_name)
    name = "ycbv" if dataset_name == "ycbvposecnn" else dataset_name
    p = {
        "name": name,
        "split": split,
        "split_type": split_type,
        "depth_range": None,
        "azimuth_range": None,
        "elev_range": None,
        "im_modalities": ["rgb", "depth"],
    }
    rgb_ext = ".jpg" if split_type == "pbr" else ".png"

    if name == "lm":
        p["scene_ids"] = list(range(1, 16))
        p["im_size"] = (640, 480)
        if split == "test":
            p["depth_range"] = (600.90, 1102.35)
            p["azimuth_range"] = (0, 2 * math.pi)
            p["elev_range"] = (0, 0.5 * math.pi)
    elif name == "lmo":
        p["scene_ids"] = {"train": [1, 5, 6, 8, 9, 10, 11, 12],
                          "test": [2]}[split]
        p["im_size"] = (640, 480)
        if split == "test":
            p["depth_range"] = (346.31, 1499.84)
            p["azimuth_range"] = (0, 2 * math.pi)
            p["elev_range"] = (0, 0.5 * math.pi)
    else:  # ycbv
        if split == "train":
            split_type = split_type or "real"
            p["split_type"] = split_type
            p["scene_ids"] = {
                "real": list(range(48)) + list(range(60, 92)),
                "pbr": None,  # use get_present_scene_ids()
                "synt": list(range(80)),
            }[split_type]
        else:
            p["scene_ids"] = list(range(48, 60))
        p["im_size"] = (640, 480)
        if split == "test":
            p["depth_range"] = (612.92, 1243.59)
            p["azimuth_range"] = (0, 2 * math.pi)
            p["elev_range"] = (-1.2788, 1.1291)

    base_path = join(datasets_path, name)
    split_path = join(base_path, split)
    if p["split_type"] is not None:
        split_path += "_" + p["split_type"]
    p.update({
        "base_path": base_path,
        "split_path": split_path,
        "scene_camera_tpath": join(split_path, "{scene_id:06d}",
                                   "scene_camera.json"),
        "scene_gt_tpath": join(split_path, "{scene_id:06d}",
                               "scene_gt.json"),
        "scene_gt_info_tpath": join(split_path, "{scene_id:06d}",
                                    "scene_gt_info.json"),
        "rgb_tpath": join(split_path, "{scene_id:06d}", "rgb",
                          "{im_id:06d}" + rgb_ext),
        "depth_tpath": join(split_path, "{scene_id:06d}", "depth",
                            "{im_id:06d}.png"),
        "mask_tpath": join(split_path, "{scene_id:06d}", "mask",
                           "{im_id:06d}_{gt_id:06d}.png"),
        "mask_visib_tpath": join(split_path, "{scene_id:06d}", "mask_visib",
                                 "{im_id:06d}_{gt_id:06d}.png"),
    })
    return p


def get_present_scene_ids(dp_split: dict) -> list[int]:
    """Scene ids actually present on disk (dataset_params.py:381-390)."""
    scene_dirs = [d for d in glob.glob(join(dp_split["split_path"], "*"))
                  if os.path.isdir(d)]
    return sorted(int(os.path.basename(d)) for d in scene_dirs)
