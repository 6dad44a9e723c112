"""Compute FPS keypoints for every object model of a BOP dataset.

Output: <models_dir>/fps_points.pkl keyed by str(obj_id), each entry holding
fps{4,8,12,16,20,32,64,128,256}_and_center arrays — the artifact layout the
reference produces (tools/lm/1_compute_fps.py:18-38 in /root/reference) and
the data layer's DatasetMeta.fps_points() loads.

Usage:
  python tools/compute_fps.py --dataset lm --data-root datasets/BOP_DATASETS
  python tools/compute_fps.py --models-dir path/to/models   # any BOP models dir

Uses the native C++ kernel (gdrnet_tpu/csrc/fps) when a toolchain is present,
falling back to the numpy twin.
"""

from __future__ import annotations

import argparse
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np  # noqa: E402

from gdrnet_tpu.data.ply import load_ply  # noqa: E402
from gdrnet_tpu.data.ref_meta import get_meta  # noqa: E402

FPS_COUNTS = (4, 8, 12, 16, 20, 32, 64, 128, 256)


def _sampler():
    from gdrnet_tpu.csrc import fps_native_available

    if fps_native_available():
        from gdrnet_tpu.ops.fps import farthest_point_sampling_cpp
        return farthest_point_sampling_cpp
    from gdrnet_tpu.ops.fps import farthest_point_sampling_np
    return farthest_point_sampling_np


def compute_fps_dict(models_dir: str, obj_ids: list[int],
                     vertex_scale: float = 0.001) -> dict:
    sample = _sampler()
    fps_dict: dict = {}
    for obj_id in obj_ids:
        ply = load_ply(osp.join(models_dir, f"obj_{obj_id:06d}.ply"),
                       vertex_scale=vertex_scale)
        pts = ply["pts"]
        center = pts.mean(0, keepdims=True).astype(np.float32)
        entry = {}
        for k in FPS_COUNTS:
            if k > len(pts):
                continue
            fps_pts = np.asarray(sample(pts, k, True), np.float32)
            entry[f"fps{k}_and_center"] = np.concatenate([fps_pts, center], 0)
        fps_dict[str(obj_id)] = entry
        print(f"obj {obj_id}: {len(pts)} verts -> fps keys {sorted(entry)}")
    return fps_dict


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default=None, help="lm | lmo | ycbv")
    p.add_argument("--data-root", default="datasets/BOP_DATASETS")
    p.add_argument("--models-dir", default=None)
    p.add_argument("--vertex-scale", type=float, default=0.001)
    args = p.parse_args(argv)

    if args.models_dir:
        models_dir = args.models_dir
        import json
        with open(osp.join(models_dir, "models_info.json")) as f:
            obj_ids = sorted(int(k) for k in json.load(f))
    else:
        meta = get_meta(args.dataset, args.data_root)
        models_dir = meta.model_dir
        obj_ids = sorted(meta.id2obj)

    fps_dict = compute_fps_dict(models_dir, obj_ids, args.vertex_scale)
    out = osp.join(models_dir, "fps_points.pkl")
    with open(out, "wb") as f:
        pickle.dump(fps_dict, f)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
