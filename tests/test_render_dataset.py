"""Render-folder dataset loader (blender/imgn synthetic sets) test on a tiny
generated fixture in the reference layout."""

import json
import os
import os.path as osp

import cv2
import numpy as np

from gdrnet_tpu.data.render_dataset import load_render_folder_dicts
from gdrnet_tpu.data.ref_meta import DatasetMeta
from gdrnet_tpu.ops.rasterizer import render_xyz

from fixture_bop import _cube, _rand_rot, K, W, H


def _build_render_fixture(root, meta, n=3, seed=0):
    rng = np.random.RandomState(seed)
    renders = osp.join(root, "renders")
    for obj_name in meta.objects:
        obj_dir = osp.join(renders, obj_name)
        os.makedirs(obj_dir, exist_ok=True)
        v, f = _cube((0.04, 0.04, 0.04))
        gt = {}
        for i in range(n):
            R = _rand_rot(rng)
            t = np.array([0.0, 0.0, rng.uniform(0.45, 0.7)], np.float32)
            depth, xyz = render_xyz(v, f, K, R, t, height=H, width=W)
            depth, xyz = np.asarray(depth), np.asarray(xyz)
            mask = (depth > 0).astype(np.uint8)
            ys, xs = np.nonzero(mask)
            img = np.full((H, W, 3), 30, np.uint8)
            img[mask.astype(bool)] = 180
            cv2.imwrite(osp.join(obj_dir, f"{i}.jpg"), img)
            cv2.imwrite(osp.join(obj_dir, f"{i}_mask_opengl.png"), mask * 255)
            import pickle
            x1, x2, y1, y2 = xs.min(), xs.max(), ys.min(), ys.max()
            with open(osp.join(obj_dir, f"{i}_xyz_bop.pkl"), "wb") as fp:
                pickle.dump({"xyz_crop": xyz[y1:y2 + 1, x1:x2 + 1].astype(np.float16),
                             "xyxy": (int(x1), int(y1), int(x2), int(y2))}, fp)
            gt[str(i)] = [{"cam_R_m2c": R.reshape(-1).tolist(),
                           "cam_t_m2c": (t * 1000).tolist(),
                           "bbox_visib": [int(x1), int(y1),
                                          int(x2 - x1 + 1), int(y2 - y1 + 1)],
                           "visib_fract": 1.0}]
        with open(osp.join(renders, f"{obj_name}_gt.json"), "w") as fp:
            json.dump(gt, fp)
    return renders


def test_render_folder_loader(tmp_path):
    meta = DatasetMeta(name="rfix", objects=["ape", "cat"],
                       id2obj={1: "ape", 2: "cat"},
                       diameters_by_name={"ape": 0.1, "cat": 0.1},
                       camera_matrix=K, width=W, height=H,
                       data_root=str(tmp_path))
    renders = _build_render_fixture(str(tmp_path), meta, n=4)
    recs = load_render_folder_dicts(meta, renders)
    assert len(recs) == 8
    r = recs[0]
    assert r["img_type"] == "syn_blender"
    assert osp.exists(r["rgb_path"]) and osp.exists(r["xyz_path"])
    assert 0.4 < r["t"][2] < 0.8
    # n_per_obj uniform subsample
    recs2 = load_render_folder_dicts(meta, renders, n_per_obj=2)
    assert len(recs2) == 4
    ids = sorted(x["im_id"] for x in recs2 if x["label"] == "ape")
    assert ids == [0, 3]  # equal-spacing endpoints
