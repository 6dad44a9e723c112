"""Tiny self-consistent BOP-layout dataset for data-layer tests.

Builds (under a tmp dir) a two-object dataset in the exact BOP directory
layout the parsers expect (models/*.ply + models_info.json,
<split>/<scene>/{rgb,mask,mask_visib}/ + scene_gt/scene_gt_info/scene_camera
json), with imagery rendered by the XLA rasterizer so masks, xyz GT and poses
are geometrically consistent — the reference generates the same artifacts
with its GL renderer (tools/lm/lm_pbr_1_gen_xyz_crop.py).
"""

from __future__ import annotations

import json
import os
import os.path as osp

import cv2
import numpy as np

from gdrnet_tpu.data.ply import save_ply
from gdrnet_tpu.data.ref_meta import DatasetMeta
from gdrnet_tpu.ops.rasterizer import render_xyz

W, H = 320, 240
K = np.array([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1.0]], np.float32)


def _cube(half_xyz, symmetric_z: bool = False):
    """Box mesh with interior landmark vertices: a plain box's corner set is
    invariant under its rotational symmetry group, which makes ADD blind to
    symmetry-equivalent poses — landmarks break the symmetries without
    changing the extents. With symmetric_z=True a mirrored landmark pair
    keeps the mesh truly z-180 symmetric (matching the fixture's declared
    symmetries_discrete for object 2)."""
    hx, hy, hz = half_xyz
    v = np.array([[sx * hx, sy * hy, sz * hz]
                  for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)], np.float32)
    apex = np.array([[0.55 * hx, 0.2 * hy, -0.35 * hz]], np.float32)
    v = np.concatenate([v, apex], axis=0)  # vertex 8
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
        # small landmark pyramid on the +x face corners
        [4, 5, 8], [5, 7, 8], [7, 4, 8]], np.int32)
    if symmetric_z:
        apex2 = apex * np.array([[-1.0, -1.0, 1.0]], np.float32)  # Rz(180) image
        v = np.concatenate([v, apex2], axis=0)  # vertex 9
        # Rz(180) maps corner idx (sx,sy,sz) -> (-sx,-sy,sz): 4,5 -> 2,3 etc.
        f = np.concatenate([f, np.array([[2, 3, 9], [3, 1, 9], [1, 2, 9]],
                                        np.int32)], axis=0)
    return v, f


def _rand_rot(rng):
    A = rng.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    return (Q * np.sign(np.linalg.det(Q))).astype(np.float32)


def build_fixture_dataset(root: str, n_images: int = 6, seed: int = 0,
                          split: str = "test",
                          duplicate_first_obj: bool = False) -> DatasetMeta:
    """duplicate_first_obj: render object 1 TWICE per image (two instances
    of the same object in one scene, YCB-V-style) — exercises per-instance
    GT matching in evaluators."""
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    model_dir = osp.join(root, "models")
    os.makedirs(model_dir, exist_ok=True)

    objs = {1: _cube((0.04, 0.04, 0.04)),
            2: _cube((0.06, 0.03, 0.02), symmetric_z=True)}
    models_info = {}
    for oid, (v, f) in objs.items():
        save_ply(osp.join(model_dir, f"obj_{oid:06d}.ply"), v * 1000.0, f)  # mm
        mins, maxs = v.min(0) * 1000, v.max(0) * 1000
        models_info[str(oid)] = {
            "diameter": float(np.linalg.norm(maxs - mins)),
            "min_x": float(mins[0]), "min_y": float(mins[1]), "min_z": float(mins[2]),
            "size_x": float(maxs[0] - mins[0]), "size_y": float(maxs[1] - mins[1]),
            "size_z": float(maxs[2] - mins[2]),
        }
    # object 2 gets a discrete z-180 symmetry
    models_info["2"]["symmetries_discrete"] = [
        [-1, 0, 0, 0, 0, -1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1]]
    with open(osp.join(model_dir, "models_info.json"), "w") as fp:
        json.dump(models_info, fp)

    scene_dir = osp.join(root, split, "000001")
    for sub in ("rgb", "mask", "mask_visib", "xyz_crop", "depth"):
        os.makedirs(osp.join(scene_dir, sub), exist_ok=True)

    scene_gt, scene_gt_info, scene_camera = {}, {}, {}
    for im_id in range(n_images):
        img = np.full((H, W, 3), 60, np.uint8)
        img += (rng.rand(H, W, 3) * 40).astype(np.uint8)
        # scene depth z-buffer across instances -> depth/ png (vsd's d_test)
        scene_depth = np.zeros((H, W), np.float32)
        gts, infos = [], []
        inst_objs = list(sorted(objs))
        if duplicate_first_obj:
            inst_objs = [inst_objs[0]] + inst_objs
            x_slots, x_jitter = [-0.09, 0.0, 0.09], 0.02
        else:
            x_slots, x_jitter = [-0.07, 0.07], 0.04
        for inst_i, oid in enumerate(inst_objs):
            v, f = objs[oid]
            R = _rand_rot(rng)
            t = np.array([rng.uniform(-x_jitter, x_jitter),
                          rng.uniform(-0.03, 0.03),
                          rng.uniform(0.45, 0.7)], np.float32)
            # separate instances horizontally to limit occlusion
            t[0] += x_slots[inst_i]
            depth, xyz = render_xyz(v, f, K, R, t, height=H, width=W)
            depth, xyz = np.asarray(depth), np.asarray(xyz)
            mask = (depth > 0).astype(np.uint8)
            closer = (depth > 0) & ((scene_depth == 0) | (depth < scene_depth))
            scene_depth = np.where(closer, depth, scene_depth)
            shade = (100 + 120 * (xyz[..., 2] / max(xyz[..., 2].max(), 1e-6)))
            color = np.stack([shade * 0.6, shade, shade * (0.4 + 0.3 * oid)], axis=-1)
            img = np.where(mask[..., None].astype(bool), color.astype(np.uint8), img)

            ys, xs = np.nonzero(mask)
            x1, x2, y1, y2 = int(xs.min()), int(xs.max()), int(ys.min()), int(ys.max())
            cv2.imwrite(osp.join(scene_dir, "mask", f"{im_id:06d}_{inst_i:06d}.png"), mask * 255)
            cv2.imwrite(osp.join(scene_dir, "mask_visib", f"{im_id:06d}_{inst_i:06d}.png"), mask * 255)
            import pickle
            with open(osp.join(scene_dir, "xyz_crop", f"{im_id:06d}_{inst_i:06d}.pkl"), "wb") as fp:
                pickle.dump({"xyz_crop": xyz[y1:y2 + 1, x1:x2 + 1].astype(np.float16),
                             "xyxy": (x1, y1, x2, y2)}, fp)
            gts.append({"cam_R_m2c": R.reshape(-1).tolist(),
                        "cam_t_m2c": (t * 1000.0).tolist(), "obj_id": oid})
            infos.append({"bbox_obj": [x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                          "bbox_visib": [x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                          "px_count_all": int(mask.sum()),
                          "px_count_visib": int(mask.sum()),
                          "visib_fract": 1.0})
        cv2.imwrite(osp.join(scene_dir, "rgb", f"{im_id:06d}.png"), img)
        # 16-bit BOP depth png: raw = depth_m * 1000 / depth_scale (scale 1.0
        # -> millimetre integers; quantization ~0.5mm << vsd delta 15mm)
        cv2.imwrite(osp.join(scene_dir, "depth", f"{im_id:06d}.png"),
                    np.round(scene_depth * 1000.0).astype(np.uint16))
        scene_gt[str(im_id)] = gts
        scene_gt_info[str(im_id)] = infos
        scene_camera[str(im_id)] = {"cam_K": K.reshape(-1).tolist(), "depth_scale": 1.0}

    for name, obj in (("scene_gt.json", scene_gt), ("scene_gt_info.json", scene_gt_info),
                      ("scene_camera.json", scene_camera)):
        with open(osp.join(scene_dir, name), "w") as fp:
            json.dump(obj, fp)

    meta = DatasetMeta(
        name="fixture", objects=["cube", "brick"],
        id2obj={1: "cube", 2: "brick"},
        diameters_by_name={"cube": models_info["1"]["diameter"] / 1000.0,
                           "brick": models_info["2"]["diameter"] / 1000.0},
        camera_matrix=K, width=W, height=H, data_root=root,
        sym_objects=["brick"])
    return meta
