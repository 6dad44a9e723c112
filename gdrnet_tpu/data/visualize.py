"""Dataset visual inspection CLI — the reference's per-dataset `test_vis()`
mains (e.g. lm_pbr.py:422-528: load dicts, render masks/bboxes/projected 3D
boxes/xyz overlays via grid_show for human inspection).

Usage:
  python -m gdrnet_tpu.data.visualize lm_13_test --data-root ... --n 4 \
      --save-dir /tmp/vis
  python -m gdrnet_tpu.data.visualize lm_13_train --mapped  # mapper outputs
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np


def vis_records(meta, records, models, n: int = 4, save_dir: str | None = None,
                mapped: bool = False, cfg=None, seed: int = 0) -> list[str]:
    import cv2

    from gdrnet_tpu.utils.vis import (
        grid_show, vis_image_bboxes_cv2, vis_image_mask_cv2,
        draw_projected_box3d, vis_xyz_map)
    from gdrnet_tpu.ops.pose import project_points

    saved = []
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    rng = np.random.RandomState(seed)

    if mapped:
        from gdrnet_tpu.data.mapper import GDRNTrainMapper

        mapper = GDRNTrainMapper(cfg, models)
        for i, rec in enumerate(records[:n]):
            s = mapper(rec, rng)
            img = (s["roi_img"] * 255).clip(0, 255).astype(np.uint8)
            panels = [img, vis_xyz_map(s["gt_xyz"]),
                      s["gt_mask_visib"], s["gt_region"] / max(s["gt_region"].max(), 1)]
            path = osp.join(save_dir, f"mapped_{i}.png") if save_dir else None
            grid_show(panels, ["roi_img", "xyz", "mask_visib", "region"],
                      row=1, save_path=path)
            if path:
                saved.append(path)
        return saved

    for i, rec in enumerate(records[:n]):
        img = cv2.imread(rec["rgb_path"], cv2.IMREAD_COLOR)
        x, y, w, h = rec["bbox_visib"]
        panel = vis_image_bboxes_cv2(img, [[x, y, x + w, y + h]], [rec["label"]])
        if rec.get("mask_visib_path") and osp.exists(rec["mask_visib_path"]):
            m = cv2.imread(rec["mask_visib_path"], cv2.IMREAD_GRAYSCALE)
            panel = vis_image_mask_cv2(panel, m > 0, color_idx=2)
        corners3d = models.bbox3d[rec["label"]][:8]
        corners2d = np.asarray(project_points(
            corners3d[None], rec["K"][None], rec["R"][None], rec["t"][None]))[0]
        panel = draw_projected_box3d(panel, corners2d)
        path = osp.join(save_dir, f"rec_{i}.png") if save_dir else None
        grid_show([panel], [f"{rec['label']} s{rec['scene_id']} i{rec['im_id']}"],
                  save_path=path)
        if path:
            saved.append(path)
    return saved


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("dataset")
    p.add_argument("--data-root", default="datasets/BOP_DATASETS")
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--save-dir", default="/tmp/gdrnet_vis")
    p.add_argument("--mapped", action="store_true",
                   help="visualize mapper outputs (ROI crops + targets)")
    args = p.parse_args(argv)

    from gdrnet_tpu.config import base_config
    from gdrnet_tpu.data.dataset_factory import resolve
    from gdrnet_tpu.data.model_store import ObjectModels

    meta, records = resolve(args.dataset, args.data_root)
    models = ObjectModels(meta, num_pm_points=512)
    cfg = base_config()
    saved = vis_records(meta, records, models, n=args.n,
                        save_dir=args.save_dir, mapped=args.mapped, cfg=cfg)
    print(f"saved {len(saved)} panels to {args.save_dir}")


if __name__ == "__main__":
    main()
