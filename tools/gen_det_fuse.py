"""Synthesize a COCO-style detection training set by pasting object crops
onto background images — the reference's detection-fusion tool
(tools/lmo/1_gen_det_lm_real_all_fuse.py:1-183 in /root/reference): masked
object pixels from a source split are composited onto random backgrounds at
random positions/scales, emitting images + a COCO json (bbox xywh,
category_id = obj_id) to train a 2D detector.

Usage:
  python tools/gen_det_fuse.py --dataset lm --split test --num-images 100 \
      --bg-root datasets/VOCdevkit/VOC2012 --out datasets/lm_det_fuse
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import cv2  # noqa: E402
import numpy as np  # noqa: E402


def fuse_images(records: list[dict], out_dir: str, num_images: int,
                bg_replacer, objs_per_img: tuple[int, int] = (3, 8),
                wh: tuple[int, int] = (640, 480), seed: int = 0) -> dict:
    """Returns the COCO dict (also written to out_dir/annotations.json)."""
    rng = np.random.RandomState(seed)
    os.makedirs(osp.join(out_dir, "images"), exist_ok=True)
    W, H = wh
    images, annotations = [], []
    ann_id = 1
    cat_ids = sorted({r["obj_id"] for r in records})
    for img_id in range(num_images):
        canvas = bg_replacer.get_bg(rng, H, W).copy()
        n_obj = rng.randint(objs_per_img[0], objs_per_img[1] + 1)
        for _ in range(n_obj):
            rec = records[rng.randint(len(records))]
            src = cv2.imread(rec["rgb_path"], cv2.IMREAD_COLOR)
            mask = cv2.imread(rec.get("mask_visib_path", ""), cv2.IMREAD_GRAYSCALE)
            if src is None or mask is None or mask.max() == 0:
                continue
            ys, xs = np.nonzero(mask)
            x1, x2, y1, y2 = xs.min(), xs.max(), ys.min(), ys.max()
            crop = src[y1:y2 + 1, x1:x2 + 1]
            crop_m = (mask[y1:y2 + 1, x1:x2 + 1] > 0)
            # random rescale
            s = rng.uniform(0.6, 1.4)
            nw = max(int(crop.shape[1] * s), 4)
            nh = max(int(crop.shape[0] * s), 4)
            if nw >= W or nh >= H:
                continue
            crop = cv2.resize(crop, (nw, nh), interpolation=cv2.INTER_LINEAR)
            crop_m = cv2.resize(crop_m.astype(np.uint8), (nw, nh),
                                interpolation=cv2.INTER_NEAREST).astype(bool)
            px = rng.randint(0, W - nw)
            py = rng.randint(0, H - nh)
            region = canvas[py:py + nh, px:px + nw]
            region[crop_m] = crop[crop_m]
            annotations.append({
                "id": ann_id, "image_id": img_id,
                "category_id": int(rec["obj_id"]),
                "bbox": [int(px), int(py), int(nw), int(nh)],
                "area": int(crop_m.sum()), "iscrowd": 0,
            })
            ann_id += 1
        fname = f"{img_id:06d}.jpg"
        cv2.imwrite(osp.join(out_dir, "images", fname), canvas)
        images.append({"id": img_id, "file_name": f"images/{fname}",
                       "width": W, "height": H})
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": cid, "name": str(cid)} for cid in cat_ids],
    }
    with open(osp.join(out_dir, "annotations.json"), "w") as f:
        json.dump(coco, f)
    return coco


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--data-root", default="datasets/BOP_DATASETS")
    p.add_argument("--bg-root", default="")
    p.add_argument("--num-images", type=int, default=1000)
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from gdrnet_tpu.data.ref_meta import get_meta
    from gdrnet_tpu.data.bop import load_bop_scene_dicts
    from gdrnet_tpu.data.augment import BackgroundReplacer

    meta = get_meta(args.dataset, args.data_root)
    records = load_bop_scene_dicts(meta, args.split, with_xyz=False)
    bg = BackgroundReplacer(args.bg_root)
    coco = fuse_images(records, args.out, args.num_images, bg,
                       wh=(meta.width, meta.height), seed=args.seed)
    print(f"wrote {len(coco['images'])} images, {len(coco['annotations'])} "
          f"annotations to {args.out}")


if __name__ == "__main__":
    main()
