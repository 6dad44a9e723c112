"""Generate a BOP test-targets json ({im_id, inst_count, obj_id, scene_id}
rows) from scene_gt files — the reference's per-dataset generator scripts
(lib/pysixd/gen_ycbv_test_targets_keyframe_json.py:45-80,
gen_lm_test_targets_bb8_json.py, gen_ycbv_test_targets_all_json.py) as one
dataset-agnostic command.

Usage:
  python tools/gen_test_targets.py --dataset ycbv --split test \
      [--keyframe datasets/BOP_DATASETS/ycbv/image_sets/keyframe.txt] \
      --out test_targets_keyframe.json
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--data-root", default="datasets/BOP_DATASETS")
    p.add_argument("--keyframe", default=None,
                   help="optional keyframe.txt ('SSSS/IIIIII' lines) filter")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    from collections import Counter

    from gdrnet_tpu.data.ref_meta import get_meta
    from gdrnet_tpu.data.io import load_json

    meta = get_meta(args.dataset, args.data_root)
    keyframes = None
    if args.keyframe:
        with open(args.keyframe) as f:
            keyframes = {line.strip() for line in f if line.strip()}

    import os

    split_path = osp.join(meta.data_root, args.split)
    scene_ids = sorted(int(d) for d in os.listdir(split_path)
                       if d.isdigit() and osp.isdir(osp.join(split_path, d)))
    targets = []
    for scene_id in scene_ids:
        scene_dir = osp.join(split_path, f"{scene_id:06d}")
        gt = load_json(osp.join(scene_dir, "scene_gt.json"))
        for im_key in sorted(gt, key=int):
            im_id = int(im_key)
            if keyframes is not None and \
                    f"{scene_id:04d}/{im_id:06d}" not in keyframes:
                continue
            counts = Counter(int(a["obj_id"]) for a in gt[im_key])
            for obj_id, n in sorted(counts.items()):
                targets.append({"im_id": im_id, "inst_count": n,
                                "obj_id": obj_id, "scene_id": scene_id})

    with open(args.out, "w") as f:
        json.dump(targets, f, indent=1)
    print(f"wrote {len(targets)} targets -> {args.out}")


if __name__ == "__main__":
    main()
