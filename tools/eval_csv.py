"""Re-score saved BOP result CSVs without re-running the model — the
reference's VAL.EVAL_CACHED / SCORE_ONLY / EVAL_PRINT_ONLY path
(core/gdrn_modeling/test_utils.py:78-135 + lib/pysixd/scripts/
eval_pose_results_more.py) as one in-process command.

Usage:
  python tools/eval_csv.py --csv output/.../lm-test_gdrnet-tpu.csv \
      --dataset lm --split test --error-types ad,rete,re,te,proj
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--data-root", default="datasets/BOP_DATASETS")
    p.add_argument("--error-types", default="ad,rete,re,te,proj")
    p.add_argument("--n-top", type=int, default=1)
    p.add_argument("--out", default=None, help="write scores json here")
    p.add_argument("--latex", default=None, help="write a latex report here")
    args = p.parse_args(argv)

    from gdrnet_tpu.data.ref_meta import get_meta
    from gdrnet_tpu.data.bop import load_bop_scene_dicts
    from gdrnet_tpu.data.model_store import ObjectModels
    from gdrnet_tpu.eval.bop_writer import load_bop_results
    from gdrnet_tpu.eval.bop_score import score_results, bop19_average_recall

    meta = get_meta(args.dataset, args.data_root)
    gts = load_bop_scene_dicts(meta, args.split, with_masks=False, with_xyz=False)
    models = ObjectModels(meta)
    results = load_bop_results(args.csv)
    scores = score_results(results, gts, models, args.error_types,
                           n_top=args.n_top, image_width=meta.width)

    from tabulate import tabulate
    rows = []
    objs = sorted({o for s in scores.values() for o in s if o != "avg"})
    header = ["error"] + objs + ["avg"]
    for etype, per_obj in scores.items():
        row = [etype]
        for o in objs + ["avg"]:
            v = per_obj.get(o, "-")
            row.append(f"{100 * np.mean(v):.2f}" if v != "-" else "-")
        rows.append(row)
    print(tabulate(rows, headers=header, tablefmt="plain"))
    print(f"bop-style average recall: {100 * bop19_average_recall(scores):.2f}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({k: {o: (list(v) if isinstance(v, list) else v)
                           for o, v in per.items()}
                       for k, per in scores.items()}, f, indent=2)
        print(f"saved {args.out}")

    if args.latex:
        from gdrnet_tpu.eval.report import write_latex_report
        write_latex_report(args.latex, scores,
                           title=osp.basename(args.csv))
        print(f"saved {args.latex}")


if __name__ == "__main__":
    main()
