"""Statistically meaningful learning gate on the generated scale dataset:
train flagship-dims GDRN on a DETERMINISTIC ~200-image synth subset
(~1.2k ROIs, 10 objects, 4 symmetric, duplicate instances) and score ad_10 /
re / te on a held-out synth slice with GT boxes.

This replaces the 12-ROI fixture (tools/validate_overfit.py) as the
regression signal for "does the assembled trainer learn": each held-out ROI
is ~0.3% of recall instead of 8.3%, so ad_10 is a statistic, not a coin
flip. Run it over several seeds (`for s in 0 1 2 3 4; do ... --seed $s;
done`) and compare the SWEEP lines; docs/training.md records the measured
spread. Reference analogue: full-dataset ADD(-S) regression runs
(core/gdrn_modeling/models/../gdrn_custom_evaluator.py:493-670).

Requires datasets/BOP_DATASETS/synth (tools/gen_scale_dataset.py).

Usage: python tools/validate_scale.py [--seed N] [--train-images 200]
       [--test-images 50] [--epochs 160] [--batch 128]
"""

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

from gdrnet_tpu.utils.device_probe import probe_device


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train-images", type=int, default=200)
    p.add_argument("--test-images", type=int, default=50)
    p.add_argument("--epochs", type=int, default=160)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--out", default="/tmp/validate_scale")
    p.add_argument("--root", default="datasets/BOP_DATASETS/synth")
    args = p.parse_args(argv)

    probe_device()  # the tunnel can hang at backend init; don't bind blind

    from gdrnet_tpu.config import base_config, load_config
    from gdrnet_tpu.config.config import Config, merge_dict
    from gdrnet_tpu.data.bop import load_bop_scene_dicts
    from gdrnet_tpu.data.dataset_factory import register
    from gdrnet_tpu.data.ref_meta import meta_from_json
    from gdrnet_tpu.engine.tester import do_test
    from gdrnet_tpu.engine.trainer import do_train
    from gdrnet_tpu.models import build_model

    if not osp.isfile(osp.join(args.root, "meta.json")):
        raise SystemExit(f"scale dataset not found at {args.root} "
                         "(tools/gen_scale_dataset.py builds it)")
    meta = meta_from_json(args.root)
    # deterministic slices: first N train images in (scene, im_id) order,
    # first M held-out test images — identical across seeds by construction
    train_all = load_bop_scene_dicts(meta, "train", visib_thr=0.1,
                                     img_type="syn_pbr")
    train_all.sort(key=lambda r: (r["scene_id"], r["im_id"]))
    train = train_all[:args.train_images]
    test_all = load_bop_scene_dicts(meta, "test", visib_thr=0.1,
                                    img_type="real")
    test_all.sort(key=lambda r: (r["scene_id"], r["im_id"]))
    test = test_all[:args.test_images]
    register("synthgate_train", lambda: (meta, train))
    register("synthgate_test", lambda: (meta, test))

    cfg = base_config()
    cfg = Config(merge_dict(cfg.to_dict(), load_config(
        osp.join(osp.dirname(osp.abspath(__file__)), "..",
                 "configs/gdrn/synth/a6_cPnP_synth.py")).to_dict()))
    cfg.SEED = args.seed
    cfg.OUTPUT_DIR = f"{args.out}_seed{args.seed}"
    cfg.DATASETS.TRAIN = ("synthgate_train",)
    cfg.DATASETS.TEST = ("synthgate_test",)
    cfg.SOLVER.IMS_PER_BATCH = args.batch
    cfg.SOLVER.TOTAL_EPOCHS = args.epochs
    cfg.SOLVER.CHECKPOINT_PERIOD = 10_000_000  # gate runs don't checkpoint
    cfg.TRAIN.PRINT_FREQ = 100
    # GT visib boxes at eval: the gate measures LEARNING, not detector noise
    cfg.TEST.TEST_BBOX_TYPE = "gt"
    cfg.MODEL.LOAD_DETS_TEST = False
    cfg.VAL.ERROR_TYPES = "ad,rete,re,te,proj"

    t0 = time.time()
    state, models, preempted = do_train(cfg)
    assert not preempted
    t_train = time.time() - t0
    results = do_test(cfg, build_model(cfg), state.variables(), models,
                      test, output_dir=cfg.OUTPUT_DIR)
    print(results["_summary"], flush=True)
    print("SWEEP " + json.dumps({
        "seed": args.seed, "train_images": len(train),
        "test_images": len(test), "epochs": args.epochs,
        "train_secs": round(t_train, 1),
        "ad_10": float(results["Avg"]["ad_10"]),
        "mean_re": float(results["Avg"]["mean_re"]),
        "mean_te": float(results["Avg"]["mean_te"])}), flush=True)


if __name__ == "__main__":
    main()
