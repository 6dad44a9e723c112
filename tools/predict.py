"""Standalone pose prediction: images + detections -> BOP pose CSV, no GT.

The serving entrypoint the reference lacks: its test flow always walks a
registered dataset with annotations (engine.py:121-142). Here any folder of
images plus a detections json (BOP format: {"scene/im": [{obj_id, bbox_est
xywh, score}]}) and camera intrinsics produce poses.

Usage:
  python tools/predict.py --config-file configs/gdrn/lm/a6_cPnP_lm13.py \
      --ckpt output/.../ckpt --dataset lm \
      --dets dets.json --image-root datasets/BOP_DATASETS/lm/test \
      --out poses.csv [--camera-json <scene_camera.json>] [--K fx,fy,cx,cy]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--ckpt", required=True,
                   help="orbax checkpoint dir, or a reference torch .pth "
                        "(converted in-memory)")
    p.add_argument("--dataset", required=True, help="registry name for object"
                   " metadata (meshes/extents), e.g. lm / lmo / ycbv")
    p.add_argument("--data-root", default="datasets/BOP_DATASETS")
    p.add_argument("--dets", required=True, help="detections json")
    p.add_argument("--image-root", required=True,
                   help="BOP split dir: <root>/<scene:06d>/rgb/<im:06d>.png")
    p.add_argument("--camera-json", default=None,
                   help="per-image K: use each scene's scene_camera.json "
                        "under image-root when omitted")
    p.add_argument("--K", default=None, help="global 'fx,fy,cx,cy' override")
    p.add_argument("--out", required=True, help="output BOP CSV path")
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args(argv)

    from gdrnet_tpu.utils.device_probe import probe_device

    probe_device()  # the tunnel can hang at backend init; don't bind blind

    from gdrnet_tpu.config import load_config, base_config
    from gdrnet_tpu.config.config import Config, merge_dict, apply_opts
    from gdrnet_tpu.data import ObjectModels, load_detections
    from gdrnet_tpu.data.ref_meta import get_meta
    from gdrnet_tpu.data.io import load_json
    from gdrnet_tpu.data.mapper import GDRNTestMapper
    from gdrnet_tpu.engine.checkpoint import load_variables_any
    from gdrnet_tpu.engine.steps import make_predict_step
    from gdrnet_tpu.eval import save_bop_results
    from gdrnet_tpu.models import build_model

    cfg = Config(merge_dict(base_config().to_dict(),
                            load_config(args.config_file).to_dict()))
    if args.opts:
        apply_opts(cfg, args.opts)

    meta = get_meta(args.dataset, args.data_root)
    models = ObjectModels(
        meta, num_pm_points=cfg.MODEL.CDPN.PNP_NET.NUM_PM_POINTS,
        num_fps=cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS)
    model = build_model(cfg)
    # orbax dir or converted reference .pth; no optimizer/train-state needed
    variables = load_variables_any(cfg, args.ckpt)
    if cfg.TEST.get("FOLD_BN"):  # TEST.FOLD_BN=True on the CLI opts
        from gdrnet_tpu.utils.fold_bn import fold_variables

        variables = fold_variables(variables)
    # local data-parallel serving (TEST.LOCAL_DEVICES, default all local
    # chips): shard each bucket over a 1-D mesh, params replicated — same
    # semantics as engine/tester.do_test
    from gdrnet_tpu.parallel import local_dp_setup, shard_batch

    bucket = int(cfg.TEST.ROI_BATCH_SIZE)
    mesh, variables = local_dp_setup(
        variables, bucket, cfg.TEST.get("LOCAL_DEVICES", -1))
    # TEST.USE_PNP=True (+TEST.PNP_TYPE / TEST.DEVICE_PNP) on the CLI opts
    # refines net poses from the decoded geometry maps, same as do_test
    use_pnp = bool(cfg.TEST.USE_PNP)
    predict = make_predict_step(model, mesh=mesh, with_maps=use_pnp)
    int8 = bool(cfg.TEST.get("INT8"))  # TEST.INT8=True on the CLI opts

    K_global = None
    if args.K:
        fx, fy, cx, cy = [float(v) for v in args.K.split(",")]
        K_global = np.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    cam_cache: dict = {}

    def K_of(scene_id: int, im_id: int) -> np.ndarray:
        if K_global is not None:
            return K_global
        path = (args.camera_json or
                osp.join(args.image_root, f"{scene_id:06d}", "scene_camera.json"))
        if path not in cam_cache:
            cam_cache[path] = load_json(path)
        cam = cam_cache[path][str(im_id)]
        return np.asarray(cam["cam_K"], np.float32).reshape(3, 3)

    dets = load_detections(args.dets, score_thr=0.0, topk_per_obj=100)
    mapper = GDRNTestMapper(cfg, models, roi_batch_size=bucket)

    flat = []
    for (scene_id, im_id), rois in sorted(dets.items()):
        rgb = osp.join(args.image_root, f"{scene_id:06d}", "rgb",
                       f"{im_id:06d}.png")
        if not osp.exists(rgb):
            rgb = rgb[:-4] + ".jpg"
        K = K_of(scene_id, im_id)
        for d in rois:
            d = dict(d, bbox=d.get("bbox_est", d.get("bbox")),
                     bbox_mode="xywh")
            flat.append((rgb, K, d, scene_id, im_id))

    rows = []
    for start in range(0, len(flat), bucket):
        chunk = flat[start:start + bucket]
        t0 = time.perf_counter()
        batch = mapper.map_flat([(p, K, d) for p, K, d, _, _ in chunk])
        dev = {k: v for k, v in batch.items()
               if k not in ("valid", "scores", "obj_ids", "im_hws")}
        if int8:  # calibrate on the first bucket (models/quantize.py)
            from gdrnet_tpu.models.quantize import calibrate_act_scales

            predict = make_predict_step(
                model, mesh=mesh, with_maps=use_pnp,
                int8_scales=calibrate_act_scales(model, variables, [dev]))
            int8 = False
        if mesh is not None:
            dev = shard_batch(dev, mesh)
        out = predict(variables, dev)
        if use_pnp:
            from gdrnet_tpu.engine.pnp_refine import refine_bucket_poses

            rot, trans = refine_bucket_poses(
                cfg, models, batch, dev, out, seed=start)
        else:
            rot = np.asarray(out["rot"])
            trans = np.asarray(out["trans"])
        dt = time.perf_counter() - t0
        for j, (_, _, det, scene_id, im_id) in enumerate(chunk):
            rows.append({"scene_id": scene_id, "im_id": im_id,
                         "obj_id": int(batch["obj_ids"][j]),
                         "score": float(batch["scores"][j]),
                         "R": rot[j], "t": trans[j] * 1000.0, "time": dt})

    save_bop_results(args.out, rows)
    print(json.dumps({"n_poses": len(rows), "csv": args.out}))


if __name__ == "__main__":
    main()
