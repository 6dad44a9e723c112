"""Export the GDRN serving forward as a portable StableHLO artifact.

Production-deployment path the reference lacks entirely (its serving story
is "run torch"): the jitted ROI-batch forward (the same program bench.py
times) serializes via jax.export into a bytes artifact that any
jax-compatible runtime can load WITHOUT this repo's Python — model code,
weights, and preprocessing constants are baked in.

Usage:
  python tools/export_model.py --out model.jaxexp \
      [--ckpt <orbax dir|converted .pth>] [--config <cfg.py>] \
      [--batch 64] [--fold-bn] [--platforms cpu,tpu]

Load side (no gdrnet_tpu import needed):
  from jax import export
  exp = export.deserialize(open("model.jaxexp", "rb").read())
  rot, trans = exp.call(roi_img, roi_classes, roi_coord_2d, roi_cams,
                        roi_centers, roi_whs, roi_extents, resize_ratios)
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def build_exported(cfg, variables, batch_size: int, platforms,
                   int8: bool = False):
    import contextlib

    import jax
    from jax import export as jex
    import jax.numpy as jnp

    from gdrnet_tpu.models import build_model
    from gdrnet_tpu.data import synthetic_roi_batch

    model = build_model(cfg)
    b = synthetic_roi_batch(
        batch_size=batch_size, input_res=cfg.MODEL.CDPN.BACKBONE.INPUT_RES,
        out_res=cfg.MODEL.CDPN.BACKBONE.OUTPUT_RES)

    int8_scales = None
    if int8:
        # PTQ activation scales calibrate on the synthetic batch (as
        # bench.py does); for deployment, re-export after calibrating on a
        # real crop batch (pass real arrays through calibrate_act_scales)
        from gdrnet_tpu.engine.steps import _model_kwargs
        from gdrnet_tpu.models.quantize import calibrate_act_scales

        bj = {k: jnp.asarray(v) for k, v in b.items()}

        def _cal_apply(v, bb, _apply):
            _apply(v, bb["roi_img"], **_model_kwargs(bb), train=False)

        int8_scales = calibrate_act_scales(model, variables, [bj],
                                           apply_fn=_cal_apply)

    def forward(roi_img, roi_classes, roi_coord_2d, roi_cams, roi_centers,
                roi_whs, roi_extents, resize_ratios):
        from gdrnet_tpu.models.quantize import quantized_scope

        ctx = (quantized_scope(int8_scales) if int8_scales
               else contextlib.nullcontext())
        with ctx:
            out = model.apply(
                variables, roi_img, roi_classes=roi_classes,
                roi_coord_2d=roi_coord_2d, roi_cams=roi_cams,
                roi_centers=roi_centers, roi_whs=roi_whs,
                roi_extents=roi_extents, resize_ratios=resize_ratios,
                train=False)
        return out["rot"], out["trans"]

    arg_names = ("roi_img", "roi_classes", "roi_coord_2d", "roi_cams",
                 "roi_centers", "roi_whs", "roi_extents", "resize_ratios")
    shapes = tuple(jax.ShapeDtypeStruct(b[k].shape, b[k].dtype)
                   for k in arg_names)
    exp = jex.export(jax.jit(forward), platforms=tuple(platforms))(*shapes)
    return exp, arg_names, {k: list(b[k].shape) for k in arg_names}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt", default=None,
                   help="orbax dir or converted reference .pth; default "
                        "random init (smoke artifacts)")
    p.add_argument("--config", default=None)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--fold-bn", action="store_true",
                   help="fold BN stats into conv kernels before export")
    p.add_argument("--int8", action="store_true",
                   help="bake the int8 MXU serving path into the artifact "
                        "(TEST.INT8 semantics; calibrated on the export "
                        "batch)")
    p.add_argument("--platforms", default="cpu,tpu")
    args = p.parse_args(argv)

    import jax

    from gdrnet_tpu.config import base_config
    from gdrnet_tpu.models import build_model
    from gdrnet_tpu.data import synthetic_roi_batch

    cfg = base_config()
    cfg.MODEL.CDPN.PNP_NET.WITH_2D_COORD = True
    cfg.MODEL.CDPN.PNP_NET.REGION_ATTENTION = True
    if args.config:
        from gdrnet_tpu.config import load_config
        from gdrnet_tpu.config.config import Config, merge_dict

        cfg = Config(merge_dict(cfg.to_dict(),
                                load_config(args.config).to_dict()))

    if args.ckpt:
        from gdrnet_tpu.engine.checkpoint import load_variables_any

        variables = load_variables_any(cfg, args.ckpt)
        print(f"exporting weights from {args.ckpt}", file=sys.stderr)
    else:
        # random-init smoke artifact: init traces the whole net, so only
        # pay for it when no checkpoint is provided
        import jax.numpy as jnp

        model = build_model(cfg)
        b = synthetic_roi_batch(
            batch_size=2, input_res=cfg.MODEL.CDPN.BACKBONE.INPUT_RES,
            out_res=cfg.MODEL.CDPN.BACKBONE.OUTPUT_RES)
        sample = {k: jnp.asarray(v) for k, v in b.items()}
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, sample["roi_img"],
            roi_classes=sample["roi_classes"], roi_coord_2d=sample["roi_coord_2d"],
            roi_cams=sample["roi_cams"], roi_centers=sample["roi_centers"],
            roi_whs=sample["roi_whs"], roi_extents=sample["roi_extents"],
            resize_ratios=sample["resize_ratios"], train=False)

    if args.fold_bn:
        from gdrnet_tpu.utils.fold_bn import fold_variables

        variables = fold_variables(variables)

    platforms = [s.strip() for s in args.platforms.split(",") if s.strip()]
    exp, arg_names, shapes = build_exported(cfg, variables, args.batch,
                                            platforms, int8=args.int8)
    blob = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    meta = {"arg_names": list(arg_names), "shapes": shapes,
            "platforms": platforms, "bytes": len(blob), "int8": args.int8,
            "outputs": ["rot [B,3,3]", "trans [B,3]"]}
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps({"out": args.out, **meta}))


if __name__ == "__main__":
    main()
