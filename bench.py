"""Benchmark: ROI pose-crop inference throughput on one chip.

Runs the flagship GDRN-R34 (256x256 ROI crops, 2D-coord + region attention —
the reference's strongest single-model config family) in bf16 over large
batches and reports crops/sec/chip. Baseline = 5000 crops/sec/chip, the
north-star from BASELINE.json (the reference paper claims ~35 ms/object
end-to-end on GPU ≈ 29 crops/sec without batching; the TPU target is the
driver-set 5k).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Default benches the int8 serving path (TEST.INT8 semantics:
models/quantize.py, calibrated on the bench batch) — quality-gated on chip
by `tools/validate_overfit.py --int8` (ad_10 parity with bf16, mean_re
+0.08 deg on the overfit fixture). `--bf16` benches the bf16 path.

Flags: --bf16 | --fold-bn | --ckpt <orbax dir or converted .pth> (bench +
int8-calibrate on real weights) | --config <cfg.py> (model dims for a
non-flagship checkpoint) | --batch N | --iters N.

Without --ckpt, real TRAINED weights are auto-detected from the default
locations below (the scale-run / validate_overfit artifacts), so the
recorded artifact reflects a real network's int8 calibration; random init
is the loud last resort. The JSON line carries "ckpt" and, on the int8
path, the int8-vs-bf16 output drift on the bench batch.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_CROPS_PER_SEC = 5000.0

# auto-detected trained-weights locations, (ckpt_dir, config) — first hit
# wins: the scale-run checkpoint (SCALE_RUN.md), then a locally saved
# validate_overfit --save-ckpt artifact. The paired config carries the
# checkpoint's model dims (class count etc.).
DEFAULT_CKPTS = (
    ("output/gdrn/synth/a6_cPnP_synth/ckpt", "configs/gdrn/synth/a6_cPnP_synth.py"),
    ("checkpoints/bench_default/ckpt", "checkpoints/bench_default/config.py"),
)


def _probe_device(max_tries: int = 12) -> None:
    # watchdogged subprocess probe: the tunnel can hang at backend init
    # (gdrnet_tpu/utils/device_probe.py). This is the round's contract
    # artifact, so ride out a long outage (~35 min window) but hard-fail
    # rather than bind a hung backend and wedge the calling driver.
    from gdrnet_tpu.utils.device_probe import probe_device

    probe_device(max_tries=max_tries, require=True)


def _flag_value(name: str) -> str | None:
    if name not in sys.argv:
        return None
    i = sys.argv.index(name) + 1
    if i >= len(sys.argv):
        raise SystemExit(f"{name} requires a value")
    return sys.argv[i]


def main():
    """Fault-bounded orchestrator: the measurement runs in a subprocess so a
    tunnel fault mid-jit (BENCH_r04 died on `remote_compile: read body`
    inside the compile leg) or a wedged runtime costs one bounded attempt —
    the driver invokes `python bench.py` exactly once per round, so this
    process must survive one hiccup on its own."""
    if "--_worker" in sys.argv:
        sys.argv.remove("--_worker")
        return _bench_main()

    from gdrnet_tpu.utils.device_probe import _pinned_cpu

    if _pinned_cpu():
        # no tunnel to isolate against, and a subprocess would escape the
        # caller's cpu pinning and bind the real chip (tests, CPU hosts)
        return _bench_main()

    import os
    import subprocess

    # ride out a long outage HERE (outside the per-attempt timeout): the
    # probe window is the round's "wait for the chip" budget, the attempt
    # timeout is the "a live chip hung mid-run" tripwire
    _probe_device()

    attempts, per_attempt_s, budget_s = 3, 900, 2100
    t0 = time.time()
    for attempt in range(1, attempts + 1):
        left = budget_s - (time.time() - t0)
        if left < 120:
            break
        try:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--_worker",
                 *sys.argv[1:]],
                timeout=min(per_attempt_s, left)).returncode
        except subprocess.TimeoutExpired:
            rc = -9
            print(f"bench attempt {attempt}: KILLED after "
                  f"{min(per_attempt_s, left):.0f}s (hung tunnel?)",
                  file=sys.stderr)
        if rc == 0:
            return
        print(f"bench attempt {attempt}/{attempts} failed (rc={rc}); "
              "re-probing chip", file=sys.stderr)
    raise SystemExit("bench: all attempts failed")


def _bench_main():
    from gdrnet_tpu.config import base_config
    from gdrnet_tpu.models import build_model
    from gdrnet_tpu.data import synthetic_roi_batch

    # validate value-taking flags BEFORE any expensive init
    for f in ("--ckpt", "--config", "--batch", "--iters"):
        _flag_value(f)

    # short probe only: the orchestrator already rode out any long outage
    _probe_device(max_tries=2)

    import os.path as osp

    cfg = base_config()
    cfg.MODEL.CDPN.PNP_NET.WITH_2D_COORD = True
    cfg.MODEL.CDPN.PNP_NET.REGION_ATTENTION = True
    cfg.PARALLEL.DTYPE = "bfloat16"
    cfg_path = _flag_value("--config")
    ckpt = _flag_value("--ckpt")
    if ckpt is None and cfg_path is None:
        # auto-detect trained weights (paired with their model-dims config)
        for c_dir, c_cfg in DEFAULT_CKPTS:
            if osp.exists(c_dir) and osp.exists(c_cfg):
                ckpt, cfg_path = c_dir, c_cfg
                print(f"auto-detected trained weights: {ckpt}", file=sys.stderr)
                break
    if ckpt is None:
        # loud whether or not --config narrowed the model dims: random
        # init is the last resort, never silent
        print("WARNING: no trained checkpoint found "
              f"({' | '.join(c for c, _ in DEFAULT_CKPTS)}); benching "
              "RANDOM INIT weights", file=sys.stderr)
    if cfg_path:  # model dims of a non-flagship checkpoint
        from gdrnet_tpu.config import load_config
        from gdrnet_tpu.config.config import Config, merge_dict

        cfg = Config(merge_dict(cfg.to_dict(), load_config(cfg_path).to_dict()))
        cfg.PARALLEL.DTYPE = "bfloat16"
    model = build_model(cfg)

    batch_size = int(_flag_value("--batch") or 1024)
    input_res = cfg.MODEL.CDPN.BACKBONE.INPUT_RES
    out_res = cfg.MODEL.CDPN.BACKBONE.OUTPUT_RES
    b = synthetic_roi_batch(batch_size=batch_size, input_res=input_res,
                            out_res=out_res)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    kwargs = dict(
        roi_classes=batch["roi_classes"], roi_coord_2d=batch["roi_coord_2d"],
        roi_cams=batch["roi_cams"], roi_centers=batch["roi_centers"],
        roi_whs=batch["roi_whs"], roi_extents=batch["roi_extents"],
        resize_ratios=batch["resize_ratios"])
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           batch["roi_img"], **kwargs, train=False)

    if ckpt:
        # bench + int8 calibration on REAL weights (orbax dir or converted
        # reference .pth) instead of random init; falls back loudly
        from gdrnet_tpu.engine.checkpoint import load_variables_any

        variables = jax.device_put(load_variables_any(cfg, ckpt))
        print(f"benching weights from {ckpt}", file=sys.stderr)

    if "--fold-bn" in sys.argv:
        from gdrnet_tpu.utils.fold_bn import fold_variables

        variables = jax.device_put(fold_variables(variables))

    int8_scales = None
    if "--bf16" not in sys.argv:
        from gdrnet_tpu.models.quantize import calibrate_act_scales
        from gdrnet_tpu.engine.steps import _model_kwargs

        def _cal_apply(v, b, _apply):
            _apply(v, b["roi_img"], **_model_kwargs(b), train=False)

        int8_scales = calibrate_act_scales(model, variables, [batch],
                                           apply_fn=_cal_apply)

    def _forward(variables, roi_img, scales=None):
        from gdrnet_tpu.models.quantize import quantized_scope
        import contextlib

        if scales is None:
            scales = int8_scales
        ctx = (quantized_scope(scales) if scales
               else contextlib.nullcontext())
        with ctx:
            out = model.apply(
                variables, roi_img,
                roi_classes=batch["roi_classes"],
                roi_coord_2d=batch["roi_coord_2d"],
                roi_cams=batch["roi_cams"], roi_centers=batch["roi_centers"],
                roi_whs=batch["roi_whs"], roi_extents=batch["roi_extents"],
                resize_ratios=batch["resize_ratios"], train=False)
        return out["rot"], out["trans"]

    iters = int(_flag_value("--iters") or 10)

    # Chain iterations on-device via lax.scan (each iteration's input depends
    # on the previous output) and fetch the carry to the host: the tunnel's
    # block_until_ready can return before execution finishes, so a host fetch
    # of a data-dependent scalar is the only honest fence. Warmup excluded as
    # in the reference driver (gdrn_evaluator.py:545-560).
    @jax.jit
    def bench_iters(variables, roi_img):
        def body(carry, _):
            rot, trans = _forward(variables, roi_img + carry * 1e-30)
            return jnp.sum(trans[0]) , None
        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return carry

    float(bench_iters(variables, batch["roi_img"]))  # compile + warmup
    t0 = time.perf_counter()
    carry = float(bench_iters(variables, batch["roi_img"]))
    dt = time.perf_counter() - t0
    assert carry == carry, "NaN in benched forward"

    crops_per_sec = batch_size * iters / dt
    record = {
        "metric": "roi_pose_crops_per_sec_per_chip",
        "value": round(crops_per_sec, 1),
        "unit": "crops/s",
        "vs_baseline": round(crops_per_sec / BASELINE_CROPS_PER_SEC, 3),
        "ckpt": ckpt,
    }
    if int8_scales:
        # int8-vs-bf16 output drift on the bench batch: the quality cost of
        # the quantization the throughput number is measured on
        from gdrnet_tpu.ops.rotation import rot_angle_deg

        r8, t8 = jax.jit(lambda v, x: _forward(v, x))(variables,
                                                      batch["roi_img"])
        r16, t16 = jax.jit(lambda v, x: _forward(v, x, scales={}))(
            variables, batch["roi_img"])
        ang = rot_angle_deg(jnp.asarray(r8, jnp.float32),
                            jnp.asarray(r16, jnp.float32))
        rel = jnp.abs(jnp.asarray(t8, jnp.float32)
                      - jnp.asarray(t16, jnp.float32)) / jnp.maximum(
            jnp.abs(jnp.asarray(t16, jnp.float32)), 1e-3)
        record["int8_rot_drift_deg_mean"] = round(float(ang.mean()), 4)
        record["int8_trans_rel_drift_max"] = round(float(rel.max()), 5)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
