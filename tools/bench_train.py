"""Train-step throughput bench on the real chip (one JSON line per batch
size). The flagship GDRN-R34 config with the full loss stack (PM loss over
3k points, 64 regions, centroid/z) and the Ranger optimizer — i.e. the real
training hot loop, not a stripped forward.

The step chains state through the optimizer update, so timing N sequential
steps and fetching a scalar off the final state is an honest device fence
even over the axon tunnel (see CLAUDE.md bench notes).

Two modes:
- default: ONE synthetic device-resident batch, step math only (the
  FLOP-bound ceiling);
- --with-loader: the REAL input path — mapper + TrainLoader + to_device +
  step via engine.trainer.build_input_pipeline (the exact objects do_train
  uses), against an on-disk dataset, reporting sustained ROIs/s and avg
  host data time per step. `--pipeline` picks host mapping
  (host|device-prep|device-aug) or the HBM-resident pool (pool); `--workers`
  sweeps mapper thread counts to locate the host-bound -> FLOP-bound
  crossover (reference logs data_time per iter, engine.py:237-239, but has
  no such bench).

Usage:
  python tools/bench_train.py [--batch-sizes 24,64,128] [--iters 6]
  python tools/bench_train.py --with-loader \
      --config-file configs/gdrn/synth/a6_cPnP_synth.py \
      --batch-sizes 64,256 --pipeline host,device-prep,device-aug,pool \
      --workers 4,8 [--iters 30] [--max-records 512]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def bench_with_loader(args):
    """Sustained loader->to_device->step throughput on a real dataset."""
    import jax
    import numpy as np

    from gdrnet_tpu.config import base_config, load_config
    from gdrnet_tpu.config.config import Config, merge_dict
    from gdrnet_tpu.engine import create_train_state, make_train_step
    from gdrnet_tpu.engine.trainer import (build_input_pipeline,
                                           build_train_objects,
                                           resolve_mesh_spec)
    from gdrnet_tpu.models import build_model
    from gdrnet_tpu.parallel import make_mesh, replicated_sharding
    from gdrnet_tpu.solver import build_lr_schedule, build_optimizer

    for pipeline in args.pipeline.split(","):
        for B in [int(x) for x in args.batch_sizes.split(",")]:
            for workers in [int(x) for x in args.workers.split(",")]:
                cfg = Config(merge_dict(
                    base_config().to_dict(),
                    load_config(args.config_file).to_dict()))
                cfg.SOLVER.IMS_PER_BATCH = B
                cfg.DATALOADER.NUM_WORKERS = workers
                cfg.INPUT.DEVICE_PREPROCESS = pipeline in ("device-prep",
                                                           "device-aug")
                cfg.INPUT.DEVICE_COLOR_AUG = pipeline == "device-aug"
                cfg.TRAIN.DEVICE_RESIDENT_POOL = pipeline == "pool"
                cfg.TRAIN.POOL_REFRESH = pipeline == "pool"
                meta, records, records2, models, mapper = build_train_objects(
                    cfg, args.data_root)
                if args.max_records and len(records) > args.max_records:
                    records = records[:args.max_records]
                n_total, mp, axis = resolve_mesh_spec(cfg, B, len(jax.devices()))
                mesh = make_mesh(n_total, axis_name=axis, model_parallel=mp)
                t_build = time.perf_counter()
                loader, to_device, refresher = build_input_pipeline(
                    cfg, records, records2, models, mapper, mesh, axis,
                    seed=1)
                loader_iter = iter(loader)
                batch = to_device(next(loader_iter), 0)
                build_s = time.perf_counter() - t_build  # incl. pool build
                model = build_model(cfg)
                opt = build_optimizer(
                    cfg, lr_schedule=build_lr_schedule(cfg, 1e-4, 10000))
                state = create_train_state(model, opt, batch,
                                           jax.random.PRNGKey(0))
                state = jax.device_put(state, replicated_sharding(mesh))
                step = make_train_step(cfg, model, opt, mesh=mesh)
                rng = jax.random.PRNGKey(1)
                # warmup: compile step + prep program, fill the worker queue
                state, m = step(state, batch, rng)
                assert np.isfinite(float(m["total_loss"]))
                batch = to_device(next(loader_iter), 1)
                data_times = []
                t0 = time.perf_counter()
                for i in range(args.iters):
                    state, m = step(state, batch, jax.random.fold_in(rng, i))
                    # overlapped host fetch, exactly like do_train's hot loop
                    td = time.perf_counter()
                    batch = to_device(next(loader_iter), i + 2)
                    data_times.append(time.perf_counter() - td)
                    if refresher is not None:
                        refresher.drain(max_chunks=1)
                loss = float(m["total_loss"])  # host fetch fences the chain
                dt = (time.perf_counter() - t0) / args.iters
                if refresher is not None:
                    refresher.stop()
                print(json.dumps({
                    "metric": "sustained_train_rois_per_sec",
                    "pipeline": pipeline, "batch": B, "workers": workers,
                    "value": round(B / dt, 1), "unit": "ROIs/s",
                    "ms_per_step": round(dt * 1e3, 1),
                    "data_ms_per_step": round(
                        1e3 * sum(data_times) / len(data_times), 1),
                    "records": len(records),
                    "build_s": round(build_s, 1),
                    "loss": round(loss, 4)}), flush=True)


def audit_step(args):
    """MFU audit of the compiled train step (VERDICT r04 #8): XLA's own
    cost analysis of the lowered step (FLOPs + HBM traffic) against the
    measured step time -> achieved TFLOP/s, fraction of the v5e peak, and
    the roofline verdict (compute- vs bandwidth-bound). The forward pass is
    audited the same way so the train/forward FLOP ratio (~3x for
    backprop) is measured, not assumed. One JSON line per batch size."""
    import jax
    import jax.numpy as jnp

    from gdrnet_tpu.config import base_config
    from gdrnet_tpu.data import synthetic_roi_batch
    from gdrnet_tpu.engine import create_train_state, make_train_step
    from gdrnet_tpu.engine.steps import _model_kwargs
    from gdrnet_tpu.models import build_model
    from gdrnet_tpu.solver import build_lr_schedule, build_optimizer

    # v5e single-chip peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM
    PEAK_TFLOPS, PEAK_GBS = 197.0, 819.0
    on_tpu = jax.default_backend() not in ("cpu",)

    for B in [int(x) for x in args.batch_sizes.split(",")]:
        cfg = base_config()
        pnp = cfg.MODEL.CDPN.PNP_NET
        pnp.WITH_2D_COORD = True
        pnp.REGION_ATTENTION = True
        pnp.PM_NORM_BY_EXTENT = True
        pnp.CENTROID_LW = 1.0
        pnp.Z_LW = 1.0
        cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 64
        cfg.PARALLEL.DTYPE = "bfloat16"
        cfg.SOLVER.OPTIMIZER_CFG = dict(type="Ranger", lr=1e-4,
                                        weight_decay=0)
        model = build_model(cfg)
        opt = build_optimizer(cfg,
                              lr_schedule=build_lr_schedule(cfg, 1e-4, 10000))
        batch = {k: jnp.asarray(v) for k, v in synthetic_roi_batch(
            batch_size=B, num_points=3000, num_regions=64).items()}
        state = create_train_state(model, opt, batch, jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, opt)
        rng = jax.random.PRNGKey(1)

        def costs(jitted, *a, **kw):
            c = jitted.lower(*a, **kw).compile().cost_analysis()
            c = c[0] if isinstance(c, (list, tuple)) else c
            return (float(c.get("flops", 0.0)),
                    float(c.get("bytes accessed", 0.0)))

        fwd = jax.jit(lambda v, b: model.apply(
            v, b["roi_img"], **_model_kwargs(b), train=False))
        variables = ({"params": state.params,
                      "batch_stats": state.batch_stats}
                     if state.batch_stats else {"params": state.params})
        f_fwd, by_fwd = costs(fwd, variables, batch)
        f_step, by_step = costs(step, state, batch, rng)
        rec = {
            "metric": "train_step_mfu_audit", "batch": B,
            "step_gflops": round(f_step / 1e9, 1),
            "fwd_gflops": round(f_fwd / 1e9, 1),
            "step_fwd_flop_ratio": round(f_step / max(f_fwd, 1.0), 2),
            "step_hbm_gb": round(by_step / 1e9, 2),
            # FLOP:byte of the whole step vs the chip's ~240 ridge point
            "arith_intensity": round(f_step / max(by_step, 1.0), 1),
            "backend": jax.default_backend(),
        }
        if on_tpu:
            state, m = step(state, batch, rng)  # compile+warmup
            assert float(m["total_loss"]) == float(m["total_loss"])
            t0 = time.perf_counter()
            for i in range(args.iters):
                state, m = step(state, batch, jax.random.fold_in(rng, i))
            float(m["total_loss"])  # fence
            dt = (time.perf_counter() - t0) / args.iters
            tflops = f_step / dt / 1e12
            gbs = by_step / dt / 1e9
            rec.update(
                ms_per_step=round(dt * 1e3, 1),
                rois_per_sec=round(B / dt, 1),
                achieved_tflops=round(tflops, 1),
                mfu=round(tflops / PEAK_TFLOPS, 3),
                achieved_hbm_gbs=round(gbs, 1),
                hbm_frac=round(gbs / PEAK_GBS, 3),
                bound=("compute" if tflops / PEAK_TFLOPS
                       >= gbs / PEAK_GBS else "bandwidth"))
        print(json.dumps(rec), flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch-sizes", default="24,64,128")
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--audit", action="store_true",
                   help="MFU/roofline audit of the compiled train step")
    p.add_argument("--cpu", action="store_true",
                   help="with --audit: FLOP counts only, no chip timing")
    p.add_argument("--with-loader", action="store_true")
    p.add_argument("--config-file",
                   default="configs/gdrn/synth/a6_cPnP_synth.py")
    p.add_argument("--data-root", default="datasets/BOP_DATASETS")
    p.add_argument("--pipeline", default="host,device-prep,device-aug,pool",
                   help="comma list: host|device-prep|device-aug|pool")
    p.add_argument("--workers", default="4")
    p.add_argument("--max-records", type=int, default=0,
                   help="truncate the record list (bounds pool build time)")
    args = p.parse_args(argv)

    if args.audit:
        # FLOP/byte counts come from the lowered module and work on any
        # backend; the timing/MFU leg is added when a TPU is bound
        import jax

        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
        else:
            from gdrnet_tpu.utils.device_probe import probe_device

            probe_device()
        if args.batch_sizes == "24,64,128":
            args.batch_sizes = "256"
        audit_step(args)
        return

    from gdrnet_tpu.utils.device_probe import probe_device

    probe_device()  # the tunnel can hang at backend init; don't bind blind

    if args.with_loader:
        if args.batch_sizes == "24,64,128":
            args.batch_sizes = "64,256"
        if args.iters == 6:
            args.iters = 30
        bench_with_loader(args)
        return

    import jax
    import jax.numpy as jnp

    from gdrnet_tpu.config import base_config
    from gdrnet_tpu.data import synthetic_roi_batch
    from gdrnet_tpu.engine import create_train_state, make_train_step
    from gdrnet_tpu.models import build_model
    from gdrnet_tpu.solver import build_lr_schedule, build_optimizer

    for B in [int(x) for x in args.batch_sizes.split(",")]:
        cfg = base_config()
        pnp = cfg.MODEL.CDPN.PNP_NET
        pnp.WITH_2D_COORD = True
        pnp.REGION_ATTENTION = True
        pnp.PM_NORM_BY_EXTENT = True
        pnp.CENTROID_LW = 1.0
        pnp.Z_LW = 1.0
        cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 64
        cfg.PARALLEL.DTYPE = "bfloat16"
        cfg.SOLVER.OPTIMIZER_CFG = dict(type="Ranger", lr=1e-4, weight_decay=0)
        model = build_model(cfg)
        opt = build_optimizer(cfg, lr_schedule=build_lr_schedule(cfg, 1e-4, 10000))
        batch = {k: jnp.asarray(v) for k, v in synthetic_roi_batch(
            batch_size=B, num_points=3000, num_regions=64).items()}
        state = create_train_state(model, opt, batch, jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, opt)
        rng = jax.random.PRNGKey(1)
        state, m = step(state, batch, rng)  # compile + warmup
        assert float(m["total_loss"]) == float(m["total_loss"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, m = step(state, batch, jax.random.fold_in(rng, i))
        loss = float(m["total_loss"])  # host fetch fences the chained steps
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "metric": "train_rois_per_sec_per_chip", "batch": B,
            "value": round(B / dt, 1), "unit": "ROIs/s",
            "ms_per_step": round(dt * 1e3, 1), "loss": round(loss, 4)}))


if __name__ == "__main__":
    main()
