"""Train-step throughput bench on the real chip (one JSON line per batch
size). The flagship GDRN-R34 config with the full loss stack (PM loss over
3k points, 64 regions, centroid/z) and the Ranger optimizer — i.e. the real
training hot loop, not a stripped forward.

The step chains state through the optimizer update, so timing N sequential
steps and fetching a scalar off the final state is an honest device fence
even over the axon tunnel (see CLAUDE.md bench notes).

Usage: python tools/bench_train.py [--batch-sizes 24,64,128] [--iters 6]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch-sizes", default="24,64,128")
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args(argv)

    from gdrnet_tpu.utils.device_probe import probe_device

    probe_device()  # the tunnel can hang at backend init; don't bind blind

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
