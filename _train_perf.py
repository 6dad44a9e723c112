import time, numpy as np, jax, jax.numpy as jnp
from gdrnet_tpu.config import base_config
from gdrnet_tpu.models import build_model
from gdrnet_tpu.data import synthetic_roi_batch
from gdrnet_tpu.engine import create_train_state, make_train_step
from gdrnet_tpu.solver import build_optimizer, build_lr_schedule

for B in (24, 64, 128):
    cfg = base_config()
    pnp = cfg.MODEL.CDPN.PNP_NET
    pnp.WITH_2D_COORD = True; pnp.REGION_ATTENTION = True
    pnp.PM_NORM_BY_EXTENT = True; pnp.CENTROID_LW = 1.0; pnp.Z_LW = 1.0
    cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 64
    cfg.PARALLEL.DTYPE = "bfloat16"
    cfg.SOLVER.OPTIMIZER_CFG = dict(type="Ranger", lr=1e-4, weight_decay=0)
    model = build_model(cfg)
    sched = build_lr_schedule(cfg, 1e-4, 10000)
    opt = build_optimizer(cfg, lr_schedule=sched)
    b = synthetic_roi_batch(batch_size=B, num_points=3000, num_regions=64)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    state = create_train_state(model, opt, batch, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, opt)
    rng = jax.random.PRNGKey(1)
    state, m = step(state, batch, rng)
    _ = float(m["total_loss"])
    iters = 6
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.fold_in(rng, i))
    _ = float(m["total_loss"])  # host fetch fence (sequential dependency via state)
    dt = (time.perf_counter() - t0) / iters
    print(f"train B={B}: {dt*1e3:.1f} ms/step -> {B/dt:.0f} ROIs/s", flush=True)
