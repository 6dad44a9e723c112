"""On-chip learning validation (--int8 additionally scores the int8 serving path): overfit the 2-object fixture dataset with the
full train step (Ranger + all losses) and verify the evaluator reports
accurate poses (expected after 800 iters / ~35s on a v5e: mean_re ~2 deg,
mean_te ~1 cm, ad_10 >= 0.5 and climbing; the brick converges to either of
its declared z-180 symmetry branches — the symmetric PM loss permits both and
the sym-aware evaluator resolves them).

Usage: python tools/validate_overfit.py [--device-preprocess] [--int8]
       [--seed N]   (N varies model init + train-step RNG; data fixed)
       [--images N] (fixture images; default 6 -> 12 ROIs. The 12-ROI
                     fixture makes ad_10 granular (each ROI = 8.3% recall,
                     and te sits near the 0.1d threshold on these small
                     boxes); --images 12 doubles the sample count and
                     stabilizes the recall across seeds)
"""
import os.path as osp
import sys as _sys
_sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
from gdrnet_tpu.utils.device_probe import probe_device
probe_device()  # the tunnel can hang at backend init; don't bind blind
import time, numpy as np, jax, jax.numpy as jnp, sys, os
sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tests"))
from fixture_bop import build_fixture_dataset
from gdrnet_tpu.config import base_config
from gdrnet_tpu.data import ObjectModels, GDRNTrainMapper, TrainLoader
from gdrnet_tpu.data.bop import load_bop_scene_dicts
from gdrnet_tpu.models import build_model
from gdrnet_tpu.solver import build_optimizer, build_lr_schedule
from gdrnet_tpu.engine import create_train_state, make_train_step
from gdrnet_tpu.engine.tester import do_test

N_IMAGES = (int(sys.argv[sys.argv.index("--images") + 1])
            if "--images" in sys.argv else 6)
root = "/tmp/fixture_overfit"
import shutil; shutil.rmtree(root, ignore_errors=True)
meta = build_fixture_dataset(root, n_images=N_IMAGES, seed=42)
records = load_bop_scene_dicts(meta, "test", img_type="real")
models = ObjectModels(meta, num_pm_points=256, num_fps=8)

cfg = base_config()
bb = cfg.MODEL.CDPN.BACKBONE; bb.NUM_LAYERS = 18
cfg.MODEL.CDPN.ROT_HEAD.NUM_CLASSES = 2
cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 8
pnp = cfg.MODEL.CDPN.PNP_NET
pnp.WITH_2D_COORD = True; pnp.REGION_ATTENTION = True
pnp.PM_LOSS_SYM = True; pnp.PM_NORM_BY_EXTENT = True
pnp.CENTROID_LW = 1.0; pnp.Z_LW = 1.0
cfg.DATASETS.SYM_OBJS = ["brick"]
cfg.SOLVER.OPTIMIZER_CFG = dict(type="Ranger", lr=1e-3, weight_decay=0)
cfg.SOLVER.ANNEAL_POINT = 0.72
cfg.TEST.ROI_BATCH_SIZE = 4
cfg.PARALLEL.DTYPE = "bfloat16"
cfg.INPUT.DZI_TYPE = "none"  # train crops == eval crops (overfit check)

TOTAL = 800
from gdrnet_tpu.data.mapper import collate
# the whole fixture dataset = 2*N_IMAGES ROI samples: pre-map with fixed DZI per
# sample, upload ONCE (the tunnel's host->device bandwidth dominates
# otherwise), train on the device-resident batch. With --device-preprocess
# the raw frames go up instead and the GT tensors come out of the XLA
# pipeline (data/device_pipeline.py) — same convergence expected.
if "--device-preprocess" in sys.argv:
    from gdrnet_tpu.data.mapper import GDRNRawTrainMapper
    from gdrnet_tpu.data.device_pipeline import device_train_batch

    raw_mapper = GDRNRawTrainMapper(cfg, models)
    raw = collate([raw_mapper(rec, np.random.RandomState(i))
                   for i, rec in enumerate(records)])
    batch = device_train_batch(
        jax.random.PRNGKey(3), {k: jnp.asarray(v) for k, v in raw.items()},
        jnp.asarray(models.points_stack), jnp.asarray(models.extents_stack),
        jnp.asarray(models.fps_stack), jnp.asarray(models.sym_rots_stack),
        jnp.asarray(models.sym_mask_stack),
        jnp.asarray(cfg.MODEL.PIXEL_MEAN, jnp.float32),
        jnp.asarray(cfg.MODEL.PIXEL_STD, jnp.float32),
        dzi_type="none", pad_scale=cfg.INPUT.DZI_PAD_SCALE)
    batch = jax.device_put(batch)
    print("training through the DEVICE preprocessing pipeline", flush=True)
else:
    mapper = GDRNTrainMapper(cfg, models)
    samples = [mapper(rec, np.random.RandomState(i))
               for i, rec in enumerate(records)]
    batch = {k: jnp.asarray(v) for k, v in collate(samples).items()}
SEED = int(sys.argv[sys.argv.index("--seed") + 1]) if "--seed" in sys.argv else 0
model = build_model(cfg)
sched = build_lr_schedule(cfg, 1e-3, TOTAL)
opt = build_optimizer(cfg, lr_schedule=sched)
state = create_train_state(model, opt, batch, jax.random.PRNGKey(SEED))
step = make_train_step(cfg, model, opt)
rng = jax.random.PRNGKey(SEED + 1)
t0 = time.time()
for it in range(TOTAL):
    state, m = step(state, batch, jax.random.fold_in(rng, it))
    if it % 200 == 0 or it == TOTAL - 1:
        parts = " ".join(f"{k.removeprefix('loss_')}={float(v):.3f}"
                         for k, v in sorted(m.items()) if k.startswith("loss"))
        print(f"it {it}: total={float(m['total_loss']):.3f} "
              f"errR={float(m['vis/error_R']):.1f}deg errT={float(m['vis/error_t']):.2f}cm | {parts}", flush=True)
print(f"train time: {time.time()-t0:.0f}s", flush=True)

if "--save-ckpt" in sys.argv:  # feed `bench.py --ckpt` real trained weights
    from gdrnet_tpu.engine.checkpoint import CheckpointManager
    arg = sys.argv[sys.argv.index("--save-ckpt") + 1]
    # bench.py auto-detect expects <dir>/ckpt + <dir>/config.py (model dims)
    ckpt_dir = arg if osp.basename(arg.rstrip("/")) == "ckpt" else osp.join(arg, "ckpt")
    mgr = CheckpointManager(ckpt_dir); mgr.save(state); mgr.wait()
    with open(osp.join(osp.dirname(osp.abspath(ckpt_dir)), "config.py"), "w") as f:
        f.write(
            "# auto-written by tools/validate_overfit.py --save-ckpt: model\n"
            "# dims of the saved fixture checkpoint (for bench.py --ckpt).\n"
            "MODEL = dict(CDPN=dict(\n"
            "    BACKBONE=dict(NUM_LAYERS=18),\n"
            "    ROT_HEAD=dict(NUM_CLASSES=2, NUM_REGIONS=8),\n"
            "    PNP_NET=dict(WITH_2D_COORD=True, REGION_ATTENTION=True,\n"
            "                 PM_LOSS_SYM=True, PM_NORM_BY_EXTENT=True,\n"
            "                 CENTROID_LW=1.0, Z_LW=1.0),\n"
            "))\n")
    print("saved checkpoint to", ckpt_dir, flush=True)

results = do_test(cfg, model, state.variables(), models, records, output_dir="/tmp/fixture_overfit_out")
print(results["_summary"], flush=True)
print("ad_10 avg:", results["Avg"]["ad_10"], " re mean:", results["Avg"]["mean_re"], flush=True)
import json as _json
print("SWEEP " + _json.dumps({
    "seed": SEED, "images": N_IMAGES,
    "device_preprocess": "--device-preprocess" in sys.argv,
    "ad_10": float(results["Avg"]["ad_10"]),
    "mean_re": float(results["Avg"]["mean_re"]),
    "mean_te": float(results["Avg"]["mean_te"])}), flush=True)

if "--int8" in sys.argv:  # quantized-serving quality gate (TEST.INT8)
    cfg.TEST.INT8 = True
    r8 = do_test(cfg, model, state.variables(), models, records,
                 output_dir="/tmp/fixture_overfit_out_int8")
    print("int8:", r8["_summary"], flush=True)
    print("int8 ad_10 avg:", r8["Avg"]["ad_10"], " re mean:", r8["Avg"]["mean_re"], flush=True)
