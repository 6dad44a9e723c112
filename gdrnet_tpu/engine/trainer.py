"""Training orchestration: config -> data/model/optimizer/mesh -> hot loop.

The reference's GDRN_Lite.do_train (core/gdrn_modeling/engine.py:144-333)
re-expressed TPU-style: one jitted train_step (forward+loss+grad+opt, see
engine/steps.py) over a 1-D data mesh, host-side threaded loader feeding it,
loss scalars already replicated (no reduce_dict), orbax periodic
checkpointing, console/json/tb writers, periodic in-train eval, and the
finite-loss tripwire (engine.py:271).
"""

from __future__ import annotations

import os.path as osp
import time

import jax
import jax.numpy as jnp
import numpy as np

from gdrnet_tpu.data import (
    ObjectModels,
    GDRNTrainMapper,
    TrainLoader,
    BackgroundReplacer,
)
from gdrnet_tpu.data.dataset_factory import resolve
from gdrnet_tpu.engine.checkpoint import CheckpointManager
from gdrnet_tpu.engine.steps import make_train_step
from gdrnet_tpu.engine.train_state import create_train_state
from gdrnet_tpu.engine.writers import ConsoleWriter, EventLog, JsonWriter, setup_logger
from gdrnet_tpu.models import build_model
from gdrnet_tpu.parallel import make_mesh, shard_batch, replicated_sharding
from gdrnet_tpu.solver import build_lr_schedule, build_optimizer


def build_train_objects(cfg, data_root: str = "datasets/BOP_DATASETS"):
    """Resolve datasets + models + mapper + loader from cfg."""
    names = list(cfg.DATASETS.TRAIN)
    assert names, "DATASETS.TRAIN is empty"
    meta, records = resolve(names[0], data_root,
                            visib_thr=cfg.DATALOADER.FILTER_VISIB_THR)
    for extra in names[1:]:
        _, more = resolve(extra, data_root,
                          visib_thr=cfg.DATALOADER.FILTER_VISIB_THR)
        records = records + more
    records2 = []
    if cfg.DATASETS.TRAIN2 and cfg.DATASETS.TRAIN2_RATIO > 0:
        for extra in cfg.DATASETS.TRAIN2:
            _, more = resolve(extra, data_root,
                              visib_thr=cfg.DATALOADER.FILTER_VISIB_THR)
            records2 += more

    models = ObjectModels(
        meta, num_pm_points=cfg.MODEL.CDPN.PNP_NET.NUM_PM_POINTS,
        num_fps=cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS)
    bg = None
    if cfg.INPUT.CHANGE_BG_PROB > 0 or any(
            r.get("img_type", "real") != "real" for r in records):
        bg = BackgroundReplacer(
            cfg.INPUT.BG_IMGS_ROOT, cfg.INPUT.NUM_BG_IMGS,
            keep_aspect=cfg.INPUT.BG_KEEP_ASPECT_RATIO,
            bg_type=cfg.INPUT.BG_TYPE)
    mapper_cls = GDRNTrainMapper
    if cfg.INPUT.DEVICE_PREPROCESS:
        from gdrnet_tpu.data.mapper import GDRNRawTrainMapper

        mapper_cls = GDRNRawTrainMapper
    mapper = mapper_cls(cfg, models, bg_replacer=bg)
    return meta, records, records2, models, mapper


def resolve_mesh_spec(cfg, ims_per_batch: int, n_avail: int,
                      logger=None) -> tuple[int, int, str]:
    """Pick the training mesh dims from cfg: (total_devices, model_parallel,
    axis_name). PARALLEL.MESH_SHAPE caps the device budget for BOTH the pure
    DP and the DP x MP branches; the data-axis size always divides the global
    batch (the reference asserts divisibility, dataset_utils.py:196-198; we
    clamp and warn)."""
    axis = (cfg.PARALLEL.AXIS_NAMES[0]
            if cfg.PARALLEL.get("AXIS_NAMES") else "data")
    mesh_shape = tuple(cfg.PARALLEL.get("MESH_SHAPE", (-1,)))
    if len(mesh_shape) != 1:
        raise ValueError(f"only 1-D data meshes are supported (DP, like the "
                         f"reference; use PARALLEL.MODEL_PARALLEL for a "
                         f"model axis): PARALLEL.MESH_SHAPE={mesh_shape}")
    if mesh_shape[0] != -1 and mesh_shape[0] < 1:
        raise ValueError(f"PARALLEL.MESH_SHAPE={mesh_shape} must be (-1,) "
                         "or a positive device count")
    dev_budget = n_avail if mesh_shape[0] == -1 else min(n_avail, mesh_shape[0])
    mp = int(cfg.PARALLEL.get("MODEL_PARALLEL", 1) or 1)
    if mp > 1:
        # 2-D (data, model) mesh: data count must still divide the batch
        dp_cap = dev_budget // mp
        if dp_cap < 1:
            raise ValueError(f"MODEL_PARALLEL={mp} exceeds "
                             f"{dev_budget} devices")
        dp = max(d for d in range(1, dp_cap + 1) if ims_per_batch % d == 0)
        return dp * mp, mp, axis
    n_dev = max(d for d in range(1, dev_budget + 1)
                if ims_per_batch % d == 0)
    if n_dev != dev_budget and logger is not None:
        logger.warning(f"batch {ims_per_batch} not divisible by "
                       f"{dev_budget} devices; using a {n_dev}-device mesh")
    return n_dev, 1, axis


def build_input_pipeline(cfg, records, records2, models, mapper, mesh, axis,
                         seed: int, logger=None, abort_check=None):
    """The training input path: (loader, to_device, refresher).

    loader yields host batches (or pool index arrays); to_device(nb, it)
    puts/shards them on the mesh, running the XLA preprocessing program when
    INPUT.DEVICE_PREPROCESS is set, or gathering from the HBM-resident pool
    when TRAIN.DEVICE_RESIDENT_POOL is set. Shared by do_train and
    tools/bench_train.py --with-loader so the benched path IS the trained
    path."""
    ims_per_batch = cfg.SOLVER.IMS_PER_BATCH
    pool = refresher = None
    if cfg.TRAIN.get("DEVICE_RESIDENT_POOL"):
        # HBM-resident pool: map every record once, keep the compact pool
        # on device, gather per-step batches by sampler indices; optional
        # background aug-refresh (data/device_pool.py). The train loop is
        # unchanged — the "loader" yields index arrays and "to_device"
        # becomes the on-device gather.
        from gdrnet_tpu.data.device_pool import (DevicePool, PoolRefresher,
                                                 pool_index_sampler)

        if cfg.INPUT.DEVICE_PREPROCESS:
            raise NotImplementedError(
                "DEVICE_RESIDENT_POOL maps on host; disable DEVICE_PREPROCESS")
        pool_out = cfg.OUTPUT_DIR if cfg.OUTPUT_DIR != "auto" else osp.join(
            cfg.OUTPUT_ROOT, cfg.EXP_NAME or "gdrn")
        cache_dir = (osp.join(pool_out, "pool_cache")
                     if cfg.TRAIN.get("POOL_CACHE", True) else None)
        pool = DevicePool(cfg, records, mapper, models, mesh,
                          axis_name=axis, seed=seed, logger=logger,
                          abort_check=abort_check, cache_dir=cache_dir,
                          records2=records2)
        loader = pool_index_sampler(
            pool, ims_per_batch, seed,
            sampler_name=cfg.DATALOADER.SAMPLER_TRAIN,
            repeat_thresh=cfg.DATALOADER.REPEAT_THRESHOLD,
            ratio2=cfg.DATASETS.TRAIN2_RATIO if records2 else 0.0)
        if cfg.TRAIN.get("POOL_REFRESH", True):
            # per-rank refresh seed: each host re-augments its OWN rows
            # with an independent stream (the broadcast seed keeps the
            # SAMPLER streams identical; refresh must not be)
            refresher = PoolRefresher(
                pool, chunk=int(cfg.TRAIN.get("POOL_REFRESH_CHUNK", 64) or 64),
                seed=seed + 1 + 1009 * jax.process_index(), logger=logger)
    else:
        loader = TrainLoader(
            records, mapper, ims_per_batch,
            sampler_name=cfg.DATALOADER.SAMPLER_TRAIN,
            repeat_thresh=cfg.DATALOADER.REPEAT_THRESHOLD,
            num_workers=cfg.DATALOADER.NUM_WORKERS,
            seed=seed,
            records2=records2, ratio2=cfg.DATASETS.TRAIN2_RATIO)

    # device-side preprocessing: ship raw frames, run the whole mapper tail
    # (DZI/crops/targets) as one sharded XLA program (INPUT.DEVICE_PREPROCESS)
    device_prep = None
    if cfg.INPUT.DEVICE_PREPROCESS:
        from gdrnet_tpu.data.device_pipeline import device_train_batch

        rh = cfg.MODEL.CDPN.ROT_HEAD
        stacks = jax.device_put(
            (jnp.asarray(models.points_stack), jnp.asarray(models.extents_stack),
             jnp.asarray(models.fps_stack), jnp.asarray(models.sym_rots_stack),
             jnp.asarray(models.sym_mask_stack),
             jnp.asarray(cfg.MODEL.PIXEL_MEAN, jnp.float32),
             jnp.asarray(cfg.MODEL.PIXEL_STD, jnp.float32)),
            replicated_sharding(mesh))
        prep_static = dict(
            input_res=cfg.MODEL.CDPN.BACKBONE.INPUT_RES,
            out_res=cfg.MODEL.CDPN.BACKBONE.OUTPUT_RES,
            xyz_bin=rh.XYZ_BIN, with_bins="CE" in rh.XYZ_LOSS_TYPE,
            dzi_type=cfg.INPUT.DZI_TYPE, pad_scale=cfg.INPUT.DZI_PAD_SCALE,
            scale_ratio=cfg.INPUT.DZI_SCALE_RATIO,
            shift_ratio=cfg.INPUT.DZI_SHIFT_RATIO,
            xyz_mask_gt=rh.XYZ_LOSS_MASK_GT)
        if cfg.INPUT.get("DEVICE_COLOR_AUG"):
            prep_static.update(
                color_aug_type=cfg.INPUT.COLOR_AUG_TYPE,
                color_aug_prob=cfg.INPUT.COLOR_AUG_PROB,
                color_aug_code=cfg.INPUT.get("COLOR_AUG_CODE") or None,
                color_aug_channel_order=(
                    "rgb" if cfg.INPUT.get("FORMAT", "BGR").upper() == "RGB"
                    else "bgr"))
        prep_rng = jax.random.PRNGKey(seed + 101)

        def device_prep(it_, raw):
            return device_train_batch(
                jax.random.fold_in(prep_rng, it_), raw, *stacks, **prep_static)

    def to_device(nb, it_):
        if pool is not None:  # nb is a [B] index array into the pool
            return pool.make_batch(nb)
        b = shard_batch({k: jnp.asarray(v) for k, v in nb.items()
                         if k not in ("sym_info",)}, mesh, axis)
        if device_prep is not None:
            # re-constrain: constants materialized inside the prep program
            # (e.g. the no-bins gt_xyz_bin zeros) come out replicated
            b = shard_batch(device_prep(it_, b), mesh, axis)
        return b

    return loader, to_device, refresher


def do_train(cfg, resume: bool = False, data_root: str = "datasets/BOP_DATASETS",
             max_iters_override: int | None = None, eval_fn=None):
    """Returns (state, models, preempted). eval_fn(cfg, state, models) is
    called every TEST.EVAL_PERIOD epochs if provided (engine.py:285-292).
    preempted=True means a SIGTERM/SIGINT ended the run at an iteration
    boundary (state checkpointed; resume with --resume) — or during the
    data warmup, in which case state is None and nothing was saved."""
    out_dir = cfg.OUTPUT_DIR if cfg.OUTPUT_DIR != "auto" else osp.join(
        cfg.OUTPUT_ROOT, cfg.EXP_NAME or "gdrn")
    logger = setup_logger(out_dir)

    # preemption-safe exit: on SIGTERM/SIGINT finish the current iteration,
    # checkpoint, and return cleanly so --resume restores the exact step (the
    # reference has only crash-restart, SURVEY.md §5 "failure detection";
    # TPU-pod preemptions make this a first-class path here). Installed at
    # entry so signals during compile/data-warmup are caught too.
    import signal

    preempted = {"flag": False}

    def _on_term(signum, frame):  # noqa: ARG001
        preempted["flag"] = True
        logger.warning(f"signal {signum}: checkpointing at next boundary")

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_term)
        except ValueError:  # non-main thread
            break

    meta, records, records2, models, mapper = build_train_objects(cfg, data_root)

    ims_per_batch = cfg.SOLVER.IMS_PER_BATCH
    iters_per_epoch = max(len(records) // ims_per_batch, 1)
    total_iters = (max_iters_override
                   or iters_per_epoch * cfg.SOLVER.TOTAL_EPOCHS)
    logger.info(f"{len(records)} records, {iters_per_epoch} iters/epoch, "
                f"{total_iters} total iters")

    # SEED < 0 means fully randomize (reference common_base.py SEED=-1);
    # mask to 31 bits so the int32 broadcast below can never overflow
    seed = cfg.SEED if cfg.SEED >= 0 else (
        int.from_bytes(__import__("os").urandom(4), "little") & 0x7FFFFFFF)
    from gdrnet_tpu.parallel import multihost as mh

    if mh.get_world_size() > 1:
        # every host must see the SAME loader stream + init rng: the batch
        # device_put asserts cross-process equality (reference broadcasts
        # the sampler seed too, my_distributed_sampler.py:37)
        from jax.experimental import multihost_utils

        seed = int(multihost_utils.broadcast_one_to_all(
            jnp.asarray(seed, jnp.int32)))
    # PARALLEL.MESH_SHAPE/AXIS_NAMES: 1-D data mesh (the reference is
    # DP-only, SURVEY.md §2.9); the axis name is config-driven so sharded
    # checkpoints/shardings stay stable across runs
    n_total, mp, axis = resolve_mesh_spec(
        cfg, ims_per_batch, len(jax.devices()), logger=logger)
    mesh = make_mesh(n_total, axis_name=axis, model_parallel=mp)

    try:
        loader, to_device, refresher = build_input_pipeline(
            cfg, records, records2, models, mapper, mesh, axis, seed,
            logger=logger, abort_check=lambda: preempted["flag"])
    except InterruptedError:
        logger.warning("preempted during pool build; nothing saved")
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)
        return None, models, True
    model = build_model(cfg)
    base_lr = dict(cfg.SOLVER.OPTIMIZER_CFG).get("lr", 1e-4)
    # with gradient accumulation the inner optimizer (optax.MultiSteps)
    # advances its schedule once per k train iterations — build the schedule
    # over optimizer UPDATES so warmup/anneal land where configured
    accum = int(cfg.SOLVER.get("GRAD_ACCUM_STEPS", 1) or 1)
    schedule = build_lr_schedule(cfg, base_lr, total_iters,
                                 steps_per_update=accum)
    optimizer = build_optimizer(cfg, lr_schedule=schedule)

    loader_iter = iter(loader)
    t0 = time.perf_counter()
    first_batch = next(loader_iter)
    data_time = time.perf_counter() - t0

    batch_dev = to_device(first_batch, 0)
    rng = jax.random.PRNGKey(seed)
    state = create_train_state(model, optimizer, batch_dev, rng)
    state = jax.device_put(state, replicated_sharding(mesh))
    train_step = make_train_step(cfg, model, optimizer, mesh=mesh)

    ckpt = CheckpointManager(osp.join(out_dir, "ckpt"),
                             max_to_keep=cfg.SOLVER.MAX_TO_KEEP)
    state, start_iter = ckpt.resume_or_load(state, resume=resume)
    if start_iter == 0:
        # fresh run: MODEL.WEIGHTS full init, else ImageNet backbone init
        # from BACKBONE.PRETRAINED, else loud random-init warning
        # (reference engine.py:198-204 + GDRN.py:713-721)
        from gdrnet_tpu.engine.checkpoint import init_model_weights

        state = jax.device_put(init_model_weights(cfg, state, logger=logger),
                               replicated_sharding(mesh))

    ev = EventLog()
    # file/console writers on the main process only (reference
    # setup_for_distributed silences non-master, my_setup.py:6-20; rank-aware
    # writers my_writer.py) — concurrent metrics.json writers would clobber.
    # ckpt.save stays on ALL ranks: orbax multiprocess save is a collective.
    writers = []
    if mh.is_main_process():
        writers = [ConsoleWriter(total_iters),
                   JsonWriter(osp.join(out_dir, "metrics.json"))]
    tb = None
    if (cfg.TRAIN.VIS_IMG or cfg.VIS_PERIOD) and mh.is_main_process():
        from gdrnet_tpu.engine.writers import TensorboardWriter

        tb = TensorboardWriter(osp.join(out_dir, "tb"))
        if tb.tb is not None:
            writers.append(tb)
    vis_predict = None
    ckpt_every = (cfg.SOLVER.CHECKPOINT_PERIOD * iters_per_epoch
                  if cfg.SOLVER.CHECKPOINT_BY_EPOCH else cfg.SOLVER.CHECKPOINT_PERIOD)
    eval_every = cfg.TEST.EVAL_PERIOD * iters_per_epoch if cfg.TEST.EVAL_PERIOD else 0
    print_every = cfg.TRAIN.PRINT_FREQ

    prof_dir, prof_active = cfg.TRAIN.PROFILE_DIR, False
    batch = batch_dev
    skip_guard = bool(cfg.SOLVER.get("SKIP_NONFINITE", True))
    skip_patience = int(cfg.SOLVER.get("SKIP_NONFINITE_PATIENCE", 5))
    skipped_boundaries = 0  # consecutive print boundaries with a skip
    for it in range(start_iter, total_iters):
        # profiler window: trace a few steady-state iters (TRAIN.PROFILE_*)
        if prof_dir and it == cfg.TRAIN.PROFILE_START and not prof_active:
            jax.profiler.start_trace(prof_dir)
            prof_active = True
        if prof_active and it == cfg.TRAIN.PROFILE_STOP:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            prof_active = False
            logger.info(f"profiler trace written to {prof_dir}")
        if preempted["flag"]:
            if prof_active:
                jax.profiler.stop_trace()
            if refresher is not None:
                refresher.stop()
            ckpt.save(state, it)
            ckpt.wait()
            logger.warning(f"preempted: saved step {it}; resume with --resume")
            for sig, h in prev_handlers.items():
                signal.signal(sig, h)
            return state, models, True
        step_rng = jax.random.fold_in(rng, it)
        t_step = time.perf_counter()
        state, metrics = train_step(state, batch, step_rng)
        # overlap: fetch next batch while the device runs
        if it + 1 < total_iters:
            t0 = time.perf_counter()
            nb = next(loader_iter)
            batch = to_device(nb, it + 1)
            data_time = time.perf_counter() - t0
        if refresher is not None:
            # apply one ready aug-refresh chunk while the device crunches
            refresher.drain(max_chunks=1)
        # Only sync with the device at print boundaries — a per-step host
        # fetch would serialize dispatch/compute (the reference pays this for
        # its per-iter assert, engine.py:271; here the NaN tripwire fires at
        # PRINT_FREQ granularity and pipelining stays intact between prints).
        ev.iter = it
        at_boundary = it % print_every == 0 or it == total_iters - 1
        if at_boundary:
            total = float(metrics["total_loss"])  # forces completion
            step_time = time.perf_counter() - t_step
            if not np.isfinite(total):  # NaN tripwire (engine.py:271)
                if not skip_guard:
                    raise FloatingPointError(
                        f"non-finite loss at iter {it}: {total}")
                # SKIP_NONFINITE reverted this step's update (steps.py); a
                # lone poisoned batch costs one step — only a persistent
                # streak (model or data wedged) should kill the run
                skipped_boundaries += 1
                logger.warning(
                    f"non-finite loss at iter {it} — update skipped "
                    f"({skipped_boundaries}/{skip_patience} boundaries)")
                if skipped_boundaries >= skip_patience:
                    raise FloatingPointError(
                        f"non-finite loss at {skip_patience} consecutive "
                        f"print boundaries (iter {it}) — wedged, aborting")
            else:
                skipped_boundaries = 0
            ev.put(total_loss=total, lr=float(schedule(it // accum)),
                   **{k: float(v) for k, v in metrics.items() if k != "total_loss"})
            ev.put(**{"time/step": step_time, "time/data": data_time})
        if at_boundary:
            for w in writers:
                w.write(ev)
            # tensorboard image panels: input / gt / pred xyz + mask
            # (reference engine.py:300-326 TRAIN.VIS_IMG)
            if cfg.TRAIN.VIS_IMG and tb is not None and tb.tb is not None:
                from gdrnet_tpu.engine.steps import make_predict_step
                from gdrnet_tpu.engine.decode import get_out_coor, get_out_mask

                if vis_predict is None:
                    vis_predict = make_predict_step(model, with_maps=True)
                out = vis_predict(
                    {"params": state.params, "batch_stats": state.batch_stats}
                    if state.batch_stats else {"params": state.params}, batch)
                xyz_pred = np.asarray(get_out_coor(
                    out["coor_x"], out["coor_y"], out["coor_z"],
                    cfg.MODEL.CDPN.ROT_HEAD.XYZ_BIN))[0]
                mask_pred = np.asarray(get_out_mask(
                    out["mask"], cfg.MODEL.CDPN.ROT_HEAD.MASK_LOSS_TYPE))[0]
                img0 = np.asarray(batch["roi_img"][0])
                img0 = (img0 - img0.min()) / max(img0.max() - img0.min(), 1e-6)
                tb.tb.add_image("vis/roi_img", img0, it, dataformats="HWC")
                tb.tb.add_image("vis/xyz_pred", np.clip(xyz_pred, 0, 1), it,
                                dataformats="HWC")
                tb.tb.add_image("vis/xyz_gt", np.clip(np.asarray(batch["gt_xyz"][0]), 0, 1),
                                it, dataformats="HWC")
                tb.tb.add_image("vis/mask_pred", np.clip(mask_pred, 0, 1)[None], it)
                tb.tb.add_image("vis/mask_gt", np.asarray(batch["gt_mask_visib"][0])[None], it)
        if ckpt_every and (it + 1) % ckpt_every == 0:
            ckpt.save(state, it + 1)
        if eval_every and (it + 1) % eval_every == 0 and eval_fn is not None:
            if cfg.TEST.PRECISE_BN.ENABLED and state.batch_stats:
                from gdrnet_tpu.engine.precise_bn import update_bn_stats
                from gdrnet_tpu.engine.steps import _model_kwargs

                def _batches():
                    bn_it = 2 ** 30  # disjoint from train-iteration keys
                    while True:
                        nb = next(loader_iter)
                        bn_it += 1
                        yield to_device(nb, bn_it)

                new_vars = update_bn_stats(
                    model, state.variables(), _batches(),
                    num_iters=cfg.TEST.PRECISE_BN.NUM_ITER,
                    model_kwargs_fn=_model_kwargs)
                state = state.replace(batch_stats=new_vars["batch_stats"])
            eval_fn(cfg, state, models)

    if prof_active:  # window ran past the end of training
        jax.block_until_ready(state.params)
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {prof_dir}")
    if refresher is not None:
        refresher.stop()
        logger.info(f"pool refresh: {refresher.refreshed} samples "
                    "re-augmented during training")
    for sig, h in prev_handlers.items():
        signal.signal(sig, h)
    ckpt.save(state, total_iters)
    ckpt.wait()
    return state, models, False
