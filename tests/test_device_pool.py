"""HBM-resident training pool (data/device_pool.py): compact-encode
round-trip parity against the host mapper batch, sharded gather over the
8-device mesh, background refresh semantics, and a pool-mode train smoke
through engine/trainer.do_train."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdrnet_tpu.config import base_config
from gdrnet_tpu.data import ObjectModels
from gdrnet_tpu.data.bop import load_bop_scene_dicts
from gdrnet_tpu.data.mapper import GDRNTrainMapper, collate
from gdrnet_tpu.data.device_pool import (DevicePool, PoolRefresher,
                                         pool_index_sampler)
from gdrnet_tpu.parallel import make_mesh

from fixture_bop import build_fixture_dataset


def _cfg():
    cfg = base_config()
    bb = cfg.MODEL.CDPN.BACKBONE
    bb.NUM_LAYERS = 18
    bb.INPUT_RES = 64
    bb.OUTPUT_RES = 16
    cfg.MODEL.CDPN.ROT_HEAD.NUM_CLASSES = 2
    cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 4
    cfg.MODEL.CDPN.PNP_NET.NUM_PM_POINTS = 64
    return cfg


@pytest.fixture(scope="module")
def pool_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop_pool")
    meta = build_fixture_dataset(str(root), n_images=8, seed=21)
    records = load_bop_scene_dicts(meta, "test", img_type="real")
    cfg = _cfg()
    models = ObjectModels(meta, num_pm_points=64, num_fps=4)
    mapper = GDRNTrainMapper(cfg, models)
    return cfg, meta, records, models, mapper


SEED = 7


def _host_rows(pool, mapper, slots, seed=SEED):
    """Re-map the given slots exactly like DevicePool.map_row."""
    out = []
    for s in slots:
        rng = np.random.RandomState((seed * 1_000_003 + int(s)) % (2 ** 31))
        samp = mapper(pool.records[s], rng)
        out.append(samp)
    return collate(out)


def test_pool_batch_matches_mapper(pool_env):
    cfg, meta, records, models, mapper = pool_env
    mesh = make_mesh(1)
    pool = DevicePool(cfg, records, mapper, models, mesh, seed=SEED)
    B = 8
    slots = np.arange(B, dtype=np.int32)
    got = jax.device_get(pool.make_batch(slots))
    want = _host_rows(pool, mapper, slots)

    # image round-trips through uint8 in DE-normalized space: <= 0.5 LSB
    std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
    mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
    d_img = np.abs((got["roi_img"] * std + mean)
                   - (want["roi_img"] * std + mean))
    assert d_img.max() <= 0.5 + 1e-3, d_img.max()
    # xyz through f16 of the extent-normalized range
    assert np.abs(got["gt_xyz"] - want["gt_xyz"]).max() < 5e-4
    # masks / region / classes exact
    for k in ("gt_mask_trunc", "gt_mask_visib", "gt_mask_obj", "gt_region",
              "roi_classes"):
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    # geometry scalars exact (stored f32) / coord map recomputed (f32 close)
    for k in ("roi_cams", "roi_centers", "roi_whs", "roi_extents",
              "resize_ratios", "gt_ego_rot", "gt_trans", "gt_trans_ratio"):
        np.testing.assert_allclose(got[k], want[k], rtol=0, atol=1e-5,
                                   err_msg=k)
    np.testing.assert_allclose(got["roi_coord_2d"], want["roi_coord_2d"],
                               atol=1e-5)
    # per-class constants re-derived from the stacks
    for k in ("gt_points", "sym_rots", "sym_mask"):
        np.testing.assert_allclose(got[k], want[k], atol=0, err_msg=k)
    # xyz bins recomputed from f16 xyz: only boundary flips allowed
    bins_ok = got["gt_xyz_bin"] == want["gt_xyz_bin"]
    assert bins_ok.mean() > 0.999, 1 - bins_ok.mean()


def test_pool_sharded_gather_matches(pool_env):
    cfg, meta, records, models, mapper = pool_env
    n_dev = min(8, len(jax.devices()))
    mesh = make_mesh(n_dev)
    pool = DevicePool(cfg, records, mapper, models, mesh, seed=SEED)
    B = 2 * n_dev
    # 2 local slots per shard (per_shard = 16 // n_dev)
    local = np.concatenate(
        [np.arange(2, dtype=np.int32) % pool.per_shard for _ in range(n_dev)])
    got = jax.device_get(pool.make_batch(local))
    # shard d block k corresponds to global slot d*per + local
    slots = np.concatenate([d * pool.per_shard + local[d * 2:(d + 1) * 2]
                            for d in range(n_dev)])
    want = _host_rows(pool, mapper, slots)
    std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
    mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
    assert np.abs((got["roi_img"] * std + mean)
                  - (want["roi_img"] * std + mean)).max() <= 0.5 + 1e-3
    np.testing.assert_array_equal(got["roi_classes"], want["roi_classes"])
    np.testing.assert_allclose(got["gt_trans"], want["gt_trans"], atol=1e-6)


def test_pool_refresh_updates_slots(pool_env):
    cfg, meta, records, models, mapper = pool_env
    mesh = make_mesh(1)
    pool = DevicePool(cfg, records, mapper, models, mesh, seed=SEED)
    before = np.asarray(pool.pool["img_u8"])
    # refresh slots {1, 3} with a different seed => different DZI crops
    rows = [pool.map_row(s, seed=SEED + 5) for s in (1, 3)]
    stacked = {k: np.stack([r[k] for r in rows]) for k in rows[0]}
    pool.apply_refresh(0, np.asarray([1, 3], np.int32), stacked)
    after = np.asarray(pool.pool["img_u8"])
    np.testing.assert_array_equal(stacked["img_u8"], after[[1, 3]])
    keep = [i for i in range(after.shape[0]) if i not in (1, 3)]
    np.testing.assert_array_equal(before[keep], after[keep])
    # background refresher thread end-to-end
    ref = PoolRefresher(pool, chunk=2, seed=3)
    import time

    for _ in range(100):
        ref.drain()
        if ref.refreshed >= 2:
            break
        time.sleep(0.1)
    ref.stop()
    assert ref.refreshed >= 2


def test_pool_refresh_heals_torn_upload(pool_env):
    """A refresh chunk whose device bytes mismatch the host checksum
    (torn upload over an unreliable link) is re-applied; a twice-torn chunk
    is dropped with the old slot content intact."""
    cfg, meta, records, models, mapper = pool_env
    pool = DevicePool(cfg, records, mapper, models, make_mesh(1), seed=SEED)
    ref = PoolRefresher(pool, chunk=2, seed=3)
    ref.stop()  # drive the apply/settle machinery directly, no thread

    rows = [pool.map_row(s, seed=SEED + 9) for s in (1, 3)]
    stacked = {k: np.stack([r[k] for r in rows]) for k in rows[0]}

    real_scatter = pool._scatter_local
    tears = {"n": 0}

    def torn_scatter(block, idx_l, dev_rows):
        if tears["n"] > 0:
            tears["n"] -= 1
            dev_rows = dict(dev_rows)
            dev_rows["xyz_f16"] = jnp.zeros_like(dev_rows["xyz_f16"])
        return real_scatter(block, idx_l, dev_rows)

    pool._scatter_local = torn_scatter

    # tear once -> settle detects, re-applies clean -> healed
    tears["n"] = 1
    ref._apply(0, np.asarray([1, 3], np.int32), stacked, attempt=0)
    ref._settle_pending(force=True)   # detects the tear, re-applies
    ref._settle_pending(force=True)   # verifies the clean re-apply
    assert ref.torn_healed == 1 and ref.torn_dropped == 0
    assert ref.refreshed == 2
    np.testing.assert_array_equal(
        np.asarray(pool.pool["xyz_f16"])[[1, 3]], stacked["xyz_f16"])

    # tear persistently -> dropped after the retry, accounted
    tears["n"] = 2
    ref._apply(0, np.asarray([1, 3], np.int32), stacked, attempt=0)
    ref._settle_pending(force=True)
    ref._settle_pending(force=True)
    assert ref.torn_dropped == 1 and ref.torn_healed == 2  # retried, then gave up
    assert ref.refreshed == 2  # dropped chunk not counted as refreshed


def test_pool_sampler_covers_all_shards(pool_env):
    cfg, meta, records, models, mapper = pool_env
    n_dev = min(8, len(jax.devices()))
    mesh = make_mesh(n_dev)
    pool = DevicePool(cfg, records, mapper, models, mesh, seed=SEED)
    stream = pool_index_sampler(pool, batch_size=2 * n_dev, seed=0)
    seen = set()
    for _ in range(pool.per_shard):
        idx = next(stream)
        assert idx.shape == (2 * n_dev,)
        assert (idx >= 0).all() and (idx < pool.per_shard).all()
        seen.update(idx.tolist())
    assert seen == set(range(pool.per_shard))  # every local slot sampled


def test_pool_mode_training_smoke(pool_env, tmp_path):
    """do_train with TRAIN.DEVICE_RESIDENT_POOL: loss finite and decreasing
    over a short run; refresher active."""
    import json
    import os.path as osp

    from gdrnet_tpu.data.dataset_factory import register
    from gdrnet_tpu.engine.trainer import do_train

    cfg, meta, records, models, mapper = pool_env

    register("poolfix_train", lambda: (meta, records))
    cfg = _cfg()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    pnp = cfg.MODEL.CDPN.PNP_NET
    pnp.WITH_2D_COORD = True
    pnp.REGION_ATTENTION = True
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.OPTIMIZER_CFG = {"type": "Adam", "lr": 1e-3, "weight_decay": 0}
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.ANNEAL_POINT = 1.0
    cfg.SOLVER.CHECKPOINT_PERIOD = 1000
    cfg.SOLVER.CHECKPOINT_BY_EPOCH = False
    cfg.DATASETS.TRAIN = ("poolfix_train",)
    cfg.DATASETS.SYM_OBJS = ["brick"]
    cfg.TRAIN.PRINT_FREQ = 5
    cfg.TRAIN.DEVICE_RESIDENT_POOL = True
    cfg.TRAIN.POOL_REFRESH = True
    cfg.TRAIN.POOL_REFRESH_CHUNK = 2

    do_train(cfg, max_iters_override=16)
    with open(osp.join(cfg.OUTPUT_DIR, "metrics.json")) as f:
        hist = [json.loads(l) for l in f if l.strip()]
    losses = [h["total_loss"] for h in hist if "total_loss" in h]
    assert len(losses) >= 3
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_pool_cache_roundtrip(pool_env, tmp_path):
    """POOL_CACHE disk path: second build loads the npz instead of mapping;
    a different seed still hits (seed excluded from the key by design); a
    changed INPUT config misses; a truncated npz falls back to remapping."""
    cfg, meta, records, models, mapper = pool_env
    mesh = make_mesh(1)
    cache = str(tmp_path / "pool_cache")

    calls = {"n": 0}
    orig = mapper.__class__.__call__

    class CountingMapper:
        def __init__(self, m):
            self._m = m
            self.frame_cache_max = 0
            self._frame_cache = {}

        def __call__(self, rec, rng):
            calls["n"] += 1
            return orig(self._m, rec, rng)

    cm = CountingMapper(mapper)
    pool1 = DevicePool(cfg, records, cm, models, mesh, seed=SEED,
                       cache_dir=cache)
    n_map = calls["n"]
    assert n_map == len(pool1.records)
    import os

    files = [f for f in os.listdir(cache) if f.endswith(".npz")]
    assert len(files) == 1

    # cache hit: no mapper calls, identical resident bytes, even with a
    # different seed (refresh re-augments; key deliberately seed-free)
    pool2 = DevicePool(cfg, records, cm, models, mesh, seed=SEED + 999,
                       cache_dir=cache)
    assert calls["n"] == n_map
    for k in pool1.pool:
        np.testing.assert_array_equal(np.asarray(pool1.pool[k]),
                                      np.asarray(pool2.pool[k]), err_msg=k)

    # a mapper-relevant config change must MISS (stale-cache guard) and
    # prune the old file
    cfg2 = _cfg()
    cfg2.INPUT.DZI_PAD_SCALE = cfg.INPUT.DZI_PAD_SCALE * 1.01
    DevicePool(cfg2, records, cm, models, mesh, seed=SEED, cache_dir=cache)
    assert calls["n"] == 2 * n_map
    files = [f for f in os.listdir(cache) if f.endswith(".npz")]
    assert len(files) == 1  # old pool pruned on write

    # corrupt cache: truncate -> loud fallback to remapping
    import os.path as osp

    path = osp.join(cache, files[0])
    with open(path, "r+b") as fp:
        fp.truncate(1024)
    DevicePool(cfg2, records, cm, models, mesh, seed=SEED, cache_dir=cache)
    assert calls["n"] == 3 * n_map


def test_pool_train2_mixing(pool_env, tmp_path_factory):
    """DATASETS.TRAIN2 on the pool path (reference hot-loop mixing,
    engine.py:157-165,232-235): each shard holds a proportional split of
    both datasets, the sampler mixes at TRAIN2_RATIO (measured), and a
    TRAIN2 slot decodes to the host mapper's sample."""
    cfg, meta, records, models, mapper = pool_env
    root2 = tmp_path_factory.mktemp("bop_pool2")
    meta2 = build_fixture_dataset(str(root2), n_images=8, seed=77)
    records2 = load_bop_scene_dicts(meta2, "test", img_type="real")

    n_dev = min(8, len(jax.devices()))
    mesh = make_mesh(n_dev)
    pool = DevicePool(cfg, records, mapper, models, mesh, seed=SEED,
                      records2=records2)
    per1 = pool.per_shard_ds1
    per2 = pool.per_shard - per1
    assert per1 == len(records) // n_dev and per2 == len(records2) // n_dev
    # shard-local layout: slots [0, per1) are TRAIN, [per1, per) TRAIN2
    for d in range(n_dev):
        blk = pool.records[d * pool.per_shard:(d + 1) * pool.per_shard]
        assert [r["rgb_path"] for r in blk[:per1]] \
            == [r["rgb_path"] for r in records[d * per1:(d + 1) * per1]]
        assert [r["rgb_path"] for r in blk[per1:]] \
            == [r["rgb_path"] for r in records2[d * per2:(d + 1) * per2]]

    ratio2 = 0.25
    stream = pool_index_sampler(pool, batch_size=4 * n_dev, seed=3,
                                ratio2=ratio2)
    draws = np.concatenate([next(stream) for _ in range(250)])
    frac2 = float((draws >= per1).mean())
    assert abs(frac2 - ratio2) < 0.03, frac2  # ~1000 draws, 3 sigma ~ 0.04

    # a TRAIN2 slot decodes to the host mapper sample (same envelope as
    # test_pool_batch_matches_mapper)
    slots = np.asarray([per1 + (s % max(per2, 1)) for s in range(4 * n_dev)],
                       np.int32)
    got = jax.device_get(pool.make_batch(slots))
    want = _host_rows(pool, mapper,
                      [d * pool.per_shard + int(s)
                       for d, s in zip(np.repeat(np.arange(n_dev), 4), slots)])
    std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
    mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
    d_img = np.abs((got["roi_img"] * std + mean)
                   - (want["roi_img"] * std + mean))
    assert d_img.max() <= 0.5 + 1e-3
    np.testing.assert_array_equal(got["gt_region"], want["gt_region"])
    np.testing.assert_array_equal(got["roi_classes"], want["roi_classes"])
