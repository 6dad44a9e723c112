"""Real multi-process multihost test: 2 CPU processes under
`jax.distributed.initialize` (tcp://localhost rendezvous) exercise
all_gather_objects / synchronize / reduce_dict_mean and a sharded do_test
whose merged results must equal a single-process run (reference all_gather
of evaluator predictions, gdrn_evaluator.py:439-444 over NCCL).

The in-process pytest run only ever sees world_size == 1 (multihost degrades
to identity), so this spawns real processes. The 1-process baseline also runs
as a subprocess with the same env (the pytest process carries an 8-device
virtual mesh whose XLA fusions differ at the 1e-4 level — enough to move
chaotic random-weight pose errors). A shared persistent compilation cache
keeps the three processes' total compile cost to one.
"""

import json
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", sys.argv[5])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
coord, pid, outdir, fixture_root = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4])
solo = pid < 0
if not solo:
    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=pid)
sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from gdrnet_tpu.parallel import multihost as mh

if solo:
    assert mh.get_world_size() == 1
else:
    assert mh.get_world_size() == 2, mh.get_world_size()
    assert mh.get_rank() == pid
    assert mh.is_main_process() == (pid == 0)

    # pickled-object gather: distinct payloads per rank, rank order kept
    got = mh.all_gather_objects({"rank": pid, "data": [pid] * (pid + 1)})
    assert got == [{"rank": 0, "data": [0]},
                   {"rank": 1, "data": [1, 1]}], got

    mh.synchronize()

    red = mh.reduce_dict_mean({"a": float(pid), "b": 2.0})
    assert abs(red["a"] - 0.5) < 1e-6 and abs(red["b"] - 2.0) < 1e-6, red

# do_test: sharded by rank in distributed mode (evaluator predictions are
# gathered to every process before scoring), plain run in solo mode
from run_tiny_dotest import run_tiny_do_test

results = run_tiny_do_test(fixture_root, outdir=None, save_csv=False)
summary = {k: dict(row) for k, row in results.items()
           if not k.startswith("_")}
name = "base" if solo else f"rank{pid}"
with open(f"{outdir}/{name}.json", "w") as f:
    json.dump(summary, f)
print("WORKER", pid, "OK")
"""


_TRAIN_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", sys.argv[5])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
coord, pid, outdir, fixture_root = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
sys.path.insert(0, ".")
sys.path.insert(0, "tests")
assert jax.process_count() == 2 and len(jax.devices()) == 2

import numpy as np
from run_tiny_dotest import _fixture_meta
from gdrnet_tpu.config import base_config
from gdrnet_tpu.data.bop import load_bop_scene_dicts
from gdrnet_tpu.data.dataset_factory import register
from gdrnet_tpu.engine.trainer import do_train

meta = _fixture_meta(fixture_root)
register("fixture_train",
         lambda: (meta, load_bop_scene_dicts(meta, "test", img_type="real")))

cfg = base_config()
cfg.OUTPUT_DIR = outdir  # SHARED dir: writers must be rank-gated
cfg.SEED = 1  # identical loader streams + init on every host
bb = cfg.MODEL.CDPN.BACKBONE
bb.NUM_LAYERS = 18; bb.INPUT_RES = 32; bb.OUTPUT_RES = 8
cfg.MODEL.CDPN.ROT_HEAD.NUM_CLASSES = 2
cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 4
cfg.DATASETS.TRAIN = ("fixture_train",); cfg.DATASETS.TEST = ()
cfg.DATASETS.SYM_OBJS = ["brick"]
cfg.SOLVER.IMS_PER_BATCH = 4
cfg.SOLVER.OPTIMIZER_CFG = {"type": "Adam", "lr": 1e-3, "weight_decay": 0}
cfg.SOLVER.CHECKPOINT_PERIOD = 10000
cfg.SOLVER.CHECKPOINT_BY_EPOCH = False
cfg.DATALOADER.NUM_WORKERS = 1  # deterministic: identical batches per host
cfg.TRAIN.PRINT_FREQ = 2

state, models, _ = do_train(cfg, max_iters_override=4)
k = np.asarray(state.params["pnp_net"]["fc_r"]["kernel"])
with open(f"{outdir}/train_rank{pid}.json", "w") as f:
    json.dump({"step": int(state.step), "k_sum": float(k.sum()),
               "k_absmax": float(np.abs(k).max())}, f)
print("TRAIN WORKER", pid, "OK")
"""


_POOL_WORKER = r"""
import json, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", sys.argv[5])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
coord, pid, outdir, fixture_root = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
sys.path.insert(0, ".")
sys.path.insert(0, "tests")
assert jax.process_count() == 2 and len(jax.devices()) == 2

import numpy as np
from run_tiny_dotest import _fixture_meta
from gdrnet_tpu.config import base_config
from gdrnet_tpu.data import ObjectModels
from gdrnet_tpu.data.bop import load_bop_scene_dicts
from gdrnet_tpu.data.dataset_factory import register
from gdrnet_tpu.data.mapper import GDRNTrainMapper
from gdrnet_tpu.data.device_pool import DevicePool, PoolRefresher
from gdrnet_tpu.parallel import make_mesh

meta = _fixture_meta(fixture_root)
records = load_bop_scene_dicts(meta, "test", img_type="real")

cfg = base_config()
cfg.SEED = 1
bb = cfg.MODEL.CDPN.BACKBONE
bb.NUM_LAYERS = 18; bb.INPUT_RES = 32; bb.OUTPUT_RES = 8
cfg.MODEL.CDPN.ROT_HEAD.NUM_CLASSES = 2
cfg.MODEL.CDPN.ROT_HEAD.NUM_REGIONS = 4
cfg.MODEL.CDPN.PNP_NET.NUM_PM_POINTS = 64
cfg.DATASETS.SYM_OBJS = ["brick"]

models = ObjectModels(meta, num_pm_points=64, num_fps=4)
mapper = GDRNTrainMapper(cfg, models)
mesh = make_mesh(2)  # 2 global devices, 1 per process

pool = DevicePool(cfg, records, mapper, models, mesh, seed=7,
                  cache_dir=f"{outdir}/pool_cache")
per = pool.per_shard
assert pool.n_refresh_shards == 1  # this process owns exactly one range
start, stop = pool.refresh_range(0)
assert (start, stop) == (pid * per, (pid + 1) * per), (start, stop, pid)

# every process feeds the SAME global index stream; each checks ITS shard
B = 4
idx = np.asarray([0, 1, 0, 2], np.int32)  # blocks: shard0 [0,1], shard1 [0,2]
batch = pool.make_batch(idx)
loc = {k: np.asarray(list(v.addressable_shards)[0].data)
       for k, v in batch.items()}
my_local = idx[pid * (B // 2):(pid + 1) * (B // 2)]
want_cls = []
for j in my_local:
    g = start + int(j)
    want_cls.append(models.label_of(pool.records[g]["label"]))
assert loc["roi_classes"].tolist() == want_cls, (loc["roi_classes"], want_cls)
# decoded image parity for this rank's rows
rng = np.random.RandomState((7 * 1_000_003 + start + int(my_local[0])) % (2**31))
samp = mapper(pool.records[start + int(my_local[0])], rng)
std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
d = np.abs((loc["roi_img"][0] * std + mean) - (samp["roi_img"] * std + mean))
assert d.max() <= 0.5 + 1e-3, d.max()

# refresh this process's own rows and settle the checksums
ref = PoolRefresher(pool, chunk=2, seed=100 + pid)
t0 = time.time()
while ref.refreshed == 0 and time.time() - t0 < 60:
    ref.drain(max_chunks=1)
    ref._settle_pending(force=True)
ref.stop()
assert ref.refreshed > 0 and ref.torn_dropped == 0

# per-rank cache file written
import os
cached = os.listdir(f"{outdir}/pool_cache")
assert any(f.startswith(f"pool_r{pid}_") for f in cached), cached

with open(f"{outdir}/pool_rank{pid}.json", "w") as f:
    json.dump({"refreshed": ref.refreshed, "per_shard": per}, f)
print("POOL WORKER", pid, "OK")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(worker_path, coord, pid, outdir, fixture_root, cache_dir, env,
         timeout=300):
    return subprocess.Popen(
        [sys.executable, worker_path, coord, str(pid), outdir, fixture_root,
         cache_dir],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)


def test_two_process_multihost(tmp_path):
    from fixture_bop import build_fixture_dataset

    fixture_root = str(tmp_path / "fix")
    build_fixture_dataset(fixture_root, n_images=2, seed=31)

    outdir = str(tmp_path / "mh")
    cache_dir = str(tmp_path / "xla_cache")
    os.makedirs(outdir, exist_ok=True)
    worker_path = str(tmp_path / "worker.py")
    with open(worker_path, "w") as f:
        f.write(_WORKER)

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=1"
        # two processes sharing few cores can miss XLA's default 40s
        # collective rendezvous window; that's an F-abort, not an error
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120")

    # 1-process baseline first: populates the compilation cache
    p = _run(worker_path, "none", -1, outdir, fixture_root, cache_dir, env)
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0, f"baseline failed:\n{out[-3000:]}"

    coord = f"localhost:{_free_port()}"
    procs = [_run(worker_path, coord, pid, outdir, fixture_root, cache_dir,
                  env) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-3000:]}"
        assert f"WORKER {pid} OK" in out

    # --- 2-process TRAINING: global 2-device mesh, shared OUTPUT_DIR,
    # rank-gated writers, collective orbax save
    train_out = str(tmp_path / "train_out")
    os.makedirs(train_out, exist_ok=True)
    train_worker = str(tmp_path / "train_worker.py")
    with open(train_worker, "w") as f:
        f.write(_TRAIN_WORKER)
    coord2 = f"localhost:{_free_port()}"
    tprocs = [subprocess.Popen(
        [sys.executable, train_worker, coord2, str(pid), train_out,
         fixture_root, cache_dir],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    touts = []
    for p in tprocs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        touts.append(out)
    for pid, (p, out) in enumerate(zip(tprocs, touts)):
        assert p.returncode == 0, f"train rank {pid} failed:\n{out[-3000:]}"
        assert f"TRAIN WORKER {pid} OK" in out
    r0 = json.load(open(osp.join(train_out, "train_rank0.json")))
    r1 = json.load(open(osp.join(train_out, "train_rank1.json")))
    assert r0["step"] == r1["step"] == 4
    # replicated params identical across hosts after 4 sharded steps
    assert r0["k_sum"] == pytest.approx(r1["k_sum"], abs=1e-6)
    # rank-gated side effects: metrics.json written once (rank 0), final
    # orbax checkpoint exists (collective save)
    assert osp.exists(osp.join(train_out, "metrics.json"))
    assert osp.isdir(osp.join(train_out, "ckpt"))

    with open(osp.join(outdir, "base.json")) as f:
        base_summary = json.load(f)
    # every rank scored the UNION of both shards, identical to 1-process
    for pid in (0, 1):
        with open(osp.join(outdir, f"rank{pid}.json")) as f:
            got = json.load(f)
        assert set(got) == set(base_summary)
        for name, row in base_summary.items():
            for metric, val in row.items():
                g = got[name][metric]
                if isinstance(val, float) and np.isnan(val):
                    assert isinstance(g, float) and np.isnan(g)
                else:
                    assert g == pytest.approx(val, abs=1e-6), (
                        pid, name, metric, g, val)


def test_two_process_pool(tmp_path):
    """DEVICE_RESIDENT_POOL on a 2-process mesh: each host maps/uploads
    only its own rows, gathers checksums globally, serves its shard of the
    batch, and refreshes its own rows (VERDICT r04 #7)."""
    from fixture_bop import build_fixture_dataset

    fixture_root = str(tmp_path / "fix")
    build_fixture_dataset(fixture_root, n_images=4, seed=13)
    outdir = str(tmp_path / "pool")
    cache_dir = str(tmp_path / "xla_cache")
    os.makedirs(outdir, exist_ok=True)
    worker = str(tmp_path / "pool_worker.py")
    with open(worker, "w") as f:
        f.write(_POOL_WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=1"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120")
    coord = f"localhost:{_free_port()}"
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, str(pid), outdir, fixture_root,
         cache_dir],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pool rank {pid} failed:\n{out[-3000:]}"
        assert f"POOL WORKER {pid} OK" in out
    r0 = json.load(open(osp.join(outdir, "pool_rank0.json")))
    r1 = json.load(open(osp.join(outdir, "pool_rank1.json")))
    assert r0["per_shard"] == r1["per_shard"]
    assert r0["refreshed"] > 0 and r1["refreshed"] > 0
