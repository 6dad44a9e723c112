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
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

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
