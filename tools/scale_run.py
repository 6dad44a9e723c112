"""Scale dress-rehearsal orchestrator (SCALE_RUN.md's executor).

Drives the full in-environment surrogate of the reference's LM/YCB-V
existence proof (reference: core/gdrn_modeling/engine.py:144-333 feeding
gdrn_evaluator.py:516-631) as a sequence of RESUMABLE stages, each run in a
fresh subprocess so a wedged TPU tunnel (which hangs inside the runtime and
blocks the GIL) can only ever cost one stage attempt, never the run:

  dataset    tools/gen_scale_dataset.py -> datasets/BOP_DATASETS/synth
  insurance  tools/validate_overfit.py --save-ckpt checkpoints/bench_default
  train      engine.train on configs/gdrn/synth/a6_cPnP_synth.py
             (preemption-safe; retried with --resume) + held-out do_test
             with estimated detections and the full BOP error matrix
  eval_int8  --eval-only with TEST.INT8=True   (serving-quality gate)
  eval_dpnp  --eval-only with TEST.DEVICE_PNP=True (device PnP at volume)

Every stage has a done-predicate checked BEFORE running, so re-invoking the
orchestrator after any crash/preemption continues where it left off. Stage
stdout/stderr stream to <out>/scale_run/<stage>.log; a machine-readable
status line per stage goes to <out>/scale_run/status.jsonl.

Usage:  python tools/scale_run.py [--only STAGE[,STAGE..]] [--max-tries N]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import shutil
import subprocess
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
SYNTH = osp.join(REPO, "datasets", "BOP_DATASETS", "synth")
OUT = osp.join(REPO, "output", "gdrn", "synth", "a6_cPnP_synth")
CFG = osp.join(REPO, "configs", "gdrn", "synth", "a6_cPnP_synth.py")
LOGDIR = osp.join(REPO, "output", "gdrn", "synth", "scale_run")
PY = sys.executable


def _probe() -> bool:
    """Subprocess-watchdogged chip probe (tunnel hangs, never errors)."""
    code = ("import signal; signal.alarm(110)\n"
            "import jax, jax.numpy as jnp\n"
            "x = jnp.ones((128,128))\n"
            "print('PROBE', jax.default_backend(), float((x@x).sum()))\n")
    try:
        r = subprocess.run([PY, "-c", code], timeout=100,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return False
    return (r.returncode == 0 and "PROBE" in r.stdout
            and r.stdout.split("PROBE", 1)[1].split()[0] != "cpu")


def _wait_for_chip(max_wait_s: float = 3600.0) -> bool:
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        if _probe():
            return True
        print(f"[scale_run] chip down ({time.time() - t0:.0f}s); retry in 60s",
              flush=True)
        time.sleep(60)
    return False


class Stage:
    def __init__(self, name, argv, done, timeout_s, pre=None,
                 resume_argv=None, on_rc0=None):
        self.name = name
        self.argv = argv
        self.done = done
        self.timeout_s = timeout_s
        self.pre = pre          # callable run before each (re)attempt
        self.resume_argv = resume_argv  # argv for attempts after the first
        self.on_rc0 = on_rc0    # callable after a rc==0 attempt


def _dataset_done():
    return (osp.isfile(osp.join(SYNTH, "meta.json"))
            and osp.isfile(osp.join(SYNTH, "test_bboxes", "est_dets.json")))


def _wipe_partial_dataset():
    # the generator is not mid-run resumable; a partial tree would register
    # as a malformed dataset, so clear it before regenerating
    if osp.isdir(SYNTH) and not _dataset_done():
        print(f"[scale_run] wiping partial dataset at {SYNTH}", flush=True)
        shutil.rmtree(SYNTH)


def _insurance_done():
    d = osp.join(REPO, "checkpoints", "bench_default")
    return osp.isdir(osp.join(d, "ckpt")) and osp.isfile(
        osp.join(d, "config.py"))


def _train_done():
    return osp.isfile(osp.join(LOGDIR, "train.done"))


def _mark_train_if_complete():
    # rc==0 covers both "trained + evaled" and "preempted: resume later";
    # only the former produces the held-out CSV (the eval-only stages write
    # to their own OUTPUT_DIRs), so gate the marker on it
    if osp.isfile(osp.join(OUT, "synth-test_gdrnet-tpu.csv")):
        with open(osp.join(LOGDIR, "train.done"), "w") as fp:
            fp.write(time.ctime() + "\n")


def _eval_done(tag):
    return osp.isfile(osp.join(OUT, f"eval_{tag}",
                               "synth-test_gdrnet-tpu.csv"))


def _marker(tag):
    path = osp.join(LOGDIR, f"{tag}.done")

    def done():
        return osp.isfile(path)

    def touch():
        with open(path, "w") as fp:
            fp.write(time.ctime() + "\n")

    return done, touch


def build_stages():
    train_argv = [PY, "-m", "gdrnet_tpu.engine.train", "--config-file", CFG]
    eval_base = train_argv + ["--eval-only",
                              f"MODEL.WEIGHTS={osp.join(OUT, 'ckpt')}"]
    bench_done, bench_touch = _marker("bench")
    audit_done, audit_touch = _marker("audit")
    loader_done, loader_touch = _marker("loader_bench")
    sweeps = []
    for seed in range(5):
        s_done, s_touch = _marker(f"sweep{seed}")
        sweeps.append(Stage(
            f"sweep{seed}",
            [PY, osp.join(REPO, "tools", "validate_scale.py"),
             "--seed", str(seed)],
            s_done, timeout_s=2400, on_rc0=s_touch))
    return [
        Stage("dataset",
              [PY, osp.join(REPO, "tools", "gen_scale_dataset.py"),
               "--root", SYNTH, "--train-images", "2000",
               "--test-images", "400"],
              _dataset_done, timeout_s=7200, pre=_wipe_partial_dataset),
        Stage("insurance",
              [PY, osp.join(REPO, "tools", "validate_overfit.py"),
               "--save-ckpt", osp.join(REPO, "checkpoints", "bench_default")],
              _insurance_done, timeout_s=1500),
        Stage("train", train_argv, _train_done, timeout_s=7200,
              resume_argv=train_argv + ["--resume"],
              on_rc0=_mark_train_if_complete),
        Stage("eval_int8",
              eval_base + ["TEST.INT8=True",
                           f"OUTPUT_DIR={osp.join(OUT, 'eval_int8')}"],
              lambda: _eval_done("int8"), timeout_s=3600),
        Stage("eval_dpnp",
              eval_base + ["TEST.USE_PNP=True", "TEST.DEVICE_PNP=True",
                           f"OUTPUT_DIR={osp.join(OUT, 'eval_dpnp')}"],
              lambda: _eval_done("dpnp"), timeout_s=3600),
        # bf16 + int8 serving bench on the trained checkpoint (bench.py
        # auto-detects OUT/ckpt); JSON lines land in the stage logs
        Stage("bench",
              ["bash", "-c",
               f"{PY} {osp.join(REPO, 'bench.py')} && "
               f"{PY} {osp.join(REPO, 'bench.py')} --bf16"],
              bench_done, timeout_s=2400, on_rc0=bench_touch),
        # train-step MFU/roofline audit on the bound chip (TPU-lowered
        # cost analysis + timed MFU; docs/performance.md table)
        Stage("audit",
              [PY, osp.join(REPO, "tools", "bench_train.py"),
               "--audit", "--batch-sizes", "128,256"],
              audit_done, timeout_s=1800, on_rc0=audit_touch),
        # sustained input-pipeline comparison on the real data path
        Stage("loader_bench",
              [PY, osp.join(REPO, "tools", "bench_train.py"),
               "--with-loader", "--config-file", CFG,
               "--batch-sizes", "128", "--iters", "30",
               "--pipeline", "host,device-prep,device-aug,pool",
               "--workers", "1,2", "--max-records", "1024"],
              loader_done, timeout_s=5400, on_rc0=loader_touch),
    ] + sweeps


def run_stage(st: Stage, max_tries: int, status_fp) -> bool:
    for attempt in range(1, max_tries + 1):
        if st.done():
            print(f"[scale_run] {st.name}: already done", flush=True)
            return True
        if not _wait_for_chip():
            print(f"[scale_run] {st.name}: chip never answered", flush=True)
            return False
        if st.pre:
            st.pre()
        argv = st.argv if attempt == 1 or not st.resume_argv \
            else st.resume_argv
        log = osp.join(LOGDIR, f"{st.name}.log")
        print(f"[scale_run] {st.name}: attempt {attempt}/{max_tries} "
              f"-> {log}", flush=True)
        t0 = time.time()
        with open(log, "a") as lf:
            lf.write(f"\n===== attempt {attempt} {time.ctime()} =====\n")
            lf.write(" ".join(argv) + "\n")
            lf.flush()
            try:
                rc = subprocess.run(argv, stdout=lf, stderr=subprocess.STDOUT,
                                    timeout=st.timeout_s, cwd=REPO).returncode
            except subprocess.TimeoutExpired:
                rc = -9
                lf.write(f"\n[scale_run] KILLED after {st.timeout_s}s\n")
        if rc == 0 and st.on_rc0:
            st.on_rc0()
        ok = st.done()
        status_fp.write(json.dumps({
            "stage": st.name, "attempt": attempt, "rc": rc, "ok": ok,
            "secs": round(time.time() - t0, 1), "ts": time.time()}) + "\n")
        status_fp.flush()
        print(f"[scale_run] {st.name}: rc={rc} done={ok} "
              f"({time.time() - t0:.0f}s)", flush=True)
        if ok:
            return True
    return st.done()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None,
                   help="comma-separated stage subset")
    p.add_argument("--max-tries", type=int, default=3)
    p.add_argument("--dry-run", action="store_true",
                   help="print each stage's argv + done state, run nothing")
    args = p.parse_args(argv)
    os.makedirs(LOGDIR, exist_ok=True)
    stages = build_stages()
    if args.only:
        keep = set(args.only.split(","))
        unknown = keep - {s.name for s in stages}
        if unknown:
            raise SystemExit(f"unknown stages: {sorted(unknown)}")
        stages = [s for s in stages if s.name in keep]
    if args.dry_run:
        for st in stages:
            print(f"{st.name}: done={st.done()} timeout={st.timeout_s}s")
            print("  " + " ".join(st.argv))
            if st.resume_argv:
                print("  retry: " + " ".join(st.resume_argv))
        return
    with open(osp.join(LOGDIR, "status.jsonl"), "a") as status_fp:
        for st in stages:
            if not run_stage(st, args.max_tries, status_fp):
                raise SystemExit(f"[scale_run] stage {st.name} FAILED")
    print("[scale_run] ALL STAGES DONE", flush=True)


if __name__ == "__main__":
    main()
