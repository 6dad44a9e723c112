"""Probe the accelerator in a watchdogged subprocess before binding it.

The TPU tunnel can hang (not error) at backend init or first dispatch; a
hang inside the runtime blocks the GIL, so no in-process timeout can
recover. Probing in a SUBPROCESS with a wall-clock timeout + bounded retries
lets an unattended run ride out a transient tunnel outage instead of
hanging forever. Used by bench.py and the TPU-facing tools/ CLIs.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def _pinned_cpu() -> bool:
    import jax

    plats = jax.config.jax_platforms or ""
    return plats.split(",")[0] == "cpu"


def probe_device(max_tries: int = 4, probe_timeout: int = 150,
                 require: bool = False) -> None:
    """Wait until the accelerator answers a tiny matmul before binding this
    process's jax backend. Skipped when jax is pinned to cpu (tests).

    With require=False (default) a dead tunnel only warns and the caller
    binds whatever backend jax picks (may hang). require=True raises
    SystemExit instead — for contract artifacts like bench.py where a fast,
    clearly-labelled failure beats wedging the calling driver forever."""
    if _pinned_cpu():
        return  # explicitly pinned to host cpu; nothing to probe
    code = (
        # alarm: the child must die on its own even if this parent is
        # SIGTERMed mid-probe (an orphaned hung client can wedge the tunnel
        # for the next run)
        f"import signal; signal.alarm({probe_timeout + 10})\n"
        "import jax, jax.numpy as jnp\n"
        "x = jnp.ones((128, 128))\n"
        "print('PROBE', jax.default_backend(), float((x @ x).sum()))\n"
    )
    for attempt in range(1, max_tries + 1):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=probe_timeout,
                capture_output=True, text=True, env=dict(os.environ))
            if r.returncode == 0 and "PROBE" in r.stdout:
                backend = r.stdout.split("PROBE", 1)[1].split()[0]
                if backend != "cpu":
                    return  # accelerator is up
                reason = "backend fell back to cpu"
            else:
                reason = f"rc={r.returncode} {r.stderr.strip()[-200:]}"
        except subprocess.TimeoutExpired:
            reason = f"hung > {probe_timeout}s"
        print(f"device probe {attempt}/{max_tries} failed ({reason})",
              file=sys.stderr)
        if attempt < max_tries:
            time.sleep(30)
    if require:
        raise SystemExit(
            f"accelerator never answered after {max_tries} probes; refusing "
            "to bind a possibly-hung backend (probe again when the tunnel "
            "recovers)")
    print("WARNING: accelerator never answered; continuing on whatever "
          "backend jax picks (may hang or be slow)", file=sys.stderr)
