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


def probe_device(max_tries: int | None = None, probe_timeout: int = 150,
                 require: bool = False) -> None:
    """Wait until the accelerator answers a tiny matmul before binding this
    process's jax backend. Skipped when jax is pinned to cpu (tests).

    With require=False (default) a dead tunnel pins THIS process to host
    cpu — slow but alive, never wedged on a hung runtime — after a short
    retry window (2 tries). require=True raises SystemExit after a longer
    window (4 tries) — for contract artifacts like bench.py where a fast,
    clearly-labelled failure beats either wedging the calling driver or
    silently benchmarking the host."""
    if _pinned_cpu():
        return  # explicitly pinned to host cpu; nothing to probe
    if max_tries is None:
        max_tries = 4 if require else 2
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
    # Binding the unanswered backend could hang this process forever (the
    # runtime blocks the GIL); pin to host cpu instead so the run stays
    # alive — the documented fallback ("work on CPU and retry later").
    import jax

    jax.config.update("jax_platforms", "cpu")
    print("WARNING: accelerator never answered; pinned this process to "
          "host cpu (re-run when the tunnel recovers)", file=sys.stderr)
