"""Strip optimizer state from an orbax checkpoint, keeping params + BN stats
(reference tools/remove_optim_from_ckpt.py:18-30 in /root/reference — used to
publish small eval-only checkpoints).

Usage:
  python tools/strip_ckpt.py --ckpt-dir output/exp/ckpt --out output/exp/ckpt_slim
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import orbax.checkpoint as ocp

    src = ocp.CheckpointManager(osp.abspath(args.ckpt_dir))
    step = src.latest_step()
    assert step is not None, f"no checkpoint in {args.ckpt_dir}"
    state = src.restore(step)  # raw pytree restore
    slim = {"step": state["step"], "params": state["params"],
            "batch_stats": state.get("batch_stats", {})}
    dst = ocp.CheckpointManager(
        osp.abspath(args.out),
        options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True))
    dst.save(int(step), args=ocp.args.StandardSave(slim))
    dst.wait_until_finished()
    print(f"saved slim checkpoint (step {step}) to {args.out}")


if __name__ == "__main__":
    main()
