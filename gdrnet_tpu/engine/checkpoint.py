"""Orbax checkpointing with the reference's resume semantics.

Reference: MyCheckpointer + PeriodicCheckpointer (core/utils/my_checkpoint.py
:9-54, engine.py:191-212) — checkpointables are model/optimizer/scheduler/
gradscaler and `resume_or_load` returns the start iteration. Here the whole
GDRNTrainState (params + BN stats + opt state + step) is one pytree; the LR
schedule is a pure function of step and bf16 needs no scaler, so saving the
state is complete. Keeps MAX_TO_KEEP latest checkpoints.
"""

from __future__ import annotations

import os
import os.path as osp

import jax
import numpy as np
import orbax.checkpoint as ocp

from gdrnet_tpu.engine.train_state import GDRNTrainState


def _is_array(x) -> bool:
    return isinstance(x, (jax.Array, np.ndarray))


# Jitted programs reused across saves/restores (stable shapes -> one
# compile): sums of |x| in f32. |x| avoids cancellation so the host and
# device sums agree to ~1e-3 relative even across backends.
@jax.jit
def _leaf_checksums(leaves):
    import jax.numpy as jnp

    return jnp.stack(
        [jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32))) for x in leaves])


@jax.jit
def _total_checksum(leaves):
    import jax.numpy as jnp

    return sum(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32))) for x in leaves)


def _host_checksums(leaves) -> list[float]:
    return [float(np.sum(np.abs(np.asarray(x, np.float64)), dtype=np.float64))
            for x in leaves]


def fenced_host_snapshot(tree):
    """Copy a pytree of device arrays to host numpy, CORRECTLY, even over
    remote-device tunnels whose readiness signals are unreliable.

    Why this exists: the train step donates the state buffers
    (steps.py donate_argnums=0), and orbax's save path trusts
    `block_until_ready` before copying device->host. Over the axon tunnel
    readiness can be reported before execution finishes (the same effect
    forces bench.py to fence with host fetches), so the copy can race the
    donated-buffer reuse of subsequent steps and tear the checkpoint —
    observed in practice as a saved state whose loss is near random init
    while the live state trains on fine. Fetching a data-dependent scalar
    of every leaf forces real completion before the copies start; the host
    snapshot then makes the save independent of live device buffers."""
    dev = [l for l in jax.tree_util.tree_leaves(tree)
           if isinstance(l, jax.Array)]
    if dev:
        float(_total_checksum(dev))  # host fetch = the only reliable fence
    return jax.tree_util.tree_map(
        lambda l: np.asarray(l) if _is_array(l) else l, tree)


class CheckpointManager:
    def __init__(self, ckpt_dir: str, max_to_keep: int = 5):
        self.ckpt_dir = osp.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, state: GDRNTrainState, step: int | None = None) -> None:
        step = int(state.step) if step is None else step
        if jax.process_count() == 1:
            # single-process: snapshot to host first (see fenced_host_snapshot)
            state = fenced_host_snapshot(state)
        # multi-process saves stay on-device: each host owns only its
        # addressable shards and orbax's collective save handles them;
        # multihost pods are locally attached, not tunneled.
        self.mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        self.mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.mgr.latest_step()

    def resume_or_load(self, state: GDRNTrainState, resume: bool = True
                       ) -> tuple[GDRNTrainState, int]:
        """Returns (state, start_iter). With resume=False or no checkpoint,
        start at 0 (reference resume_or_load, my_checkpoint.py + engine.py:204).

        Single-process restores are verified: the checkpoint is read into
        host memory, placed onto devices with the template's shardings, and
        per-leaf |sum| checksums of the device copies are compared against
        the host bytes (the host->device direction rides the same tunnel
        that tore the save direction; a silent upload tear would train on
        subtly-wrong weights)."""
        step = self.latest_step()
        if not resume or step is None:
            return state, 0
        if jax.process_count() > 1:
            restored = self.mgr.restore(
                step, args=ocp.args.StandardRestore(state))
            return restored, int(step)

        leaves, treedef = jax.tree_util.tree_flatten(state)
        arr_idx = [i for i, l in enumerate(leaves) if isinstance(l, jax.Array)]
        host_tmpl = jax.tree_util.tree_unflatten(
            treedef, [np.zeros(l.shape, l.dtype) if isinstance(l, jax.Array)
                      else l for l in leaves])
        restored_host = self.mgr.restore(
            step, args=ocp.args.StandardRestore(host_tmpl))
        rleaves = jax.tree_util.tree_leaves(restored_host)
        assert len(rleaves) == len(leaves), "restored tree shape drifted"
        want = _host_checksums([rleaves[i] for i in arr_idx])

        last_err = None
        for attempt in range(2):
            placed = [jax.device_put(r, l.sharding)
                      if isinstance(l, jax.Array) else r
                      for r, l in zip(rleaves, leaves)]
            got = np.asarray(
                _leaf_checksums([placed[i] for i in arr_idx])).tolist()
            bad = [i for i, (g, w) in enumerate(zip(got, want))
                   if abs(g - w) > 1e-3 * max(abs(w), 1.0) + 1e-3]
            if not bad:
                return jax.tree_util.tree_unflatten(treedef, placed), int(step)
            last_err = (f"restore verify failed (attempt {attempt + 1}): "
                        f"{len(bad)} leaves mismatch, first {bad[:5]}")
        raise RuntimeError(
            f"checkpoint step {step}: host->device upload checksum mismatch "
            f"after retry — {last_err}; the device link is unreliable, "
            f"refusing to train on torn weights")


def load_variables_for_inference(ckpt_dir: str) -> dict:
    """{"params", "batch_stats"} from the newest checkpoint WITHOUT an
    optimizer-state template (inference/serving callers like `bench.py
    --ckpt` have no reason to rebuild the training optimizer)."""
    mgr = ocp.CheckpointManager(osp.abspath(ckpt_dir))
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    tree = mgr.restore(step)
    out = {"params": tree["params"]}
    if tree.get("batch_stats"):
        out["batch_stats"] = tree["batch_stats"]
    return out


def load_variables_any(cfg, path: str) -> dict:
    """{"params"[, "batch_stats"]} from either a reference torch checkpoint
    (.pth/.pt, converted in-memory — reference MyCheckpointer loads .pth,
    core/utils/my_checkpoint.py:26-54) or an orbax checkpoint directory.
    Head-shape kwargs for the converter come from cfg. Shared by bench.py,
    tools/export_model.py and `engine.train --eval-only`."""
    if path.endswith((".pth", ".pt")):
        from gdrnet_tpu.utils.torch_convert import load_torch_checkpoint

        rh = cfg.MODEL.CDPN.ROT_HEAD
        pnp_head_cfg = cfg.MODEL.CDPN.PNP_NET.get("PNP_HEAD_CFG", {})
        params, stats = load_torch_checkpoint(
            path, head_num_layers=rh.NUM_LAYERS, head_norm=rh.NORM,
            pnp_norm=pnp_head_cfg.get("norm", "GN"),
            pnp_num_layers=pnp_head_cfg.get("num_layers", 3))
        return {"params": params, "batch_stats": stats}
    return load_variables_for_inference(path)


def _merge_subtree(dst: dict, src: dict, path: str = "") -> dict:
    """Copy `src` leaves into a copy of `dst`, requiring every src key to
    exist in dst with the same shape (loud failure beats a silently
    random backbone)."""
    import numpy as np

    out = dict(dst)
    for k, v in src.items():
        here = f"{path}/{k}" if path else k
        if k not in out:
            raise KeyError(f"pretrained key {here} not in model tree "
                           f"(have: {sorted(out)})")
        if isinstance(v, dict):
            out[k] = _merge_subtree(out[k], v, here)
        else:
            v = np.asarray(v)
            if tuple(out[k].shape) != tuple(v.shape):
                raise ValueError(f"shape mismatch at {here}: model "
                                 f"{tuple(out[k].shape)} vs pretrained "
                                 f"{tuple(v.shape)}")
            import jax.numpy as jnp

            out[k] = jnp.asarray(v, out[k].dtype)
    return out


def _resolve_pretrained(spec: str) -> str:
    """BACKBONE.PRETRAINED value -> local .pth path. The reference passes
    "torchvision://resnet34" to mmcv which downloads from the zoo
    (GDRN.py:713-721); this environment has zero egress, so torchvision://
    resolves only against the local torch hub cache."""
    if spec.startswith("torchvision://"):
        import glob

        name = spec.split("://", 1)[1]
        root = os.environ.get("TORCH_HOME",
                              osp.expanduser("~/.cache/torch"))
        hits = sorted(glob.glob(osp.join(root, "hub", "checkpoints",
                                         f"{name}*.pth")))
        if not hits:
            raise FileNotFoundError(
                f"{spec}: no cached weights under {root}/hub/checkpoints "
                "(offline environment) — place the torchvision state_dict "
                ".pth locally and set MODEL.CDPN.BACKBONE.PRETRAINED to "
                "its path")
        return hits[0]
    return spec


def init_model_weights(cfg, state: GDRNTrainState, logger=None
                       ) -> GDRNTrainState:
    """Initial weights for a fresh run (start_iter == 0).

    Reference semantics: the checkpointer loads cfg.MODEL.WEIGHTS when set
    (engine.py:198-204); when MODEL.WEIGHTS=="" the backbone alone gets
    official ImageNet weights from BACKBONE.PRETRAINED (GDRN.py:713-721),
    else "Randomly initialize weights for backbone!" (:717).
    """
    weights = cfg.MODEL.WEIGHTS
    if weights:
        v = load_variables_any(cfg, weights)
        state = state.replace(params=v["params"],
                              batch_stats=v.get("batch_stats",
                                                state.batch_stats))
        if logger:
            logger.info(f"loaded initial model weights from {weights}")
        return state
    pretrained = cfg.MODEL.CDPN.BACKBONE.get("PRETRAINED", "")
    if pretrained:
        from gdrnet_tpu.utils.torch_convert import load_torchvision_resnet

        path = _resolve_pretrained(pretrained)
        bb_params, bb_stats = load_torchvision_resnet(path)

        # full-coverage check: a depth mismatch (e.g. resnet18 weights into
        # a resnet34 tree) merges cleanly key-by-key but leaves whole blocks
        # random — the silent-partial-init failure mode. Require the
        # pretrained tree to cover every backbone leaf.
        def _leaves(tree, prefix=""):
            for k, v in tree.items():
                p = f"{prefix}/{k}" if prefix else k
                if isinstance(v, dict):
                    yield from _leaves(v, p)
                else:
                    yield p

        have = set(_leaves(bb_params["backbone"]))
        need = set(_leaves(state.params["backbone"]))
        if need - have:
            raise KeyError(
                f"pretrained backbone {path} does not cover the model's "
                f"backbone (missing {sorted(need - have)[:5]}... "
                f"{len(need - have)} leaves) — depth mismatch?")
        params = _merge_subtree(state.params, bb_params)
        stats = state.batch_stats
        if stats:
            stats = _merge_subtree(stats, bb_stats)
        state = state.replace(params=params, batch_stats=stats)
        if logger:
            logger.info(f"initialized backbone from ImageNet weights "
                        f"{path} (BACKBONE.PRETRAINED)")
        return state
    if logger:
        logger.warning("Randomly initialize weights for backbone!")
    return state
