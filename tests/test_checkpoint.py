"""Checkpoint save/restore integrity under buffer donation and unreliable
device links.

Why this exists: the train step donates the state buffers
(engine/steps.py donate_argnums=0) and orbax's save path trusts device
readiness signals before its device->host copy. Over the remote-device
tunnel this tore checkpoints in practice (saved state near random-init loss
while the live run trained on fine — found by the SCALE_RUN dress
rehearsal). The fix (engine/checkpoint.py): fence with a host fetch of a
data-dependent scalar, snapshot to host numpy before handing orbax anything,
and checksum-verify the host->device upload on restore. Reference analogue:
MyCheckpointer save/resume (core/utils/my_checkpoint.py) — torch is
synchronous so the reference never faced this.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gdrnet_tpu.engine.checkpoint import (CheckpointManager,
                                          fenced_host_snapshot)
from gdrnet_tpu.engine.train_state import GDRNTrainState


def _tiny_state(seed: int = 0) -> tuple[GDRNTrainState, optax.GradientTransformation]:
    k = jax.random.PRNGKey(seed)
    params = {"w": jax.random.normal(k, (8, 8), jnp.float32),
              "b": jnp.zeros((8,), jnp.bfloat16)}
    opt = optax.adam(1e-2)
    return GDRNTrainState(step=jnp.zeros([], jnp.int32), params=params,
                          batch_stats={"m": jnp.ones((8,), jnp.float32)},
                          opt_state=opt.init(params)), opt


def _donating_step(opt):
    @jax.jit
    def step(state, x):
        def loss(p):
            return jnp.sum((x @ p["w"] + p["b"].astype(jnp.float32)) ** 2)

        g = jax.grad(loss)(state.params)
        upd, new_opt = opt.update(g, state.opt_state, state.params)
        return state.replace(step=state.step + 1,
                             params=optax.apply_updates(state.params, upd),
                             opt_state=new_opt)

    return jax.jit(step, donate_argnums=0)


def test_save_is_a_point_in_time_snapshot(tmp_path):
    """mgr.save(state) must capture state AS OF THE CALL even though the
    very next train step donates (and overwrites) those buffers."""
    state, opt = _tiny_state()
    step_fn = _donating_step(opt)
    x = jnp.ones((4, 8), jnp.float32)

    for _ in range(3):
        state = step_fn(state, x)
    expected = jax.tree_util.tree_map(np.asarray, state)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, 3)
    # keep training: donation reuses the saved state's buffers immediately
    for _ in range(5):
        state = step_fn(state, x)
    mgr.wait()

    fresh, _ = _tiny_state()
    restored, start = mgr.resume_or_load(fresh, resume=True)
    assert start == 3
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        expected, restored)


def test_fenced_host_snapshot_values_and_types():
    state, opt = _tiny_state()
    step_fn = _donating_step(opt)
    state = step_fn(state, jnp.ones((4, 8), jnp.float32))
    snap = fenced_host_snapshot(state)
    for leaf in jax.tree_util.tree_leaves(snap):
        assert isinstance(leaf, np.ndarray)
    np.testing.assert_array_equal(snap.params["w"], np.asarray(state.params["w"]))
    assert snap.params["b"].dtype == np.asarray(state.params["b"]).dtype


def test_restore_verify_catches_upload_tear(tmp_path, monkeypatch):
    """Corrupt the host->device placement and check the checksum verify
    refuses to hand back torn weights (and that an intermittent tear is
    healed by the retry)."""
    state, opt = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, 7)
    mgr.wait()

    real_put = jax.device_put
    calls = {"n": 0}

    def torn_put(x, sharding=None):
        out = real_put(x, sharding)
        if getattr(x, "shape", None) == (8, 8):
            calls["n"] += 1
            return real_put(np.zeros_like(np.asarray(x)), sharding)
        return out

    fresh, _ = _tiny_state(seed=1)
    monkeypatch.setattr(jax, "device_put", torn_put)
    with pytest.raises(RuntimeError, match="checksum mismatch"):
        mgr.resume_or_load(fresh, resume=True)
    assert calls["n"] >= 2  # retried before giving up

    # intermittent tear: first placement torn, retry clean -> succeeds
    calls["n"] = 0

    def flaky_put(x, sharding=None):
        if getattr(x, "shape", None) == (8, 8) and calls["n"] == 0:
            calls["n"] += 1
            return real_put(np.zeros_like(np.asarray(x)), sharding)
        return real_put(x, sharding)

    monkeypatch.setattr(jax, "device_put", flaky_put)
    restored, start = mgr.resume_or_load(fresh, resume=True)
    assert start == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(state.params["w"]))


def test_eval_load_is_optimizer_tree_agnostic(tmp_path):
    """Eval-only restore must not depend on rebuilding the exact optimizer
    the checkpoint was trained with. Regression: the flagship run trains
    with a schedule-built Ranger (ScaleBySchedule state) while the eval CLI
    rebuilt a constant-lr template (EmptyState) -> orbax tree mismatch.
    load_variables_for_inference restores params/batch_stats with no
    opt_state template at all."""
    from gdrnet_tpu.engine.checkpoint import load_variables_for_inference

    k = jax.random.PRNGKey(3)
    params = {"w": jax.random.normal(k, (8, 8), jnp.float32)}
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.scale_by_adam(),
                      optax.scale_by_schedule(lambda c: -1e-3 / (1.0 + c)))
    state = GDRNTrainState(step=jnp.zeros([], jnp.int32), params=params,
                           batch_stats={"m": jnp.ones((8,), jnp.float32)},
                           opt_state=opt.init(params))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, 5)
    mgr.wait()

    v = load_variables_for_inference(str(tmp_path / "ckpt"))
    np.testing.assert_array_equal(np.asarray(v["params"]["w"]),
                                  np.asarray(params["w"]))
    np.testing.assert_array_equal(np.asarray(v["batch_stats"]["m"]),
                                  np.ones((8,), np.float32))
