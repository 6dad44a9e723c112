"""Object symmetry handling, vectorized over padded symmetry sets.

The reference stores per-object symmetry rotations as a ragged python list
(Kx3x3 or None per instance, engine_utils.py:57-58) and loops over candidates
on CPU (get_closest_rot, core/utils/pose_utils.py:430-482). On TPU ragged
loops don't trace, so symmetry sets are padded to a fixed K with identity
rotations and a validity mask; the closest-rotation search becomes one batched
einsum + argmin that runs inside the jitted loss.

Symmetry-set construction from BOP ``models_info.json`` follows
lib/pysixd/misc.py:206-262 (get_symmetry_transformations).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gdrnet_tpu.ops import rotation as R


# ---------------------------------------------------------------------------
# construction (host, numpy — offline metadata path)
# ---------------------------------------------------------------------------


def _axangle_mat_np(axis: np.ndarray, angle: float) -> np.ndarray:
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    x, y, z = axis
    c, s = np.cos(angle), np.sin(angle)
    C = 1 - c
    return np.array(
        [
            [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
            [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
            [z * x * C - y * s, z * y * C + x * s, z * z * C + c],
        ]
    )


def get_symmetry_transformations(model_info: dict, max_sym_disc_step: float = 0.01) -> list[dict]:
    """BOP models_info entry -> list of {R: 3x3, t: 3x1} symmetry transforms.

    Mirrors lib/pysixd/misc.py:206-262: discrete syms from 4x4 matrices,
    continuous syms discretized to ceil(pi / max_sym_disc_step) steps, then the
    cartesian product of both sets.
    """
    trans_disc = [{"R": np.eye(3), "t": np.zeros((3, 1))}]
    for sym in model_info.get("symmetries_discrete", []):
        m = np.reshape(np.asarray(sym, dtype=np.float64), (4, 4))
        trans_disc.append({"R": m[:3, :3], "t": m[:3, 3].reshape(3, 1)})

    trans_cont = []
    for sym in model_info.get("symmetries_continuous", []):
        axis = np.asarray(sym["axis"], dtype=np.float64)
        offset = np.asarray(sym["offset"], dtype=np.float64).reshape(3, 1)
        n_steps = int(np.ceil(np.pi / max_sym_disc_step))
        step = 2.0 * np.pi / n_steps
        for i in range(1, n_steps):
            rot = _axangle_mat_np(axis, i * step)
            trans_cont.append({"R": rot, "t": -rot @ offset + offset})

    out = []
    for td in trans_disc:
        if trans_cont:
            for tc in trans_cont:
                out.append({"R": tc["R"] @ td["R"], "t": tc["R"] @ td["t"] + tc["t"]})
        else:
            out.append(dict(td))
    return out


def get_symmetry_rotations(model_info: dict, max_sym_disc_step: float = 0.01) -> np.ndarray | None:
    """Kx3x3 rotation-only symmetry set, or None if the object is asymmetric.

    Matches the reference evaluators' sym_info construction
    (gdrn_custom_evaluator.py get_sym_infos pattern): continuous syms are
    discretized much coarser for the PM loss (the reference's datasets use
    max_sym_disc_step=0.01 for eval; training sym_infos come from the same
    models_info).
    """
    if not model_info.get("symmetries_discrete") and not model_info.get("symmetries_continuous"):
        return None
    trans = get_symmetry_transformations(model_info, max_sym_disc_step)
    return np.stack([t["R"] for t in trans]).astype(np.float32)


def pad_symmetry_sets(sym_list: list[np.ndarray | None], max_k: int | None = None
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Ragged per-object [Ki x 3 x 3 | None] -> padded [O, K+1, 3, 3] + bool
    mask [O, K+1].

    Slot 0 is always the identity: the reference's get_closest_rot starts the
    search from the raw GT rotation (pose_utils.py:444-445), so GT itself must
    stay a candidate even when the stored sym set omits identity (BOP
    continuous syms are discretized as range(1, n), misc.py:238). Remaining
    slots hold the object's syms, identity-padded with mask=False."""
    ks = [0 if s is None else s.shape[0] for s in sym_list]
    K = (max_k if max_k is not None else max(ks)) + 1
    O = len(sym_list)
    rots = np.tile(np.eye(3, dtype=np.float32), (O, K, 1, 1))
    mask = np.zeros((O, K), dtype=bool)
    mask[:, 0] = True
    for i, s in enumerate(sym_list):
        if s is not None:
            k = min(s.shape[0], K - 1)
            rots[i, 1:1 + k] = s[:k]
            mask[i, 1:1 + k] = True
    return rots, mask


# ---------------------------------------------------------------------------
# closest-rotation search (device, jnp — runs inside the PM loss)
# ---------------------------------------------------------------------------


def identity_padded_sym_arrays(srots: np.ndarray | None, batch: int
                                ) -> tuple[np.ndarray, np.ndarray]:
    """[K,3,3] discrete sym rotations (or None) -> batched identity-padded
    ([B,K+1,3,3], [B,K+1] bool mask) with the identity in slot 0 — the
    convention every sym-aware batched metric here uses (MSSD/MSPD, the
    custom evaluator's closest-rot search)."""
    if srots is None:
        sym = np.tile(np.eye(3, dtype=np.float32), (batch, 1, 1, 1))
        return sym, np.ones((batch, 1), bool)
    k = srots.shape[0] + 1
    sym = np.tile(np.eye(3, dtype=np.float32), (batch, k, 1, 1))
    sym[:, 1:] = srots[None]
    return sym, np.ones((batch, k), bool)


def get_closest_rot_batch(pred_rots: jnp.ndarray, gt_rots: jnp.ndarray,
                          sym_rots: jnp.ndarray,
                          sym_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-sample closest symmetric GT rotation.

    pred_rots [B, 3, 3] or [B, 4]; gt_rots same; sym_rots [B, K, 3, 3]
    (identity-padded); sym_mask optional [B, K] bool.

    Candidate rotations are gt @ sym_k (m2m syms applied on the right,
    pose_utils.py:448); the winner minimizes the geodesic angle to the
    prediction. One einsum + argmin — no per-sample python loop.
    """
    if pred_rots.shape[-1] == 4:
        pred_rots = R.quat_to_mat(pred_rots)
    if gt_rots.shape[-1] == 4:
        gt_rots = R.quat_to_mat(gt_rots)

    cands = jnp.einsum("bij,bkjl->bkil", gt_rots, sym_rots, precision="highest")  # [B, K, 3, 3]
    # re(pred, cand) minimised <=> trace(pred @ cand^T) maximised
    tr = jnp.einsum("bij,bkij->bk", pred_rots, cands, precision="highest")
    if sym_mask is not None:
        tr = jnp.where(sym_mask, tr, -jnp.inf)
    best = jnp.argmax(tr, axis=-1)
    return jnp.take_along_axis(cands, best[:, None, None, None], axis=1)[:, 0]
