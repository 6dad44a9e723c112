"""Head-output decoding helpers (reference engine_utils.py:92-126
get_out_coor / get_out_mask): binned-CE xyz channels -> continuous [0,1]
coords via argmax bin centers; mask logits -> probability. Channels-last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_out_coor(coor_x: jnp.ndarray, coor_y: jnp.ndarray, coor_z: jnp.ndarray,
                 xyz_bin: int = 64, decode_type: str = "center") -> jnp.ndarray:
    """[B,H,W,1] (L1 mode) or [B,H,W,bin+1] (CE mode, last=bg) per channel ->
    [B,H,W,3] coords in [0,1] (engine_utils.get_out_coor:92-105: argmax over
    all bins, bg-argmax pixels zeroed, then normalized).

    decode_type:
      "center"    (idx+0.5)/bin — unbiased for the floor(x*bin) bin encoding;
                  the right choice for models trained in this repo.
      "reference" idx/(bin-1) — bit-faithful to engine_utils.py:103 so
                  converted reference checkpoints trained in CE mode decode
                  exactly as the reference would (TEST.CE_DECODE_TYPE)."""
    if decode_type not in ("center", "reference"):
        raise ValueError(f"unknown CE decode type: {decode_type}")
    outs = []
    for c in (coor_x, coor_y, coor_z):
        if c.shape[-1] == 1:
            outs.append(c[..., 0])
        else:
            idx = jnp.argmax(c[..., :-1], axis=-1).astype(jnp.float32)
            is_fg = jnp.argmax(c, axis=-1) < c.shape[-1] - 1
            dec = ((idx + 0.5) / xyz_bin if decode_type == "center"
                   else idx / (xyz_bin - 1))
            outs.append(jnp.where(is_fg, dec, 0.0))
    return jnp.stack(outs, axis=-1)


def get_out_mask(mask: jnp.ndarray, mask_loss_type: str = "L1") -> jnp.ndarray:
    """[B,H,W,C] mask head channels -> [B,H,W] probability
    (engine_utils.get_out_mask:108-126)."""
    if mask_loss_type == "CE":
        # hard argmax class like the reference (engine_utils.py:123) — a soft
        # softmax prob would select a different fg set at MASK_THR_TEST != 0.5
        return jnp.argmax(mask, axis=-1).astype(jnp.float32)
    if mask_loss_type == "BCE":
        return jax.nn.sigmoid(mask[..., 0])
    # L1: per-image min-max normalization to [0,1] (engine_utils.py:115-117)
    m = mask[..., 0]
    lo = jnp.min(m, axis=(1, 2), keepdims=True)
    hi = jnp.max(m, axis=(1, 2), keepdims=True)
    return (m - lo) / jnp.maximum(hi - lo, 1e-6)
