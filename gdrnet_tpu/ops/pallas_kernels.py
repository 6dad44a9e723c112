"""Pallas TPU kernels for hot ops where XLA's default tiling leaves perf on
the table.

`nn_min_dist`: batched nearest-neighbor mean distance (the ADI / ADD-S /
Chamfer core, reference pose_error.adi lib/pysixd/pose_error.py:315 with a
cKDTree per instance). For [B, N, 3] point sets the O(N^2) distance matrix
never leaves VMEM: each grid step loads one query tile + the full reference
set, computes the squared-distance tile via one MXU matmul (|a-b|^2 =
|a|^2 + |b|^2 - 2 a.b) and min-reduces in-register, accumulating the running
sum in SMEM-backed scratch. Falls back to the jnp implementation on
non-TPU backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nn_kernel(q_ref, r_ref, rn2_ref, out_ref, acc_ref):
    """One (batch b, query-tile i) step.

    q_ref  [1, TQ, 8]  query-tile (xyz padded to 8 cols)
    r_ref  [1, NR, 8]  full reference set for this batch element
    rn2_ref [1, 8, NR] |r|^2 broadcast-ready (row 0 valid)
    out_ref [1, 8, 128] per-batch sum broadcast into a VMEM tile (TPU
                        blocks must be (8,128)-tileable; scalar read back
                        as out[:, 0, 0])
    acc_ref [1, 1]      SMEM scratch running sum
    """
    i = pl.program_id(1)
    nq_tiles = pl.num_programs(1)

    q = q_ref[0]                        # [TQ, 8] (leading block dim is 1)
    r = r_ref[0]                        # [NR, 8]
    # cross term on MXU: [TQ, NR]
    cross = jnp.dot(q, r.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    qn2 = jnp.sum(q * q, axis=1, keepdims=True)      # [TQ, 1]
    rn2 = rn2_ref[0, 0:1, :]                         # [1, NR]
    d2 = qn2 + rn2 - 2.0 * cross
    mind = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1, keepdims=True), 0.0))
    tile_sum = jnp.sum(mind)  # [TQ,1] -> scalar (keep 2-D until the reduce)

    @pl.when(i == 0)
    def _():
        acc_ref[0, 0] = 0.0

    acc_ref[0, 0] += tile_sum

    @pl.when(i == nq_tiles - 1)
    def _():
        out_ref[0] = jnp.full((8, 128), acc_ref[0, 0], jnp.float32)


@partial(jax.jit, static_argnames=("tile_q",))
def nn_min_dist_pallas(query: jnp.ndarray, ref: jnp.ndarray,
                       tile_q: int = 512) -> jnp.ndarray:
    """query [B, NQ, 3], ref [B, NR, 3] -> [B] mean_q min_r |q - r|.

    NQ is padded to a tile multiple with +inf-distance handling via repeating
    the first point (padding points only lower nothing: they contribute the
    same min distance as a real duplicate, so the SUM is corrected below).
    """
    B, NQ, _ = query.shape
    NR = ref.shape[1]
    nq_pad = _round_up(NQ, tile_q)
    # pad queries by repeating the first point; subtract their contribution
    pad = nq_pad - NQ
    if pad:
        query = jnp.concatenate(
            [query, jnp.broadcast_to(query[:, :1], (B, pad, 3))], axis=1)
    # pad xyz -> 8 columns (f32 sublane-friendly); zeros don't change dists
    q8 = jnp.concatenate(
        [query, jnp.zeros((B, nq_pad, 5), query.dtype)], axis=-1)
    r8 = jnp.concatenate([ref, jnp.zeros((B, NR, 5), ref.dtype)], axis=-1)
    rn2 = jnp.sum(jnp.square(ref), axis=-1)  # [B, NR]
    rn2_b = jnp.broadcast_to(rn2[:, None, :], (B, 8, NR))

    grid = (B, nq_pad // tile_q)
    sums = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, 8), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NR, 8), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, NR), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
    )(q8.astype(jnp.float32), r8.astype(jnp.float32),
      rn2_b.astype(jnp.float32))
    sums = sums[:, 0, 0]
    if pad:
        # padded queries duplicated query[:, 0]: subtract their min-dists
        d0 = jnp.sqrt(jnp.maximum(jnp.min(jnp.sum(jnp.square(
            query[:, :1] - ref), axis=-1), axis=-1), 0.0))
        sums = sums - pad * d0
    return sums / NQ


def _kernel_ref_shapes_ok(nr: int) -> bool:
    # full reference set must fit VMEM comfortably: NR * 8 * 4B * few bufs
    return nr * 8 * 4 * 4 < 8 * 1024 * 1024


def nn_min_dist(query, ref, tile_q: int = 512):
    """Dispatch: Pallas on TPU when shapes fit, else the jnp matmul path."""
    query = jnp.asarray(query)
    ref = jnp.asarray(ref)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if on_tpu and _kernel_ref_shapes_ok(ref.shape[1]):
        return nn_min_dist_pallas(query, ref, tile_q=min(
            tile_q, _round_up(query.shape[1], 8)))
    # jnp fallback (same math as eval.pose_errors.adi_batch core)
    cross = jnp.einsum("bqd,brd->bqr", query, ref, precision="highest")
    d2 = (jnp.sum(jnp.square(query), -1)[..., None]
          + jnp.sum(jnp.square(ref), -1)[:, None, :] - 2 * cross)
    return jnp.mean(jnp.sqrt(jnp.maximum(jnp.min(d2, -1), 0.0)), axis=-1)
