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


# ---------------------------------------------------------------------------
# triangle rasterization (z-buffer) kernel
# ---------------------------------------------------------------------------


def _raster_kernel(pxy_ref, fd_ref, attr_ref, depth_ref, xyz_ref, best_ref):
    """One (pixel-tile i, face-chunk j) step of the z-buffer.

    pxy_ref  [TP, 8]    pixel coords: col 0 = x, col 1 = y
    fd_ref   [FC, 8]    per-face data: x0 y0 x1 y1 x2 y2, col6 = inv_area
                        (0 for degenerate/behind), col7 unused
    attr_ref [FC, 8]    per-face per-vertex packed: iz0 iz1 iz2,
                        (a0x a0y a0z interleave below) -- see packing in
                        rasterize_xyz_pallas: cols 0..2 inv_z, 3..5 unused
    xyz attr channels ride in a second [FC, 16] block: rows are faces,
    cols 0..8 = attrs_over_z for v0,v1,v2 (x,y,z each)  [packed in attr_ref
    cols 3..11 in reality -- see builder]
    depth_ref [TP, 8]   output depth tile (col 0 valid)
    xyz_ref  [TP, 8]    output xyz tile (cols 0..2 valid)
    best_ref [TP, 8]    VMEM scratch: col 0 best 1/z, cols 1..3 best
                        attr-over-z at the winner
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_ref[...] = jnp.zeros_like(best_ref)

    px = pxy_ref[:, 0:1]                    # [TP, 1]
    py = pxy_ref[:, 1:2]
    x0 = fd_ref[0:1, :]                     # [1, FC] (row reads: lane-major)
    y0 = fd_ref[1:2, :]
    x1 = fd_ref[2:3, :]
    y1 = fd_ref[3:4, :]
    x2 = fd_ref[4:5, :]
    y2 = fd_ref[5:6, :]
    inv_area = fd_ref[6:7, :]

    w0 = ((x1 - px) * (y2 - py) - (y1 - py) * (x2 - px)) * inv_area
    w1 = ((x2 - px) * (y0 - py) - (y2 - py) * (x0 - px)) * inv_area
    w2 = 1.0 - w0 - w1
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (inv_area != 0)

    iz0 = attr_ref[0:1, :]
    iz1 = attr_ref[1:2, :]
    iz2 = attr_ref[2:3, :]
    frag_iz = jnp.where(inside, w0 * iz0 + w1 * iz1 + w2 * iz2, 0.0)  # [TP,FC]

    # chunk winner per pixel + first-max selection mask
    maxv = jnp.max(frag_iz, axis=1, keepdims=True)                    # [TP,1]
    sel = (frag_iz == maxv) & (maxv > 0)
    # first-max tie-break via lane iota (cumsum has no Pallas TPU lowering)
    lane = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 1)
    first_idx = jnp.min(jnp.where(sel, lane, jnp.int32(2 ** 30)),
                        axis=1, keepdims=True)
    sel = sel & (lane == first_idx)

    take = maxv[:, 0] > best_ref[:, 0]                                # [TP]

    def attr_c(c):
        a = (w0 * attr_ref[3 + c:4 + c, :]
             + w1 * attr_ref[6 + c:7 + c, :]
             + w2 * attr_ref[9 + c:10 + c, :])
        return jnp.sum(jnp.where(sel, a, 0.0), axis=1)                # [TP]

    new0 = jnp.where(take, maxv[:, 0], best_ref[:, 0])
    new1 = jnp.where(take, attr_c(0), best_ref[:, 1])
    new2 = jnp.where(take, attr_c(1), best_ref[:, 2])
    new3 = jnp.where(take, attr_c(2), best_ref[:, 3])
    best_ref[:, 0] = new0
    best_ref[:, 1] = new1
    best_ref[:, 2] = new2
    best_ref[:, 3] = new3

    @pl.when(j == nj - 1)
    def _():
        iz = best_ref[:, 0]
        hit = iz > 0
        safe = jnp.maximum(iz, 1e-12)
        depth = jnp.where(hit, 1.0 / safe, 0.0)
        col = jax.lax.broadcasted_iota(jnp.int32, depth_ref.shape, 1)
        depth_ref[...] = jnp.where(col == 0, depth[:, None], 0.0)
        out_x = jnp.zeros_like(xyz_ref)
        for c in range(3):
            a = jnp.where(hit, best_ref[:, 1 + c] / safe, 0.0)
            out_x = out_x + jnp.where(col == c, a[:, None], 0.0)
        xyz_ref[...] = out_x


@partial(jax.jit, static_argnames=("height", "width", "tile_p", "chunk_f"))
def rasterize_xyz_pallas(verts, faces, K, R, t, *, height: int, width: int,
                         origin=None, tile_p: int = 512, chunk_f: int = 1024,
                         z_near: float = 1e-4):
    """Pallas z-buffer XYZ render — same semantics as
    ops.rasterizer.rasterize_attr with attrs = verts (and the same pixel
    convention), but every [pixel-tile, face-chunk] intermediate stays in
    VMEM instead of streaming through HBM per scan step. faces must be
    pre-padded to a multiple of chunk_f (degenerate (0,0,0) rows are culled
    by inv_area=0). Ties at shared edges may pick a different (equal-depth)
    face than the XLA path; depth is identical, attrs equal up to edge ties.
    """
    verts = jnp.asarray(verts, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    F = faces.shape[0]
    assert F % chunk_f == 0, "pad faces to a chunk multiple (_pad_faces)"

    # precision="highest": screen coordinates feeding the kernel must not
    # run at the default bf16 matmul precision (CLAUDE.md invariant)
    cam = jnp.matmul(verts, jnp.asarray(R, jnp.float32).T,
                     precision="highest") + jnp.asarray(t, jnp.float32)
    z = cam[:, 2]
    uvw = jnp.matmul(cam, jnp.asarray(K, jnp.float32).T, precision="highest")
    u = uvw[:, 0] / jnp.maximum(uvw[:, 2], z_near)
    v = uvw[:, 1] / jnp.maximum(uvw[:, 2], z_near)
    inv_z = 1.0 / jnp.maximum(z, z_near)
    attrs_over_z = verts * inv_z[:, None]

    i0, i1, i2 = faces[:, 0], faces[:, 1], faces[:, 2]
    x0, y0, x1, y1, x2, y2 = u[i0], v[i0], u[i1], v[i1], u[i2], v[i2]
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    valid = ((jnp.abs(area) > 1e-12) & (z[i0] > z_near)
             & (z[i1] > z_near) & (z[i2] > z_near))
    inv_area = jnp.where(valid, 1.0 / jnp.where(valid, area, 1.0), 0.0)
    fd = jnp.stack([x0, y0, x1, y1, x2, y2, inv_area,
                    jnp.zeros_like(x0)], axis=0)                     # [8, F]
    fattr = jnp.concatenate([
        inv_z[i0][None], inv_z[i1][None], inv_z[i2][None],
        attrs_over_z[i0].T, attrs_over_z[i1].T, attrs_over_z[i2].T,
        jnp.zeros((4, F), jnp.float32)], axis=0)                     # [16, F]

    P = height * width
    TP = tile_p
    P_pad = _round_up(P, TP)
    yy, xx = jnp.mgrid[0:height, 0:width]
    px = xx.reshape(-1).astype(jnp.float32)
    py = yy.reshape(-1).astype(jnp.float32)
    if origin is not None:
        px = px + origin[0]
        py = py + origin[1]
    pad = P_pad - P
    if pad:
        px = jnp.concatenate([px, jnp.full(pad, -1e9, jnp.float32)])
        py = jnp.concatenate([py, jnp.full(pad, -1e9, jnp.float32)])
    pxy = jnp.stack([px, py], axis=1)
    pxy = jnp.concatenate(
        [pxy, jnp.zeros((P_pad, 6), jnp.float32)], axis=1)           # [P, 8]

    grid = (P_pad // TP, F // chunk_f)
    depth, xyz = pl.pallas_call(
        _raster_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TP, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((8, chunk_f), lambda i, j: (0, j)),
            pl.BlockSpec((16, chunk_f), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((TP, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((TP, 8), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((P_pad, 8), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((TP, 8), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(pxy, fd, fattr)
    depth = depth[:P, 0].reshape(height, width)
    xyz = xyz[:P, :3].reshape(height, width, 3)
    return depth, xyz
