"""PointNet-style PnP variants (flax, channels-last).

Reference core/gdrn_modeling/models/point_pnp_net.py:
  * PointPnPNet (:60-206): shared 1x1-conv point MLP over all ROI pixels,
    region-weighted pooling (per-region max/mean/topk/softpool), flatten ->
    FCs -> (rot, t). The torch per-channel SoftPool python loop (:8-26)
    becomes one vectorized top-k gather.
  * SimplePointPnPNet (:208-285): PointNet max-pool baseline (single-stage
    pose, cvlab-epfl) with optional softpool.

1x1 convs over N points are expressed as Dense layers on [..., N, C] — the
same MXU matmuls, no layout shuffling.


PointPnPNet accepts mask_attention but — like the reference forward (point_pnp_net.py:126, parameter unused) — does not apply it; only SimplePointPnPNet implements mul/concat mask attention (:252-258)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def soft_pool(x: jnp.ndarray, n_p: int = 32) -> jnp.ndarray:
    """[B, N, F] -> [B, n_p, F, F] (torch SoftPool, point_pnp_net.py:8-26,
    which builds [B, F, N_p, F]; here batched top-k gather instead of a
    python loop over channels). For each channel f, softmax over channels
    ranks points; the top-n_p points' full feature vectors are gathered."""
    probs = jax.nn.softmax(x, axis=-1)  # softmax over F (torch dim=1 of BFN)
    # top n_p points per channel by prob: [B, F, n_p]
    _, idx = jax.lax.top_k(jnp.swapaxes(probs, -1, -2), n_p)  # [B, F, n_p]
    # gather full feature rows: out[b, k, :, f] = x[b, idx[b, f, k], :]
    gathered = jnp.take_along_axis(
        x[:, None], idx[..., None], axis=2)  # [B, F, n_p, F]
    return jnp.transpose(gathered, (0, 2, 3, 1))  # [B, n_p, F, F]


def topk_pool(x: jnp.ndarray, k: int = 32) -> jnp.ndarray:
    """[B, M, P, F] -> [B, M, k, F]: top-k per feature over the point dim
    (reference topk_pool, conv_pnp_net.py:28-38, channels-last)."""
    xt = jnp.swapaxes(x, -1, -2)  # [B, M, F, P]
    vals, _ = jax.lax.top_k(xt, k)
    return jnp.swapaxes(vals, -1, -2)


class PointPnPNet(nn.Module):
    rot_dim: int = 4
    num_regions: int = 8
    spatial_pooltype: str = "max"  # max | mean | topk | soft
    spatial_topk: int = 1
    region_softpool: bool = False
    region_topk: int = 8
    mask_attention_type: str = "none"
    denormalize_by_extent: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coor_feat: jnp.ndarray, region: jnp.ndarray | None = None,
                 extents: jnp.ndarray | None = None,
                 mask_attention: jnp.ndarray | None = None,
                 *, train: bool = False, dropblock_progress=1.0):
        """coor_feat [B,H,W,C]; region [B,H,W,M] softmax weights."""
        b, h, w, c = coor_feat.shape
        if self.denormalize_by_extent and c in (3, 5):
            xyz = (coor_feat[..., :3] - 0.5) * extents[:, None, None, :]
            coor_feat = jnp.concatenate([xyz, coor_feat[..., 3:]], axis=-1)

        act = lambda v: nn.leaky_relu(v, 0.1)
        x = coor_feat.reshape(b, h * w, -1).astype(self.dtype)
        init = nn.initializers.normal(0.001)
        x = act(nn.Dense(128, kernel_init=init, dtype=self.dtype, name="conv1")(x))
        x = act(nn.Dense(128, kernel_init=init, dtype=self.dtype, name="conv2")(x))
        x = nn.Dense(128, kernel_init=init, dtype=self.dtype, name="conv3")(x)  # [B,N,128]

        # region weighting -> [B, M, N, 128]
        r = region.reshape(b, h * w, self.num_regions)
        x = x[:, None] * jnp.transpose(r, (0, 2, 1))[..., None]

        if self.spatial_pooltype == "max":
            x = jnp.max(x, axis=2)  # [B, M, 128]
        elif self.spatial_pooltype == "mean":
            x = jnp.mean(x, axis=2)
        elif self.spatial_pooltype == "topk":
            x = topk_pool(x, k=self.spatial_topk)  # [B, M, k, 128]
            x = act(nn.Dense(128, kernel_init=init, dtype=self.dtype,
                             name="conv_topk")(x.reshape(b, self.num_regions, -1)))
        elif self.spatial_pooltype == "soft":
            xs = x.reshape(b * self.num_regions, h * w, 128)
            sp = soft_pool(xs, n_p=self.spatial_topk)  # [BM, k, F, F]
            sp = sp.reshape(b, self.num_regions, self.spatial_topk, 128, 128)
            x = jnp.max(sp, axis=(2, 4))  # reduce like the reference's max over dim 3
        else:
            raise ValueError(f"Unknown spatial pool type: {self.spatial_pooltype}")

        if self.region_softpool:
            # x [B, M, 128] -> torch layout [B, 128, M] softpooled to topk
            sp = soft_pool(jnp.swapaxes(x, 1, 2), n_p=self.region_topk)  # [B,k,M?,..]
            sp = nn.Dense(128, kernel_init=init, dtype=self.dtype, name="conv_sp")(
                sp.reshape(b, self.region_topk, -1))
            x = act(sp)

        x = x.reshape(b, -1)
        x = act(nn.Dense(512, kernel_init=init, dtype=self.dtype, name="fc1")(x))
        x = act(nn.Dense(256, kernel_init=init, dtype=self.dtype, name="fc2")(x))
        x = x.astype(jnp.float32)
        rot = nn.Dense(self.rot_dim, kernel_init=nn.initializers.normal(0.01),
                       name="fc_r")(x)
        t = nn.Dense(3, kernel_init=nn.initializers.normal(0.01), name="fc_t")(x)
        return rot, t


class SimplePointPnPNet(nn.Module):
    rot_dim: int = 6
    use_softpool: bool = False
    softpool_topk: int = 32
    mask_attention_type: str = "none"
    denormalize_by_extent: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coor_feat: jnp.ndarray, region: jnp.ndarray | None = None,
                 extents: jnp.ndarray | None = None,
                 mask_attention: jnp.ndarray | None = None,
                 *, train: bool = False, dropblock_progress=1.0):
        b, h, w, c = coor_feat.shape
        if self.denormalize_by_extent and c in (3, 5):
            xyz = (coor_feat[..., :3] - 0.5) * extents[:, None, None, :]
            coor_feat = jnp.concatenate([xyz, coor_feat[..., 3:]], axis=-1)
        feats = coor_feat if region is None else jnp.concatenate(
            [coor_feat, region], axis=-1)
        if self.mask_attention_type == "mul":
            feats = feats * mask_attention
        elif self.mask_attention_type == "concat":
            feats = jnp.concatenate([feats, mask_attention], axis=-1)

        act = lambda v: nn.leaky_relu(v, 0.1)
        init = nn.initializers.normal(0.001)
        x = feats.reshape(b, h * w, -1).astype(self.dtype)
        x = act(nn.Dense(128, kernel_init=init, dtype=self.dtype, name="conv1")(x))
        x = act(nn.Dense(128, kernel_init=init, dtype=self.dtype, name="conv2")(x))
        if self.use_softpool:
            x = nn.Dense(128, kernel_init=init, dtype=self.dtype, name="conv3")(x)
            sp = soft_pool(x, n_p=self.softpool_topk)  # [B, k, F, F]
            x = act(nn.Dense(128, kernel_init=init, dtype=self.dtype, name="conv_sp")(
                sp.reshape(b, self.softpool_topk, -1)))
            x = x.reshape(b, -1)
        else:
            x = nn.Dense(1024, kernel_init=init, dtype=self.dtype, name="conv3")(x)
            x = jnp.max(x, axis=1)  # PointNet global max pool
        x = act(nn.Dense(512, kernel_init=init, dtype=self.dtype, name="fc1")(x))
        x = act(nn.Dense(256, kernel_init=init, dtype=self.dtype, name="fc2")(x))
        pose = nn.Dense(self.rot_dim + 3, kernel_init=nn.initializers.normal(0.01),
                        name="fc_pose")(x.astype(jnp.float32))
        return pose[:, :self.rot_dim], pose[:, self.rot_dim:]
