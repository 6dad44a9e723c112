"""Patch-PnP: the learned PnP conv net (flax, NHWC).

Reference ConvPnPNet (core/gdrn_modeling/models/conv_pnp_net.py:41-157):
input = [denormalized xyz coords | optional 2D coord map | optional region
attention | optional mask attention] at 64x64; 3 stride-2 convs (GN) down to
8x8 -> flatten -> fc(1024) -> fc(256) -> fc_r (rot_dim) + fc_t (3), LeakyReLU
0.1 activations, optional DropBlock. The 8x8x128 flatten + two big FCs is one
MXU-friendly matmul chain.

Coordinate denormalization (reference :122): the first 3 input channels are
(coords - 0.5) * extents — mapping the [0,1]-normalized XYZ map back to
object-metric space so the net sees scale.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from gdrnet_tpu.models.layers import ConvNormAct, DropBlock2D


class ConvPnPNet(nn.Module):
    rot_dim: int = 6
    featdim: int = 128
    num_layers: int = 3
    norm: str = "GN"
    num_gn_groups: int = 32
    drop_prob: float = 0.0
    dropblock_size: int = 5
    mask_attention_type: str = "none"  # none | mul | concat
    fc1_dim: int = 1024
    fc2_dim: int = 256
    denormalize_by_extent: bool = True
    freeze: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coor_feat: jnp.ndarray, region: jnp.ndarray | None = None,
                 extents: jnp.ndarray | None = None,
                 mask_attention: jnp.ndarray | None = None,
                 *, train: bool = False,
                 dropblock_progress: float | jnp.ndarray = 1.0):
        """coor_feat [B,64,64,C] (xyz first 3 ch when C in {3,5}), region
        [B,64,64,R] softmax attention, extents [B,3], mask_attention
        [B,64,64,1]. Returns (rot [B,rot_dim], t [B,3])."""
        in_c = coor_feat.shape[-1]
        if self.denormalize_by_extent and in_c in (3, 5):
            assert extents is not None
            xyz = (coor_feat[..., :3] - 0.5) * extents[:, None, None, :]
            coor_feat = jnp.concatenate([xyz, coor_feat[..., 3:]], axis=-1)

        x = coor_feat if region is None else jnp.concatenate([coor_feat, region], axis=-1)

        if self.mask_attention_type == "mul":
            x = x * mask_attention
        elif self.mask_attention_type == "concat":
            x = jnp.concatenate([x, mask_attention], axis=-1)
        elif self.mask_attention_type != "none":
            raise ValueError(f"Wrong mask attention type: {self.mask_attention_type}")

        if self.drop_prob > 0:
            x = DropBlock2D(self.drop_prob, self.dropblock_size)(
                x, train=train, progress=dropblock_progress)

        x = x.astype(self.dtype)
        for i in range(3):
            x = ConvNormAct(self.featdim, 3, 2, self.norm, self.num_gn_groups,
                            dtype=self.dtype, name=f"conv{i}")(x, train=train)
        for i in range(self.num_layers - 3):
            x = ConvNormAct(self.featdim, 3, 1, self.norm, self.num_gn_groups,
                            dtype=self.dtype, name=f"conv_extra{i}")(x, train=train)

        x = x.reshape(x.shape[0], -1)
        act = lambda v: nn.leaky_relu(v, 0.1)
        x = act(nn.Dense(self.fc1_dim, kernel_init=nn.initializers.normal(0.001),
                         dtype=self.dtype, name="fc1")(x))
        x = act(nn.Dense(self.fc2_dim, kernel_init=nn.initializers.normal(0.001),
                         dtype=self.dtype, name="fc2")(x))
        x = x.astype(jnp.float32)
        rot = nn.Dense(self.rot_dim, kernel_init=nn.initializers.normal(0.01), name="fc_r")(x)
        t = nn.Dense(3, kernel_init=nn.initializers.normal(0.01), name="fc_t")(x)
        if self.freeze:
            import jax
            rot, t = jax.lax.stop_gradient((rot, t))
        return rot, t
