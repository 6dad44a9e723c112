"""ResNet backbone (flax, NHWC) — capability match for the reference's
ResNetBackboneNet (core/gdrn_modeling/models/resnet_backbone.py:17-80): a
stride-32 trunk over 256x256 ROI crops emitting the 8x8 high-level feature,
optionally also the 64/32/16 intermediate maps for U-Net-style concat
("rot_concat"), and a freeze mode (stop_gradient).

TPU-first: NHWC + bf16 compute keeps the convs on the MXU; BatchNorm stats
are per-replica (reference semantics under DDP).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# depth -> (block type, stage sizes, stage channel widths)
RESNET_SPEC = {
    18: ("basic", (2, 2, 2, 2), (64, 128, 256, 512)),
    34: ("basic", (3, 4, 6, 3), (64, 128, 256, 512)),
    50: ("bottleneck", (3, 4, 6, 3), (64, 128, 256, 512)),
    101: ("bottleneck", (3, 4, 23, 3), (64, 128, 256, 512)),
    152: ("bottleneck", (3, 8, 36, 3), (64, 128, 256, 512)),
}

# feature channels per stage as seen by downstream heads (reference
# resnet_spec channels list, resnet_backbone.py:8-14)
def stage_channels(depth: int) -> tuple[int, ...]:
    block, _, widths = RESNET_SPEC[depth]
    exp = 4 if block == "bottleneck" else 1
    return tuple(w * exp for w in widths)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4*features
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """x [B, 256, 256, 3] -> 8x8 feature (+ optional 64/32/16 skips)."""

    depth: int = 34
    freeze: bool = False
    rot_concat: bool = False
    remat: bool = False  # rematerialize residual blocks (trade FLOPs for HBM)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        block_name, stages, widths = RESNET_SPEC[self.depth]
        block = BasicBlock if block_name == "basic" else Bottleneck
        if self.remat:
            # train flag is static (arg 2 after self, x)
            block = nn.remat(block, static_argnums=(2,))
        train = train and not self.freeze

        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])  # 64x64

        feats = []
        for si, (n_blocks, width) in enumerate(zip(stages, widths)):
            for bi in range(n_blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = block(width, stride, dtype=self.dtype, name=f"layer{si + 1}_{bi}")(x, train)
            feats.append(x)

        x_f64, x_f32, x_f16, x_high = feats
        if self.freeze:
            x_high, x_f64, x_f32, x_f16 = jax.tree.map(
                jax.lax.stop_gradient, (x_high, x_f64, x_f32, x_f16))
        if self.rot_concat:
            return x_high, x_f64, x_f32, x_f16
        return x_high
