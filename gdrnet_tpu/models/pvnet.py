"""PVNet-style alternative dense net: dilated 8-stride ResNet trunk + skip
decoder emitting confidence + coordinate maps at input resolution.

Parity target: the reference's vendored pvnet_net (core/gdrn_modeling/models/
pvnet_net/model_repository.py:7-95 Resnet18_8s, :221 Resnet34_8s, :97
Resnet50_8s; dilated trunk core/gdrn_modeling/models/pvnet_net/resnet.py:
17-45,121-207 with fully_conv/output_stride=8). Re-designed NHWC/flax:
output stride 8 comes from dilation-2/4 in stages 3/4 (stride 1), the
decoder upsamples with bilinear `jax.image.resize` + skip concats at
strides 8/4/2/1, and the head splits channels by (conf_mode, coor_mode)
exactly as model_repository.py:74-95 — "cls" coords are NUM_BINS+1-way
per axis, "reg" a single channel.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from gdrnet_tpu.models.resnet import RESNET_SPEC


class _DilatedBasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dilation
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=[(d, d), (d, d)], kernel_dilation=(d, d),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(d, d), (d, d)],
                    kernel_dilation=(d, d), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="downsample")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


def _conv_bn_act(x, features, name, train, dtype, kernel=3, neg_slope=0.1):
    p = kernel // 2
    x = nn.Conv(features, (kernel, kernel), padding=[(p, p), (p, p)],
                use_bias=False, dtype=dtype, name=f"{name}_conv")(x)
    x = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                     name=f"{name}_bn")(x)
    return nn.leaky_relu(x, neg_slope) if neg_slope else nn.relu(x)


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(
        x.astype(jnp.float32), (b, 2 * h, 2 * w, c), "bilinear").astype(x.dtype)


class PVNet(nn.Module):
    """NHWC input [B, H, W, 3] -> (conf, coor_x, coor_y, coor_z) at [B, H, W, .].

    ver_dim/seg_dim follow the reference ctor; conf_mode/coor_mode in
    {"cls", "reg"} select the channel split (model_repository.py:74-95).
    """

    depth: int = 18
    conf_mode: str = "cls"
    coor_mode: str = "cls"
    num_bins: int = 65
    fcdim: int = 256
    s8dim: int = 128
    s4dim: int = 64
    s2dim: int = 32
    raw_dim: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.depth not in (18, 34):
            raise ValueError("PVNet trunk supports depth 18/34 (basic blocks)")
        blocks = RESNET_SPEC[self.depth][1]
        raw = x.astype(self.dtype)

        # stem: /2 conv + /2 maxpool (resnet.py:209-216)
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(raw)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(x)
        x = nn.relu(x)
        x2s = x  # stride 2 skip
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        # stages: (stride, dilation) = (1,1), (2,1), (1,2), (1,4) -> stride 8
        plan = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
        skips = []
        for si, (width, stride, dil) in enumerate(plan):
            for bi in range(blocks[si]):
                x = _DilatedBasicBlock(
                    width, stride if bi == 0 else 1, dil, dtype=self.dtype,
                    name=f"layer{si + 1}_{bi}")(x, train)
            skips.append(x)
        x4s, x8s = skips[0], skips[1]

        xfc = _conv_bn_act(x, self.fcdim, "fc", train, self.dtype,
                           neg_slope=0.0)

        # decoder with skip concats (model_repository.py:27-50,56-68)
        fm = _conv_bn_act(jnp.concatenate([xfc, x8s], -1), self.s8dim,
                          "conv8s", train, self.dtype)
        fm = _up2(fm)
        fm = _conv_bn_act(jnp.concatenate([fm, x4s], -1), self.s4dim,
                          "conv4s", train, self.dtype)
        fm = _up2(fm)
        fm = _conv_bn_act(jnp.concatenate([fm, x2s], -1), self.s2dim,
                          "conv2s", train, self.dtype)
        fm = _up2(fm)
        fm = _conv_bn_act(jnp.concatenate([fm, raw], -1), self.raw_dim,
                          "convraw", train, self.dtype)
        n_conf = 2 if self.conf_mode == "cls" else 1
        n_coor = self.num_bins if self.coor_mode == "cls" else 1
        out = nn.Conv(n_conf + 3 * n_coor, (1, 1), dtype=self.dtype,
                      name="head")(fm).astype(jnp.float32)

        conf = out[..., :n_conf]
        cx = out[..., n_conf:n_conf + n_coor]
        cy = out[..., n_conf + n_coor:n_conf + 2 * n_coor]
        cz = out[..., n_conf + 2 * n_coor:]
        return conf, cx, cy, cz
