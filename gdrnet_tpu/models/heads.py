"""Geometry head and (legacy) translation head — flax, NHWC.

RotWithRegionHead: 8x8 backbone feature -> 64x64 dense geometry maps laid out
as [mask | xyz | region] on the channel axis, exactly the reference's output
contract (cdpn_rot_head_region.py:120-193): one stride-2 ConvTranspose then
`num_layers` rounds of (bilinear-up + 2 convs) — the first round skips the
upsample (reference :103: `if i >= 1` upsample), giving 8->16->32->64.
Optional U-Net-style concat of backbone skips ("rot_concat", reference
:146-166 concats x_f16/x_f32/x_f64 before rounds 1/2/3).

TransHeadNet: the CDPN-legacy direct-translation head used when
PNP_NET.R_ONLY (reference cdpn_trans_head.py:8-70).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from gdrnet_tpu.models.layers import (
    ConvNormAct,
    ConvTranspose2dTorch,
    upsample_bilinear_align_corners,
)


class RotWithRegionHead(nn.Module):
    rot_output_dim: int = 3          # 3 (L1 xyz) or 3*(XYZ_BIN+1) (CE)
    mask_output_dim: int = 1         # 1 (L1/BCE) or 2 (CE)
    region_output_dim: int = 9       # num_regions + 1 (bg)
    num_layers: int = 3
    num_filters: int = 256
    kernel_size: int = 3
    output_kernel_size: int = 1
    norm: str = "BN"
    num_gn_groups: int = 32
    freeze: bool = False
    concat: bool = False             # ROT_CONCAT skips from the backbone
    num_classes: int = 1
    rot_class_aware: bool = False
    mask_class_aware: bool = False
    region_class_aware: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        m = self.num_classes if self.mask_class_aware else 1
        r = self.num_classes if self.rot_class_aware else 1
        g = self.num_classes if self.region_class_aware else 1
        return self.mask_output_dim * m + self.rot_output_dim * r + self.region_output_dim * g

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_f64=None, x_f32=None, x_f16=None,
                 *, train: bool = False) -> jnp.ndarray:
        train = train and not self.freeze
        # stride-2 transposed conv: 8 -> 16 (torch ConvTranspose2d parity:
        # k=3 -> p=1/op=1, k=2 -> p=0/op=0, k=4 -> p=1/op=0, reference
        # cdpn_rot_head_region.py:35-40)
        pad, out_pad = {2: (0, 0), 3: (1, 1), 4: (1, 0)}[self.kernel_size]
        x = ConvTranspose2dTorch(
            self.num_filters,
            kernel_size=self.kernel_size,
            stride=2,
            padding=pad,
            output_padding=out_pad,
            use_bias=False,
            dtype=self.dtype,
            name="deconv",
        )(x)
        norm0 = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype, name="deconv_bn") if self.norm == "BN" else \
            nn.GroupNorm(num_groups=self.num_gn_groups, epsilon=1e-5, dtype=self.dtype, name="deconv_gn")
        x = nn.relu(norm0(x))

        skips = [x_f16, x_f32, x_f64]
        for i in range(self.num_layers):
            if self.concat:
                # reference concats the skip BEFORE each upsample round
                # (feature idx 3/12/21, cdpn_rot_head_region.py:146-166).
                # NOTE: like the reference's concat construction (:65-74,
                # one UpsamplingBilinear2d per round), this emits
                # out_res*2 maps (8->16 deconv then 3x2 upsample = 128);
                # no shipped reference config enables ROT_CONCAT and the
                # 64x64 GT maps don't match it — kept for structural parity
                if skips[i] is not None:
                    x = jnp.concatenate([x, skips[i].astype(x.dtype)], axis=-1)
                x = upsample_bilinear_align_corners(x, 2)
            elif i >= 1:
                x = upsample_bilinear_align_corners(x, 2)
            x = ConvNormAct(self.num_filters, 3, 1, self.norm, self.num_gn_groups,
                            dtype=self.dtype, name=f"conv{i}_a")(x, train=train)
            x = ConvNormAct(self.num_filters, 3, 1, self.norm, self.num_gn_groups,
                            dtype=self.dtype, name=f"conv{i}_b")(x, train=train)

        out = nn.Conv(
            self.out_channels,
            (self.output_kernel_size, self.output_kernel_size),
            padding="SAME",
            use_bias=True,
            kernel_init=nn.initializers.normal(0.001),
            dtype=jnp.float32,  # head output in f32 for stable losses
            name="out_conv",
        )(x.astype(jnp.float32))
        if self.freeze:
            out = jax.lax.stop_gradient(out)
        return out

    def split_outputs(self, out: jnp.ndarray, roi_classes: jnp.ndarray | None = None):
        """Channel-split [B,H,W,C] -> (mask, coor_x, coor_y, coor_z, region),
        applying class-aware gather when configured (reference GDRN.py:134-151).
        Each coor_* is [B,H,W,rot_output_dim//3]."""
        b, h, w, _ = out.shape

        def _gather(t, dim):
            if roi_classes is None:
                return t
            t = t.reshape(b, h, w, self.num_classes, dim)
            return jnp.take_along_axis(
                t, roi_classes.reshape(b, 1, 1, 1, 1).astype(jnp.int32), axis=3
            )[:, :, :, 0]

        c = 0
        m_dim = self.mask_output_dim * (self.num_classes if self.mask_class_aware else 1)
        mask = out[..., c:c + m_dim]
        c += m_dim
        if self.mask_class_aware:
            mask = _gather(mask, self.mask_output_dim)

        r_dim = self.rot_output_dim * (self.num_classes if self.rot_class_aware else 1)
        xyz = out[..., c:c + r_dim]
        c += r_dim
        if self.rot_class_aware:
            xyz = _gather(xyz, self.rot_output_dim)
        # layout matches reference view(bs, 3, r_out_dim//3, h, w): channel-major
        # split into 3 groups of bins
        nbin = self.rot_output_dim // 3
        coor_x = xyz[..., 0 * nbin:1 * nbin]
        coor_y = xyz[..., 1 * nbin:2 * nbin]
        coor_z = xyz[..., 2 * nbin:3 * nbin]

        g_dim = self.region_output_dim * (self.num_classes if self.region_class_aware else 1)
        region = out[..., c:c + g_dim]
        if self.region_class_aware:
            region = _gather(region, self.region_output_dim)
        return mask, coor_x, coor_y, coor_z, region


class TransHeadNet(nn.Module):
    """convs + FCs -> 3-vector translation (reference cdpn_trans_head.py)."""

    num_layers: int = 3
    num_filters: int = 256
    kernel_size: int = 3
    norm: str = "BN"
    num_gn_groups: int = 32
    out_channel: int = 3
    freeze: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        train = train and not self.freeze
        for i in range(self.num_layers):
            x = ConvNormAct(self.num_filters, self.kernel_size, 1, self.norm,
                            self.num_gn_groups, dtype=self.dtype, name=f"conv{i}")(x, train=train)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        x = nn.relu(nn.Dense(4096, kernel_init=nn.initializers.normal(0.001),
                             name="fc1")(x))
        x = nn.relu(nn.Dense(4096, kernel_init=nn.initializers.normal(0.001),
                             name="fc2")(x))
        # named so the int8 path can exclude the translation regressor
        # (models/quantize.py DEFAULT_EXCLUDE_NAMES)
        x = nn.Dense(self.out_channel, kernel_init=nn.initializers.normal(0.001),
                     name="fc_out")(x)
        if self.freeze:
            x = jax.lax.stop_gradient(x)
        return x
