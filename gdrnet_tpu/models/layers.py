"""Shared flax building blocks: norm factory, align-corners bilinear
upsampling, DropBlock regularization.

TPU notes: everything is NHWC (XLA's native conv layout on TPU); convs run on
the MXU in the module's compute dtype (bf16 by default at train), norms and
the final head outputs stay f32.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def get_norm(norm: str, num_gn_groups: int = 32, dtype: Any = jnp.float32) -> Callable:
    """BN / GN factory (reference core/utils/layer_utils.py:17 get_norm).

    Returns a flax module factory; BatchNorm keeps per-replica running stats
    (no cross-replica sync), matching the reference's plain nn.BatchNorm2d
    under DDP (SURVEY.md §7 "BatchNorm under DP").
    """
    if norm in ("BN", "SyncBN"):
        # On TPU we intentionally keep BN per-replica even for "SyncBN":
        # reference trains with plain BN per GPU.
        return lambda: nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype)
    if norm == "GN":
        return lambda: nn.GroupNorm(num_groups=num_gn_groups, epsilon=1e-5, dtype=dtype)
    if norm in ("none", ""):
        return lambda: (lambda x: x)
    raise ValueError(f"Unknown norm type: {norm}")


def upsample_bilinear_align_corners(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """NHWC bilinear x`scale` upsample with align_corners=True.

    Matches torch nn.UpsamplingBilinear2d(scale_factor=2) used by the geometry
    head (reference cdpn_rot_head_region.py:66,104): output grid point i maps
    to input coordinate i*(H-1)/(OH-1).

    TPU note: expressed as two small dense interpolation matmuls
    (out = Wy @ x @ Wx^T) instead of index gathers — the interpolation
    matrices are trace-time numpy constants and the contraction rides the
    MXU; gathers on [B,64,64,256] maps were the head's hotspot.
    """
    import numpy as np

    B, H, W, C = x.shape
    OH, OW = H * scale, W * scale

    def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
        m = np.zeros((n_out, n_in), np.float32)
        if n_in == 1:
            m[:, 0] = 1.0
            return m
        pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
        i0 = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 2)
        w = (pos - i0).astype(np.float32)
        m[np.arange(n_out), i0] = 1.0 - w
        m[np.arange(n_out), i0 + 1] = w
        return m

    wy = jnp.asarray(_interp_matrix(H, OH), x.dtype)
    wx = jnp.asarray(_interp_matrix(W, OW), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", wy, x)
    return jnp.einsum("ow,bhwc->bhoc", wx, y)


class DropBlock2D(nn.Module):
    """DropBlock (NHWC): zero contiguous spatial blocks at train time.

    Reference: core/utils/dropblock/dropblock.py:6 (DropBlock2D) with the
    LinearScheduler (scheduler.py:5) folded in via the `progress` argument —
    drop_prob ramps 0 -> drop_prob over `nr_steps` training steps. The
    schedule is driven by the caller passing progress = step/nr_steps in
    [0, 1] (JAX modules are stateless; no .step() counter).
    """

    drop_prob: float = 0.0
    block_size: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool, progress: float | jnp.ndarray = 1.0,
                 rng: jax.Array | None = None) -> jnp.ndarray:
        if self.drop_prob == 0.0 or not train:
            return x
        if rng is None:
            rng = self.make_rng("dropout")
        B, H, W, C = x.shape
        drop_prob = self.drop_prob * jnp.clip(progress, 0.0, 1.0)
        gamma = drop_prob / (self.block_size ** 2)
        mask = jax.random.bernoulli(rng, gamma, (B, H, W, 1)).astype(x.dtype)
        # expand each dropped seed to a block via max-pool
        block_mask = nn.max_pool(
            mask, (self.block_size, self.block_size), strides=(1, 1), padding="SAME"
        )
        keep = 1.0 - block_mask
        denom = jnp.maximum(jnp.mean(keep, axis=(1, 2, 3), keepdims=True), 1e-6)
        return x * keep / denom


class ConvTranspose2dTorch(nn.Module):
    """Transposed conv with torch ConvTranspose2d semantics (k, s=2, p=1,
    op=1 -> exact 2x upsample), expressed as a dilated conv:
    out = conv(dilate(x, s), flip(K)) with padding (k-1-p, k-1-p+op).

    flax's nn.ConvTranspose pads differently from torch for these settings
    (verified numerically), so this module keeps weight-level parity with
    reference checkpoints. Kernel layout [kh, kw, in, out]; a torch weight
    [in, out, kh, kw] converts via transpose(2, 3, 0, 1).
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = False
    kernel_init: Callable = nn.initializers.normal(0.001)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, in_ch, self.features))
        pad_lo = k - 1 - self.padding
        pad_hi = pad_lo + self.output_padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), jnp.flip(kernel, (0, 1)).astype(self.dtype),
            window_strides=(1, 1), padding=[(pad_lo, pad_hi)] * 2,
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class ConvNormAct(nn.Module):
    """Conv -> norm -> ReLU with the reference's init (normal std=0.001)."""

    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "BN"
    num_gn_groups: int = 32
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            use_bias=self.use_bias,
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype,
        )(x)
        norm = get_norm(self.norm, self.num_gn_groups, dtype=self.dtype)()
        if isinstance(norm, nn.BatchNorm):
            x = norm(x, use_running_average=not train)
        elif callable(norm) and not isinstance(norm, nn.Module):
            x = norm(x)
        else:
            x = norm(x)
        return nn.relu(x)
