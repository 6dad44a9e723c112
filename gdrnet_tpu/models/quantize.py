"""Post-training int8 quantization for TPU serving.

No reference counterpart — the reference serves fp16 AMP on GPU
(main_gdrn.py:141, engine.py:137). On TPU v5e the int8 MXU path runs
~1.75x bf16 (measured: 226 vs 129 TFLOP/s on 3x3x256x256 convs at 64^2),
and GDRN inference is FLOP-bound (docs/performance.md), so int8 is the
one lever left past bf16.

Design: zero model changes. Every `nn.Conv` call is intercepted with
`flax.linen.intercept_methods` and — for quantized module paths —
re-executed as:

    x_i8 = clip(round(x / s_x))          s_x: static per-tensor scale
                                          from calibration (max|x|/127)
    w_i8 = clip(round(w / s_w[c]))       s_w: per-output-channel max|w|/127
                                          (computed under jit from the
                                          live params; cost is negligible)
    y    = conv_i32(x_i8, w_i8) * (s_x * s_w[c]) + b

`nn.Dense` layers (the ConvPnPNet/TransHeadNet FC chains — flattened-ROI
matmuls, pure MXU) are intercepted the same way, with int32-accumulated
`dot_general`. Symmetric quantization keeps the conv free of zero-point
corrections; the int32 accumulator is exact, so the only error is the
8-bit rounding of inputs/weights. BatchNorm/GN, biases, attention maps,
upsampling, the f32 `out_conv` emit layer and the final fc_r/fc_t pose
regressors stay in bf16/f32.

Usage:
    scales = calibrate_act_scales(model, variables, batches)
    predict = make_predict_step(model, int8_scales=scales)   # engine.steps
or wrap any apply: `with quantized_scope(scales): model.apply(...)`.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# module-path prefixes quantized by default, per module type. Convs: the
# ResNet trunk and the geometry head carry ~all inference FLOPs; pnp_net's
# convs consume the decoded coordinate maps whose 8-bit rounding costs pose
# accuracy (measured: up to ~2.4 deg rotation drift) for little time — off.
# Dense: the 8192->1024->256 FC chain (reference conv_pnp_net.py:41-157)
# and TransHeadNet FCs are flattened-feature matmuls, robust to 8-bit
# rounding (exactness + quality gates in tests/test_quantize.py).
DEFAULT_CONV_PREFIXES = ("backbone", "rot_head")
DEFAULT_DENSE_PREFIXES = ("backbone", "rot_head", "pnp_net", "trans_head")
# legacy alias (single-set callers): the conv set
DEFAULT_QUANT_PREFIXES = DEFAULT_CONV_PREFIXES
# never quantize: the f32 emit layer feeding the softmax/argmax decodes,
# and the final pose regressors (tiny matmuls — zero throughput to win,
# direct rounding error on the pose outputs): conv_pnp fc_r/fc_t,
# SimplePointPnPNet fc_pose, TransHeadNet fc_out.
DEFAULT_EXCLUDE_NAMES = ("out_conv", "fc_r", "fc_t", "fc_pose", "fc_out")
# Dense-only extra excludes: the point-MLP layers of PointPnPNet /
# SimplePointPnPNet are Dense layers named conv1-3 (+conv_topk/conv_sp
# pool mixers) that consume the DECODED coordinate maps — the same
# rounding-sensitivity that keeps ConvPnPNet's convs off the int8 path.
# Applied only to nn.Dense, so backbone/rot_head *convs* that happen to
# share these names are unaffected.
DENSE_EXTRA_EXCLUDE_NAMES = ("conv1", "conv2", "conv3", "conv_topk",
                             "conv_sp")


def _path_str(module: nn.Module) -> str:
    return "/".join(module.path)


def _norm_tuple(v, n):
    if v is None:
        return (1,) * n
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def _lax_conv_like(module: nn.Conv, x, kernel, preferred_element_type=None):
    """Replicate the lax call flax's nn.Conv makes for NHWC/HWIO layouts
    (the only layouts this codebase uses), so the int8 path sees the exact
    same padding/striding as the bf16 path."""
    n = len(module.kernel_size)
    strides = _norm_tuple(module.strides, n)
    padding = module.padding
    if isinstance(padding, int):
        padding = [(padding, padding)] * n
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=padding,
        lhs_dilation=_norm_tuple(module.input_dilation, n),
        rhs_dilation=_norm_tuple(module.kernel_dilation, n),
        dimension_numbers=dn,
        feature_group_count=module.feature_group_count,
        preferred_element_type=preferred_element_type)


def _should_quantize(path: str, prefixes, exclude_names) -> bool:
    segs = path.split("/")
    return (any(path.startswith(p) for p in prefixes)
            and not any(s in exclude_names for s in segs))


def _resolve_prefix_sets(prefixes, dense_prefixes):
    """(conv_set, dense_set) from the user-facing args: `prefixes` governs
    convs (default DEFAULT_CONV_PREFIXES); `dense_prefixes` governs Dense
    layers, defaulting to `prefixes` when that was given explicitly and to
    DEFAULT_DENSE_PREFIXES otherwise."""
    if dense_prefixes is None:
        dense_prefixes = DEFAULT_DENSE_PREFIXES if prefixes is None else prefixes
    if prefixes is None:
        prefixes = DEFAULT_CONV_PREFIXES
    return prefixes, dense_prefixes


def _quantizable(module, path, conv_prefixes, dense_prefixes, exclude_names):
    if isinstance(module, nn.Dense):
        return _should_quantize(
            path, dense_prefixes,
            tuple(exclude_names) + DENSE_EXTRA_EXCLUDE_NAMES)
    if isinstance(module, nn.Conv):
        return _should_quantize(path, conv_prefixes, exclude_names)
    return False


def calibrate_act_scales(model, variables, batches: list[dict],
                         apply_fn: Callable | None = None,
                         prefixes=None, dense_prefixes=None,
                         exclude_names=DEFAULT_EXCLUDE_NAMES) -> dict:
    """Per-conv-input activation scales from calibration batches.

    batches: list of model-kwargs dicts; each is forwarded once under jit
    with an interceptor that emits max|input| per conv path as auxiliary
    outputs (no eager dispatch — one compiled program per batch shape).
    apply_fn(variables, batch) -> None overrides how a batch is applied
    (default: engine.steps kwargs convention).
    Returns {path: scale} with scale = running-max |x| / 127.
    """
    conv_pre, dense_pre = _resolve_prefix_sets(prefixes, dense_prefixes)
    if apply_fn is None:
        from gdrnet_tpu.engine.steps import _model_kwargs

        def apply_fn(v, b, _apply):
            _apply(v, b["roi_img"], **_model_kwargs(b), train=False)

    def fwd(v, b):
        rec = {}

        def interceptor(next_fun, args, kwargs, context):
            if context.method_name == "__call__":
                p = _path_str(context.module)
                if _quantizable(context.module, p, conv_pre, dense_pre,
                                exclude_names):
                    m = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                    # max-merge: a weight-shared conv called twice per
                    # forward must calibrate over BOTH invocations
                    rec[p] = jnp.maximum(rec[p], m) if p in rec else m
            return next_fun(*args, **kwargs)

        def _apply(v, *a, **kw):
            with nn.intercept_methods(interceptor):
                model.apply(v, *a, **kw)

        apply_fn(v, b, _apply)
        return rec

    jfwd = jax.jit(fwd)
    scales: dict[str, float] = {}
    for b in batches:
        rec = jax.device_get(jfwd(variables, b))
        for p, m in rec.items():
            scales[p] = max(scales.get(p, 0.0), float(m))
    return {p: m / 127.0 for p, m in scales.items() if m > 0}


def make_int8_interceptor(scales: dict,
                          prefixes=None, dense_prefixes=None,
                          exclude_names=DEFAULT_EXCLUDE_NAMES) -> Callable:
    """flax method interceptor replacing calibrated nn.Conv/nn.Dense calls
    with the int8 MXU path (int32 accumulation, per-out-channel weight
    scales)."""
    conv_pre, dense_pre = _resolve_prefix_sets(prefixes, dense_prefixes)

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if context.method_name != "__call__":
            return next_fun(*args, **kwargs)
        p = _path_str(m)
        if p not in scales or not _quantizable(m, p, conv_pre, dense_pre,
                                               exclude_names):
            return next_fun(*args, **kwargs)
        (x,) = args
        params = m.variables["params"]
        w = jnp.asarray(params["kernel"], jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
                         / 127.0, 1e-12)                     # [C_out]
        w_i8 = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
        sx = jnp.float32(scales[p])
        x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                        -127, 127).astype(jnp.int8)
        if isinstance(m, nn.Dense):
            # y = x @ kernel with int32 accumulation ([.., in] x [in, out])
            y = lax.dot_general(
                x_i8, w_i8, (((x_i8.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            y = _lax_conv_like(m, x_i8, w_i8,
                               preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * sw)
        if m.use_bias:
            y = y + jnp.asarray(params["bias"], jnp.float32)
        return y.astype(x.dtype)

    return interceptor


@contextlib.contextmanager
def quantized_scope(scales: dict, prefixes=None, dense_prefixes=None,
                    exclude_names=DEFAULT_EXCLUDE_NAMES):
    """`with quantized_scope(scales): model.apply(...)` — every calibrated
    conv/Dense inside runs int8. Composable with jax.jit (interception
    happens at trace time)."""
    with nn.intercept_methods(
            make_int8_interceptor(scales, prefixes, dense_prefixes,
                                  exclude_names)):
        yield
