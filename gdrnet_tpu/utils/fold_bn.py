"""Fold BatchNorm running statistics into the preceding conv for inference.

Serving optimization the reference doesn't do (its eval runs BN in eval mode,
an extra scale+shift pass per conv): with
y = scale * (conv(x) - mean) / sqrt(var + eps) + bias, rewrite
    kernel' = kernel * scale / sqrt(var + eps)   (per output channel)
    BN'     = identity-scale + bias' where bias' = bias - mean*scale/sqrt(var+eps)
i.e. the multiplier folds into the conv kernel and the BN collapses to a pure
bias add (mean'=0, var'=1-eps, scale'=1) — no new params, so the folded trees
drop into the SAME flax module. XLA fuses the remaining add into the conv.
Numerics verified in tests/test_fold_bn.py.
"""

from __future__ import annotations

import copy

import numpy as np

_EPS = 1e-5


def _is_bn_name(name: str) -> bool:
    return name.startswith("BatchNorm") or name.endswith("_bn") or name == "bn1"


def _conv_for_bn(params_mod: dict, bn_name: str) -> str | None:
    """Conv feeding this BN within one module dict (naming conventions of
    models/resnet.py blocks, heads.py, layers.ConvNormAct)."""
    if bn_name.startswith("BatchNorm_"):
        cand = "Conv_" + bn_name.split("_")[1]
    elif bn_name == "downsample_bn":
        cand = "downsample_conv"
    elif bn_name == "bn1":
        cand = "conv1"
    elif bn_name == "deconv_bn":
        cand = "deconv"
    else:
        return None
    return cand if cand in params_mod else None


def _to_np(tree):
    if isinstance(tree, dict):
        return {k: _to_np(v) for k, v in tree.items()}
    return np.asarray(tree)


def fold_batch_norms(params: dict, batch_stats: dict) -> tuple[dict, dict]:
    """Returns (folded_params, folded_stats); inputs untouched."""
    params = copy.deepcopy(_to_np(params))
    stats = copy.deepcopy(_to_np(batch_stats))
    _fold(params, stats)
    return params, stats


def _fold(params: dict, stats: dict) -> None:
    for name, sub_stats in list(stats.items()):
        if not isinstance(sub_stats, dict):
            continue
        if "mean" in sub_stats and "var" in sub_stats and _is_bn_name(name):
            conv_name = _conv_for_bn(params, name)
            if conv_name is None or name not in params:
                continue
            mean = np.asarray(sub_stats["mean"], np.float64)
            var = np.asarray(sub_stats["var"], np.float64)
            scale = np.asarray(params[name].get("scale", np.ones_like(mean)), np.float64)
            bias = np.asarray(params[name].get("bias", np.zeros_like(mean)), np.float64)
            inv = scale / np.sqrt(var + _EPS)

            k = np.asarray(params[conv_name]["kernel"], np.float64)
            params[conv_name]["kernel"] = (
                k * inv.reshape((1,) * (k.ndim - 1) + (-1,))).astype(np.float32)
            # BN becomes a pure bias add: (x - 0) * 1 / sqrt((1-eps)+eps) + b'
            params[name]["scale"] = np.ones_like(mean, np.float32)
            params[name]["bias"] = (bias - mean * inv).astype(np.float32)
            sub_stats["mean"] = np.zeros_like(mean, np.float32)
            sub_stats["var"] = np.full_like(mean, 1.0 - _EPS, np.float32)
        else:
            if name in params and isinstance(params[name], dict):
                _fold(params[name], sub_stats)


def _fold_tree_jnp(params: dict, stats: dict):
    """Pure-jnp twin of _fold over (params, stats) pytrees; traceable."""
    import jax.numpy as jnp

    params = dict(params)
    stats = dict(stats)
    for name in list(stats.keys()):
        sub = stats[name]
        if not isinstance(sub, dict):
            continue
        if "mean" in sub and "var" in sub and _is_bn_name(name):
            conv_name = _conv_for_bn(params, name)
            if conv_name is None or name not in params:
                continue
            mean, var = sub["mean"], sub["var"]
            p_bn = dict(params[name])
            scale = p_bn.get("scale", jnp.ones_like(mean))
            bias = p_bn.get("bias", jnp.zeros_like(mean))
            inv = scale / jnp.sqrt(var + _EPS)
            p_conv = dict(params[conv_name])
            k = p_conv["kernel"]
            p_conv["kernel"] = (k * inv.reshape((1,) * (k.ndim - 1) + (-1,))
                                ).astype(k.dtype)
            params[conv_name] = p_conv
            p_bn["scale"] = jnp.ones_like(mean)
            p_bn["bias"] = bias - mean * inv
            params[name] = p_bn
            stats[name] = {**sub, "mean": jnp.zeros_like(mean),
                           "var": jnp.full_like(mean, 1.0 - _EPS)}
        elif name in params and isinstance(params[name], dict):
            p2, s2 = _fold_tree_jnp(params[name], sub)
            params[name] = p2
            stats[name] = s2
    return params, stats


def fold_variables(variables: dict) -> dict:
    """Fold a {'params', 'batch_stats'} variables dict for inference.

    Runs as ONE jitted device program: the numpy path (`fold_batch_norms`,
    kept for host-side golden checks) fetches every leaf individually, which
    over a remote-TPU tunnel costs a round-trip per parameter tensor."""
    import jax

    p, s = jax.jit(_fold_tree_jnp)(dict(variables["params"]),
                                   dict(variables.get("batch_stats", {})))
    out = {"params": p}
    if s:
        out["batch_stats"] = s
    return out
