"""Torch GDRN checkpoint -> flax params/batch_stats converter.

Enables the fidelity gates against released reference checkpoints
(BASELINE.json "ape, provided test_bboxes" config): a reference .pth
state_dict (module names per core/gdrn_modeling/models/GDRN.py composition —
backbone.*, rot_head_net.features.*, pnp_net.*, trans_head_net.*) maps onto
this framework's flax module tree.

Weight layout transforms:
  Conv2d   [out,in,kh,kw] -> kernel [kh,kw,in,out]        (transpose 2,3,1,0)
  ConvT2d  [in,out,kh,kw] -> kernel [kh,kw,in,out]        (transpose 2,3,0,1;
           our ConvTranspose2dTorch flips at apply time, layers.py)
  Linear   [out,in]       -> kernel [in,out]
  BN       weight/bias -> scale/bias; running_mean/var -> batch_stats
  GN       weight/bias -> scale/bias
"""

from __future__ import annotations

import numpy as np


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    cur = tree
    for p in path[:-1]:
        cur = cur.setdefault(p, {})
    cur[path[-1]] = value


def _conv_w(w):  # torch conv weight -> flax kernel
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _convT_w(w):
    return np.transpose(np.asarray(w), (2, 3, 0, 1))


def _lin_w(w):
    return np.transpose(np.asarray(w), (1, 0))


def _lin_w_from_chw(w, c: int, h: int, wd: int):
    """FC applied right after a flatten: torch flattens NCHW (c,h,w-major),
    flax flattens NHWC — permute the input axis accordingly."""
    w = np.asarray(w)  # [out, c*h*w]
    w = w.reshape(w.shape[0], c, h, wd).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
    return np.transpose(w, (1, 0))


def _infer_chw(sd: dict, conv_prefix: str, fc_w, alt_prefix: str | None = None
               ) -> tuple[int, int, int]:
    """Infer the (C, H, W) of the tensor flattened into fc1 from the last
    conv's out-channels and the fc input width (square spatial assumed —
    true for ConvPnPNet 8x8 and TransHeadNet 8x8)."""
    c = None
    for prefix in filter(None, (conv_prefix, alt_prefix)):
        for k, v in sd.items():
            if k.startswith(prefix) and k.endswith("weight"):
                arr = v
                shape = tuple(arr.shape)
                if len(shape) == 4:  # conv weight [out,in,kh,kw]
                    c = shape[0]
    assert c is not None, f"no conv weights under {conv_prefix}"
    flat = fc_w.shape[1]
    hw = flat // c
    h = int(round(hw ** 0.5))
    assert h * h * c == flat, f"cannot infer chw: c={c}, flat={flat}"
    return c, h, h


def _map_backbone(key_parts: list[str]) -> tuple[list[str], str] | None:
    """backbone.* torch key -> (flax path, kind). kind in conv|bn|lin."""
    k = key_parts
    if k[0] == "conv1":
        return ["backbone", "conv1"], "conv"
    if k[0] == "bn1":
        return ["backbone", "bn1"], "bn"
    if k[0].startswith("layer"):
        layer, block = k[0], k[1]
        base = ["backbone", f"{layer}_{block}"]
        sub = k[2]
        if sub.startswith("conv"):
            return base + [f"Conv_{int(sub[4:]) - 1}"], "conv"
        if sub.startswith("bn"):
            return base + [f"BatchNorm_{int(sub[2:]) - 1}"], "bn"
        if sub == "downsample":
            return (base + ["downsample_conv"], "conv") if k[3] == "0" \
                else (base + ["downsample_bn"], "bn")
    return None


def _rot_head_feature_map(num_layers: int = 3, norm: str = "BN") -> dict[int, tuple[list[str], str]]:
    """ModuleList index -> (flax path, kind) for the no-concat head
    (reference cdpn_rot_head_region.py:82-115 ordering: deconv,norm,relu then
    per round [up?]+2x(conv,norm,relu), final out conv)."""
    m: dict[int, tuple[list[str], str]] = {
        0: (["deconv"], "convT"),
        1: (["deconv_bn" if norm == "BN" else "deconv_gn"], "bn" if norm == "BN" else "gn"),
    }
    idx = 3
    inner_norm = "bn" if norm == "BN" else "gn"
    inner_norm_name = "BatchNorm_0" if norm == "BN" else "GroupNorm_0"
    for i in range(num_layers):
        if i >= 1:
            idx += 1  # upsample module occupies one slot
        m[idx] = ([f"conv{i}_a", "Conv_0"], "conv"); idx += 1
        m[idx] = ([f"conv{i}_a", inner_norm_name], inner_norm); idx += 2
        m[idx] = ([f"conv{i}_b", "Conv_0"], "conv"); idx += 1
        m[idx] = ([f"conv{i}_b", inner_norm_name], inner_norm); idx += 2
    m[idx] = (["out_conv"], "conv")
    return m


def _pnp_feature_map(num_layers: int = 3, norm: str = "GN") -> dict[int, tuple[list[str], str]]:
    """ConvPnPNet ModuleList (conv,norm,relu)xN (conv_pnp_net.py:76-85)."""
    inner = ("gn", "GroupNorm_0") if norm == "GN" else ("bn", "BatchNorm_0")
    m: dict[int, tuple[list[str], str]] = {}
    for i in range(3):
        m[3 * i] = ([f"conv{i}", "Conv_0"], "conv")
        m[3 * i + 1] = ([f"conv{i}", inner[1]], inner[0])
    for i in range(num_layers - 3):
        m[9 + 3 * i] = ([f"conv_extra{i}", "Conv_0"], "conv")
        m[9 + 3 * i + 1] = ([f"conv_extra{i}", inner[1]], inner[0])
    return m


def convert_torch_state_dict(sd: dict, head_num_layers: int = 3,
                             head_norm: str = "BN", pnp_norm: str = "GN",
                             pnp_num_layers: int = 3,
                             pnp_fc1_chw: tuple[int, int, int] | None = None,
                             trans_fc1_chw: tuple[int, int, int] | None = None
                             ) -> tuple[dict, dict]:
    """torch state_dict (tensors or numpy) -> (params, batch_stats) trees.

    Unmapped keys are reported via the returned trees' "_unmapped" list-free
    contract: raises on unknown structural keys so silent drops can't happen
    (log_var MTL params and num_batches_tracked are skipped knowingly).
    """
    params: dict = {}
    stats: dict = {}
    rot_map = _rot_head_feature_map(head_num_layers, head_norm)
    pnp_map = _pnp_feature_map(pnp_num_layers, pnp_norm)

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    # unwrap DDP/Lite prefixes ONCE for the whole dict (reference
    # my_checkpoint.py:9-25) so prefix-matching helpers (_infer_chw) see
    # clean keys too
    def _strip(k: str) -> str:
        parts = k.split(".")
        while parts and parts[0] in ("module", "_module", "model"):
            parts = parts[1:]
        return ".".join(parts)

    sd = {_strip(k): v for k, v in sd.items()}

    for key, val in sd.items():
        if key.endswith("num_batches_tracked") or key.startswith("log_var"):
            continue
        parts = key.split(".")
        v = to_np(val)

        if parts[0] == "backbone":
            mapped = _map_backbone(parts[1:])
            assert mapped is not None, f"unmapped backbone key: {key}"
            path, kind = mapped
        elif parts[0] in ("rot_head_net", "rot_head"):
            assert parts[1] == "features", f"unmapped rot head key: {key}"
            path, kind = rot_map[int(parts[2])]
            path = ["rot_head"] + path
        elif parts[0] == "pnp_net":
            if parts[1] == "features":
                path, kind = pnp_map[int(parts[2])]
                path = ["pnp_net"] + path
            elif parts[1] in ("fc1", "fc2", "fc_r", "fc_t"):
                path, kind = ["pnp_net", parts[1]], "lin"
            else:
                raise KeyError(f"unmapped pnp key: {key}")
        elif parts[0] in ("trans_head_net", "trans_head"):
            if parts[1] == "features":
                # convs at ModuleList stride 3 (cdpn_trans_head.py)
                i = int(parts[2])
                if i % 3 == 0:
                    path, kind = ["trans_head", f"conv{i // 3}", "Conv_0"], "conv"
                else:
                    path, kind = ["trans_head", f"conv{i // 3}", "BatchNorm_0"], "bn"
            elif parts[1].startswith("fc"):
                # torch fc1/fc2/fc3 -> flax fc1/fc2/fc_out (heads.py)
                name = {1: "fc1", 2: "fc2", 3: "fc_out"}[int(parts[1][2:])]
                path, kind = ["trans_head", name], "lin"
            else:
                raise KeyError(f"unmapped trans head key: {key}")
        else:
            raise KeyError(f"unmapped key: {key}")

        field = parts[-1]
        if kind == "conv":
            if field == "weight":
                _set(params, path + ["kernel"], _conv_w(v))
            else:
                _set(params, path + ["bias"], v)
        elif kind == "convT":
            if field == "weight":
                _set(params, path + ["kernel"], _convT_w(v))
            else:
                _set(params, path + ["bias"], v)
        elif kind == "lin":
            if field == "weight":
                is_pnp_fc1 = path[-2:] == ["pnp_net", "fc1"] or path == ["pnp_net", "fc1"]
                is_trans_fc1 = path == ["trans_head", "fc1"]
                if is_pnp_fc1:
                    chw = pnp_fc1_chw or _infer_chw(sd, "pnp_net.features", v)
                    _set(params, path + ["kernel"], _lin_w_from_chw(v, *chw))
                elif is_trans_fc1:
                    chw = trans_fc1_chw or _infer_chw(
                        sd, "trans_head_net.features", v,
                        alt_prefix="trans_head.features")
                    _set(params, path + ["kernel"], _lin_w_from_chw(v, *chw))
                else:
                    _set(params, path + ["kernel"], _lin_w(v))
            else:
                _set(params, path + ["bias"], v)
        elif kind in ("bn", "gn"):
            if field == "weight":
                _set(params, path + ["scale"], v)
            elif field == "bias":
                _set(params, path + ["bias"], v)
            elif field == "running_mean":
                _set(stats, path + ["mean"], v)
            elif field == "running_var":
                _set(stats, path + ["var"], v)
            else:
                raise KeyError(f"unknown norm field: {key}")
        else:
            raise KeyError(kind)
    return params, stats


def load_torch_checkpoint(path: str, **kwargs) -> tuple[dict, dict]:
    """Load a reference .pth and convert (model key unwrapped)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    return convert_torch_state_dict(sd, **kwargs)


def convert_torchvision_resnet(sd: dict) -> tuple[dict, dict]:
    """Raw torchvision-format resnet state_dict -> ({"backbone": params},
    {"backbone": batch_stats}).

    This is the format of the official ImageNet weights the reference loads
    into the backbone when MODEL.WEIGHTS=="" (GDRN.py:713-721 via mmcv
    `load_checkpoint(model, "torchvision://resnetNN")`): keys `conv1.*`,
    `bn1.*`, `layer{1..4}.{i}.conv{1..3}/bn{1..3}/downsample.{0,1}.*` with
    NO `backbone.` prefix, plus the ImageNet classifier `fc.*` which the
    trunk drops (reference resnet_backbone.py keeps layers 0..4 only)."""
    trunk = {f"backbone.{k}": v for k, v in sd.items()
             if not k.split(".")[0].startswith("fc")}
    return convert_torch_state_dict(trunk)


def load_torchvision_resnet(path: str) -> tuple[dict, dict]:
    """Load a torchvision resnet .pth (bare state_dict or wrapped) and
    convert to backbone (params, batch_stats) subtrees."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt)) \
        if isinstance(ckpt, dict) and not any(
            k.startswith(("conv1", "layer")) for k in ckpt) else ckpt
    return convert_torchvision_resnet(sd)
