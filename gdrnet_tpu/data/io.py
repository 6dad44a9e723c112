"""Image / depth / json IO helpers (reference lib/pysixd/inout.py subset:
load_im, load_depth :176-220, save_depth, load/save_json; BOP depth pngs are
16-bit with a depth_scale into millimetres)."""

from __future__ import annotations

import json

import cv2
import numpy as np


def load_im(path: str, fmt: str = "BGR") -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    assert img is not None, path
    if fmt == "RGB":
        return img[..., ::-1]
    return img


def load_depth(path: str, depth_scale: float = 1.0) -> np.ndarray:
    """16-bit BOP depth png -> metres: raw * depth_scale / 1000
    (inout.load_depth semantics)."""
    d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    assert d is not None, path
    if d.ndim == 3:
        d = d[..., 0]
    return d.astype(np.float32) * depth_scale / 1000.0


def save_depth(path: str, depth_m: np.ndarray, depth_scale: float = 1.0) -> None:
    """Metres -> 16-bit png with the given depth_scale."""
    raw = np.round(depth_m * 1000.0 / depth_scale).astype(np.uint16)
    assert path.endswith(".png")
    cv2.imwrite(path, raw)


def load_json(path: str, keys_to_int: bool = False) -> dict:
    with open(path) as f:
        d = json.load(f)
    if keys_to_int:
        return {int(k): v for k, v in d.items()}
    return d


def save_json(path: str, obj) -> None:
    def _default(o):
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, (np.floating, np.integer)):
            return o.item()
        raise TypeError(type(o))

    with open(path, "w") as f:
        json.dump(obj, f, default=_default)


def load_cam_params(path: str) -> dict:
    """Camera json -> {im_size, K, depth_scale?} (reference
    lib/pysixd/inout.py:204-223)."""
    c = load_json(path)
    cam = {
        "im_size": (c["width"], c["height"]),
        "K": np.array([[c["fx"], 0.0, c["cx"]],
                       [0.0, c["fy"], c["cy"]],
                       [0.0, 0.0, 1.0]]),
    }
    if "depth_scale" in c:
        cam["depth_scale"] = float(c["depth_scale"])
    return cam
