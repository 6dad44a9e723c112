"""Native (C++) host kernels, loaded via ctypes with on-demand compilation.

The reference built its FPS extension with cffi + a compile.sh
(core/csrc/fps/setup.py in /root/reference); here `load_library(name)`
compiles <csrc>/<name>/<name>.cpp with g++ -O3 -fopenmp into a cached .so on
first use. Pure-python/JAX twins exist for every native kernel, so the
framework works without a toolchain (the native path is a host-side
speedup for offline tools).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

_CSRC_DIR = osp.dirname(osp.abspath(__file__))
_CACHE: dict[str, ctypes.CDLL] = {}


def load_library(name: str, recompile: bool = False) -> ctypes.CDLL:
    if name in _CACHE and not recompile:
        return _CACHE[name]
    src = osp.join(_CSRC_DIR, name, f"{name}.cpp")
    so = osp.join(_CSRC_DIR, name, f"lib{name}.so")
    if recompile or not osp.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
               src, "-o", so]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(so)
    _CACHE[name] = lib
    return lib


def fps_native_available() -> bool:
    try:
        load_library("fps")
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        return False
