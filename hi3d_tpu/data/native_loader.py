"""ctypes bindings for the native C++ clip loader (native/hi3d_loader.cpp).

Builds the shared library on first use (g++, cached by source hash under
~/.cache/hi3d_tpu) and exposes `load_clip(paths, h, w)`. The Python datasets
use it automatically and fall back to the cv2 path when the toolchain or
image libraries are unavailable (`available()` gates the fast path).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "hi3d_loader.cpp",
)
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "HI3D_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "hi3d_tpu"),
    )
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, f"hi3d_loader_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", so_path + ".tmp", "-lpng", "-ljpeg", "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        msg = getattr(e, "stderr", b"") or b""
        print(f"[native_loader] build failed, using cv2 fallback: "
              f"{msg.decode(errors='replace')[:500]}")
        return None
    os.replace(so_path + ".tmp", so_path)
    return so_path


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        if os.environ.get("HI3D_NATIVE_LOADER", "1") == "0":
            _FAILED = True
            return None
        so = _build()
        if so is None:
            _FAILED = True
            return None
        lib = ctypes.CDLL(so)
        lib.hi3d_load_clip.restype = ctypes.c_int
        lib.hi3d_load_clip.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def load_clip(
    paths: List[str], height: int, width: int, num_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """paths → (video (T,H,W,3) float32 in [-1,1], masks (T,H,W) float32).

    Raises RuntimeError if any frame fails to decode.
    """
    lib = _lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    t = len(paths)
    video = np.empty((t, height, width, 3), np.float32)
    masks = np.empty((t, height, width), np.float32)
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    failures = lib.hi3d_load_clip(
        blob, t, height, width,
        video.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    if failures:
        raise RuntimeError(f"{failures}/{t} frames failed to decode")
    return video, masks
