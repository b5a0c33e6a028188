"""ctypes binding to the native host-ops library (native/hostops.cc).

Loads `native/libhostops.so`, building it with `make` on first use if a
toolchain is present; every entry point has a numpy fallback so the
framework runs unchanged without the library.  ctypes calls release the GIL,
so the threaded loader (data/loader.py) scales across cores.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhostops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.remap_labels_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t, ctypes.c_uint8,
            ]
            lib.disparity_to_depth_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ]
            lib.disparity_to_depth_f32.restype = ctypes.c_size_t
            lib.normalize_u8_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            _lib = lib
        except OSError:
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def remap_labels(
    labels: np.ndarray, table: np.ndarray, ignore: int = 255
) -> Optional[np.ndarray]:
    """Native labelId->trainId remap; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    labels = np.ascontiguousarray(labels, dtype=np.uint8)
    table = np.ascontiguousarray(table, dtype=np.uint8)
    out = np.empty_like(labels)
    lib.remap_labels_u8(
        labels.ctypes.data, out.ctypes.data, labels.size,
        table.ctypes.data, table.size, ignore,
    )
    return out


def disparity_to_depth(
    disparity: np.ndarray,
    depth_max: float,
    bf: float,
    scale: float = 256.0,
    offset: float = 1.0,
    min_scaled: float = 1e-3,
    ignore_value: float = 0.0,
) -> Optional[Tuple[np.ndarray, int]]:
    """Native fused disparity->depth; returns (depth, n_valid) or None."""
    lib = _load()
    if lib is None:
        return None
    disparity = np.ascontiguousarray(disparity, dtype=np.uint16)
    depth = np.empty(disparity.shape, np.float32)
    n_valid = lib.disparity_to_depth_f32(
        disparity.ctypes.data, depth.ctypes.data, disparity.size,
        bf, depth_max, scale, offset, min_scaled, ignore_value,
    )
    return depth, int(n_valid)


def normalize_image(
    image: np.ndarray, mean, std
) -> Optional[np.ndarray]:
    """Native fused uint8 -> CLIP-normalized float32 (HWC); None if no lib."""
    lib = _load()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, dtype=np.uint8)
    if image.shape[-1] != 3:
        return None
    out = np.empty(image.shape, np.float32)
    mean = np.ascontiguousarray(mean, dtype=np.float32)
    inv_std = np.ascontiguousarray(1.0 / np.asarray(std, np.float32))
    lib.normalize_u8_f32(
        image.ctypes.data, out.ctypes.data, image.size // 3,
        mean.ctypes.data, inv_std.ctypes.data,
    )
    return out
