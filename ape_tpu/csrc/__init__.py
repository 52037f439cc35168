"""ctypes bindings for the native host ops, with transparent numpy fallback.

The shared library is built lazily on first import (g++ is in the image); if
the build fails, the pure-numpy implementations in ape_tpu.data.transforms /
ape_tpu.evaluation keep everything working.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger("ape_tpu")

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libhost_ops.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR], check=True, capture_output=True, timeout=120
        )
        return True
    except Exception as e:
        logger.warning(f"native host_ops build failed ({e}); using numpy fallback")
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        _lib = False
        return False
    try:
        lib = ctypes.CDLL(_SO)
        lib.rle_decode_counts.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.rle_encode_counts.restype = ctypes.c_int64
        lib.greedy_nms.restype = ctypes.c_int64
        _lib = lib
    except Exception as e:
        logger.warning(f"native host_ops load failed ({e})")
        _lib = False
    return _lib


def mask_iou_native(dets: np.ndarray, gts: np.ndarray, iscrowd=None):
    """dets (N, H, W) bool, gts (M, H, W) bool -> (N, M) float64, or None."""
    lib = get_lib()
    if not lib:
        return None
    n, h, w = dets.shape
    m = gts.shape[0]
    d = np.ascontiguousarray(dets.reshape(n, -1), np.uint8)
    g = np.ascontiguousarray(gts.reshape(m, -1), np.uint8)
    ic = np.ascontiguousarray(
        iscrowd if iscrowd is not None else np.zeros(m), np.uint8
    )
    out = np.zeros((n, m), np.float64)
    lib.mask_iou_matrix(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), m,
        ic.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h * w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def greedy_nms_native(boxes: np.ndarray, scores: np.ndarray, thresh: float):
    lib = get_lib()
    if not lib:
        return None
    n = len(boxes)
    b = np.ascontiguousarray(boxes, np.float32)
    s = np.ascontiguousarray(scores, np.float32)
    keep = np.zeros(n, np.uint8)
    lib.greedy_nms(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.c_float(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return keep.astype(bool)
