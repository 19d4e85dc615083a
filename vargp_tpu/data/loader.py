"""ctypes bridge to the native C++ loader (native/loader.cpp).

Builds libvargp_loader.so on demand with make/g++; every entry point has a
pure-numpy fallback so the framework works without a toolchain.  Used by
data.core.batch_iter (shuffle-gather) and data.mnist (IDX parsing).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_NAME = "libvargp_loader.so"
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        path = os.path.abspath(os.path.join(_NATIVE_DIR, _LIB_NAME))
        if not os.path.exists(path):
            if os.environ.get("VARGP_TPU_NO_NATIVE"):
                _lib_failed = True
                return None
            try:
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(path)
            lib.gather_rows_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            lib.gather_rows_i32.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ]
            lib.parse_idx_images_f32.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ]
            lib.parse_idx_images_f32.restype = ctypes.c_int
            lib.parse_idx_labels_i32.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ]
            lib.parse_idx_labels_i32.restype = ctypes.c_int
            _lib = lib
        except OSError:
            _lib_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def native_gather(data: np.ndarray, targets: np.ndarray, order: np.ndarray):
    """Fused shuffle-gather; falls back to numpy fancy indexing."""
    lib = _load()
    if (
        lib is None
        or data.dtype != np.float32
        or not data.flags["C_CONTIGUOUS"]
    ):
        return data[order], targets[order]
    idx = np.ascontiguousarray(order, dtype=np.int64)
    out_x = np.empty((idx.shape[0], data.shape[1]), dtype=np.float32)
    lib.gather_rows_f32(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        data.shape[0], data.shape[1],
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        idx.shape[0],
        out_x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        0,
    )
    t32 = np.ascontiguousarray(targets, dtype=np.int32)
    out_y = np.empty((idx.shape[0],), dtype=np.int32)
    lib.gather_rows_i32(
        t32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        idx.shape[0],
        out_y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out_x, out_y


def native_parse_idx_images(path: str) -> np.ndarray | None:
    """Parse an uncompressed IDX image file to (N, rows*cols) float32/255."""
    lib = _load()
    if lib is None:
        return None
    # read header for capacity
    with open(path, "rb") as f:
        header = f.read(16)
    if len(header) < 16 or header[2] != 0x08 or header[3] != 3:
        return None
    n = int.from_bytes(header[4:8], "big")
    r = int.from_bytes(header[8:12], "big")
    c = int.from_bytes(header[12:16], "big")
    out = np.empty((n * r * c,), dtype=np.float32)
    dims = (ctypes.c_int64 * 3)()
    rc = lib.parse_idx_images_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.shape[0], dims,
    )
    if rc != 0:
        return None
    return out.reshape(n, r * c)


def native_parse_idx_labels(path: str) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        header = f.read(8)
    if len(header) < 8 or header[2] != 0x08 or header[3] != 1:
        return None
    n = int.from_bytes(header[4:8], "big")
    out = np.empty((n,), dtype=np.int32)
    count = ctypes.c_int64()
    rc = lib.parse_idx_labels_i32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.shape[0], ctypes.byref(count),
    )
    if rc != 0:
        return None
    return out
