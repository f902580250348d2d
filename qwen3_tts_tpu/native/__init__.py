"""ctypes bindings for the native C++ runtime library.

Builds lazily via `make` on first use (or explicitly: make -C this dir).
All callers fall back to the pure-numpy implementations in io/gguf.py and
runtime/audio_io.py when the library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libqwen3_tts_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def load_library(build_if_missing: bool = True):
    """Return the ctypes library handle, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            if not (build_if_missing and _build()):
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        lib.q3t_dequant_f32.restype = ctypes.c_int
        lib.q3t_dequant_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32]
        lib.q3t_dequant_bf16.restype = ctypes.c_int
        lib.q3t_dequant_bf16.argtypes = lib.q3t_dequant_f32.argtypes
        lib.q3t_resample_linear.restype = ctypes.c_int64
        lib.q3t_resample_linear.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
        _lib = lib
        return _lib


def dequantize_f32(raw: np.ndarray, ggml_type: int,
                   n_elements: int) -> np.ndarray | None:
    """Multithreaded native dequant; None if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw.view(np.uint8).reshape(-1))
    out = np.empty(n_elements, np.float32)
    rc = lib.q3t_dequant_f32(
        raw.ctypes.data, raw.nbytes, ggml_type, n_elements,
        out.ctypes.data, 0)
    return out if rc == 0 else None


def dequantize_bf16(raw: np.ndarray, ggml_type: int,
                    n_elements: int) -> np.ndarray | None:
    """Dequantize straight to bf16 (uint16 bit pattern) — half the host
    memory traffic of the f32 path when the destination is a bf16 device
    buffer. None if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw.view(np.uint8).reshape(-1))
    out = np.empty(n_elements, np.uint16)
    rc = lib.q3t_dequant_bf16(
        raw.ctypes.data, raw.nbytes, ggml_type, n_elements,
        out.ctypes.data, 0)
    return out if rc == 0 else None


def resample_linear(x: np.ndarray, in_rate: int,
                    out_rate: int) -> np.ndarray | None:
    lib = load_library()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    cap = int(len(x) * out_rate / in_rate) + 2
    out = np.empty(cap, np.float32)
    n = lib.q3t_resample_linear(x.ctypes.data, len(x), in_rate,
                                out.ctypes.data, cap, out_rate)
    if n < 0:
        return None
    return out[:n]
