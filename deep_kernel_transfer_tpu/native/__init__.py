"""Native (C++) host data-path: decode + transform straight to float32.

Builds `libdkt_data.so` from src/image_pipeline.cc on first use (g++,
-O3 -march=native, linked against libjpeg/libpng) and exposes it through
ctypes. Falls back cleanly when the toolchain or image libraries are
missing — callers should check `available()` and use the PIL pipeline
otherwise (deep_kernel_transfer_tpu/data/transforms.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "image_pipeline.cc")
_LIB_PATH = os.path.join(_HERE, "libdkt_data.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    # Compile to a per-process temp path, then atomically rename into
    # place: concurrent processes (pytest + TPU subprocesses) may rebuild
    # a stale .so simultaneously, and g++ writing the target in place would
    # let another process dlopen a half-written file. rename() is atomic on
    # POSIX, so every reader sees either the old or the new complete file.
    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
           "-o", tmp, _SRC, "-ljpeg", "-lpng"]
    try:
        result = subprocess.run(cmd, capture_output=True, text=True,
                                timeout=120)
        if result.returncode != 0:
            print(f"[native] build failed:\n{result.stderr}")
            return False
        os.replace(tmp, _LIB_PATH)
        return True
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        fp = ctypes.POINTER(ctypes.c_float)
        lib.dkt_image_size.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int),
                                       ctypes.POINTER(ctypes.c_int)]
        lib.dkt_image_size.restype = ctypes.c_int
        lib.dkt_load_eval.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                      ctypes.c_int, fp]
        lib.dkt_load_eval.restype = ctypes.c_int
        lib.dkt_load_aug.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.c_float, ctypes.c_float,
                                     ctypes.c_float, ctypes.c_int, fp]
        lib.dkt_load_aug.restype = ctypes.c_int
        lib.dkt_load_eval_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, fp]
        lib.dkt_load_eval_batch.restype = ctypes.c_int
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        lib.dkt_load_canvas.argtypes = [ctypes.c_char_p, ctypes.c_int, u8p]
        lib.dkt_load_canvas.restype = ctypes.c_int
        lib.dkt_load_canvas_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p]
        lib.dkt_load_canvas_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def image_size(path: str) -> tuple[int, int]:
    lib = _load()
    assert lib is not None
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.dkt_image_size(path.encode(), ctypes.byref(w), ctypes.byref(h)):
        raise IOError(f"native decode failed: {path}")
    return w.value, h.value


def load_eval(path: str, size: int, normalize: bool = True) -> np.ndarray:
    """Decode + Scale(1.15x) + CenterCrop + normalize -> [size, size, 3]."""
    lib = _load()
    assert lib is not None
    out = np.empty((size, size, 3), np.float32)
    rc = lib.dkt_load_eval(path.encode(), size, int(normalize),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc:
        raise IOError(f"native decode failed: {path}")
    return out


def load_eval_batch(paths: list[str], size: int, normalize: bool = True,
                    n_threads: int = 0) -> np.ndarray:
    """Threaded batch of `load_eval`: [n, size, size, 3] float32.

    n_threads <= 0 uses hardware_concurrency; the C++ pool shares nothing
    but an atomic work counter, so results are deterministic and identical
    to a per-image loop regardless of thread count."""
    lib = _load()
    assert lib is not None
    n = len(paths)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    out = np.empty((n, size, size, 3), np.float32)
    rc = lib.dkt_load_eval_batch(
        arr, n, size, int(normalize), int(n_threads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc:
        raise IOError(f"native decode failed: {paths[rc - 1]}")
    return out


def load_canvas(path: str, size: int) -> np.ndarray:
    """Full image resampled to a square canvas (no crop): [size, size, 3]
    uint8 — the DeviceDataset(canvas=True) staging format."""
    lib = _load()
    assert lib is not None
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.dkt_load_canvas(path.encode(), size,
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc:
        raise IOError(f"native decode failed: {path}")
    return out


def load_canvas_batch(paths: list[str], size: int,
                      n_threads: int = 0) -> np.ndarray:
    """Threaded batch of `load_canvas`: [n, size, size, 3] uint8.
    Deterministic and identical to the per-image loop (see
    load_eval_batch)."""
    lib = _load()
    assert lib is not None
    n = len(paths)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    out = np.empty((n, size, size, 3), np.uint8)
    rc = lib.dkt_load_canvas_batch(
        arr, n, size, int(n_threads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc:
        raise IOError(f"native decode failed: {paths[rc - 1]}")
    return out


def load_aug(path: str, size: int, crop_box, jitter_factors, flip: bool,
             normalize: bool = True) -> np.ndarray:
    """Aug pipeline; crop_box = (left, top, w, h) or None for the
    deterministic fallback; jitter_factors = (brightness, contrast, color)."""
    lib = _load()
    assert lib is not None
    left, top, cw, ch = crop_box if crop_box is not None else (0, 0, -1, -1)
    bright, contrast, color = jitter_factors
    out = np.empty((size, size, 3), np.float32)
    rc = lib.dkt_load_aug(path.encode(), size, int(normalize), left, top, cw,
                          ch, bright, contrast, color, int(flip),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc:
        raise IOError(f"native decode failed: {path}")
    return out
