"""Native (C++) data-path backend, ctypes-bound.

The reference's data loader is native under the hood (cv2's C++ resize,
nibabel's C IO); this package is the framework's own native layer for
the host-side hot path — cv2-INTER_CUBIC-parity bicubic resize and the
dihedral-augmentation primitives the training sampler uses.

The shared library auto-builds from ``image_ops.cpp`` with g++ on first
import (cached next to the source); everything degrades gracefully to
the numpy/cv2 path when no toolchain is available. Select with
``RDST_TPU_NATIVE=1`` (data ops prefer the native backend) or ``=0``
(never). Parity vs cv2 is gated in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "image_ops.cpp")
_LIB = os.path.join(_DIR, "libimage_ops.so")

_STAMP = _LIB + ".buildinfo"

_lib = None
_failed = False  # a failed build is cached: never re-spawn g++ per call


def _host_stamp() -> str:
    """Identify the build host well enough to catch -march=native
    mismatches: a checkout shared across heterogeneous machines must
    rebuild instead of loading an .so with illegal instructions."""
    import platform

    tag = f"{platform.machine()}"
    try:  # ISA feature flags (Linux); absence degrades to machine arch
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    tag += ":" + ",".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:  # pragma: no cover
        pass
    return tag


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _LIB],
            check=True, capture_output=True, timeout=120)
    except Exception as e:  # pragma: no cover - toolchain-dependent
        warnings.warn(f"rdst_tpu.native: build failed ({e}); "
                      "falling back to the numpy/cv2 data path")
        return False
    try:  # the .so is good even if the stamp can't be written (e.g.
        # read-only checkout) — only the rebuild cache degrades then
        with open(_STAMP, "w") as f:
            f.write(_host_stamp())
    except OSError as e:  # pragma: no cover - fs-dependent
        warnings.warn(f"rdst_tpu.native: arch stamp not written ({e}); "
                      "the library will rebuild next process")
    return True


def _cached_build_ok() -> bool:
    if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        return False
    try:  # arch stamp must match this host (see _host_stamp)
        with open(_STAMP) as f:
            return f.read() == _host_stamp()
    except OSError:
        return False  # pre-stamp builds rebuild once


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _failed
    if _lib is not None:
        return _lib
    if _failed or os.environ.get("RDST_TPU_NATIVE", "") == "0":
        return None
    if not _cached_build_ok():
        if not _build():
            _failed = True
            return None
    lib = ctypes.CDLL(_LIB)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.rdst_resize_bicubic_f32.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, ctypes.c_int]
    for name in ("rdst_transpose_f32", "rdst_flipud_f32", "rdst_fliplr_f32"):
        getattr(lib, name).argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def _as_hwc_f32(img: np.ndarray) -> np.ndarray:
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    return np.ascontiguousarray(img, np.float32), squeeze


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bicubic(img: np.ndarray, size) -> np.ndarray:
    """cv2.INTER_CUBIC-parity bicubic resize (float32, HW or HWC)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native backend unavailable (build failed or "
                           "RDST_TPU_NATIVE=0); use rdst_tpu.data.ops")
    src, squeeze = _as_hwc_f32(img)
    h, w, c = src.shape
    dh, dw = int(size[0]), int(size[1])
    dst = np.empty((dh, dw, c), np.float32)
    lib.rdst_resize_bicubic_f32(_ptr(src), h, w, c, _ptr(dst), dh, dw)
    return dst[:, :, 0] if squeeze else dst


def _unary(name: str, img: np.ndarray, swap: bool) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native backend unavailable (build failed or "
                           "RDST_TPU_NATIVE=0); use rdst_tpu.data.ops")
    src, squeeze = _as_hwc_f32(img)
    h, w, c = src.shape
    dst = np.empty((w, h, c) if swap else (h, w, c), np.float32)
    getattr(lib, name)(_ptr(src), h, w, c, _ptr(dst))
    return dst[:, :, 0] if squeeze else dst


def transpose(img):
    return _unary("rdst_transpose_f32", img, swap=True)


def flipud(img):
    return _unary("rdst_flipud_f32", img, swap=False)


def fliplr(img):
    return _unary("rdst_fliplr_f32", img, swap=False)

