"""ctypes bindings for the native host data-path (runtime/haff_host.cpp).

Builds the shared library on first use (g++, no external deps) and falls
back to the Python/cv2 implementations in transforms.py when a compiler
is unavailable. The native path exists for production hosts where
per-frame Python preprocessing starves the TPU (SURVEY.md section 2.8
"hot transforms")."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _so_runs_here(so: str) -> bool:
    """Exercise the library once in a KILLABLE subprocess. A cached .so
    built with -march=native on a newer CPU dies with SIGILL — which
    would take the whole loader process down — so probe out-of-process
    before trusting it."""
    code = (
        "import ctypes, numpy as np\n"
        f"lib = ctypes.CDLL({so!r})\n"
        "lib.sam_preprocess_f32.restype = ctypes.c_int\n"
        "img = np.zeros((4, 4, 3), np.uint8)\n"
        "out = np.empty((8, 8, 3), np.float32)\n"
        "one = np.ones(3, np.float32)\n"
        "u8 = ctypes.POINTER(ctypes.c_uint8)\n"
        "f32 = ctypes.POINTER(ctypes.c_float)\n"
        "lib.sam_preprocess_f32(img.ctypes.data_as(u8), 4, 4, 8,\n"
        "    one.ctypes.data_as(f32), one.ctypes.data_as(f32),\n"
        "    out.ctypes.data_as(f32))\n")
    try:
        return subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            timeout=60).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_repo_root(), "runtime", "haff_host.cpp")
    so = os.path.join(_repo_root(), "runtime", "libhaffhost.so")
    try:
        fresh = (os.path.exists(so)
                 and os.path.getmtime(so) >= os.path.getmtime(src))
        if not fresh or not _so_runs_here(so):
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-fPIC", "-shared",
                     src, "-o", so],
                    check=True, capture_output=True)
            except subprocess.CalledProcessError:
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-shared", src, "-o", so],
                    check=True, capture_output=True)
            if not _so_runs_here(so):
                # -march=native binary illegal on this CPU: portable build
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-shared", src, "-o", so],
                    check=True, capture_output=True)
                if not _so_runs_here(so):
                    raise RuntimeError("native library probe failed")
        lib = ctypes.CDLL(so)
        lib.sam_preprocess_f32.restype = ctypes.c_int
        _LIB = lib
    except Exception as e:  # no compiler / load failure -> Python path
        print(f"native: falling back to Python path ({e})")
        _LIB = None
    return _LIB


def available() -> bool:
    return load_library() is not None


def sam_preprocess_native(image: np.ndarray, image_size: int,
                          mean, std) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Fused resize-longest-side + normalize + pad (C++)."""
    lib = load_library()
    assert lib is not None
    img = np.ascontiguousarray(image, np.uint8)
    h, w = img.shape[:2]
    # np.empty: the C++ writes every byte (content + pad memsets)
    out = np.empty((image_size, image_size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    packed = lib.sam_preprocess_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(h), ctypes.c_int(w), ctypes.c_int(image_size),
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out, (packed >> 16, packed & 0xFFFF)


def clip_preprocess_native(image: np.ndarray, image_size: int,
                           mean, std) -> np.ndarray:
    """Fused bicubic short-side resize + center crop + normalize (C++).

    PIL-exact resampling (antialias, window-clipped taps, separable
    passes with intermediate uint8 rounding) — matches the PIL parity
    path to 1 LSB of fixed-point rounding."""
    lib = load_library()
    assert lib is not None
    img = np.ascontiguousarray(image, np.uint8)
    h, w = img.shape[:2]
    out = np.empty((image_size, image_size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.clip_preprocess_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(h), ctypes.c_int(w), ctypes.c_int(image_size),
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def mask_to_canvas_native(mask: np.ndarray, resize_hw: Tuple[int, int],
                          image_size: int) -> np.ndarray:
    lib = load_library()
    assert lib is not None
    m = np.ascontiguousarray(mask, np.uint8)
    out = np.zeros((image_size, image_size), np.float32)
    lib.mask_to_canvas_f32(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(m.shape[0]), ctypes.c_int(m.shape[1]),
        ctypes.c_int(resize_hw[0]), ctypes.c_int(resize_hw[1]),
        ctypes.c_int(image_size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def fill_polygon_native(points: np.ndarray, shape: Tuple[int, int]
                        ) -> np.ndarray:
    """Even-odd fill of one polygon (contour fallback when cv2 absent)."""
    lib = load_library()
    assert lib is not None
    pts = np.ascontiguousarray(points.reshape(-1, 2), np.int32)
    out = np.zeros(shape, np.uint8)
    lib.fill_polygon_u8(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(pts.shape[0]), ctypes.c_int(shape[0]),
        ctypes.c_int(shape[1]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
