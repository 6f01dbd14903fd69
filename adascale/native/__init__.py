"""Native (C++) host-side rasterizer for the synth data pipeline.

Builds ``synth_render.cpp`` on demand with g++ (-O3, shared) into a
per-source-hash cached ``.so`` and exposes it through ctypes. The compute
path of the framework is JAX/XLA/Pallas on the TPU; this library is the
native *runtime* piece — the data-loader hot loop — mirroring how the
reference leans on vkit/OpenCV C++ internals for page synthesis
(reference dataset/adaptive_scaling.py:180-189 drives the vkit pipeline,
whose rasterization is OpenCV C++).

Usage: ``lib = load_library()`` (returns None and remembers failure if no
compiler is available, so callers can fall back to the pure-python path).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "synth_render.cpp")
_CACHE_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "adascale_native",
)

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build(src: str, out_so: str) -> None:
    os.makedirs(os.path.dirname(out_so), exist_ok=True)
    # Build into a temp name then rename: concurrent processes (data-pool
    # workers) race on first build; rename is atomic.
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(out_so))
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             src, "-o", tmp],
            check=True,
            capture_output=True,
            text=True,
            timeout=120,
        )
        os.replace(tmp, out_so)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_library() -> Optional[ctypes.CDLL]:
    """The compiled library, building it if needed; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so_path = os.path.join(_CACHE_DIR, f"synth_render_{digest}.so")
        if not os.path.exists(so_path):
            _build(_SRC, so_path)
        lib = ctypes.CDLL(so_path)
    except (OSError, subprocess.SubprocessError):
        _load_failed = True
        return None

    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    c_int = ctypes.c_int
    lib.asr_execute.argtypes = [
        u8p, c_int, c_int, i32p, i32p, u8p, f32p, c_int, u8p, c_int, c_int,
    ]
    lib.asr_execute.restype = None
    lib.asr_render_labels.argtypes = [
        u8p, f32p, f32p, c_int, c_int, f32p, f32p, f32p, f32p, c_int,
    ]
    lib.asr_render_labels.restype = None
    _lib = lib
    return _lib


def execute_draw_buffer(
    image: np.ndarray,  # (H, W, 3) uint8, modified in place
    types: np.ndarray,  # (N,) int32: 0 glyph, 1 line
    aux: np.ndarray,  # (N,) int32: tile index / thickness
    inks: np.ndarray,  # (N,) uint8
    geo: np.ndarray,  # (N, 8) float32
    atlas: np.ndarray,  # (T, tile, tile) uint8
) -> None:
    lib = load_library()
    assert lib is not None, "native renderer unavailable"
    n = len(types)
    if n == 0:
        return
    h, w = image.shape[:2]
    lib.asr_execute(
        image,
        h,
        w,
        np.ascontiguousarray(types, np.int32),
        np.ascontiguousarray(aux, np.int32),
        np.ascontiguousarray(inks, np.uint8),
        np.ascontiguousarray(geo, np.float32),
        n,
        np.ascontiguousarray(atlas, np.uint8),
        atlas.shape[0],
        atlas.shape[1],
    )


def render_labels_native(
    shape: tuple,
    quads: np.ndarray,  # (N, 4, 2) float32, downsampled-crop coords
    heights: np.ndarray,  # (N,) float32
    centers: np.ndarray,  # (N, 2) float32 (cx, cy)
    sigmas: np.ndarray,  # (N,) float32
):
    lib = load_library()
    assert lib is not None, "native renderer unavailable"
    h, w = shape
    mask = np.zeros((h, w), np.uint8)
    height_map = np.zeros((h, w), np.float32)
    gaussian = np.zeros((h, w), np.float32)
    n = len(quads)
    if n:
        lib.asr_render_labels(
            mask,
            height_map,
            gaussian,
            h,
            w,
            np.ascontiguousarray(quads.reshape(n, 8), np.float32),
            np.ascontiguousarray(heights, np.float32),
            np.ascontiguousarray(centers, np.float32),
            np.ascontiguousarray(sigmas, np.float32),
            n,
        )
    return mask, height_map, gaussian


def available() -> bool:
    return load_library() is not None
