"""ctypes bindings for the native data-IO runtime (dataio.cc).

Builds `libdataio.so` with g++ on first import (cached beside the source;
rebuilt when the source is newer). All entry points degrade gracefully:
callers check `available()` and fall back to the pure-Python paths in
datasets.py, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataio.cc")
_LIB_PATH = os.path.join(_HERE, "libdataio.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    needs_build = (not os.path.exists(_LIB_PATH)
                   or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC))
    if needs_build and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    c_char_p, i64, u8p, f32p = (ctypes.c_char_p, ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_uint8),
                                ctypes.POINTER(ctypes.c_float))
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.tfrecord_count.restype = i64
    lib.tfrecord_count.argtypes = [c_char_p]
    lib.tfrecord_index.restype = i64
    lib.tfrecord_index.argtypes = [c_char_p, i64p, i64]
    lib.tfrecord_read.restype = i64
    lib.tfrecord_read.argtypes = [c_char_p, i64, u8p, i64]
    lib.resize_area_f32.restype = None
    lib.resize_area_f32.argtypes = [f32p, i64, i64, i64, f32p, i64, i64]
    lib.resize_bilinear_f32.restype = None
    lib.resize_bilinear_f32.argtypes = [f32p, i64, i64, i64, f32p, i64, i64]
    lib.crop_resize_f32.restype = None
    lib.crop_resize_f32.argtypes = [f32p, i64, i64, i64, i64, i64, i64,
                                    i64, f32p, i64, i64]
    lib.crop_resize_bilinear_f32.restype = None
    lib.crop_resize_bilinear_f32.argtypes = [f32p, i64, i64, i64, i64, i64,
                                             i64, i64, f32p, i64, i64]
    lib.u8_to_f32_scaled.restype = None
    lib.u8_to_f32_scaled.argtypes = [u8p, i64, f32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def index_tfrecords(path: str) -> List[int]:
    """Byte offsets of every record in a TFRecord file."""
    lib = _load()
    assert lib is not None
    count = lib.tfrecord_count(path.encode())
    if count < 0:
        raise IOError(f"Cannot index TFRecord file {path}.")
    offsets = np.empty(count, np.int64)
    got = lib.tfrecord_index(
        path.encode(), offsets.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)), count)
    return offsets[:got].tolist()


_read_local = __import__("threading").local()


def read_record(path: str, offset: int, max_size: int = 64 << 20) -> bytes:
    """Read one record. The scratch buffer is thread-local and reused —
    this sits on the per-example decode hot path, and a fresh multi-MB
    np.empty per call would mmap/munmap at the pipeline rate."""
    lib = _load()
    assert lib is not None
    buf = getattr(_read_local, "buf", None)
    if buf is None:
        buf = _read_local.buf = np.empty(1 << 20, np.uint8)
    while True:
        got = lib.tfrecord_read(
            path.encode(), offset,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf))
        if got >= 0:
            return buf[:got].tobytes()
        if got != -2:
            # -1: genuine IO error (missing file, bad offset, truncated
            # record) — fail immediately, don't grow-and-retry.
            raise IOError(f"IO error reading record at {path}:{offset}.")
        if len(buf) >= max_size:
            raise IOError(
                f"Record at {path}:{offset} exceeds max_size={max_size}.")
        # -2: record larger than the scratch buffer — grow and retry.
        buf = _read_local.buf = np.empty(len(buf) * 8, np.uint8)


def resize_area(image: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Box/area resize of f32 HWC image (native datasets._resize_area)."""
    lib = _load()
    assert lib is not None
    image = np.ascontiguousarray(image, np.float32)
    h, w, c = image.shape
    oh, ow = size
    out = np.empty((oh, ow, c), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.resize_area_f32(image.ctypes.data_as(f32p), h, w, c,
                        out.ctypes.data_as(f32p), oh, ow)
    return out


def resize_bilinear(image: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """TF1 legacy bilinear resize of f32 HWC image (align_corners=False;
    matches tf.image.resize_images — reference datasets.py:474-476)."""
    lib = _load()
    assert lib is not None
    image = np.ascontiguousarray(image, np.float32)
    h, w, c = image.shape
    oh, ow = size
    out = np.empty((oh, ow, c), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.resize_bilinear_f32(image.ctypes.data_as(f32p), h, w, c,
                            out.ctypes.data_as(f32p), oh, ow)
    return out


def crop_resize(image: np.ndarray, top: int, left: int, ch: int, cw: int,
                size: Tuple[int, int]) -> np.ndarray:
    lib = _load()
    assert lib is not None
    image = np.ascontiguousarray(image, np.float32)
    h, w, c = image.shape
    oh, ow = size
    out = np.empty((oh, ow, c), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.crop_resize_f32(image.ctypes.data_as(f32p), h, w, c,
                        top, left, ch, cw,
                        out.ctypes.data_as(f32p), oh, ow)
    return out


def crop_resize_bilinear(image: np.ndarray, top: int, left: int, ch: int,
                         cw: int, size: Tuple[int, int]) -> np.ndarray:
    """Fused crop + TF1-legacy bilinear resize (no intermediate copy)."""
    lib = _load()
    assert lib is not None
    image = np.ascontiguousarray(image, np.float32)
    h, w, c = image.shape
    oh, ow = size
    out = np.empty((oh, ow, c), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.crop_resize_bilinear_f32(image.ctypes.data_as(f32p), h, w, c,
                                 top, left, ch, cw,
                                 out.ctypes.data_as(f32p), oh, ow)
    return out


def u8_to_f32(raw: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    raw = np.ascontiguousarray(raw, np.uint8)
    out = np.empty(raw.shape, np.float32)
    lib.u8_to_f32_scaled(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), raw.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
