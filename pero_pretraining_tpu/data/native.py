"""ctypes binding for the native collation library (native/collate.cpp).

Builds the shared library on first use (plain g++, no Python headers) and
exposes `pack_lines` / `stack_labels`. BatchCreator uses these when
available; the numpy path remains as fallback (and as the semantics
reference — tests assert both produce identical batches).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "native", "collate.cpp")
_LIB_PATH = os.path.join(_HERE, "_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17", src, "-ljpeg", "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native collate build failed: %s", e)
        return None
    return _LIB_PATH


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build()
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError as e:  # stale/foreign binary
            logger.warning("native collate load failed: %s", e)
            _build_failed = True
            return None
        lib.pack_lines.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.stack_labels.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_void_p,
        ]
        lib.jpeg_dims.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.jpeg_dims.restype = ctypes.c_int32
        lib.jpeg_decode_bgr.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
        lib.jpeg_decode_bgr.restype = ctypes.c_int32
        lib.jpeg_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def pack_lines(
    images: Sequence[np.ndarray],
    left_paddings: Sequence[int],
    target_width: int,
    sub: int,
    num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack lines into a zeroed (n, H, W, C) canvas + (n, S) int32 masks."""
    lib = get_lib()
    assert lib is not None
    n = len(images)
    height, _, channels = images[0].shape
    # np.zeros: calloc-backed — padding pages stay virtual-zero, untouched
    out_images = np.zeros((n, height, target_width, channels), dtype=np.uint8)
    out_masks = np.empty((n, target_width // sub), dtype=np.int32)

    contiguous = [np.ascontiguousarray(img) for img in images]
    ptrs = (ctypes.c_void_p * n)(*[img.ctypes.data for img in contiguous])
    widths = np.asarray([img.shape[1] for img in contiguous], dtype=np.int32)
    lps = np.asarray(left_paddings, dtype=np.int32)
    if num_threads <= 0:
        # the copy is memory-bandwidth-bound: threads only pay off once the
        # batch is tens of MB
        total_bytes = out_images.nbytes
        num_threads = 1 if total_bytes < 32 * 1024 * 1024 else min(8, os.cpu_count() or 1)

    lib.pack_lines(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        height,
        channels,
        target_width,
        sub,
        lps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_images.ctypes.data,
        out_masks.ctypes.data,
        num_threads,
    )
    return out_images, out_masks


def stack_labels(
    labels: Sequence[Optional[Sequence[int]]],
    left_paddings: Sequence[int],
    s: int,
    fill_value: int = -1,
) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    n = len(labels)
    out = np.full((n, s), fill_value, dtype=np.int32)
    arrays: List[np.ndarray] = [
        np.ascontiguousarray(np.asarray(l if l is not None else [], dtype=np.int32)) for l in labels
    ]
    ptrs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in arrays])
    lengths = np.asarray([len(a) for a in arrays], dtype=np.int32)
    lps = np.asarray(left_paddings, dtype=np.int32)
    lib.stack_labels(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        s,
        lps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data,
    )
    return out


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """Decode one JPEG to (H, W, 3) uint8 BGR; None on failure/unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    buf = np.frombuffer(data, dtype=np.uint8)
    if lib.jpeg_dims(buf.ctypes.data, len(data), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), dtype=np.uint8)
    if lib.jpeg_decode_bgr(buf.ctypes.data, len(data), out.ctypes.data, out.strides[0]) != 0:
        return None
    return out


def decode_jpeg_batch(datas: Sequence[bytes], num_threads: int = 0) -> List[Optional[np.ndarray]]:
    """Decode many JPEGs in the persistent no-GIL pool."""
    lib = get_lib()
    assert lib is not None
    n = len(datas)
    bufs = [np.frombuffer(d, dtype=np.uint8) for d in datas]
    outs: List[Optional[np.ndarray]] = []
    out_ptrs = (ctypes.c_void_p * n)()
    strides = np.empty(n, dtype=np.int64)
    for i, d in enumerate(datas):
        h = ctypes.c_int32()
        w = ctypes.c_int32()
        if lib.jpeg_dims(bufs[i].ctypes.data, len(d), ctypes.byref(h), ctypes.byref(w)) != 0:
            outs.append(None)
            out_ptrs[i] = None
            strides[i] = 0
            continue
        arr = np.empty((h.value, w.value, 3), dtype=np.uint8)
        outs.append(arr)
        out_ptrs[i] = arr.ctypes.data
        strides[i] = arr.strides[0]
    data_ptrs = (ctypes.c_void_p * n)(*[b.ctypes.data for b in bufs])
    lens = np.asarray([len(d) for d in datas], dtype=np.int64)
    oks = np.empty(n, dtype=np.int32)
    if num_threads <= 0:
        num_threads = min(8, os.cpu_count() or 1)
    lib.jpeg_decode_batch(
        ctypes.cast(data_ptrs, ctypes.POINTER(ctypes.c_void_p)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        ctypes.cast(out_ptrs, ctypes.POINTER(ctypes.c_void_p)),
        strides.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        oks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_threads,
    )
    return [out if ok == 0 else None for out, ok in zip(outs, oks)]
