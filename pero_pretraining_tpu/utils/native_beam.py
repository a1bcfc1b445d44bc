"""ctypes binding for the native CTC prefix beam search (native/beam_decode.cpp).

Builds the shared library on first use (plain g++, no Python headers) and
exposes `decode_batch_native`, a drop-in for the Python
`utils/ctc_decode.decode_batch` (which remains the semantics oracle — tests
assert both produce identical transcriptions). The native path fans the
independent per-line searches out over a no-GIL thread pool and runs the
stupid-backoff LM walk in C++, turning the quality decode path from
~0.5-1 s/line of Python into milliseconds.

The fitted CharNgramLM is exported once per decode session as a flat int64
blob (contexts and chars as unicode code points) and handed to the library;
`NativeLm` caches the handle keyed by the LM object's identity.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

from pero_pretraining_tpu.utils.lm import CharNgramLM
from pero_pretraining_tpu.utils.text import BLANK_ID, Charset

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "native", "beam_decode.cpp")
_LIB_PATH = os.path.join(_HERE, "_native_beam.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17", src, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native beam decoder build failed: %s", e)
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
            logger.warning("native beam decoder load failed: %s", e)
            _build_failed = True
            return None
        lib.lm_create.argtypes = [
            ctypes.c_int32, ctypes.c_double, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.lm_create.restype = ctypes.c_void_p
        lib.lm_free.argtypes = [ctypes.c_void_p]
        lib.beam_decode_batch.argtypes = [
            ctypes.c_void_p,                      # logp (packed float32)
            ctypes.POINTER(ctypes.c_int64),       # offsets (n+1)
            ctypes.c_int32, ctypes.c_int32,       # n, C
            ctypes.c_int32, ctypes.c_int32,       # blank, beam_width
            ctypes.c_int32, ctypes.c_double,      # prune_chars, prune_logp
            ctypes.c_void_p,                      # lm handle (nullable)
            ctypes.c_double, ctypes.c_double,     # lm_weight, insertion_bonus
            ctypes.c_void_p,                      # id_to_char (uint32*, nullable)
            ctypes.c_void_p, ctypes.c_int32,      # out_ids, out_cap
            ctypes.c_void_p, ctypes.c_int32,      # out_lens, num_threads
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _lm_blob(lm: CharNgramLM) -> np.ndarray:
    """Flatten the fitted LM: per context — len, codes..., n, (code, count)..."""
    parts: List[int] = []
    for context, bucket in lm.counts.items():
        parts.append(len(context))
        parts.extend(ord(ch) for ch in context)
        parts.append(len(bucket))
        for ch, count in bucket.items():
            parts.append(ord(ch))
            parts.append(count)
    return np.asarray(parts, dtype=np.int64)


class NativeLm:
    """Owns the C-side LM handle for one fitted CharNgramLM."""

    def __init__(self, lm: CharNgramLM):
        lib = get_lib()
        assert lib is not None
        blob = _lm_blob(lm)
        self._lib = lib
        self.handle = lib.lm_create(
            lm.order, lm.backoff_factor, len(lm.vocab),
            blob.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(blob),
        )
        if not self.handle:
            raise RuntimeError(f"lm_create rejected order={lm.order} (> 16?)")

    def __del__(self):
        handle = getattr(self, "handle", None)
        if handle:
            self._lib.lm_free(handle)
            self.handle = None


_lm_cache_lock = threading.Lock()
_lm_cache: dict = {}  # id(lm) -> (weakref-less) NativeLm; bounded by usage pattern


def _native_lm(lm: Optional[CharNgramLM]) -> Optional[NativeLm]:
    if lm is None:
        return None
    with _lm_cache_lock:
        cached = _lm_cache.get(id(lm))
        if cached is None or cached[0] is not lm:
            cached = (lm, NativeLm(lm))
            _lm_cache.clear()  # one live LM at a time is the usage pattern
            _lm_cache[id(lm)] = cached
        return cached[1]


def decode_batch_native(
    log_probs: np.ndarray,
    frame_masks: np.ndarray,
    charset: Charset,
    beam_width: int = 16,
    lm: Optional[CharNgramLM] = None,
    lm_weight: float = 0.5,
    insertion_bonus: float = 0.0,
    prune_chars: int = 16,
    prune_logp: float = -12.0,
    num_threads: int = 0,
) -> List[str]:
    """Native equivalent of utils/ctc_decode.decode_batch (same signature +
    threading knob). Raises RuntimeError if the library is unavailable —
    callers gate on available()."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native beam decoder unavailable")
    log_probs = np.ascontiguousarray(np.asarray(log_probs, dtype=np.float32))
    masks = np.asarray(frame_masks).astype(bool)
    n, s, c = log_probs.shape

    # compact real-content frames into one ragged packed buffer
    lens = masks.sum(axis=1).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    packed = np.empty((int(offsets[-1]), c), dtype=np.float32)
    for i in range(n):
        packed[offsets[i] : offsets[i + 1]] = log_probs[i][masks[i]]

    id_to_char = np.zeros(c, dtype=np.uint32)
    for i in range(1, c):
        if i - 1 < len(charset.chars):
            id_to_char[i] = ord(charset.chars[i - 1])

    nlm = _native_lm(lm)
    out_cap = max(int(lens.max()) if n else 1, 1)
    out_ids = np.zeros((n, out_cap), dtype=np.int32)
    out_lens = np.zeros(n, dtype=np.int32)
    if num_threads <= 0:
        num_threads = min(8, os.cpu_count() or 1)
    lib.beam_decode_batch(
        packed.ctypes.data,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, c, BLANK_ID, beam_width, prune_chars, prune_logp,
        nlm.handle if nlm is not None else None,
        lm_weight, insertion_bonus,
        id_to_char.ctypes.data,
        out_ids.ctypes.data, out_cap,
        out_lens.ctypes.data, num_threads,
    )
    return [charset.decode(out_ids[i, : min(out_lens[i], out_cap)].tolist()) for i in range(n)]
