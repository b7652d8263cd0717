"""ctypes bindings for the native host kernels (native/host_kernels.cpp).

The library is built on demand with the repo's Makefile (g++); if no
compiler or library is available every caller falls back to the pure
Python implementation — results are identical either way (parity-tested).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_LIB = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")


def load() -> "ctypes.CDLL | None":
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("MALVA_NO_NATIVE"):
        return None
    nd = _native_dir()
    so = os.path.join(nd, "libmalva_host.so")
    src = os.path.join(nd, "host_kernels.cpp")
    try:
        if not os.path.exists(src):
            return None
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["make", "-C", nd], check=True, capture_output=True, timeout=120
            )
        lib = ctypes.CDLL(so)
        lib.malva_combs.restype = ctypes.c_int64
        lib.malva_combs.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.malva_bf_rank.restype = ctypes.c_uint64
        lib.malva_bf_rank.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        _LIB = lib
    except Exception as e:  # pragma: no cover - environment dependent
        print(f"[malva-tpu] native kernels unavailable ({e}); using Python path",
              file=sys.stderr)
        _LIB = None
    return _LIB


def bf_rank(words: np.ndarray) -> "tuple[np.ndarray, int] | None":
    """Exclusive popcount scan (rank) via the native kernel; None when the
    library is unavailable (caller uses the numpy path)."""
    lib = load()
    if lib is None:
        return None
    words = np.ascontiguousarray(words, dtype=np.uint32)
    rank = np.empty_like(words)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    total = lib.malva_bf_rank(
        words.ctypes.data_as(u32p), words.shape[0], rank.ctypes.data_as(u32p)
    )
    return rank, int(total)


class CombsNative:
    """Reusable buffers + call wrapper for malva_combs."""

    def __init__(self, lib):
        self.lib = lib
        self.cap_idx = 1 << 16
        self.cap_combs = 1 << 12
        self._alloc()

    def _alloc(self):
        self.out_idx = np.zeros(self.cap_idx, dtype=np.int32)
        self.out_off = np.zeros(self.cap_combs + 1, dtype=np.int64)

    def combs(self, pos, size, min_size, present, center: int, k: int):
        """Returns list[list[int]] of combinations, or None on overflow
        (caller should fall back to the Python path)."""
        i64p = ctypes.POINTER(ctypes.c_int64)
        while True:
            n = self.lib.malva_combs(
                pos.ctypes.data_as(i64p), size.ctypes.data_as(i64p),
                min_size.ctypes.data_as(i64p),
                present.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                len(pos), center, k,
                self.out_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                self.out_off.ctypes.data_as(i64p),
                self.cap_idx, self.cap_combs,
            )
            if n >= 0:
                off = self.out_off
                idx = self.out_idx
                return [idx[off[c] : off[c + 1]].tolist() for c in range(n)]
            if self.cap_idx > 1 << 26:
                return None  # genuinely explosive block: let Python handle
            self.cap_idx <<= 2
            self.cap_combs <<= 2
            self._alloc()
