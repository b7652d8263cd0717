"""Exact canonical k-mer -> count map for reference-allele k-mers.

Mirrors the reference KMAP (reference: kmap.hpp:46-132): keys are the
canonical form of the k-mer *as a C string*, i.e. truncated at the first
NUL byte (which appears when the canonical form is a reverse complement
containing non-ACGTN characters).  ``add_key`` resets the value to 0;
``increment`` only touches existing keys and wraps mod 2^32;
``get_count`` reinterprets the stored value as a signed int (upstream
stores into ``int``).
"""

from __future__ import annotations

import numpy as np

from ..ops.seq import canonical, truncate_at_nul


def _keys(kmers: np.ndarray) -> list[bytes]:
    ck = truncate_at_nul(canonical(kmers))
    return [row.tobytes().rstrip(b"\x00") for row in ck]


class KMAP:
    def __init__(self):
        self.kmers: dict[bytes, int] = {}

    def add_keys(self, kmers: np.ndarray) -> None:
        for key in _keys(kmers):
            self.kmers[key] = 0

    def increment_keys(self, kmers: np.ndarray, counters: np.ndarray) -> None:
        d = self.kmers
        for key, c in zip(_keys(kmers), counters.tolist()):
            v = d.get(key)
            if v is not None:
                d[key] = (v + int(c)) & 0xFFFFFFFF

    def get_counts(self, kmers: np.ndarray) -> np.ndarray:
        d = self.kmers
        out = np.zeros(len(kmers), dtype=np.int64)
        for i, key in enumerate(_keys(kmers)):
            v = d.get(key)
            if v is not None:
                # stored as uint32, read back as signed int (kmap.hpp:119-121)
                out[i] = v - (1 << 32) if v >= (1 << 31) else v
        return out

    def __len__(self) -> int:
        return len(self.kmers)

    # -- serialization -----------------------------------------------------
    def state(self) -> dict:
        keys = list(self.kmers.keys())
        maxlen = max((len(k) for k in keys), default=0)
        arr = np.zeros((len(keys), maxlen), dtype=np.uint8)
        for i, k in enumerate(keys):
            arr[i, : len(k)] = np.frombuffer(k, dtype=np.uint8)
        vals = np.fromiter(self.kmers.values(), dtype=np.uint32, count=len(keys))
        return {"keys": arr, "vals": vals}

    @classmethod
    def from_state(cls, st: dict, prefix: str = "") -> "KMAP":
        km = cls()
        arr = np.asarray(st[prefix + "keys"], dtype=np.uint8)
        vals = np.asarray(st[prefix + "vals"], dtype=np.uint32)
        for i in range(arr.shape[0]):
            km.kmers[arr[i].tobytes().rstrip(b"\x00")] = int(vals[i])
        return km
