"""Device exact-map layout: 4-way bucketized hash table, one gather/query.

TPU gathers cost the same per row whether the row is 4 or 48 bytes
(measured on v5e), so the exact reference-allele map is laid out as
buckets of 4 candidate keys; a query gathers one bucket row and compares
all four slots on the VPU.  The bucket index reuses the XXH3 hash of the
canonical k-mer that the call step already computes for the Bloom probe
(bucket = (lo ^ hi) & mask), so no extra hashing happens on device.

Build is host-side; if any bucket overflows 4 keys the table doubles and
rebuilds (load factor starts at <= 0.25, overflow is rare).
"""

from __future__ import annotations

import numpy as np

from ..ops.xxh3 import xxh3_64
from .device import pack2bit_u32_np

SLOTS = 4


class BucketTable:
    def __init__(self, keys: list[bytes], k: int, min_buckets: int = 1):
        self.k = k
        self.w = (k + 15) // 16
        if keys:
            arr = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, self.k)
            packed = pack2bit_u32_np(arr, self.k)
            h = xxh3_64(arr)
        else:
            packed = np.zeros((0, self.w), dtype=np.uint32)
            h = np.zeros(0, dtype=np.uint64)
        self._build(packed, h, keys, min_buckets)

    @classmethod
    def from_packed(cls, packed: np.ndarray, h: np.ndarray, k: int,
                    min_buckets: int = 1) -> "BucketTable":
        """Build straight from packed keys + hashes (no byte-key list;
        set_vals_from/write_back are unavailable — bench/bulk use)."""
        self = cls.__new__(cls)
        self.k = k
        self.w = (k + 15) // 16
        self._build(packed, h, None, min_buckets)
        return self

    def _build(self, packed, h, keys, min_buckets: int) -> None:
        m = packed.shape[0]
        n_buckets = max(1, min_buckets)
        while n_buckets < max(1, m):  # load <= 0.25 at start
            n_buckets <<= 1
        lo = (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (h >> np.uint64(32)).astype(np.uint32)
        while not self._try_build(packed, lo ^ hi, keys, n_buckets):
            n_buckets <<= 1

    def _try_build(self, packed, bmix, keys, n_buckets: int) -> bool:
        w = self.w
        m = packed.shape[0]
        buckets = bmix & np.uint32(n_buckets - 1)
        # stable sort by bucket; slot = position within the bucket run
        order = np.argsort(buckets, kind="stable")
        sb = buckets[order].astype(np.int64)
        if m:
            new_run = np.concatenate([[True], sb[1:] != sb[:-1]])
            run_start = np.maximum.accumulate(np.where(new_run, np.arange(m), 0))
            slot = np.arange(m) - run_start
            if int(slot.max(initial=0)) >= SLOTS:
                return False
        else:
            slot = np.zeros(0, dtype=np.int64)
        bucket_keys = np.full((n_buckets, SLOTS, w), 0xFFFFFFFF, dtype=np.uint32)
        bucket_keys[sb, slot] = packed[order]
        self.n_buckets = n_buckets
        self.bucket_keys = bucket_keys.reshape(n_buckets, SLOTS * w)
        self.vals = np.zeros(n_buckets * SLOTS, dtype=np.uint32)
        if keys is None:
            self.slot_keys = None
        else:
            slot_keys: list = [None] * (n_buckets * SLOTS)
            flat = sb * SLOTS + slot
            for i, pos in zip(order.tolist(), flat.tolist()):
                slot_keys[pos] = keys[i]
            self.slot_keys = slot_keys
        return True

    def set_vals_from(self, kmers: dict) -> None:
        for i, kb in enumerate(self.slot_keys):
            if kb is not None:
                self.vals[i] = np.uint32(kmers[kb])

    def write_back(self, vals: np.ndarray, kmers: dict) -> None:
        for i, kb in enumerate(self.slot_keys):
            if kb is not None:
                kmers[kb] = int(vals[i])


def probe_bucket_table(bucket_keys, n_buckets: int, w: int, packed, hash_hi, hash_lo,
                       bucket=None):
    """Device-side probe: returns (flat_slot_index int32, found bool).
    Pass either the XXH3 (hi, lo) pair or the precomputed ``bucket``."""
    import jax.numpy as jnp

    if bucket is None:
        bucket = (hash_lo ^ hash_hi) & jnp.uint32(n_buckets - 1)
    bucket = bucket.astype(jnp.int32)
    rows = jnp.take(bucket_keys, bucket, axis=0)  # (B, SLOTS*w)
    found = jnp.zeros(packed.shape[0], dtype=bool)
    slot = jnp.zeros(packed.shape[0], dtype=jnp.int32)
    for s in range(SLOTS):
        eq = jnp.ones(packed.shape[0], dtype=bool)
        for j in range(w):
            eq = eq & (rows[:, s * w + j] == packed[:, j])
        slot = jnp.where(eq & ~found, bucket * SLOTS + s, slot)
        found = found | eq
    return slot, found
