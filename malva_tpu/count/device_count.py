"""Device-side distinct k-mer counting (the KMC replacement's hot half).

The two-stage counter's cost at scale is canonicalize + pack + sort of
every window occurrence; this module runs that on device: a batch of
(B, ref_k) ASCII windows is canonicalized, 2-bit packed and row-sorted
(multi-key lax.sort) in one jitted step, returning the sorted packed rows
plus run-boundary mask and the count of valid lanes.  The host then
compacts runs and merges them into the accumulated distinct-count store
(cheap versus the sort).

Invalid/padding lanes sort last: when ref_k % 16 != 0 they are forced to
an all-ones packed row (impossible for a real k-mer — the tail word's low
bits are always zero); when ref_k % 16 == 0 every row pattern is
reachable, so a leading validity sort key is added instead (one extra
uint32 column through the sort).  Either way the first n_ok sorted rows
are exactly the valid ones.
"""

from __future__ import annotations

import numpy as np

from ..ops import seq
from ..ops.bloom_jax import pack2bit_jax


def _sort_valid_first(jax, jnp, packed, ok, w: int, need_flag: bool):
    """Sort rows (valid lanes first, then by packed words); returns
    (sorted_packed (B, w), boundary, n_ok)."""
    if need_flag:
        flag = (~ok).astype(jnp.uint32)
        cols = [flag] + [packed[:, j] for j in range(w)]
        out = jax.lax.sort(tuple(cols), num_keys=w + 1)
        s = jnp.stack(out[1:], axis=1)
    else:
        packed = jnp.where(ok[:, None], packed, jnp.uint32(0xFFFFFFFF))
        cols = [packed[:, j] for j in range(w)]
        out = jax.lax.sort(tuple(cols), num_keys=w)
        s = jnp.stack(out, axis=1)
    boundary = jnp.concatenate(
        [jnp.ones(1, bool), jnp.any(s[1:] != s[:-1], axis=1)]
    )
    return s, boundary, jnp.sum(ok.astype(jnp.int32))


def make_sort_count_step(ref_k: int, batch: int):
    import jax
    import jax.numpy as jnp

    w = (ref_k + 15) // 16
    need_flag = ref_k % 16 == 0

    @jax.jit
    def step(windows, n_valid):
        canon = seq.canonical_jax(windows)
        packed = pack2bit_jax(canon, ref_k)
        lane = jnp.arange(batch, dtype=jnp.int32)
        ok = lane < n_valid
        return _sort_valid_first(jax, jnp, packed, ok, w, need_flag)

    return step


def make_seq_sort_count_step(ref_k: int, chunk: int):
    """Sort-count step over a RAW sequence chunk: windows are built on
    device (k-merization included), so the host uploads 1 byte/base
    instead of ref_k bytes/base.  Reads are joined with a separator byte
    (0xFF) on the host; any window crossing a read boundary contains the
    separator and is dropped by the same pure-ACGT validity test KMC
    applies (SURVEY.md §7 semantics 6).

    step(seq (chunk+ref_k-1,) uint8, n_valid) -> (sorted_packed, boundary,
    n_ok) with invalid/padding lanes sorted last."""
    import jax
    import jax.numpy as jnp

    w = (ref_k + 15) // 16
    need_flag = ref_k % 16 == 0

    @jax.jit
    def step(seq_chunk, n_valid):
        cols = [
            jax.lax.dynamic_slice(seq_chunk, (j,), (chunk,)) for j in range(ref_k)
        ]
        win = jnp.stack(cols, axis=1)  # (chunk, ref_k)
        ok = jnp.ones(chunk, dtype=bool)
        for j in range(ref_k):
            c = cols[j]
            ok = ok & ((c == 65) | (c == 67) | (c == 71) | (c == 84))
        lane = jnp.arange(chunk, dtype=jnp.int32)
        ok = ok & (lane < n_valid)
        canon = seq.canonical_jax(win)
        packed = pack2bit_jax(canon, ref_k)
        return _sort_valid_first(jax, jnp, packed, ok, w, need_flag)

    return step


def device_seq_sorted_counts(step, seq: np.ndarray, chunk: int, ref_k: int):
    """Run one raw-sequence chunk through the seq step; returns
    (keys_u64, counts) in counter._merge_runs layout.  ``seq`` holds up to
    chunk + ref_k - 1 bytes; windows at positions >= len(seq)-ref_k+1 are
    masked out."""
    n_pos = seq.shape[0] - ref_k + 1
    w64 = (ref_k + 31) // 32
    if n_pos <= 0:
        return np.zeros((0, w64), dtype=np.uint64), np.zeros(0, dtype=np.int64)
    if seq.shape[0] < chunk + ref_k - 1:
        seq = np.concatenate(
            [seq, np.full(chunk + ref_k - 1 - seq.shape[0], 0xFF, dtype=np.uint8)]
        )
    s, boundary, n_ok = step(seq, n_pos)
    return _compact_runs(
        np.asarray(s), np.asarray(boundary), int(n_ok), ref_k
    )


def _compact_runs(s: np.ndarray, boundary: np.ndarray, n_ok: int, ref_k: int):
    """Shared tail of the device count steps: run-length compact the first
    n_ok sorted packed rows, repack to uint64 words."""
    w64 = (ref_k + 31) // 32
    starts = np.nonzero(boundary[:n_ok])[0]
    ends = np.concatenate([starts[1:], [n_ok]])
    keys32 = s[starts]
    counts = (ends - starts).astype(np.int64)
    m, w = keys32.shape
    out = np.zeros((m, w64), dtype=np.uint64)
    for j in range(w64):
        hi = keys32[:, 2 * j].astype(np.uint64)
        lo = (
            keys32[:, 2 * j + 1].astype(np.uint64)
            if 2 * j + 1 < w
            else np.zeros(m, np.uint64)
        )
        out[:, j] = (hi << np.uint64(32)) | lo
    return out, counts


def device_sorted_counts(step, windows: np.ndarray, batch: int, ref_k: int):
    """Run one padded batch through the step; return (keys_u64, counts)
    compatible with counter._merge_runs (uint64 word layout)."""
    n = windows.shape[0]
    w64 = (ref_k + 31) // 32
    if n == 0:
        return np.zeros((0, w64), dtype=np.uint64), np.zeros(0, dtype=np.int64)
    if n < batch:
        windows = np.concatenate(
            [windows, np.zeros((batch - n, ref_k), dtype=np.uint8)]
        )
    s, boundary, n_ok = step(windows, n)
    return _compact_runs(np.asarray(s), np.asarray(boundary), int(n_ok), ref_k)
