"""Device-resident index + the fused call-phase query/update step.

This is the TPU materialization of the genotyper's hot loop D (reference:
main.cpp:487-500, SURVEY.md §3.5): for every distinct canonical sample
context k-mer, probe the context Bloom filter, canonicalize + hash the
centered k-mer, scatter-add its count into the rank-compressed alt-allele
counter array (unless the context is a known reference context), and
scatter-add into the exact reference-allele map (binary search over
2-bit-packed sorted keys).

The step is a single jitted function over batched arrays; results are
bit-identical to the host path (enforced by tests) because all arithmetic
is the same uint32 math.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from functools import partial
from typing import Any

import numpy as np

from ..ops import seq
from ..ops.bloom_jax import pack2bit_jax, rank_counter_idx, bloom_test, scatter_add_u32, searchsorted_rows
from ..ops.xxh3_jax import xxh3_64_jax, xxh3_mod_size
from ..utils.config import Config


def pack2bit_u32_np(kmers: np.ndarray, k: int) -> np.ndarray:
    """Host mirror of ops.bloom_jax.pack2bit_jax layout: (N, ceil(k/16))
    uint32, 16 bases per word, big-endian within the word."""
    table = np.full(256, 3, dtype=np.uint32)
    for i, ch in enumerate(b"ACGT"):
        table[ch] = i
    codes = table[kmers]
    nwords = (k + 15) // 16
    out = np.zeros((kmers.shape[0], nwords), dtype=np.uint32)
    for j in range(k):
        w = j // 16
        out[:, w] |= codes[:, j] << np.uint32(2 * (15 - (j % 16)))
    return out


@dataclass
class DeviceIndex:
    """Arrays for the call-phase step, all device-resident under jit."""

    bf_words: Any
    bf_rank: Any
    bf_counts: Any
    ctx_words: Any
    kmap_keys: Any  # (M, W) uint32, sorted lexicographically
    kmap_vals: Any  # (M,) uint32
    size_bits: int
    k: int
    ref_k: int
    kmap_key_bytes: list  # host-side: original dict keys, aligned with rows

    @classmethod
    def from_host(cls, index, cfg: Config) -> "DeviceIndex":
        import jax.numpy as jnp

        assert index.bf.mode, "switch_mode must have run"
        rank = index.bf.rank
        assert int(rank[-1]) < (1 << 32)

        # exact-map: only pure-ACGT keys of length k can match sample
        # queries (sample contexts are pure ACGT); others keep counts on host
        keys = [kb for kb in index.ref_bf.kmers if len(kb) == cfg.k]
        if keys:
            arr = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, cfg.k)
            ok = seq.is_acgt(arr)
            keys = [kb for kb, good in zip(keys, ok.tolist()) if good]
        if keys:
            arr = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, cfg.k)
            packed = pack2bit_u32_np(arr, cfg.k)
            order = np.lexsort(tuple(packed[:, w] for w in range(packed.shape[1] - 1, -1, -1)))
            packed = packed[order]
            keys = [keys[i] for i in order.tolist()]
            vals = np.array([index.ref_bf.kmers[kb] for kb in keys], dtype=np.uint32)
        else:
            packed = np.zeros((0, (cfg.k + 15) // 16), dtype=np.uint32)
            vals = np.zeros(0, dtype=np.uint32)

        return cls(
            bf_words=jnp.asarray(index.bf.words),
            bf_rank=jnp.asarray(rank.astype(np.uint32)),
            bf_counts=jnp.asarray(index.bf.counts),
            ctx_words=jnp.asarray(index.context_bf.words),
            kmap_keys=jnp.asarray(packed),
            kmap_vals=jnp.asarray(vals),
            size_bits=cfg.bf_size,
            k=cfg.k,
            ref_k=cfg.ref_k,
            kmap_key_bytes=keys,
        )

    def write_back(self, index) -> None:
        """Fold device counter state back into the host index."""
        index.bf.counts = np.asarray(self.bf_counts)
        vals = np.asarray(self.kmap_vals)
        for kb, v in zip(self.kmap_key_bytes, vals.tolist()):
            index.ref_bf.kmers[kb] = int(v)


def make_call_step(k: int, ref_k: int, size_bits: int):
    """Build the jitted fused query/update step.

    step(bf_words, bf_rank, bf_counts, ctx_words, kmap_keys, kmap_vals,
         contexts, counters) -> (bf_counts, kmap_vals)

    contexts: (B, ref_k) uint8 canonical sample k-mers; counters: (B,)
    uint32 (0 for padding rows — adding 0 is a no-op everywhere).
    """
    import jax
    import jax.numpy as jnp

    off = (ref_k - k) // 2

    @jax.jit
    def step(bf_words, bf_rank, bf_counts, ctx_words, kmap_keys, kmap_vals, contexts, counters):
        ctx_hash = xxh3_64_jax(contexts)
        cw, cb = xxh3_mod_size(ctx_hash, size_bits)
        ctx_known = bloom_test(ctx_words, cw, cb)

        centers = contexts[:, off : off + k]
        centers_canon = seq.canonical_jax(centers)
        ch = xxh3_64_jax(centers_canon)
        bw, bb = xxh3_mod_size(ch, size_bits)
        is_set, cnt_idx = rank_counter_idx(bf_words, bf_rank, bw, bb)
        upd = (~ctx_known) & is_set
        bf_counts = scatter_add_u32(bf_counts, cnt_idx, counters, upd)

        packed = pack2bit_jax(centers_canon, k)
        kidx, found = searchsorted_rows(kmap_keys, packed)
        kmap_vals = scatter_add_u32(kmap_vals, kidx, counters, found)
        return bf_counts, kmap_vals

    return step


def apply_sample_counts_device(
    index, contexts: np.ndarray, counters: np.ndarray, cfg: Config, batch: int = 1 << 20
) -> None:
    """Device equivalent of pipeline.apply_sample_counts: stream the
    distinct sample contexts through the fused step, then fold the counter
    state back into the host index."""
    dev = DeviceIndex.from_host(index, cfg)
    step = make_call_step(cfg.k, cfg.ref_k, dev.size_bits)
    bf_counts, kmap_vals = dev.bf_counts, dev.kmap_vals
    n = contexts.shape[0]
    for start in range(0, max(n, 1), batch):
        chunk = contexts[start : start + batch]
        cnts = counters[start : start + batch].astype(np.uint32)
        if chunk.shape[0] == 0:
            break
        if chunk.shape[0] < batch and n > batch:
            pad = batch - chunk.shape[0]
            chunk = np.concatenate([chunk, np.full((pad, cfg.ref_k), ord("A"), np.uint8)])
            cnts = np.concatenate([cnts, np.zeros(pad, np.uint32)])
        bf_counts, kmap_vals = step(
            dev.bf_words, dev.bf_rank, bf_counts, dev.ctx_words,
            dev.kmap_keys, kmap_vals, chunk, cnts,
        )
    dev.bf_counts, dev.kmap_vals = bf_counts, kmap_vals
    dev.write_back(index)
