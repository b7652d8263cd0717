"""Hash-range-sharded device index + multi-chip call-phase step.

The TPU-native answer to "the index does not fit one chip's HBM"
(SURVEY.md §2: sharded k-mer index; BASELINE.json north_star): the Bloom
bit/counter arrays and the exact map are split into contiguous hash
ranges, one range per device along mesh axis ``shard``.  Read-derived
k-mer batches stream in data-parallel (one slice per device) and are
all-gathered within the axis; each device resolves probes/updates that
land in its range, and the only cross-device dependency — "is this
context k-mer a known reference context?", whose bit may live on any
shard — is merged with a single boolean psum.  Counter updates then stay
entirely local to the owning shard (deterministic: uint32 adds are
commutative), and per-shard counter state concatenates back into exactly
the host layout.

Collectives used: all_gather (batch), psum (context membership bits) —
both ride ICI inside a pod slice.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import numpy as np

from ..index.device import pack2bit_u32_np
from ..ops import seq
from ..ops.bloom_jax import pack2bit_jax, scatter_add_u32, searchsorted_rows
from ..ops.xxh3_jax import xxh3_64_jax, xxh3_mod_size
from ..utils.config import Config


@dataclass
class ShardedIndexState:
    bf_words: Any      # (S, W/S) uint32
    bf_rank: Any       # (S, W/S) uint32, exclusive popcount cumsum *per shard*
    bf_counts: Any     # (S, Cmax) uint32, padded
    ctx_words: Any     # (S, W/S) uint32
    kmap_keys: Any     # (S, Mmax, Wk) uint32, sorted, padded with 0xFFFFFFFF
    kmap_vals: Any     # (S, Mmax) uint32
    # host-side bookkeeping for write_back
    counts_len: list
    kmap_len: list
    kmap_key_bytes: list  # per shard list of dict keys
    n_shards: int
    size_bits: int


def shard_index(index, cfg: Config, n_shards: int) -> ShardedIndexState:
    """Split a host Index into n_shards contiguous hash ranges."""
    import jax.numpy as jnp

    S = n_shards
    words = index.bf.words
    W = words.shape[0]
    assert W % S == 0, "word count must divide evenly across shards"
    wps = W // S

    bf_words = words.reshape(S, wps)
    ctx_words = index.context_bf.words.reshape(S, wps)

    pc = np.bitwise_count(bf_words).astype(np.uint32)
    local_rank = np.zeros_like(pc)
    local_rank[:, 1:] = np.cumsum(pc, axis=1)[:, :-1]
    per_shard = pc.sum(axis=1).astype(np.int64)
    cmax = max(1, int(per_shard.max()))
    counts = np.zeros((S, cmax), dtype=np.uint32)
    starts = np.concatenate([[0], np.cumsum(per_shard)])
    for s in range(S):
        counts[s, : per_shard[s]] = index.bf.counts[starts[s] : starts[s + 1]]

    # exact map sharded by the top bits of the first packed word
    sbits = int(np.log2(S)) if S > 1 else 0
    assert (1 << sbits) == S, "n_shards must be a power of two"
    keys = [kb for kb in index.ref_bf.kmers if len(kb) == cfg.k]
    if keys:
        arr = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, cfg.k)
        ok = seq.is_acgt(arr)
        keys = [kb for kb, good in zip(keys, ok.tolist()) if good]
    wk = (cfg.k + 15) // 16
    if keys:
        arr = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, cfg.k)
        packed = pack2bit_u32_np(arr, cfg.k)
        order = np.lexsort(tuple(packed[:, w] for w in range(wk - 1, -1, -1)))
        packed = packed[order]
        keys = [keys[i] for i in order.tolist()]
        vals = np.array([index.ref_bf.kmers[kb] for kb in keys], dtype=np.uint32)
        shard_of = (packed[:, 0] >> np.uint32(32 - sbits)) if sbits else np.zeros(len(keys), np.uint32)
        bounds = np.searchsorted(shard_of, np.arange(S + 1))
    else:
        packed = np.zeros((0, wk), dtype=np.uint32)
        vals = np.zeros(0, dtype=np.uint32)
        bounds = np.zeros(S + 1, dtype=np.int64)

    mmax = max(1, int((bounds[1:] - bounds[:-1]).max()) if S else 1)
    kk = np.full((S, mmax, wk), 0xFFFFFFFF, dtype=np.uint32)
    kv = np.zeros((S, mmax), dtype=np.uint32)
    key_bytes = []
    klen = []
    for s in range(S):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        kk[s, : hi - lo] = packed[lo:hi]
        kv[s, : hi - lo] = vals[lo:hi]
        key_bytes.append(keys[lo:hi])
        klen.append(hi - lo)

    return ShardedIndexState(
        bf_words=jnp.asarray(bf_words),
        bf_rank=jnp.asarray(local_rank),
        bf_counts=jnp.asarray(counts),
        ctx_words=jnp.asarray(ctx_words),
        kmap_keys=jnp.asarray(kk),
        kmap_vals=jnp.asarray(kv),
        counts_len=per_shard.tolist(),
        kmap_len=klen,
        kmap_key_bytes=key_bytes,
        n_shards=S,
        size_bits=cfg.bf_size,
    )


def write_back(state: ShardedIndexState, index) -> None:
    counts = np.asarray(state.bf_counts)
    index.bf.counts = np.concatenate(
        [counts[s, : state.counts_len[s]] for s in range(state.n_shards)]
    )
    vals = np.asarray(state.kmap_vals)
    for s in range(state.n_shards):
        for kb, v in zip(state.kmap_key_bytes[s], vals[s, : state.kmap_len[s]].tolist()):
            index.ref_bf.kmers[kb] = int(v)


def make_sharded_call_step(mesh, k: int, ref_k: int, size_bits: int, n_shards: int):
    """Jitted multi-device call step under shard_map.

    step(bf_words, bf_rank, bf_counts, ctx_words, kmap_keys, kmap_vals,
         contexts, counters) with index arrays sharded on axis 0 and the
    batch sharded on axis 0 (data parallel); returns updated
    (bf_counts, kmap_vals) shards.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    off = (ref_k - k) // 2
    W_total = size_bits // 32
    wps = W_total // n_shards
    sbits = int(np.log2(n_shards)) if n_shards > 1 else 0

    def _local(word_idx, my_shard):
        local = word_idx - my_shard * wps
        mine = (local >= 0) & (local < wps)
        return jnp.clip(local, 0, wps - 1), mine

    def step(bf_words, bf_rank, bf_counts, ctx_words, kmap_keys, kmap_vals, contexts, counters):
        # leading shard dim of size 1 inside shard_map; drop it
        bf_words = bf_words[0]
        bf_rank = bf_rank[0]
        bf_counts = bf_counts[0]
        ctx_words = ctx_words[0]
        kmap_keys = kmap_keys[0]
        kmap_vals = kmap_vals[0]

        my = jax.lax.axis_index("shard")

        # data-parallel batch: gather all slices (DCN/ICI all_gather)
        contexts = jax.lax.all_gather(contexts, "shard", axis=0, tiled=True)
        counters = jax.lax.all_gather(counters, "shard", axis=0, tiled=True)

        # context membership: probe local range, merge bits across shards
        ctx_hash = xxh3_64_jax(contexts)
        cw, cb = xxh3_mod_size(ctx_hash, size_bits)
        lcw, cmine = _local(cw, my)
        w = jnp.take(ctx_words, lcw, axis=0)
        hit_local = cmine & (((w >> cb.astype(jnp.uint32)) & jnp.uint32(1)).astype(bool))
        ctx_known = jax.lax.psum(hit_local.astype(jnp.int32), "shard") > 0

        # centered k-mer -> canonical -> counter update in local range
        centers = seq.canonical_jax(contexts[:, off : off + k])
        ch = xxh3_64_jax(centers)
        bw, bb = xxh3_mod_size(ch, size_bits)
        lbw, bmine = _local(bw, my)
        wv = jnp.take(bf_words, lbw, axis=0)
        bbu = bb.astype(jnp.uint32)
        is_set = ((wv >> bbu) & jnp.uint32(1)).astype(bool)
        below = wv & ((jnp.uint32(1) << bbu) - jnp.uint32(1))
        cnt_idx = (jnp.take(bf_rank, lbw, axis=0) + jax.lax.population_count(below)).astype(jnp.int32)
        upd = bmine & (~ctx_known) & is_set
        bf_counts = scatter_add_u32(bf_counts, cnt_idx, counters, upd)

        # exact map: local key-range search
        packed = pack2bit_jax(centers, k)
        qshard = (packed[:, 0] >> np.uint32(32 - sbits)).astype(jnp.int32) if sbits else jnp.zeros(packed.shape[0], jnp.int32)
        kidx, found = searchsorted_rows(kmap_keys, packed)
        found = found & (qshard == my)
        kmap_vals = scatter_add_u32(kmap_vals, kidx, counters, found)

        return bf_counts[None], kmap_vals[None]

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P("shard"), P("shard"), P("shard"), P("shard"), P("shard"), P("shard"),
            P("shard"), P("shard"),
        ),
        out_specs=(P("shard"), P("shard")),
        check_rep=False,
    )
    import jax

    return jax.jit(sharded)


def apply_sample_counts_sharded(
    index, contexts: np.ndarray, counters: np.ndarray, cfg: Config, mesh, batch: int = 1 << 20
) -> None:
    """Multi-device equivalent of pipeline.apply_sample_counts."""
    S = mesh.devices.size
    state = shard_index(index, cfg, S)
    step = make_sharded_call_step(mesh, cfg.k, cfg.ref_k, cfg.bf_size, S)
    bf_counts, kmap_vals = state.bf_counts, state.kmap_vals
    n = contexts.shape[0]
    batch = max(batch - batch % S, S)
    for start in range(0, max(n, 1), batch):
        chunk = contexts[start : start + batch]
        cnts = counters[start : start + batch].astype(np.uint32)
        if chunk.shape[0] == 0:
            break
        if chunk.shape[0] % S or (chunk.shape[0] < batch and n > batch):
            pad = batch - chunk.shape[0]
            chunk = np.concatenate([chunk, np.full((pad, cfg.ref_k), ord("A"), np.uint8)])
            cnts = np.concatenate([cnts, np.zeros(pad, np.uint32)])
        bf_counts, kmap_vals = step(
            state.bf_words, state.bf_rank, bf_counts, state.ctx_words,
            state.kmap_keys, kmap_vals, chunk, cnts,
        )
    state.bf_counts, state.kmap_vals = bf_counts, kmap_vals
    write_back(state, index)
