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

Per-shard layouts mirror the single-chip ones (index.device): Bloom word
and local rank interleaved (one gather), exact map as a 4-way bucket
table addressed by the already-computed XXH3 (one gather), sharded by
contiguous bucket ranges.

Collectives used: all_gather (batch), psum (context membership bits) —
both ride ICI inside a pod slice.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np

from ..index.device import device_map_keys
from ..index.kmap_table import SLOTS, BucketTable
from ..ops import seq
from ..ops.bloom_jax import pack2bit_jax, scatter_add_u32
from ..ops.xxh3_jax import xxh3_64_jax, xxh3_mod_size
from ..utils.config import Config


@dataclass
class ShardedIndexState:
    bf_packed: Any     # (S, W/S, 2) uint32: [word, local rank]
    bf_counts: Any     # (S, Cmax) uint32, padded
    ctx_words: Any     # (S, W/S) uint32
    kmap_keys: Any     # (S, NB/S, 4*Wk) uint32
    kmap_vals: Any     # (S, NB/S * 4) uint32
    counts_len: list
    table: Any         # host BucketTable (global)
    n_shards: int
    n_buckets: int     # global bucket count
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
    local_rank[:, 1:] = np.cumsum(pc, axis=1)[:, :-1].astype(np.uint32)
    bf_packed = np.stack([bf_words, local_rank], axis=2)

    per_shard = pc.sum(axis=1).astype(np.int64)
    cmax = max(1, int(per_shard.max()))
    counts = np.zeros((S, cmax), dtype=np.uint32)
    starts = np.concatenate([[0], np.cumsum(per_shard)])
    for s in range(S):
        counts[s, : per_shard[s]] = index.bf.counts[starts[s] : starts[s + 1]]

    # exact map: global bucket table split into contiguous bucket ranges
    # (min_buckets=S keeps n_buckets divisible — both are powers of two)
    table = BucketTable(device_map_keys(index, cfg), cfg.k, min_buckets=S)
    table.set_vals_from(index.ref_bf.kmers)
    nbps = table.n_buckets // S
    kk = table.bucket_keys.reshape(S, nbps, SLOTS * table.w)
    kv = table.vals.reshape(S, nbps * SLOTS)

    return ShardedIndexState(
        bf_packed=jnp.asarray(bf_packed),
        bf_counts=jnp.asarray(counts),
        ctx_words=jnp.asarray(ctx_words),
        kmap_keys=jnp.asarray(kk),
        kmap_vals=jnp.asarray(kv),
        counts_len=per_shard.tolist(),
        table=table,
        n_shards=S,
        n_buckets=table.n_buckets,
        size_bits=cfg.bf_size,
    )


def write_back(state: ShardedIndexState, index) -> None:
    counts = np.asarray(state.bf_counts)
    index.bf.counts = np.concatenate(
        [counts[s, : state.counts_len[s]] for s in range(state.n_shards)]
    )
    vals = np.asarray(state.kmap_vals).reshape(-1)
    state.table.write_back(vals, index.ref_bf.kmers)


def make_sharded_call_step(mesh, k: int, ref_k: int, size_bits: int, n_shards: int, n_buckets: int):
    """Jitted multi-device call step under shard_map.

    step(bf_packed, bf_counts, ctx_words, kmap_keys, kmap_vals,
         contexts, counters) with index arrays sharded on axis 0 and the
    batch sharded on axis 0 (data parallel); returns updated
    (bf_counts, kmap_vals) shards.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    off = (ref_k - k) // 2
    w_k = (k + 15) // 16
    W_total = size_bits // 32
    wps = W_total // n_shards
    nbps = n_buckets // n_shards

    def step(bf_packed, bf_counts, ctx_words, kmap_keys, kmap_vals, contexts, counters):
        bf_packed = bf_packed[0]
        bf_counts = bf_counts[0]
        ctx_words = ctx_words[0]
        kmap_keys = kmap_keys[0]
        kmap_vals = kmap_vals[0]

        my = jax.lax.axis_index("shard")

        # data-parallel batch: gather all slices (ICI all_gather)
        contexts = jax.lax.all_gather(contexts, "shard", axis=0, tiled=True)
        counters = jax.lax.all_gather(counters, "shard", axis=0, tiled=True)

        # context membership: probe local range, merge bits across shards
        ctx_hash = xxh3_64_jax(contexts)
        cw, cb = xxh3_mod_size(ctx_hash, size_bits)
        lcw = cw - my * wps
        cmine = (lcw >= 0) & (lcw < wps)
        wv = jnp.take(ctx_words, jnp.clip(lcw, 0, wps - 1), axis=0)
        hit_local = cmine & (((wv >> cb.astype(jnp.uint32)) & jnp.uint32(1)).astype(bool))
        ctx_known = jax.lax.psum(hit_local.astype(jnp.int32), "shard") > 0

        # centered k-mer -> canonical -> counter update in local range
        centers = seq.canonical_jax(contexts[:, off : off + k])
        ch = xxh3_64_jax(centers)
        bw, bb = xxh3_mod_size(ch, size_bits)
        lbw = bw - my * wps
        bmine = (lbw >= 0) & (lbw < wps)
        row = jnp.take(bf_packed, jnp.clip(lbw, 0, wps - 1), axis=0)
        word = row[:, 0]
        bbu = bb.astype(jnp.uint32)
        is_set = ((word >> bbu) & jnp.uint32(1)).astype(bool)
        below = word & ((jnp.uint32(1) << bbu) - jnp.uint32(1))
        cnt_idx = (row[:, 1] + jax.lax.population_count(below)).astype(jnp.int32)
        upd = bmine & (~ctx_known) & is_set
        bf_counts = scatter_add_u32(bf_counts, cnt_idx, counters, upd)

        # exact map: contiguous bucket ranges per shard
        packed = pack2bit_jax(centers, k)
        gbucket = ((ch[:, 1] ^ ch[:, 0]) & jnp.uint32(n_buckets - 1)).astype(jnp.int32)
        lbucket = gbucket - my * nbps
        kmine = (lbucket >= 0) & (lbucket < nbps)
        rows = jnp.take(kmap_keys, jnp.clip(lbucket, 0, nbps - 1), axis=0)
        found = jnp.zeros(packed.shape[0], dtype=bool)
        slot = jnp.zeros(packed.shape[0], dtype=jnp.int32)
        for s in range(SLOTS):
            eq = jnp.ones(packed.shape[0], dtype=bool)
            for j in range(w_k):
                eq = eq & (rows[:, s * w_k + j] == packed[:, j])
            slot = jnp.where(eq & ~found, jnp.clip(lbucket, 0, nbps - 1) * SLOTS + s, slot)
            found = found | eq
        kmap_vals = scatter_add_u32(kmap_vals, slot, counters, found & kmine)

        return bf_counts[None], kmap_vals[None]

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P("shard"), P("shard"), P("shard"), P("shard"), P("shard"), P("shard"), P("shard")),
        out_specs=(P("shard"), P("shard")),
        check_rep=False,
    )
    return jax.jit(sharded)


def apply_sample_counts_sharded(
    index, contexts: np.ndarray, counters: np.ndarray, cfg: Config, mesh, batch: int = 1 << 20
) -> None:
    """Multi-device equivalent of pipeline.apply_sample_counts."""
    S = mesh.devices.size
    state = shard_index(index, cfg, S)
    step = make_sharded_call_step(mesh, cfg.k, cfg.ref_k, cfg.bf_size, S, state.n_buckets)
    bf_counts, kmap_vals = state.bf_counts, state.kmap_vals
    n = contexts.shape[0]
    batch = max(batch - batch % S, S)
    for start in range(0, max(n, 1), batch):
        chunk = contexts[start : start + batch]
        cnts = counters[start : start + batch].astype(np.uint32)
        if chunk.shape[0] == 0:
            break
        if chunk.shape[0] % S or (chunk.shape[0] < batch and n > batch):
            pad = (S - chunk.shape[0] % S) % S if chunk.shape[0] % S else batch - chunk.shape[0]
            chunk = np.concatenate([chunk, np.full((pad, cfg.ref_k), ord("A"), np.uint8)])
            cnts = np.concatenate([cnts, np.zeros(pad, np.uint32)])
        bf_counts, kmap_vals = step(
            state.bf_packed, bf_counts, state.ctx_words, state.kmap_keys, kmap_vals, chunk, cnts
        )
    state.bf_counts, state.kmap_vals = bf_counts, kmap_vals
    write_back(state, index)
