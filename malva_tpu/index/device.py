"""Device-resident index + the fused call-phase query/update step.

This is the TPU materialization of the genotyper's hot loop D (reference:
main.cpp:487-500, SURVEY.md §3.5): for every distinct canonical sample
context k-mer, probe the context Bloom filter, canonicalize + hash the
centered k-mer, scatter-add its count into the rank-compressed alt-allele
counter array (unless the context is a known reference context), and
scatter-add into the exact reference-allele map.

TPU-specific layout choices (measured on v5e — random-gather cost is per
ROW, independent of row width up to ~48B):

* the Bloom word and its rank (exclusive popcount cumsum) are interleaved
  into one (W, 2) uint32 array so the counter path costs ONE gather;
* the exact map is a 4-way bucketized hash table addressed by the same
  XXH3 hash the Bloom probe computes — one gather per query instead of a
  log2(M)-step binary search (see index.kmap_table).

The step is a single jitted function over batched arrays; results are
bit-identical to the host path (enforced by tests) because all arithmetic
is the same uint32 math.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np

from ..ops import seq
from ..ops.bloom_jax import pack2bit_jax, scatter_add_u32
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


def device_map_keys(index, cfg: Config) -> list:
    """Exact-map keys that can match device-side sample queries: pure-ACGT,
    full k length (sample contexts are pure ACGT; truncated/IUPAC keys can
    never equal a sample center and keep their counts on host)."""
    keys = [kb for kb in index.ref_bf.kmers if len(kb) == cfg.k]
    if keys:
        arr = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, cfg.k)
        ok = seq.is_acgt(arr)
        keys = [kb for kb, good in zip(keys, ok.tolist()) if good]
    return keys


@dataclass
class DeviceIndex:
    """Arrays for the call-phase step, all device-resident under jit."""

    bf_packed: Any   # (W, 2) uint32: [word, rank]
    bf_counts: Any   # (popcount,) uint32
    ctx_words: Any   # (W,) uint32
    kmap_keys: Any   # (n_buckets, 4*Wk) uint32
    kmap_vals: Any   # (n_buckets*4,) uint32
    size_bits: int
    k: int
    ref_k: int
    n_buckets: int
    table: Any       # host BucketTable (for write_back)

    @classmethod
    def from_host(cls, index, cfg: Config) -> "DeviceIndex":
        import jax.numpy as jnp

        from .kmap_table import BucketTable

        assert index.bf.mode, "switch_mode must have run"
        rank = index.bf.rank
        assert int(rank[-1]) < (1 << 32)
        packed = np.stack([index.bf.words, rank.astype(np.uint32)], axis=1)

        table = BucketTable(device_map_keys(index, cfg), cfg.k)
        table.set_vals_from(index.ref_bf.kmers)

        return cls(
            bf_packed=jnp.asarray(packed),
            bf_counts=jnp.asarray(index.bf.counts),
            ctx_words=jnp.asarray(index.context_bf.words),
            kmap_keys=jnp.asarray(table.bucket_keys),
            kmap_vals=jnp.asarray(table.vals),
            size_bits=cfg.bf_size,
            k=cfg.k,
            ref_k=cfg.ref_k,
            n_buckets=table.n_buckets,
            table=table,
        )

    def write_back(self, index) -> None:
        """Fold device counter state back into the host index."""
        index.bf.counts = np.asarray(self.bf_counts)
        self.table.write_back(np.asarray(self.kmap_vals), index.ref_bf.kmers)


def make_call_step(k: int, ref_k: int, size_bits: int, n_buckets: int):
    """Build the jitted fused query/update step.

    step(bf_packed, bf_counts, ctx_words, kmap_keys, kmap_vals,
         contexts, counters) -> (bf_counts, kmap_vals)

    contexts: (B, ref_k) uint8 canonical sample k-mers; counters: (B,)
    uint32 (0 for padding rows — adding 0 is a no-op everywhere).
    """
    import jax
    import jax.numpy as jnp

    from .kmap_table import probe_bucket_table

    off = (ref_k - k) // 2
    w_k = (k + 15) // 16

    @jax.jit
    def step(bf_packed, bf_counts, ctx_words, kmap_keys, kmap_vals, contexts, counters):
        ctx_hash = xxh3_64_jax(contexts)
        cw, cb = xxh3_mod_size(ctx_hash, size_bits)
        wv = jnp.take(ctx_words, cw, axis=0)
        ctx_known = ((wv >> cb.astype(jnp.uint32)) & jnp.uint32(1)).astype(bool)

        centers = contexts[:, off : off + k]
        centers_canon = seq.canonical_jax(centers)
        ch = xxh3_64_jax(centers_canon)
        bw, bb = xxh3_mod_size(ch, size_bits)
        row = jnp.take(bf_packed, bw, axis=0)  # (B, 2): word, rank
        word = row[:, 0]
        bbu = bb.astype(jnp.uint32)
        is_set = ((word >> bbu) & jnp.uint32(1)).astype(bool)
        below = word & ((jnp.uint32(1) << bbu) - jnp.uint32(1))
        cnt_idx = (row[:, 1] + jax.lax.population_count(below)).astype(jnp.int32)
        upd = (~ctx_known) & is_set
        bf_counts = scatter_add_u32(bf_counts, cnt_idx, counters, upd)

        packed = pack2bit_jax(centers_canon, k)
        slot, found = probe_bucket_table(
            kmap_keys, n_buckets, w_k, packed, ch[:, 0], ch[:, 1]
        )
        kmap_vals = scatter_add_u32(kmap_vals, slot, counters, found)
        return bf_counts, kmap_vals

    return step


def make_ref_scan_step(k: int, ref_k: int, size_bits: int, chunk: int):
    """Device version of the index-phase reference scan (hot loop C,
    main.cpp:382-401): for every ref_k-window of the reference whose
    centered k-mer hits the alt-allele filter, set the window's bit in the
    context filter.

    scan(bf_words, ctx_words, ref_chunk, n_valid) -> ctx_words
    ref_chunk: (chunk + ref_k - 1,) uint8, zero-padded at the tail;
    lanes >= n_valid are masked out exactly.
    """
    import jax
    import jax.numpy as jnp

    off = (ref_k - k) // 2

    @jax.jit
    def scan(bf_words, ctx_words, ref_chunk, n_valid):
        cols = [
            jax.lax.dynamic_slice(ref_chunk, (j,), (chunk,)) for j in range(ref_k)
        ]
        win = jnp.stack(cols, axis=1)  # (chunk, ref_k)
        centers = seq.canonical_jax(win[:, off : off + k])
        h = xxh3_64_jax(centers)
        bw, bb = xxh3_mod_size(h, size_bits)
        wv = jnp.take(bf_words, bw, axis=0)
        hit = ((wv >> bb.astype(jnp.uint32)) & jnp.uint32(1)).astype(bool)
        lane = jnp.arange(chunk, dtype=jnp.int32)
        hit = hit & (lane < n_valid)

        ctxc = seq.canonical_jax(win)
        h2 = xxh3_64_jax(ctxc)
        cw, cb = xxh3_mod_size(h2, size_bits)
        from ..ops.bloom_jax import bloom_set

        return bloom_set(ctx_words, cw, cb, mask=hit)

    return scan


def make_ref_scan_step_pallas(k: int, ref_k: int, size_bits: int, chunk: int, tile: int | None = None):
    """Ref-scan step using the fused Pallas window-hash kernel
    (ops.pallas_kernels): canonicalization + XXH3 of every center and
    context happen in VMEM; only the Bloom probe/set stay in XLA.
    ~1.8x the XLA window pipeline on v5e.  Signature matches
    make_ref_scan_step but takes the chunk pre-widened to uint32 with a
    128-lane halo."""
    import jax
    import jax.numpy as jnp

    from ..ops.bloom_jax import bloom_set
    from ..ops.pallas_kernels import HALO, make_window_hash_fn

    if tile is None:
        tile = min(4096, chunk)
    assert chunk % tile == 0
    # Mosaic only exists for TPU; interpret on CPU (tests)
    whash = make_window_hash_fn(k, ref_k, tile, interpret=jax.default_backend() == "cpu")

    @jax.jit
    def scan(bf_words, ctx_words, ref_chunk_u32, n_valid):
        c_hi, c_lo, x_hi, x_lo = whash(ref_chunk_u32)
        ch = jnp.stack([c_hi[0], c_lo[0]], axis=1)
        bw, bb = xxh3_mod_size(ch, size_bits)
        wv = jnp.take(bf_words, bw, axis=0)
        hit = ((wv >> bb.astype(jnp.uint32)) & jnp.uint32(1)).astype(bool)
        lane = jnp.arange(chunk, dtype=jnp.int32)
        hit = hit & (lane < n_valid)

        xh = jnp.stack([x_hi[0], x_lo[0]], axis=1)
        cw, cb = xxh3_mod_size(xh, size_bits)
        return bloom_set(ctx_words, cw, cb, mask=hit)

    return scan


def build_context_device(
    index, refs_used: list[np.ndarray], cfg: Config, chunk: int = 1 << 20,
    use_pallas: bool = False,
):
    """Run the reference context scan on device, updating
    index.context_bf.words in place.  Equivalent to the host scan in
    pipeline.build_index."""
    import jax.numpy as jnp

    if use_pallas:
        from ..ops.pallas_kernels import HALO

        scan_p = make_ref_scan_step_pallas(cfg.k, cfg.ref_k, cfg.bf_size, chunk)
    scan = make_ref_scan_step(cfg.k, cfg.ref_k, cfg.bf_size, chunk)

    # short contigs first, on host (their adds must precede the device
    # snapshot of the context words, or they would be overwritten below)
    for ref in refs_used:
        if len(ref) < cfg.ref_k:
            off = cfg.center_off
            if len(ref) > off:
                sub = ref[off : off + cfg.k][None, :]
                if index.bf.test_keys(sub)[0]:
                    index.context_bf.add_keys(ref[: cfg.ref_k][None, :])

    bf_words = jnp.asarray(index.bf.words)
    ctx_words = jnp.asarray(index.context_bf.words)
    for ref in refs_used:
        L = len(ref)
        if L < cfg.ref_k:
            continue
        n_pos = L - cfg.ref_k + 1
        for start in range(0, n_pos, chunk):
            n_valid = min(chunk, n_pos - start)
            if use_pallas:
                piece = ref[start : start + chunk + HALO]
                if piece.shape[0] < chunk + HALO:
                    piece = np.concatenate(
                        [piece, np.zeros(chunk + HALO - piece.shape[0], np.uint8)]
                    )
                ctx_words = scan_p(
                    bf_words, ctx_words,
                    jnp.asarray(piece.astype(np.uint32))[None, :], n_valid,
                )
            else:
                piece = ref[start : start + chunk + cfg.ref_k - 1]
                if piece.shape[0] < chunk + cfg.ref_k - 1:
                    piece = np.concatenate(
                        [piece, np.zeros(chunk + cfg.ref_k - 1 - piece.shape[0], np.uint8)]
                    )
                ctx_words = scan(bf_words, ctx_words, jnp.asarray(piece), n_valid)
    index.context_bf.words = np.asarray(ctx_words)


def apply_sample_counts_device(
    index, contexts: np.ndarray, counters: np.ndarray, cfg: Config, batch: int = 1 << 20
) -> None:
    """Device equivalent of pipeline.apply_sample_counts: stream the
    distinct sample contexts through the fused step, then fold the counter
    state back into the host index."""
    dev = DeviceIndex.from_host(index, cfg)
    step = make_call_step(cfg.k, cfg.ref_k, dev.size_bits, dev.n_buckets)
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
            dev.bf_packed, bf_counts, dev.ctx_words, dev.kmap_keys, kmap_vals, chunk, cnts
        )
    dev.bf_counts, dev.kmap_vals = bf_counts, kmap_vals
    dev.write_back(index)
