#!/usr/bin/env python
"""Ablate the packed call step's COMPACT path on the real TPU: rebuild the
step with individual pieces dead-coded out, so XLA removes them, and time
each variant.  The difference from the full variant is that piece's cost.

Run with the default env (axon TPU).  Fences with a scalar fetch (see
tools/profile_callstep.py for why block_until_ready is not trustworthy).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG2_BITS = 33
BATCH = 1 << 21
ITERS = int(os.environ.get("PROF_ITERS", "8"))
ONLY = set(os.environ.get("PROF_ONLY", "").split(",")) - {""}
K, REF_K = 35, 43


def make_step_ablated(k, ref_k, size_bits, n_buckets, batch, *,
                      cap=None, ablate=frozenset()):
    """make_call_step_packed with named pieces removed.  Pieces:
    sort, payload, ctxhash, ctxgather, probe, scatter, front, gather.
    Always takes the compact path (no lax.cond)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from malva_tpu.index.kmap_table import SLOTS, bucket_pair_jax, probe_bucket_table
    from malva_tpu.ops.pallas_kernels import make_callstep_hash_fn
    from malva_tpu.ops.xxh3_jax import xxh3_mod_size, xxh3_64_cols
    from malva_tpu.ops.pallas_kernels import _decode_byte_cols
    from malva_tpu.index.device import RANK_BITS, RANK_MASK

    w_k = (k + 15) // 16
    wc = (ref_k + 15) // 16
    if cap is None:
        cap = max(256, batch // 16)
    kv_len = n_buckets * SLOTS
    hash_fn = make_callstep_hash_fn(k, ref_k, with_ctx=False)

    def ctx_hash_rows(rows):
        cols = [rows[:, j] for j in range(wc)]
        xh, xl = xxh3_64_cols(_decode_byte_cols(jnp, cols, ref_k))
        return xxh3_mod_size(jnp.stack([xh, xl], axis=1), size_bits)

    def step(bf_packed, state, ctx_words, kmap_keys, ctx_packed, counters):
        counts_len = state.shape[0] - kv_len
        if "front" in ablate:
            chh = ctx_packed[:, 0]
            chl = ctx_packed[:, 1]
            packed = ctx_packed[:, :w_k]
        else:
            R = batch // 128
            mats = [ctx_packed[:, j].reshape(R, 128) for j in range(wc)]
            outs = hash_fn(*mats)
            flat = [o.reshape(-1) for o in outs]
            chh, chl, packed = flat[0], flat[1], jnp.stack(flat[2:], axis=1)
        ch = jnp.stack([chh, chl], axis=1)
        bw, bb = xxh3_mod_size(ch, size_bits)
        if "gather" in ablate:
            row = jnp.stack([bw.astype(jnp.uint32), bb.astype(jnp.uint32)], axis=1)
        else:
            row = jnp.take(bf_packed, bw, axis=0)
        word = row[:, 0]
        bbu = bb.astype(jnp.uint32)
        is_set = ((word >> bbu) & jnp.uint32(1)).astype(bool)
        rank = row[:, 1] & jnp.uint32(RANK_MASK)
        below = word & ((jnp.uint32(1) << bbu) - jnp.uint32(1))
        cnt_idx = rank + jax.lax.population_count(below)

        mf = row[:, 1] >> jnp.uint32(RANK_BITS)
        mf_slot = (chh >> jnp.uint32(28)) & jnp.uint32(3)
        kmap_cand = ((mf >> mf_slot) & jnp.uint32(1)).astype(bool)
        interesting = is_set | kmap_cand

        bucket, bucket2 = bucket_pair_jax(chh, chl, n_buckets)
        counters_u = counters.astype(jnp.uint32)

        if "sort" in ablate:
            sel = jnp.arange(cap, dtype=jnp.int32)
        else:
            key = (~interesting).astype(jnp.uint32)
            lane = jnp.arange(batch, dtype=jnp.int32)
            _, perm = lax.sort((key, lane), num_keys=1)
            sel = perm[:cap]

        flags = (
            is_set.astype(jnp.uint32)
            | (kmap_cand.astype(jnp.uint32) << 1)
        )
        if "payload" in ablate:
            p_cnt = cnt_idx[:cap]
            p_counter = counters_u[:cap]
            p_flags = flags[:cap]
            p_bucket = bucket[:cap]
            p_bucket2 = bucket2[:cap]
            p_packed = packed[:cap]
            p_ctx = ctx_packed[:cap]
        else:
            payload = jnp.stack(
                [cnt_idx, counters_u, flags, bucket, bucket2]
                + [packed[:, j] for j in range(w_k)]
                + [ctx_packed[:, j] for j in range(wc)],
                axis=1,
            )
            p = jnp.take(payload, sel, axis=0)
            p_cnt, p_counter, p_flags = p[:, 0], p[:, 1], p[:, 2]
            p_bucket = p[:, 3]
            p_bucket2 = p[:, 4]
            p_packed = p[:, 5 : 5 + w_k]
            p_ctx = p[:, 5 + w_k : 5 + w_k + wc]
        p_set = (p_flags & jnp.uint32(1)).astype(bool)
        p_cand = ((p_flags >> jnp.uint32(1)) & jnp.uint32(1)).astype(bool)

        if "ctxhash" in ablate:
            p_cw = p_cnt.astype(jnp.int32)
            p_cb = p_counter
        else:
            p_cw, p_cb = ctx_hash_rows(p_ctx)
        if "ctxgather" in ablate:
            wv = p_cb.astype(jnp.uint32)
        else:
            wv = jnp.take(ctx_words, p_cw, axis=0)
        ctx_known = ((wv >> p_cb.astype(jnp.uint32)) & jnp.uint32(1)).astype(bool)
        upd = p_set & ~ctx_known

        if "probe" in ablate:
            slot = p_bucket.astype(jnp.int32)
            found = p_cand
        else:
            slot, found = probe_bucket_table(
                kmap_keys, n_buckets, w_k, p_packed, None, None,
                bucket=p_bucket, bucket2=p_bucket2,
            )
        if "scatter" in ablate:
            acc = jnp.sum(jnp.where(upd, p_counter, 0) +
                          jnp.where(found, slot.astype(jnp.uint32), 0))
            return state.at[0].add(acc.astype(jnp.uint32))
        idx = jnp.concatenate([
            jnp.where(upd, p_cnt.astype(jnp.int32), jnp.int32(state.shape[0])),
            jnp.where(found & p_cand, slot + counts_len, jnp.int32(state.shape[0])),
        ])
        vals = jnp.concatenate([p_counter, p_counter])
        return state.at[idx].add(vals, mode="drop")

    return jax.jit(step, donate_argnums=(1,))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from malva_tpu.index.device import RANK_BITS
    from malva_tpu.index.kmap_table import BucketTable
    from malva_tpu.index.device import pack2bit_u32_np
    from malva_tpu.ops.xxh3 import xxh3_64

    print(f"[abl] device: {jax.devices()[0]}", file=sys.stderr)
    size_bits = 1 << LOG2_BITS
    nwords = size_bits // 32

    # same wgs-fill index construction as bench.py
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    key_arr = alpha[rng.integers(0, 4, size=(1_000_000, K))]
    h = xxh3_64(key_arr)
    table = BucketTable.from_packed(pack2bit_u32_np(key_arr, K), h, K)
    kmap_keys = jnp.asarray(table.bucket_keys)
    kv_len = table.vals.shape[0]
    key_h = jnp.asarray(
        np.stack([(h >> np.uint64(32)).astype(np.uint32),
                  (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)], axis=1))
    del key_arr, h

    @jax.jit
    def build_index(key, key_h):
        from malva_tpu.ops.xxh3_jax import xxh3_mod_size
        ks = jax.random.split(key, 12)
        words = jax.random.bits(ks[0], (nwords,), dtype=jnp.uint32)
        ctx_words = jax.random.bits(ks[1], (nwords,), dtype=jnp.uint32)
        for j in range(1, 6):
            words &= jax.random.bits(ks[2 * j], (nwords,), dtype=jnp.uint32)
            ctx_words &= jax.random.bits(ks[2 * j + 1], (nwords,), dtype=jnp.uint32)
        pc = jax.lax.population_count(words)
        rank = jnp.concatenate([jnp.zeros(1, jnp.uint32), jnp.cumsum(pc)[:-1]])
        n_counts = rank[-1] + pc[-1]
        kw, _ = xxh3_mod_size(key_h, size_bits)
        slot = (key_h[:, 0] >> jnp.uint32(28)) & jnp.uint32(3)
        mf = jnp.zeros(nwords, dtype=jnp.uint32)
        for s in range(4):
            idx = jnp.where(slot == s, kw, jnp.int32(nwords))
            mf = mf.at[idx].max(jnp.uint32(1 << s), mode="drop")
        bf_packed = jnp.stack([words, rank | (mf << jnp.uint32(RANK_BITS))], axis=1)
        return bf_packed, ctx_words, n_counts

    bf_packed, ctx_words, n_counts = build_index(jax.random.PRNGKey(0), key_h)
    n_counts = int(np.asarray(n_counts))
    print(f"[abl] popcount {n_counts} (density {n_counts/size_bits:.2e})",
          file=sys.stderr)

    @jax.jit
    def make_contexts(i):
        k = jax.random.fold_in(jax.random.PRNGKey(7), i)
        return jax.random.bits(k, (BATCH, 3), dtype=jnp.uint32)

    counters = jnp.ones((BATCH,), dtype=jnp.uint32)
    fence = jax.jit(lambda s: s.sum())

    def sync(x):
        np.asarray(fence(x))

    small = jnp.zeros(8, jnp.uint32)
    sync(small)
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(fence(small))
    rt = (time.perf_counter() - t0) / 5
    print(f"[abl] roundtrip {rt*1e3:.1f} ms", file=sys.stderr)

    if not ONLY or "prod" in ONLY:
        from malva_tpu.index.device import make_call_step_packed

        step = make_call_step_packed(K, REF_K, size_bits, table.n_buckets, BATCH)
        state = jnp.zeros(n_counts + kv_len, dtype=jnp.uint32)

        def itp(i, state):
            return step(bf_packed, state, ctx_words, kmap_keys,
                        make_contexts(i), counters)

        state = itp(0, state)
        state = itp(1, state)
        sync(state)
        t0 = time.perf_counter()
        for i in range(2, 2 + ITERS):
            state = itp(i, state)
        sync(state)
        dt = (time.perf_counter() - t0 - rt) / ITERS
        print(f"[abl] {'prod':11s} {dt*1e3:8.2f} ms/2M  ({BATCH/dt/1e6:7.1f} M/s)",
              file=sys.stderr)

    variants = [
        ("full", frozenset()),
        ("-sort", frozenset({"sort"})),
        ("-payload", frozenset({"payload"})),
        ("-ctxhash", frozenset({"ctxhash"})),
        ("-ctxgather", frozenset({"ctxgather"})),
        ("-probe", frozenset({"probe"})),
        ("-scatter", frozenset({"scatter"})),
        ("-front", frozenset({"front"})),
        ("-gather", frozenset({"gather"})),
        ("-tail", frozenset({"payload", "ctxhash", "ctxgather", "probe",
                             "scatter", "sort"})),
    ]
    for name, abl in variants:
        if ONLY and name not in ONLY:
            continue
        step = make_step_ablated(K, REF_K, size_bits, table.n_buckets, BATCH,
                                 ablate=abl)
        state = jnp.zeros(n_counts + kv_len, dtype=jnp.uint32)

        def it(i, state):
            return step(bf_packed, state, ctx_words, kmap_keys,
                        make_contexts(i), counters)

        state = it(0, state)
        state = it(1, state)
        sync(state)
        t0 = time.perf_counter()
        for i in range(2, 2 + ITERS):
            state = it(i, state)
        sync(state)
        dt = (time.perf_counter() - t0 - rt) / ITERS
        print(f"[abl] {name:11s} {dt*1e3:8.2f} ms/2M  ({BATCH/dt/1e6:7.1f} M/s)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
