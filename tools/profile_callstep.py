#!/usr/bin/env python
"""Dissect the call-step's 2M-batch cost on the real TPU.

Run with the default env (axon TPU).  Timings are fenced via a scalar
fetch (block_until_ready lies on the tunnel backend); one tunnel
roundtrip (~26 ms) is measured and subtracted.  Big device arrays are
always passed as ARGUMENTS (closures get embedded in the remote-compile
request -> HTTP 413).
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


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from malva_tpu.ops import seq
    from malva_tpu.ops.bloom_jax import pack2bit_jax
    from malva_tpu.ops.xxh3_jax import xxh3_64_jax, xxh3_mod_size

    print(f"[prof] device: {jax.devices()[0]}", file=sys.stderr)
    size_bits = 1 << LOG2_BITS
    nwords = size_bits // 32

    @jax.jit
    def build(key):
        k1, k2 = jax.random.split(key)
        r = jax.random.randint(k1, (nwords,), 0, 10000, dtype=jnp.int32)
        bitpos = jax.random.randint(k2, (nwords,), 0, 32, dtype=jnp.int32)
        words = jnp.where(r == 0, jnp.uint32(1) << bitpos.astype(jnp.uint32), jnp.uint32(0))
        pc = (words != 0).astype(jnp.uint32)
        rank = jnp.concatenate([jnp.zeros(1, jnp.uint32), jnp.cumsum(pc)[:-1]])
        return jnp.stack([words, rank], axis=1)

    bf_packed = build(jax.random.PRNGKey(0))

    @jax.jit
    def make_ctx(i):
        k = jax.random.fold_in(jax.random.PRNGKey(7), i)
        codes = jax.random.randint(k, (BATCH, 43), 0, 4, dtype=jnp.int32)
        al = jnp.array([65, 67, 71, 84], dtype=jnp.uint8)
        return jnp.take(al, codes, axis=0)

    @jax.jit
    def make_packed(i):
        k = jax.random.fold_in(jax.random.PRNGKey(7), i)
        codes = jax.random.randint(k, (BATCH, 43), 0, 4, dtype=jnp.uint32)
        cols = []
        for w in range(3):
            acc = jnp.zeros(BATCH, dtype=jnp.uint32)
            for j in range(w * 16, min((w + 1) * 16, 43)):
                acc = acc | (codes[:, j] << (2 * (15 - (j - w * 16))))
            cols.append(acc)
        return jnp.stack(cols, axis=1)

    contexts = make_ctx(0)
    ctx_packed = make_packed(0)

    fence = jax.jit(lambda s: s.sum())

    def sync(x):
        np.asarray(fence(x if x.dtype != bool else x.astype(jnp.uint32)))

    small = jnp.zeros(8, jnp.uint32)
    sync(small)
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(fence(small))
    rt = (time.perf_counter() - t0) / 5
    print(f"[prof] roundtrip {rt*1e3:.1f} ms", file=sys.stderr)

    def timeit(name, fn, *args, state_idx=None):
        if ONLY and name not in ONLY:
            return
        a = list(args)
        out = fn(*a)
        if state_idx is not None:
            a[state_idx] = out  # donated input must not be reused
        sync(out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            o = fn(*a)
            if state_idx is not None:
                a[state_idx] = o
        sync(o)
        dt = (time.perf_counter() - t0 - rt) / ITERS
        print(f"[prof] {name:12s} {dt*1e3:8.2f} ms/2M  ({BATCH/dt/1e6:7.1f} M/s)",
              file=sys.stderr)

    @jax.jit
    def idx_of(ctxs):
        h = xxh3_64_jax(ctxs[:, 4:39])
        return xxh3_mod_size(h, size_bits)[0]

    idx0 = idx_of(contexts)

    @jax.jit
    def gather_pure(bf, idx):
        return jnp.take(bf, idx, axis=0)[:, 0]

    @jax.jit
    def hash_xla(ctxs):
        ctx_hash = xxh3_64_jax(ctxs)
        cw, cb = xxh3_mod_size(ctx_hash, size_bits)
        centers = seq.canonical_jax(ctxs[:, 4:39])
        ch = xxh3_64_jax(centers)
        bw, bb = xxh3_mod_size(ch, size_bits)
        packed = pack2bit_jax(centers, 35)
        return (cw ^ cb ^ bw ^ bb ^ packed[:, 0].astype(jnp.int32)
                ^ ch[:, 0].astype(jnp.int32))

    from malva_tpu.ops.pallas_kernels import make_callstep_hash_fn
    hash_fn = make_callstep_hash_fn(35, 43)
    hash_fn_noctx = make_callstep_hash_fn(35, 43, with_ctx=False)

    @jax.jit
    def hash_pallas(pk):
        R = BATCH // 128
        mats = [pk[:, j].reshape(R, 128) for j in range(3)]
        outs = hash_fn(*mats)
        acc = outs[0]
        for o in outs[1:]:
            acc = acc ^ o
        return acc.reshape(-1)

    @jax.jit
    def hash_pallas_noctx(pk):
        R = BATCH // 128
        mats = [pk[:, j].reshape(R, 128) for j in range(3)]
        outs = hash_fn_noctx(*mats)
        acc = outs[0]
        for o in outs[1:]:
            acc = acc ^ o
        return acc.reshape(-1)

    @jax.jit
    def sort_only(ctxs):
        key = ctxs[:, 0].astype(jnp.uint32)
        lane = jnp.arange(BATCH, dtype=jnp.int32)
        _, perm = jax.lax.sort((key, lane), num_keys=1)
        return perm[:256]

    from malva_tpu.index.kmap_table import BucketTable
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    key_arr = alpha[rng.integers(0, 4, size=(1 << 18, 35))]
    keys = list(dict.fromkeys(key_arr[i].tobytes() for i in range(key_arr.shape[0])))
    table = BucketTable(keys, 35)
    kmap_keys = jnp.asarray(table.bucket_keys)
    state = jnp.zeros(nwords + table.vals.shape[0], dtype=jnp.uint32)
    ctx_words = bf_packed[:, 0]

    from malva_tpu.index.device import make_call_step_compact, make_call_step_packed
    step_c = make_call_step_compact(35, 43, size_bits, table.n_buckets, BATCH,
                                    minifilter=False)
    step_p = make_call_step_packed(35, 43, size_bits, table.n_buckets, BATCH,
                                   minifilter=False)
    counters = jnp.ones((BATCH,), dtype=jnp.uint32)

    timeit("gather_pure", gather_pure, bf_packed, idx0)
    timeit("hash_xla", hash_xla, contexts)
    timeit("hash_pallas", hash_pallas, ctx_packed)
    timeit("hash_noctx", hash_pallas_noctx, ctx_packed)
    timeit("sort", sort_only, contexts)
    timeit("step_compact", step_c, bf_packed, state, ctx_words, kmap_keys,
           contexts, counters, state_idx=1)
    state2 = jnp.zeros(nwords + table.vals.shape[0], dtype=jnp.uint32)
    timeit("step_packed", step_p, bf_packed, state2, ctx_words, kmap_keys,
           ctx_packed, counters, state_idx=1)


if __name__ == "__main__":
    main()
