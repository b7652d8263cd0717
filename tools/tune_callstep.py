#!/usr/bin/env python
"""Grid-tune the packed call step's compaction parameters on the real TPU:
segment length (seg_c), tail cap, and scan-chaining factor.  The segmented
sort is a batched bitonic network along the minor axis, so its cost scales
~log2(seg_c)^2 per element — shorter segments are cheaper to sort but
raise the per-row overflow probability the tier dispatch must absorb.

Measures the PRODUCTION dispatch pattern (lax.scan chaining, donated
state), same wgs-fill index as bench.py.  Run with the default env (axon
TPU) on an otherwise idle host.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG2_BITS = 33
BATCH = 1 << 21
ITERS = int(os.environ.get("TUNE_ITERS", "8"))
K, REF_K = 35, 43
KMAP_KEYS = 10_000_000


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    from jax import lax

    from malva_tpu.index.device import (
        RANK_BITS, make_call_step_packed, pack2bit_u32_np,
    )
    from malva_tpu.index.kmap_table import BucketTable
    from malva_tpu.ops.xxh3 import xxh3_64

    print(f"[tune] device: {jax.devices()[0]}", file=sys.stderr)
    size_bits = 1 << LOG2_BITS
    nwords = size_bits // 32

    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    key_arr = alpha[rng.integers(0, 4, size=(KMAP_KEYS, K))]
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
    print(f"[tune] popcount {n_counts} (density {n_counts/size_bits:.2e})",
          file=sys.stderr)

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
    print(f"[tune] roundtrip {rt*1e3:.1f} ms", file=sys.stderr)

    def measure(seg_c, cap, scan_s, label):
        inner = make_call_step_packed(K, REF_K, size_bits, table.n_buckets,
                                      BATCH, cap=cap, donate=False,
                                      seg_c=seg_c)

        def scan_step(bf_packed, state, ctx_words, kmap_keys, i, counters):
            def body(st, j):
                ctx = jax.random.bits(
                    jax.random.fold_in(jax.random.PRNGKey(7), i * scan_s + j),
                    (BATCH, 3), dtype=jnp.uint32)
                return inner.__wrapped__(
                    bf_packed, st, ctx_words, kmap_keys, ctx, counters), None

            st, _ = lax.scan(body, state, jnp.arange(scan_s))
            return st

        step = jax.jit(scan_step, donate_argnums=(1,))
        state = jnp.zeros(n_counts + kv_len, dtype=jnp.uint32)
        state = step(bf_packed, state, ctx_words, kmap_keys, 0, counters)
        state = step(bf_packed, state, ctx_words, kmap_keys, 1, counters)
        sync(state)
        t0 = time.perf_counter()
        for i in range(2, 2 + ITERS):
            state = step(bf_packed, state, ctx_words, kmap_keys, i, counters)
        sync(state)
        dt = (time.perf_counter() - t0 - rt) / (ITERS * scan_s)
        print(f"[tune] {label:34s} {dt*1e3:8.2f} ms/2M  "
              f"({BATCH/dt/1e6:7.1f} M/s)", file=sys.stderr)
        return dt

    grid = [
        (16384, None, 4, "seg=16384 cap=def  S=4 (prod)"),
        (4096, None, 4, "seg=4096  cap=def  S=4"),
        (2048, None, 4, "seg=2048  cap=def  S=4"),
        (1024, None, 4, "seg=1024  cap=def  S=4"),
    ]
    results = {}
    for seg_c, cap, scan_s, label in grid:
        results[(seg_c, cap, scan_s)] = measure(seg_c, cap, scan_s, label)

    best = min(results, key=results.get)
    seg_b = best[0]
    # refine around the winner: tighter cap (t ~= mean + 5 sigma) and S=8
    segs = BATCH // seg_b
    extra = [
        (seg_b, (BATCH // 16) * 3 // 4, 4, f"seg={seg_b:<5d} cap=3/4   S=4"),
        (seg_b, None, 8, f"seg={seg_b:<5d} cap=def  S=8"),
    ]
    for seg_c, cap, scan_s, label in extra:
        results[(seg_c, cap, scan_s)] = measure(seg_c, cap, scan_s, label)

    best = min(results, key=results.get)
    dt = results[best]
    print(f"[tune] BEST seg_c={best[0]} cap={best[1]} scan_s={best[2]}: "
          f"{dt*1e3:.2f} ms/2M ({BATCH/dt/1e6:.1f} M/s)", file=sys.stderr)


if __name__ == "__main__":
    main()
