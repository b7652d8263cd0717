#!/usr/bin/env python
"""Headline benchmark: sample k-mers queried/sec/chip through the fused
call-phase step (hot loop D — SURVEY.md §3.5, BASELINE.md north star).

Runs on whatever jax platform the environment provides (the real TPU
under the driver).  The index is synthesized on device (no host->device
bulk transfer in the timed region); the batch of contexts is generated
on device per iteration from a counter-based PRNG.

Baseline: a single-thread C++ replica of the reference's per-k-mer work
(canonicalization + XXH3 + Bloom probes + rank/counter + hashmap lookup),
compiled on this machine against the reference's vendored xxhash.c —
i.e. what the original CPU pipeline can do per core here.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LOG2_BITS = int(os.environ.get("MALVA_BENCH_LOG2_BITS", "33"))  # 1 GiB filter
BATCH = int(os.environ.get("MALVA_BENCH_BATCH", str(1 << 21)))
ITERS = int(os.environ.get("MALVA_BENCH_ITERS", "10"))


def cpu_baseline() -> float:
    """kmers/s of the reference-equivalent loop, single CPU thread."""
    exe = "/tmp/malva_ref_hotloop"
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native", "ref_hotloop.cpp")
    xxh = "/root/reference/xxhash.c"
    if not os.path.exists(xxh):
        return 0.0
    try:
        if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-o", exe, src, xxh],
                check=True, capture_output=True, timeout=180,
            )
        out = subprocess.run(
            [exe, str(min(LOG2_BITS, 33)), str(1 << 20), "3"],
            check=True, capture_output=True, timeout=600, text=True,
        ).stdout
        for line in out.splitlines():
            if line.startswith("kmers_per_sec="):
                return float(line.split("=")[1])
    except Exception as e:  # baseline is best-effort
        print(f"[bench] cpu baseline failed: {e}", file=sys.stderr)
    return 0.0


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp

    from malva_tpu.index.device import RANK_BITS, _minifilter_slot_np, make_call_step_compact
    from malva_tpu.ops.xxh3 import xxh3_64

    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)

    size_bits = 1 << LOG2_BITS
    nwords = size_bits // 32
    key = jax.random.PRNGKey(0)

    # synthetic exact-map: 1M random keys in the 4-way bucket table
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    from malva_tpu.index.kmap_table import BucketTable

    key_arr = alpha[rng.integers(0, 4, size=(1 << 20, 35))]
    keys = [key_arr[i].tobytes() for i in range(key_arr.shape[0])]
    keys = list(dict.fromkeys(keys))
    table = BucketTable(keys, 35)
    kmap_keys = jnp.asarray(table.bucket_keys)

    # exact-map mini-filter words (rank top bits), as DeviceIndex.from_host builds
    arr = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, 35)
    h = xxh3_64(arr)
    word_idx = ((h % np.uint64(size_bits)) >> np.uint64(5)).astype(np.int64)
    mf_np = np.zeros(nwords, dtype=np.uint32)
    np.bitwise_or.at(mf_np, word_idx, np.uint32(1) << _minifilter_slot_np(h))
    mf = jnp.asarray(mf_np)
    del mf_np

    @jax.jit
    def build_index(key, mf):
        k1, k2, k3 = jax.random.split(key, 3)
        # ~1e-4 fill, at most one bit per word so rank indices stay in-bounds
        r = jax.random.randint(k1, (nwords,), 0, 10000, dtype=jnp.int32)
        bitpos = jax.random.randint(k2, (nwords,), 0, 32, dtype=jnp.int32)
        words = jnp.where(r == 0, jnp.uint32(1) << bitpos.astype(jnp.uint32), jnp.uint32(0))
        r2 = jax.random.randint(k3, (nwords,), 0, 10000, dtype=jnp.int32)
        ctx_words = jnp.where(r2 == 0, jnp.uint32(1) << bitpos.astype(jnp.uint32), jnp.uint32(0))
        pc = (words != 0).astype(jnp.uint32)
        rank = jnp.concatenate([jnp.zeros(1, jnp.uint32), jnp.cumsum(pc)[:-1]])
        bf_packed = jnp.stack([words, rank | (mf << jnp.uint32(RANK_BITS))], axis=1)
        return bf_packed, ctx_words

    bf_packed, ctx_words = build_index(key, mf)
    del mf
    # combined [bf_counts | kmap_vals] state; nwords is an upper bound on popcount
    state = jnp.zeros(nwords + table.vals.shape[0], dtype=jnp.uint32)

    step = make_call_step_compact(35, 43, size_bits, table.n_buckets, BATCH)
    alpha_dev = jnp.asarray(alpha)

    @jax.jit
    def bench_iter(i, bf_packed, state, ctx_words, kmap_keys):
        k = jax.random.fold_in(jax.random.PRNGKey(7), i)
        contexts = jnp.take(
            alpha_dev,
            jax.random.randint(k, (BATCH, 43), 0, 4, dtype=jnp.int32),
            axis=0,
        )
        counters = jnp.ones((BATCH,), dtype=jnp.uint32)
        return step(bf_packed, state, ctx_words, kmap_keys, contexts, counters)

    def it(i, state):
        return bench_iter(i, bf_packed, state, ctx_words, kmap_keys)

    # block_until_ready does not reliably block on tunneled backends;
    # fetching a reduced scalar is the only trustworthy fence.
    fence = jax.jit(lambda s: s.sum())

    def sync(state):
        np.asarray(fence(state))

    # warmup / compile
    state = it(0, state)
    state = it(1, state)
    sync(state)

    t0 = time.perf_counter()
    for i in range(2, 2 + ITERS):
        state = it(i, state)
    sync(state)
    dt = time.perf_counter() - t0
    rate = BATCH * ITERS / dt
    print(f"[bench] {rate:.3e} kmers/s over {ITERS} iters of {BATCH}", file=sys.stderr)

    base = cpu_baseline()
    print(f"[bench] cpu baseline: {base:.3e} kmers/s", file=sys.stderr)
    vs = rate / base if base > 0 else 0.0

    print(json.dumps({
        "metric": "call_kmers_queried_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "kmers/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
