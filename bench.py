#!/usr/bin/env python
"""Headline benchmark: sample k-mers queried/sec/chip through the fused
call-phase step (hot loop D — SURVEY.md §3.5, BASELINE.md north star).

Default mode "wgs" models a 30x whole-genome index: 1 GiB Bloom filter at
~1.6e-2 set-bit density (AND of 6 random words) and a 10M-key exact map —
the cache-hostile regime a real cohort run sees.  MALVA_BENCH_MODE=sparse
reproduces the round-1 synthetic (~3e-6 fill, 1M keys).

The index is synthesized on device (no bulk host->device transfer in the
timed region except the one-time bucket-table upload); each iteration's
2M packed contexts come from a counter-based PRNG on device.

Baseline: a single-thread C++ replica of the reference's per-k-mer work
(canonicalization + XXH3 + Bloom probes + rank/counter + hashmap lookup)
built with the SAME fill/kmap parameters, compiled on this machine
against the reference's vendored xxhash.c — i.e. what the original CPU
pipeline can do per core here.  vs_baseline = TPU rate / that.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MODE = os.environ.get("MALVA_BENCH_MODE", "wgs")
LOG2_BITS = int(os.environ.get("MALVA_BENCH_LOG2_BITS", "33"))  # 1 GiB filter
BATCH = int(os.environ.get("MALVA_BENCH_BATCH", str(1 << 21)))
ITERS = int(os.environ.get("MALVA_BENCH_ITERS", "10"))
N_AND = 6 if MODE == "wgs" else 0          # bit density 2^-6 ~ 1.6e-2
KMAP_KEYS = (10_000_000 if MODE == "wgs" else 1_000_000)


def _baseline_exe() -> str | None:
    exe = f"/tmp/malva_ref_hotloop_{N_AND}_{KMAP_KEYS}"
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native", "ref_hotloop.cpp")
    xxh = "/root/reference/xxhash.c"
    if not os.path.exists(xxh):
        return None
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-o", exe, src, xxh],
            check=True, capture_output=True, timeout=180,
        )
    return exe


def _parse_rate(out: str) -> float:
    for line in out.splitlines():
        if line.startswith("kmers_per_sec="):
            return float(line.split("=")[1])
    return 0.0


def cpu_baseline() -> float:
    """kmers/s of the reference-equivalent loop, single CPU thread, same
    fill + kmap size as the device run."""
    try:
        exe = _baseline_exe()
        if exe is None:
            return 0.0
        out = subprocess.run(
            [exe, str(min(LOG2_BITS, 33)), str(1 << 20), "3", str(N_AND), str(KMAP_KEYS)],
            check=True, capture_output=True, timeout=900, text=True,
        ).stdout
        return _parse_rate(out)
    except Exception as e:  # baseline is best-effort
        print(f"[bench] cpu baseline failed: {e}", file=sys.stderr)
    return 0.0


def cpu_baseline_machine() -> float:
    """Whole-machine baseline: one replica process per CPU, run
    concurrently, rates summed — what the reference loop could do using
    every core of this host (it is single-threaded upstream, MALVA:107
    pins even KMC to -t1, so this is a GENEROUS machine-level bound)."""
    try:
        exe = _baseline_exe()
        if exe is None:
            return 0.0
        n = os.cpu_count() or 1
        procs = [
            subprocess.Popen(
                [exe, str(min(LOG2_BITS, 33)), str(1 << 20), "3",
                 str(N_AND), str(KMAP_KEYS)],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            )
            for _ in range(n)
        ]
        total = 0.0
        for p in procs:
            out, _ = p.communicate(timeout=900)
            if p.returncode == 0:
                total += _parse_rate(out)
        return total
    except Exception as e:
        print(f"[bench] machine baseline failed: {e}", file=sys.stderr)
    return 0.0


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp

    from malva_tpu.index.device import RANK_BITS, make_call_step_packed
    from malva_tpu.index.kmap_table import BucketTable
    from malva_tpu.ops.xxh3 import xxh3_64

    dev = jax.devices()[0]
    print(f"[bench] device: {dev}, mode: {MODE}", file=sys.stderr)

    size_bits = 1 << LOG2_BITS
    nwords = size_bits // 32

    # exact map: KMAP_KEYS random ACGT 35-mers -> host bucket table
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    t0 = time.perf_counter()
    key_arr = alpha[rng.integers(0, 4, size=(KMAP_KEYS, 35))]
    h = xxh3_64(key_arr)
    from malva_tpu.index.device import pack2bit_u32_np

    table = BucketTable.from_packed(pack2bit_u32_np(key_arr, 35), h, 35)
    print(f"[bench] kmap table: {KMAP_KEYS} keys, {table.n_buckets} buckets "
          f"({time.perf_counter()-t0:.1f}s host build)", file=sys.stderr)
    kmap_keys = jnp.asarray(table.bucket_keys)
    kv_len = table.vals.shape[0]

    # key hashes -> device, for the on-device mini-filter build
    key_h = jnp.asarray(
        np.stack([(h >> np.uint64(32)).astype(np.uint32),
                  (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)], axis=1)
    )
    del key_arr, h

    @jax.jit
    def build_index(key, key_h):
        ks = jax.random.split(key, 2 * max(N_AND, 1) + 2)
        if N_AND > 0:
            words = jax.random.bits(ks[0], (nwords,), dtype=jnp.uint32)
            ctx_words = jax.random.bits(ks[1], (nwords,), dtype=jnp.uint32)
            for j in range(1, N_AND):
                words &= jax.random.bits(ks[2 * j], (nwords,), dtype=jnp.uint32)
                ctx_words &= jax.random.bits(ks[2 * j + 1], (nwords,), dtype=jnp.uint32)
        else:
            r = jax.random.randint(ks[0], (nwords,), 0, 10000, dtype=jnp.int32)
            bitpos = jax.random.randint(ks[1], (nwords,), 0, 32, dtype=jnp.int32)
            words = jnp.where(r == 0, jnp.uint32(1) << bitpos.astype(jnp.uint32), jnp.uint32(0))
            r2 = jax.random.randint(ks[2], (nwords,), 0, 10000, dtype=jnp.int32)
            ctx_words = jnp.where(r2 == 0, jnp.uint32(1) << bitpos.astype(jnp.uint32), jnp.uint32(0))
        pc = jax.lax.population_count(words)
        rank = jnp.concatenate([jnp.zeros(1, jnp.uint32), jnp.cumsum(pc)[:-1]])
        n_counts = rank[-1] + pc[-1]

        # exact-map mini-filter in the rank column's top 4 bits, exactly as
        # DeviceIndex.from_host lays it out (hash -> word, bits 60-61 -> slot)
        from malva_tpu.ops.xxh3_jax import xxh3_mod_size

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
    fill = n_counts / size_bits
    print(f"[bench] filter popcount {n_counts} (density {fill:.2e})", file=sys.stderr)
    assert n_counts < (1 << RANK_BITS)
    state = jnp.zeros(n_counts + kv_len, dtype=jnp.uint32)

    # production dispatch pattern (index/device.apply_sample_counts_stream):
    # SCAN_S sub-batches chained inside one dispatch via lax.scan.  The
    # sub-batch contexts are generated inside the scan body — uniform
    # random packed rows: every 2-bit base code is a uniform random bit
    # pair, so raw random words ARE a packed batch (the step never reads
    # bits past base ref_k-1).
    from jax import lax

    from malva_tpu.index.device import SCAN_S

    inner = make_call_step_packed(35, 43, size_bits, table.n_buckets, BATCH,
                                  donate=False)
    counters = jnp.ones((BATCH,), dtype=jnp.uint32)

    def scan_step(bf_packed, state, ctx_words, kmap_keys, i, counters):
        def body(st, j):
            ctx = jax.random.bits(
                jax.random.fold_in(jax.random.PRNGKey(7), i * SCAN_S + j),
                (BATCH, 3), dtype=jnp.uint32)
            return inner.__wrapped__(
                bf_packed, st, ctx_words, kmap_keys, ctx, counters), None

        st, _ = lax.scan(body, state, jnp.arange(SCAN_S))
        return st

    step = jax.jit(scan_step, donate_argnums=(1,))

    def it(i, state):
        return step(bf_packed, state, ctx_words, kmap_keys, i, counters)

    # block_until_ready does not reliably block on tunneled backends;
    # fetching a reduced scalar is the only trustworthy fence.
    fence = jax.jit(lambda s: s.sum())

    def sync(state):
        np.asarray(fence(state))

    # warmup / compile (state is donated: always rebind)
    state = it(0, state)
    state = it(1, state)
    sync(state)

    t0 = time.perf_counter()
    for i in range(2, 2 + ITERS):
        state = it(i, state)
    sync(state)
    dt = time.perf_counter() - t0
    rate = BATCH * SCAN_S * ITERS / dt
    print(f"[bench] {rate:.3e} kmers/s over {ITERS} iters of {SCAN_S}x{BATCH}",
          file=sys.stderr)

    base = cpu_baseline()
    base_machine = cpu_baseline_machine()
    print(f"[bench] cpu C++-replica baseline ({MODE} fill, {KMAP_KEYS}-key map): "
          f"{base:.3e} kmers/s single-thread, {base_machine:.3e} kmers/s "
          f"whole-machine ({os.cpu_count()} cores)", file=sys.stderr)
    vs = rate / base if base > 0 else 0.0

    # vs_baseline keeps its round-1 definition (single-thread replica —
    # what the upstream single-threaded pipeline does per core here);
    # vs_machine is the same replica on every core concurrently, so the
    # ratio cannot be misread as chip-vs-whole-host.
    print(json.dumps({
        "metric": f"call_kmers_queried_per_sec_per_chip_{MODE}",
        "value": round(rate, 1),
        "unit": "kmers/s",
        "vs_baseline": round(vs, 3),
        "baseline_single_thread": round(base, 1),
        "baseline_machine": round(base_machine, 1),
        "vs_machine": round(rate / base_machine, 3) if base_machine > 0 else 0.0,
    }))


if __name__ == "__main__":
    main()
