#!/usr/bin/env python
"""Shard-size decision table (VERDICT r2 #7): measure the cost of the call
step's ONE mandatory random access — a (B,2)-u32 bf-row gather — as a
function of the table size on the real chip.

If the per-row cost is flat in table size (transaction-bound), sharding
the 1 GiB filter across D chips buys CAPACITY (bigger -b, more samples
resident) but not latency, and the routed all_to_all design's win is the
O(B/D) per-chip batch, not a faster gather.  If small tables are faster
(cache/VMEM effects), a VMEM-resident Bloom shard becomes the 16-chip
play.  Run with the default env (axon TPU) on an idle host.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

BATCH = 1 << 21
ITERS = 8


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    print(f"[gvs] device: {jax.devices()[0]}", file=sys.stderr)
    fence = jax.jit(lambda s: s.sum())

    def sync(x):
        np.asarray(fence(x))

    small = jnp.zeros(8, jnp.uint32)
    sync(small)
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(fence(small))
    rt = (time.perf_counter() - t0) / 5
    print(f"[gvs] roundtrip {rt*1e3:.1f} ms", file=sys.stderr)

    # log2 table ROWS (8 B/row): 2^17 rows = 1 MiB ... 2^28 rows = 2 GiB
    for log2_rows in [17, 19, 21, 23, 25, 27, 28]:
        rows = 1 << log2_rows

        # table built in its own jit and passed as an ARG (embedding a big
        # array in the jitted closure ships it inside the remote-compile
        # request — see CLAUDE.md), so the timed region is gathers only
        tab = jax.jit(
            lambda key: jax.random.bits(key, (rows, 2), dtype=jnp.uint32)
        )(jax.random.PRNGKey(log2_rows))

        @jax.jit
        def run(tab, key, n=rows):
            def body(acc, j):
                idx = jax.random.randint(
                    jax.random.fold_in(key, j), (BATCH,), 0, n, dtype=jnp.int32)
                r = jnp.take(tab, idx, axis=0)
                return acc + r[:, 0].sum() + r[:, 1].sum(), None

            acc, _ = jax.lax.scan(body, jnp.uint32(0), jnp.arange(ITERS))
            return acc

        k = jax.random.PRNGKey(100 + log2_rows)
        sync(run(tab, k))  # compile + warm
        t0 = time.perf_counter()
        sync(run(tab, k))
        dt = (time.perf_counter() - t0 - rt) / ITERS
        mib = rows * 8 / (1 << 20)
        print(f"[gvs] table {mib:8.1f} MiB  {dt*1e3:7.2f} ms/2M  "
              f"({BATCH/dt/1e6:6.1f} M rows/s)", file=sys.stderr)


if __name__ == "__main__":
    main()
