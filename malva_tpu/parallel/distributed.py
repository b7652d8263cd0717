"""Multi-host orchestration (jax.distributed).

Maps the pipeline onto a multi-host pod slice (BASELINE.json north_star):

* every host reads its own shard of the read files (``host_shard``),
* counts its shard's k-mers WITHOUT the ci/cs threshold (thresholding is
  non-linear and must happen after the global merge),
* the per-host distinct-count stores are exchanged with
  ``multihost_utils.process_allgather`` and merged identically on every
  host (deterministic: sorted merge), then ci/cs are applied globally,
* the query/update phase runs on each host's devices over the global
  mesh via parallel.sharded_index.

Single-host degenerates to the plain pipeline; multi-host requires
``jax.distributed.initialize()`` before first jax use (standard envs:
coordinator address + process id/count).  There is no multi-host hardware
in this environment — the logic below keeps the host-count dimension
fully general and is exercised at host_count=1 in tests.
"""

from __future__ import annotations

import sys

import numpy as np

from ..count.counter import _merge_runs, count_reads_kmers
from ..ops.seq import unpack_2bit
from ..utils.config import Config


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op when single-process)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard(paths: list[str]) -> list[str]:
    """The read files this host is responsible for (round-robin)."""
    import jax

    pid = jax.process_index()
    n = jax.process_count()
    return [p for i, p in enumerate(paths) if i % n == pid]


def count_distributed(
    reads_paths: list[str], cfg: Config, ci: int = 2, cs: int = 255
) -> tuple[np.ndarray, np.ndarray]:
    """Count k-mers across hosts; every host returns the identical global
    (contexts, counts) with ci/cs applied after the merge."""
    import jax

    # local raw counts (ci=1, no cap — thresholds are global)
    local_keys = np.zeros((0, (cfg.ref_k + 31) // 32), dtype=np.uint64)
    local_cnts = np.zeros(0, dtype=np.int64)
    for path in host_shard(reads_paths):
        k_arr, c_arr = count_reads_kmers(path, cfg.ref_k, ci=1, cs=1 << 62)
        from ..ops.seq import pack_2bit

        packed = pack_2bit(k_arr)
        order = np.lexsort(tuple(packed[:, w] for w in range(packed.shape[1] - 1, -1, -1)))
        local_keys, local_cnts = _merge_runs(
            local_keys, local_cnts, packed[order], c_arr.astype(np.int64)[order]
        )

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # pad to the max length across hosts, allgather, then merge
        n_local = np.array([local_keys.shape[0]])
        all_n = multihost_utils.process_allgather(n_local).reshape(-1)
        m = int(all_n.max())
        kp = np.zeros((m, local_keys.shape[1]), dtype=np.uint64)
        cp = np.zeros(m, dtype=np.int64)
        kp[: local_keys.shape[0]] = local_keys
        cp[: local_cnts.shape[0]] = local_cnts
        all_k = multihost_utils.process_allgather(kp)
        all_c = multihost_utils.process_allgather(cp)
        merged_k = np.zeros((0, local_keys.shape[1]), dtype=np.uint64)
        merged_c = np.zeros(0, dtype=np.int64)
        for h in range(all_k.shape[0]):
            nh = int(all_n[h])
            merged_k, merged_c = _merge_runs(merged_k, merged_c, all_k[h, :nh], all_c[h, :nh])
        local_keys, local_cnts = merged_k, merged_c

    keep = local_cnts >= ci
    contexts = unpack_2bit(local_keys[keep], cfg.ref_k)
    counts = np.minimum(local_cnts[keep], cs).astype(np.uint32)
    print(
        f"[malva-tpu/dist] {jax.process_count()} host(s), "
        f"{contexts.shape[0]} distinct k-mers past ci={ci}",
        file=sys.stderr,
    )
    return contexts, counts
