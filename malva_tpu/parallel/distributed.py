"""Multi-host orchestration (jax.distributed).

Maps the pipeline onto a multi-process/multi-host cluster (BASELINE.json
north_star):

* every host reads its own shard of the read files (``host_shard``),
* each host counts its shard through the BOUNDED-MEMORY spill counter
  (count.spill — disk-backed, resumable, kmc -m4 parity) WITHOUT the
  ci/cs threshold (thresholding is non-linear and must happen after the
  global merge),
* distinct (key, count) runs are exchanged in lockstep rounds with
  per-HOST hash-range ownership: each batch is partitioned by owner and
  only the owner MERGES (and keeps) its slice, so per-host resident state
  is O(global_distinct / n_hosts) plus one transient exchange buffer —
  never the full distinct set (the pre-round-4 design allgathered every
  host's full store to every host),
* ci/cs apply after the merge on the owner; each host then applies its
  owned k-mers to zero-initialized counter planes, and the planes merge
  with one global sum (counter adds are commutative, mod-2^32 exact),
* rank 0 runs the genotyping pass and emits the VCF.

Exercised for real with ``process_count > 1``: tests/test_distributed.py
spawns local CPU processes with a 127.0.0.1 coordinator (Gloo
collectives) and requires the multi-process VCF byte-identical to the
single-process output.  The same entry points drive real multi-host TPU
pods (coordinator + process ids from the scheduler).
"""

from __future__ import annotations

import sys

import numpy as np

from ..count.counter import _merge_runs
from ..count.spill import _bucket_of
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


class _Collectives:
    """Cached global mesh + jitted exchange steps for host-side data.

    The process-level collectives ride a 1-device-per-process global mesh
    (axis "p"): host arrays go global via host_local_array_to_global_array,
    one jitted shard_map collective runs (all_to_all for the ranged
    exchange, psum for the counter-plane merge), and results come back
    host-local.  Jits are cached per padded shape (pow2-bucketed rows, so
    compile count is O(log batch))."""

    def __init__(self):
        self._mesh = None
        self._checked = False
        self._a2a = {}
        self._psum = {}

    def mesh_or_none(self):
        """The process mesh, or None when the topology doesn't give one
        device per process (then callers use the allgather fallback)."""
        if self._checked:
            return self._mesh
        self._checked = True
        import jax

        devs = np.array(jax.devices())
        if devs.size == jax.process_count():
            from jax.sharding import Mesh

            self._mesh = Mesh(devs, ("p",))
        return self._mesh

    def all_to_all(self, send: np.ndarray) -> np.ndarray | None:
        """(H, m, R)->(H, m, R): block [dst] of each src lands at dst's
        [src].  Returns None when no process mesh is available."""
        mesh = self.mesh_or_none()
        if mesh is None:
            return None
        import jax
        from jax.experimental import multihost_utils
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        shape = send.shape
        if shape not in self._a2a:
            self._a2a[shape] = jax.jit(shard_map(
                lambda x: jax.lax.all_to_all(
                    x, "p", split_axis=0, concat_axis=0, tiled=True
                ),
                mesh=mesh, in_specs=P("p"), out_specs=P("p"),
            ))
        glob = multihost_utils.host_local_array_to_global_array(
            send, mesh, P("p")
        )
        out = self._a2a[shape](glob)
        return np.asarray(multihost_utils.global_array_to_host_local_array(
            out, mesh, P("p")
        ))

    def psum_u32(self, plane: np.ndarray) -> np.ndarray | None:
        """Element-wise mod-2^32 sum of one uint32 plane across processes
        (counter adds commute; uint32 wraparound is order-independent).
        O(plane) transient memory per host — never the O(H x plane) an
        allgather+sum holds.  None when no process mesh is available."""
        if plane.shape[0] == 0:
            return np.asarray(plane, dtype=np.uint32)
        mesh = self.mesh_or_none()
        if mesh is None:
            return None
        import jax
        from jax.experimental import multihost_utils
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        n = plane.shape[0]
        if n not in self._psum:
            self._psum[n] = jax.jit(shard_map(
                lambda x: jax.lax.psum(x, "p"),
                mesh=mesh, in_specs=P("p"), out_specs=P(None),
            ))
        gp = multihost_utils.host_local_array_to_global_array(
            np.ascontiguousarray(plane, dtype=np.uint32)[None], mesh, P("p")
        )
        out = self._psum[n](gp)
        return np.asarray(multihost_utils.global_array_to_host_local_array(
            out, mesh, P(None)
        ))[0]


def _exchange_rows(coll: _Collectives, keys: np.ndarray, cnts: np.ndarray,
                   owner: np.ndarray, w: int, stats: dict | None = None):
    """One-round ranged exchange: every process sends each row to its
    owner and receives the rows it owns — per-destination blocks, ONE
    all_to_all, O(data) total traffic (each host receives only what it
    keeps, plus per-(src,dst) padding to the global max block).  Replaces
    the per-owner allgather loop (2H collectives/batch, every host
    receiving H x what it kept).  Falls back to that loop when no
    process mesh exists.  Returns [(keys, cnts)] received by this
    process, per source, sorted-run order preserved."""
    import jax
    from jax.experimental import multihost_utils

    H = jax.process_count()
    pid = jax.process_index()
    my_counts = np.bincount(owner, minlength=H).astype(np.int32)
    all_counts = np.asarray(
        multihost_utils.process_allgather(my_counts)
    ).reshape(H, H)  # [src, dst]
    m = int(all_counts.max())
    if m == 0:
        return []
    # pow2 row padding bounds jit compiles at O(log batch) distinct shapes
    m_pad = 1 << max(0, (m - 1).bit_length())
    R = 2 * w + 2  # key uint32 lanes + count int64 as 2 lanes
    order = np.argsort(owner, kind="stable")
    row32 = np.concatenate([
        np.ascontiguousarray(keys[order]).view(np.uint32).reshape(-1, 2 * w),
        cnts[order].astype(np.int64).view(np.uint32).reshape(-1, 2),
    ], axis=1)
    starts = np.zeros(H + 1, dtype=np.int64)
    np.cumsum(my_counts, out=starts[1:])
    send = np.zeros((H, m_pad, R), dtype=np.uint32)
    for dst in range(H):
        lo, hi = int(starts[dst]), int(starts[dst + 1])
        send[dst, : hi - lo] = row32[lo:hi]

    recv = coll.all_to_all(send)
    if stats is not None:
        stats["rounds"] = stats.get("rounds", 0) + 1
        stats["rows_sent"] = stats.get("rows_sent", 0) + int(keys.shape[0])
        stats["rows_padded"] = stats.get("rows_padded", 0) + H * m_pad
    if recv is None:
        # no 1-device-per-process mesh: lockstep per-owner allgather
        out = []
        for h in range(H):
            sel = owner == h
            per_proc = _allgather_runs(keys[sel], cnts[sel], w)
            if pid == h:
                out.extend(per_proc)
        if stats is not None:
            stats["fallback"] = True
        return out

    out = []
    for src in range(H):
        n = int(all_counts[src, pid])
        if n == 0:
            continue
        rows = np.ascontiguousarray(recv[src, :n])
        kk = np.ascontiguousarray(rows[:, : 2 * w]).view(np.uint64)
        cc = np.ascontiguousarray(rows[:, 2 * w :]).view(np.int64).reshape(-1)
        out.append((kk, cc))
        if stats is not None:
            stats["rows_kept"] = stats.get("rows_kept", 0) + n
    return out


def _allgather_runs(keys: np.ndarray, cnts: np.ndarray, w: int):
    """Exchange one (possibly empty) sorted run with every process.
    Returns per-process (keys, cnts) lists.  Rows pad to the max length
    across processes (allgather needs one static shape), and 64-bit
    payloads travel as uint32 lanes — under JAX's default 32-bit mode
    process_allgather silently DOWNCASTS uint64/int64 arrays, truncating
    packed k-mer words (measured, not hypothetical)."""
    import jax
    from jax.experimental import multihost_utils

    H = jax.process_count()
    n_local = np.array([keys.shape[0]], dtype=np.int32)
    all_n = np.asarray(multihost_utils.process_allgather(n_local)).reshape(-1)
    m = int(all_n.max())
    if m == 0:
        empty = np.zeros((0, w), np.uint64), np.zeros(0, np.int64)
        return [empty] * H
    kp = np.zeros((m, w), dtype=np.uint64)
    cp = np.zeros(m, dtype=np.int64)
    kp[: keys.shape[0]] = keys
    cp[: cnts.shape[0]] = cnts
    all_k32 = np.asarray(
        multihost_utils.process_allgather(kp.view(np.uint32))
    )  # (H, m, 2w)
    all_c32 = np.asarray(
        multihost_utils.process_allgather(cp.view(np.uint32).reshape(m, 2))
    )
    out = []
    for h in range(H):
        nh = int(all_n[h])
        kk = np.ascontiguousarray(all_k32[h, :nh]).view(np.uint64)
        cc = np.ascontiguousarray(all_c32[h, :nh]).view(np.int64).reshape(-1)
        out.append((kk, cc))
    return out


def _tree_merge(runs: list) -> tuple[np.ndarray, np.ndarray]:
    """Pairwise tree merge of sorted distinct (keys, counts) runs."""
    if not runs:
        raise ValueError("no runs")
    while len(runs) > 1:
        nxt = []
        for i in range(0, len(runs) - 1, 2):
            ka, ca = runs[i]
            kb, cb = runs[i + 1]
            nxt.append(_merge_runs(ka, ca, kb, cb))
        if len(runs) % 2:
            nxt.append(runs[-1])
        runs = nxt
    return runs[0]


# Ownership hash width: ranges are assigned from the spill bucket hash so
# keys within one range share no lexicographic structure (canonical
# k-mers are non-uniform in their prefix — see count.spill._bucket_of).
_OWNER_RANGES = 1024


def count_distributed(
    reads_paths: list[str], cfg: Config, ci: int = 2, cs: int = 255,
    spill_dir: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Count k-mers across processes with hash-range ownership.

    Returns THIS process's owned slice of the global distinct set as
    (keys_packed_u64, counts_u32) with ci/cs applied — the union over
    processes is exactly the single-process counter's output.  Per-host
    resident memory is O(distinct / n_hosts) + one exchange buffer;
    counting itself is disk-spilled when ``spill_dir`` is given."""
    import jax

    H = jax.process_count()
    pid = jax.process_index()

    def local_batches():
        # local raw counts: ci=1, no cap — thresholds are global
        if spill_dir is not None:
            from ..count.spill import count_reads_kmers_spill

            for path_i, path in enumerate(host_shard(reads_paths)):
                yield from count_reads_kmers_spill(
                    path, cfg.ref_k, f"{spill_dir}/h{pid}_{path_i}",
                    ci=1, cs=1 << 62,
                )
        else:
            from ..count.counter import count_reads_kmers

            for path in host_shard(reads_paths):
                k_arr, c_arr = count_reads_kmers(
                    path, cfg.ref_k, ci=1, cs=1 << 62, return_packed=True
                )
                yield k_arr, c_arr

    w = (cfg.ref_k + 31) // 32
    my_runs: list = []
    it = iter(local_batches())
    from jax.experimental import multihost_utils

    coll = _Collectives()
    stats: dict = {}
    while True:
        batch = next(it, None)
        have = np.array([0 if batch is None else 1], dtype=np.int64)
        any_have = int(
            np.asarray(multihost_utils.process_allgather(have)).sum()
        )
        if any_have == 0:
            break
        if batch is None:
            keys = np.zeros((0, w), np.uint64)
            cnts = np.zeros(0, np.int64)
        else:
            keys = np.ascontiguousarray(batch[0], dtype=np.uint64)
            cnts = np.asarray(batch[1], dtype=np.int64)
        owner = _bucket_of(keys, _OWNER_RANGES) % H if keys.shape[0] else \
            np.zeros(0, np.int64)
        # one-round exchange: per-destination blocks, one all_to_all
        for kk, cc in _exchange_rows(coll, keys, cnts, owner, w, stats):
            if kk.shape[0]:
                my_runs.append((kk, cc))
    if stats:
        print(
            f"[malva-tpu/dist] host {pid}/{H}: exchange "
            f"{stats.get('rounds', 0)} rounds x 1 all_to_all"
            f"{' (allgather fallback)' if stats.get('fallback') else ''}, "
            f"{stats.get('rows_sent', 0)} rows sent, "
            f"{stats.get('rows_kept', 0)} kept, "
            f"{stats.get('rows_padded', 0)} padded slots",
            file=sys.stderr,
        )

    if not my_runs:
        keys = np.zeros((0, w), np.uint64)
        counts = np.zeros(0, np.int64)
    else:
        keys, counts = _tree_merge(my_runs)
    keep = counts >= ci
    keys = keys[keep]
    counts = np.minimum(counts[keep], cs).astype(np.uint32)
    print(
        f"[malva-tpu/dist] host {pid}/{H}: owns {keys.shape[0]} distinct "
        f"k-mers past ci={ci}",
        file=sys.stderr,
    )
    return keys, counts


def call_distributed(cfg: Config, index, reads_paths: list[str], out,
                     spill_dir: str | None = None) -> None:
    """Full multi-process call phase (reference main.cpp:421-594 over a
    process cluster): shard-count + ranged exchange, per-host counter
    application on its owned k-mers, one global counter merge, VCF
    emission on rank 0 (``out`` is only written there)."""
    import jax
    from jax.experimental import multihost_utils

    from ..io.fasta import load_reference
    from ..pipeline import _genotype_and_emit, apply_sample_counts
    from ..utils.timing import PhaseTimer

    keys, counts = count_distributed(
        reads_paths, cfg, spill_dir=spill_dir
    )
    # zero-initialized planes: each host adds only its owned k-mers
    index.bf.counts[:] = 0
    for k in index.ref_bf.kmers:
        index.ref_bf.kmers[k] = 0
    if keys.shape[0]:
        apply_sample_counts(index, keys, counts, cfg)

    # global merge: counter adds commute, so summing the per-host planes
    # equals the sequential single-process application (mod-2^32 exact;
    # the 16-bit BF wrap applies at read time, after the sum — same as
    # sequential adds into one uint32 plane).  psum keeps transient
    # memory O(plane); the allgather fallback holds O(H x plane).
    coll = _Collectives()

    def merge_plane(plane: np.ndarray) -> np.ndarray:
        out = coll.psum_u32(plane)
        if out is not None:
            return out
        return np.asarray(
            multihost_utils.process_allgather(plane)
        ).astype(np.uint64).sum(axis=0).astype(np.uint32)

    index.bf.counts = merge_plane(index.bf.counts)
    vals_sum = merge_plane(index.ref_bf.snapshot_values())
    for k, v in zip(list(index.ref_bf.kmers.keys()), vals_sum.tolist()):
        index.ref_bf.kmers[k] = v

    if jax.process_index() == 0:
        refs = load_reference(cfg.fasta_path, cfg.strip_chr)
        _genotype_and_emit(cfg, index, refs, out, PhaseTimer())
