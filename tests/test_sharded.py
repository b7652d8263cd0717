"""Multi-chip sharded index parity with the host path (8-dev CPU mesh)."""

import numpy as np
import pytest

from malva_tpu.index.bloom_filter import BF
from malva_tpu.index.kmap import KMAP
from malva_tpu.parallel.mesh import make_mesh
from malva_tpu.parallel.sharded_index import apply_sample_counts_sharded
from malva_tpu.pipeline import Index, apply_sample_counts
from malva_tpu.utils.config import Config


def _index(cfg, seed=0):
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    bf = BF(cfg.bf_size)
    ref_bf = KMAP()
    ctx = BF(cfg.bf_size)
    alt = alpha[rng.integers(0, 4, size=(400, cfg.k))]
    ref = alpha[rng.integers(0, 4, size=(400, cfg.k))]
    ctxk = alpha[rng.integers(0, 4, size=(300, cfg.ref_k))]
    bf.add_keys(alt)
    ref_bf.add_keys(ref)
    ctx.add_keys(ctxk)
    bf.switch_mode()
    ctx.switch_mode()
    return Index(bf=bf, ref_bf=ref_bf, context_bf=ctx), (alt, ref, ctxk)


@pytest.mark.parametrize("n_dev,routed", [(2, False), (8, False), (2, True), (8, True)])
def test_sharded_call_parity(n_dev, routed):
    import jax

    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    cfg = Config(k=35, ref_k=43, bf_size=1 << 20)
    rng = np.random.default_rng(42)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)

    host_idx, (alt, ref, ctxk) = _index(cfg)
    shard_idx, _ = _index(cfg)

    from malva_tpu.ops.seq import canonical

    contexts = alpha[rng.integers(0, 4, size=(3000, cfg.ref_k))]
    contexts[:300, 4:39] = alt[:300]
    contexts[300:600, 4:39] = ref[:300]
    contexts[600:900] = ctxk[:300]
    contexts = canonical(contexts)
    counters = rng.integers(1, 255, size=3000).astype(np.uint32)

    apply_sample_counts(host_idx, contexts, counters, cfg)
    mesh = make_mesh(n_dev)
    apply_sample_counts_sharded(
        shard_idx, contexts, counters, cfg, mesh, batch=1024, routed=routed
    )

    np.testing.assert_array_equal(host_idx.bf.counts, np.asarray(shard_idx.bf.counts))
    assert host_idx.ref_bf.kmers == shard_idx.ref_bf.kmers


def test_routed_overflow_falls_back(monkeypatch):
    """Adversarial skew (every k-mer hashing to one shard's ranges, forced
    via identical contexts) overflows the routing capacity; the batch must
    rerun through the all_gather fallback with identical results."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    cfg = Config(k=35, ref_k=43, bf_size=1 << 20)
    rng = np.random.default_rng(7)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    host_idx, (alt, ref, ctxk) = _index(cfg)
    shard_idx, _ = _index(cfg)

    from malva_tpu.ops.seq import canonical

    one = alpha[rng.integers(0, 4, size=(1, cfg.ref_k))]
    one[:, 4:39] = alt[:1]
    one = canonical(one)  # sample streams are canonical (KMC contract)
    contexts = np.repeat(one, 2048, axis=0)
    counters = np.ones(2048, np.uint32)

    apply_sample_counts(host_idx, contexts, counters, cfg)
    mesh = make_mesh(8)
    apply_sample_counts_sharded(
        shard_idx, contexts, counters, cfg, mesh, batch=2048, routed=True
    )
    np.testing.assert_array_equal(host_idx.bf.counts, np.asarray(shard_idx.bf.counts))
    assert host_idx.ref_bf.kmers == shard_idx.ref_bf.kmers


def test_count_distributed_single_host_matches_plain(tmp_path):
    import numpy as np

    from malva_tpu.count.counter import count_reads_kmers
    from malva_tpu.parallel.distributed import count_distributed
    from malva_tpu.utils.config import Config

    rng = np.random.default_rng(12)
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=500).tobytes()
    fq = tmp_path / "r.fa"
    with open(fq, "wb") as f:
        for i in range(30):
            s = int(rng.integers(0, 400))
            f.write(b">r%d\n%s\n" % (i, base[s : s + 80]))
    cfg = Config(ref_k=13)
    plain_k, plain_c = count_reads_kmers(str(fq), 13)
    # single process owns every hash range; keys come back 2-bit packed
    dist_k, dist_c = count_distributed([str(fq)], cfg)
    from malva_tpu.ops.seq import unpack_2bit

    np.testing.assert_array_equal(unpack_2bit(dist_k, 13), plain_k)
    np.testing.assert_array_equal(dist_c, plain_c)


def test_sharded_ref_scan_parity():
    """Multi-device index-phase context scan == host scan (hot loop C)."""
    import jax

    from malva_tpu.parallel.mesh import make_mesh
    from malva_tpu.parallel.sharded_index import build_context_sharded

    cfg = Config(k=35, ref_k=43, bf_size=1 << 20)
    rng = np.random.default_rng(21)
    alpha = np.frombuffer(b"ACGTN", dtype=np.uint8)
    refs = [alpha[rng.integers(0, 5, size=n)] for n in (4000, 37, 700)]

    host_idx = _index(cfg, seed=5)[0]
    shard_idx = _index(cfg, seed=5)[0]
    for ref in refs:
        for start in (10, 150, 800):
            if start + 39 <= len(ref):
                host_idx.bf.add_keys(ref[start + 4 : start + 39][None, :])
                shard_idx.bf.add_keys(ref[start + 4 : start + 39][None, :])

    # host scan (as in pipeline.build_index)
    off = cfg.center_off
    for ref in refs:
        if len(ref) < cfg.ref_k:
            if len(ref) > off:
                sub = ref[off : off + cfg.k][None, :]
                if host_idx.bf.test_keys(sub)[0]:
                    host_idx.context_bf.add_keys(ref[: cfg.ref_k][None, :])
            continue
        n_pos = len(ref) - cfg.ref_k + 1
        windows = np.lib.stride_tricks.sliding_window_view(ref, cfg.ref_k)[:n_pos]
        hits = host_idx.bf.test_keys(np.ascontiguousarray(windows[:, off : off + cfg.k]))
        if hits.any():
            host_idx.context_bf.add_keys(np.ascontiguousarray(windows[hits]))

    mesh = make_mesh(len(jax.devices()))
    build_context_sharded(shard_idx, refs, cfg, mesh, slice_chunk=256)
    np.testing.assert_array_equal(
        host_idx.context_bf.words, shard_idx.context_bf.words
    )
