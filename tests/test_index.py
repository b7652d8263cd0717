"""Bloom filter + exact map semantics vs scalar oracles."""

import numpy as np

from malva_tpu.index.bloom_filter import BF
from malva_tpu.index.kmap import KMAP
from malva_tpu.ops.seq import canonical
from malva_tpu.ops.xxh3 import xxh3_64


def _kmers(n, k, seed=0, alpha=b"ACGTN"):
    rng = np.random.default_rng(seed)
    a = np.frombuffer(alpha, dtype=np.uint8)
    return a[rng.integers(0, len(a), size=(n, k))]


def test_bf_add_test_roundtrip():
    bf = BF(1 << 20)
    keys = _kmers(500, 35)
    others = _kmers(500, 35, seed=9)
    bf.add_keys(keys)
    assert bf.test_keys(keys).all()
    # false positives possible but should be rare at this load
    assert bf.test_keys(others).mean() < 0.05


def test_bf_counter_semantics_vs_dict_oracle():
    size = 1 << 16  # tiny filter to force collisions
    bf = BF(size)
    keys = _kmers(400, 35, seed=1)
    bf.add_keys(keys)
    bf.switch_mode()

    inc_keys = _kmers(3000, 35, seed=2)
    counters = np.random.default_rng(3).integers(1, 300, size=3000).astype(np.uint32)
    bf.increment_keys(inc_keys, counters)

    # scalar oracle: counters live per set bit index, shared on collisions
    idx_of = lambda ks: xxh3_64(canonical(ks)) % np.uint64(size)
    set_bits = set(idx_of(keys).tolist())
    oracle = {}
    for i, c in zip(idx_of(inc_keys).tolist(), counters.tolist()):
        if i in set_bits:
            oracle[i] = (oracle.get(i, 0) + c) & 0xFFFFFFFF

    got = bf.get_counts(inc_keys)
    for j, i in enumerate(idx_of(inc_keys).tolist()):
        want = (oracle.get(i, 0) & 0xFFFF) if i in set_bits else 0
        assert got[j] == want


def test_bf_counts_wrap_mod_2_16():
    bf = BF(1 << 12)
    key = _kmers(1, 35, seed=4, alpha=b"ACGT")
    bf.add_keys(key)
    bf.switch_mode()
    big = np.array([60000], dtype=np.uint32)
    bf.increment_keys(key, big)
    bf.increment_keys(key, big)
    assert bf.get_counts(key)[0] == (120000 & 0xFFFF)


def test_bf_state_roundtrip():
    bf = BF(1 << 14)
    keys = _kmers(100, 35, seed=5)
    bf.add_keys(keys)
    bf.switch_mode()
    bf.increment_keys(keys, np.full(100, 7, dtype=np.uint32))
    bf2 = BF.from_state({f"x_{k}": v for k, v in bf.state().items()}, "x_")
    np.testing.assert_array_equal(bf2.get_counts(keys), bf.get_counts(keys))


def test_kmap_truncation_and_increment():
    km = KMAP()
    # 'R' complements to NUL; canonical picks the revcomp (leading NUL
    # sorts first), so the stored key is truncated
    kmer = np.frombuffer(b"TTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTR", dtype=np.uint8)[None, :]
    km.add_keys(kmer)
    assert len(km) == 1
    (key,) = km.kmers
    assert 0 not in key and len(key) < 35
    km.increment_keys(kmer, np.array([5], dtype=np.uint32))
    assert km.get_counts(kmer)[0] == 5


def test_kmap_signed_reinterpretation():
    km = KMAP()
    kmer = _kmers(1, 35, seed=6, alpha=b"ACGT")
    km.add_keys(kmer)
    km.increment_keys(kmer, np.array([0x90000000], dtype=np.uint32))
    # stored uint32 >= 2^31 reads back negative (upstream int cast)
    assert km.get_counts(kmer)[0] < 0


def test_bucket_table_two_choice_at_scale():
    """Two-choice cuckoo layout: 200k keys build at load <= 0.5 without
    size doubling (single-choice 4-slot tables overflow with certainty at
    this scale), and the device probe finds every key and no others."""
    import jax.numpy as jnp

    from malva_tpu.index.device import pack2bit_u32_np
    from malva_tpu.index.kmap_table import SLOTS, BucketTable, probe_bucket_table
    from malva_tpu.ops.xxh3 import xxh3_64

    rng = np.random.default_rng(42)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    m = 200_000
    arr = np.unique(alpha[rng.integers(0, 4, size=(m, 35))], axis=0)
    keys = [arr[i].tobytes() for i in range(arr.shape[0])]
    table = BucketTable(keys, 35)
    # sizing stays at the load bound (pow2 rounding only — no overflow growth)
    want = 1
    while want * SLOTS < 2 * len(keys):
        want <<= 1
    assert table.n_buckets == want

    # every key is found at a slot holding exactly that key
    h = xxh3_64(arr)
    hi = (h >> np.uint64(32)).astype(np.uint32)
    lo = (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    packed = pack2bit_u32_np(arr, 35)
    slot, found = probe_bucket_table(
        jnp.asarray(table.bucket_keys), table.n_buckets, table.w,
        jnp.asarray(packed), jnp.asarray(hi), jnp.asarray(lo),
    )
    assert bool(np.asarray(found).all())
    stored = table.bucket_keys.reshape(-1, table.w)[np.asarray(slot)]
    np.testing.assert_array_equal(stored, packed)

    # misses stay misses
    miss = alpha[rng.integers(0, 4, size=(1000, 35))]
    in_set = {miss[i].tobytes() for i in range(1000)} & set(keys)
    hm = xxh3_64(miss)
    _, fm = probe_bucket_table(
        jnp.asarray(table.bucket_keys), table.n_buckets, table.w,
        jnp.asarray(pack2bit_u32_np(miss, 35)),
        jnp.asarray((hm >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((hm & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )
    assert int(np.asarray(fm).sum()) == len(in_set)

    # from_packed builds the identical layout
    t2 = BucketTable.from_packed(packed, h, 35)
    np.testing.assert_array_equal(t2.bucket_keys, table.bucket_keys)


def test_kmap_fast_membership_path():
    """The vectorized membership pre-filter (engaged only at >=1024-probe
    batches) must agree exactly with the per-row dict walk — including
    revcomp probes of stored keys, truncated (NUL) keys, IUPAC probes,
    and increments seen through get_counts."""
    from malva_tpu.index.kmap import KMAP
    from malva_tpu.ops.seq import revcomp

    rng = np.random.default_rng(5)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    k = 21
    stored = alpha[rng.integers(0, 4, size=(500, k))]
    messy = stored.copy()
    messy[:50, 3] = ord("N")  # some keys canonicalize with IUPAC/NULs

    km = KMAP()
    km.add_keys(messy)

    probes = np.concatenate([
        alpha[rng.integers(0, 4, size=(1500, k))],  # mostly misses
        messy[:300],                                # direct hits
        revcomp(messy[300:400]),                    # revcomp hits
    ])
    cnt = rng.integers(1, 9, size=probes.shape[0]).astype(np.uint32)

    km2 = KMAP()
    km2.add_keys(messy)
    # reference: per-row path (mask disabled via tiny batches)
    for i in range(probes.shape[0]):
        km2.increment_keys(probes[i : i + 1], cnt[i : i + 1])

    km.increment_keys(probes, cnt)
    assert km.kmers == km2.kmers

    got = km.get_counts(probes)
    exp = np.concatenate(
        [km2.get_counts(probes[j : j + 1]) for j in range(probes.shape[0])]
    )
    np.testing.assert_array_equal(got, exp)


def test_index_save_load_roundtrip(tmp_path):
    """save_index stores the GiB-scale Bloom word arrays sparse + raw (zlib
    on dense zero-runs dominated load: 23 s -> ~1 s at chr scale); the
    loader must also accept the older dense-words files."""
    from malva_tpu.pipeline import Index, load_index, save_index

    bf = BF(1 << 16)
    ctx = BF(1 << 16)
    km = KMAP()
    keys = _kmers(300, 35, seed=4, alpha=b"ACGT")
    bf.add_keys(keys)
    ctx.add_keys(_kmers(200, 43, seed=5, alpha=b"ACGT"))
    bf.switch_mode()
    ctx.switch_mode()
    bf.increment_keys(keys[:100], np.arange(1, 101, dtype=np.uint32))
    km.add_keys(keys)
    km.add_keys(np.frombuffer(b"ACG", dtype=np.uint8)[None, :])  # short key
    km.increment_keys(keys[:50], np.full(50, 7, dtype=np.uint32))
    index = Index(bf=bf, ref_bf=km, context_bf=ctx)

    p = str(tmp_path / "idx.npz")
    save_index(index, p)
    got = load_index(p)
    np.testing.assert_array_equal(got.bf.words, bf.words)
    np.testing.assert_array_equal(got.bf.counts, bf.counts)
    np.testing.assert_array_equal(got.context_bf.words, ctx.words)
    assert got.ref_bf.kmers == km.kmers

    # pre-sparse format (dense words, compressed) still loads
    st = {}
    for name, obj in [("bf", bf), ("ctx", ctx)]:
        for k, v in obj.state().items():
            st[f"{name}_{k}"] = v
    for k, v in km.state().items():
        st[f"kmap_{k}"] = v
    p2 = str(tmp_path / "idx_old.npz")
    np.savez_compressed(p2, **st)
    got2 = load_index(p2)
    np.testing.assert_array_equal(got2.bf.words, bf.words)
    np.testing.assert_array_equal(got2.bf.counts, bf.counts)
    assert got2.ref_bf.kmers == km.kmers
