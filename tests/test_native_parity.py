"""Native batch kernels == pure-Python/NumPy paths, bit for bit.

The native library is authoritative in production; the NumPy code is the
readable spec.  Fuzz both over adversarial inputs (IUPAC bytes, NULs,
ties, every XXH3 length class); the Python path is obtained by switching
the module-level _LIB off for just that call.
"""

import contextlib

import numpy as np
import pytest

from malva_tpu.utils import native as nat


@contextlib.contextmanager
def py_path():
    """Force the pure-Python paths within the block."""
    lib, tried = nat._LIB, nat._TRIED
    nat._LIB, nat._TRIED = None, True
    try:
        yield
    finally:
        nat._LIB, nat._TRIED = lib, tried


def _rand_rows(rng, n, k, alphabet):
    return alphabet[rng.integers(0, len(alphabet), size=(n, k))]


ALPHA_ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)
ALPHA_MESSY = np.frombuffer(b"ACGTNacgtnRYKM\x00\xffW", dtype=np.uint8)


def test_native_available():
    assert nat.load() is not None, "native kernels must build in CI"


@pytest.mark.parametrize("k", [1, 2, 5, 32, 33, 35, 43, 64, 65, 100])
def test_canonical_parity(k):
    from malva_tpu.ops.seq import canonical

    rng = np.random.default_rng(k)
    rows = np.concatenate([
        _rand_rows(rng, 200, k, ALPHA_ACGT),
        _rand_rows(rng, 200, k, ALPHA_MESSY),
    ])
    # palindromes (ties: revcomp must win)
    if k % 2 == 0:
        half = _rand_rows(rng, 50, k // 2, ALPHA_ACGT)
        comp = np.zeros_like(half)
        for s, d in zip(b"ACGT", b"TGCA"):
            comp[half == s] = d
        rows = np.concatenate([rows, np.concatenate([half, comp[:, ::-1]], axis=1)])
    out = nat.canonical(rows)
    assert out is not None
    with py_path():
        py = canonical(rows)
    np.testing.assert_array_equal(out, py)


@pytest.mark.parametrize("k", [1, 35, 43, 80])
def test_truncate_parity(k):
    from malva_tpu.ops.seq import truncate_at_nul

    rng = np.random.default_rng(k + 1)
    rows = _rand_rows(rng, 500, k, ALPHA_MESSY)
    out = nat.truncate_nul(rows)
    assert out is not None
    with py_path():
        py = truncate_at_nul(rows)
    np.testing.assert_array_equal(out, py)


@pytest.mark.parametrize("k", [1, 16, 32, 33, 43, 64, 65, 96])
def test_pack2bit_parity(k):
    from malva_tpu.ops.seq import pack_2bit

    rng = np.random.default_rng(k + 2)
    rows = np.concatenate([
        _rand_rows(rng, 300, k, ALPHA_ACGT),
        _rand_rows(rng, 50, k, ALPHA_MESSY),  # code-255 wrap garbage must match
    ])
    out = nat.pack2bit(rows)
    assert out is not None
    with py_path():
        py = pack_2bit(rows)
    np.testing.assert_array_equal(out, py)


@pytest.mark.parametrize(
    "length", [0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 35, 43, 64, 96, 128,
               129, 160, 240, 241, 500, 1024, 1100]
)
def test_xxh3_batch_parity(length):
    from malva_tpu.ops.xxh3 import xxh3_64

    rng = np.random.default_rng(length + 3)
    rows = rng.integers(0, 256, size=(64, length)).astype(np.uint8)
    out = nat.xxh3_batch(rows)
    assert out is not None
    with py_path():
        py = xxh3_64(rows)
    np.testing.assert_array_equal(out, py)


def test_canonical_xxh3_fused():
    from malva_tpu.ops.seq import canonical
    from malva_tpu.ops.xxh3 import xxh3_64

    rng = np.random.default_rng(9)
    for k in (35, 43, 7):
        rows = np.concatenate([
            _rand_rows(rng, 300, k, ALPHA_ACGT),
            _rand_rows(rng, 100, k, ALPHA_MESSY),
        ])
        out = nat.canonical_xxh3(rows)
        assert out is not None
        with py_path():
            py = xxh3_64(canonical(rows))
        np.testing.assert_array_equal(out, py)


def test_noncontiguous_inputs():
    """Sliding-window views and column slices must be handled (the native
    wrappers copy to contiguous)."""
    from malva_tpu.ops.seq import canonical

    rng = np.random.default_rng(11)
    seq = ALPHA_ACGT[rng.integers(0, 4, size=500)]
    win = np.lib.stride_tricks.sliding_window_view(seq, 43)
    a = canonical(win)
    b = canonical(np.ascontiguousarray(win))
    np.testing.assert_array_equal(a, b)


def test_coverage_scan_parity():
    """malva_coverage == the Python incremental-mean/max scan, fuzzed over
    ragged signature/allele partitions including zeros and empty runs."""
    rng = np.random.default_rng(21)
    for trial in range(20):
        n_alleles = int(rng.integers(1, 50))
        allele_nsig = rng.integers(0, 6, size=n_alleles).astype(np.int64)
        n_sigs = int(allele_nsig.sum())
        sig_len = rng.integers(0, 9, size=n_sigs).astype(np.int64)
        total = int(sig_len.sum())
        w = rng.integers(0, 30, size=total).astype(np.int64)
        w[rng.random(total) < 0.5] = 0  # plenty of skipped k-mers

        out = nat.coverage(w, sig_len, allele_nsig)
        assert out is not None

        sig_off = np.concatenate([[0], np.cumsum(sig_len)])
        s = 0
        exp = np.zeros(n_alleles, dtype=np.int64)
        for a in range(n_alleles):
            best = 0
            for _ in range(int(allele_nsig[a])):
                curr = 0
                n = 0
                for x in w[sig_off[s] : sig_off[s + 1]].tolist():
                    if x > 0:
                        curr = (curr * n + x) // (n + 1)
                        n += 1
                s += 1
                best = max(best, curr)
            exp[a] = best
        np.testing.assert_array_equal(out, exp)


def _np_sorted_counts(packed):
    order = np.lexsort(tuple(packed[:, w] for w in range(packed.shape[1] - 1, -1, -1)))
    s = packed[order]
    diff = np.any(s[1:] != s[:-1], axis=1)
    starts = np.concatenate([[0], np.nonzero(diff)[0] + 1])
    ends = np.concatenate([starts[1:], [s.shape[0]]])
    return s[starts], (ends - starts).astype(np.int64)


@pytest.mark.parametrize("k", [5, 31, 32, 33, 43, 63, 64])
def test_read_kmers_parity(k):
    """Native rolling window->packed-canonical == the NumPy spec path
    (windows -> canonical -> pack_2bit), over messy reads: lowercase,
    IUPAC/N poison bases, reads shorter than k."""
    from malva_tpu.count.counter import _windows_of_read
    from malva_tpu.ops.seq import canonical, pack_2bit

    rng = np.random.default_rng(k)
    reads = []
    for i in range(40):
        L = int(rng.integers(0, 4 * k))
        r = ALPHA_ACGT[rng.integers(0, 4, size=L)].copy()
        # sprinkle junk + lowercase
        junk = rng.random(L) < 0.05
        r[junk] = ord("N")
        low = rng.random(L) < 0.3
        r[low] |= 0x20
        reads.append(r.tobytes())
    out = nat.read_kmers(reads, k)
    assert out is not None
    with py_path():
        wins = [w for r in reads for w in [_windows_of_read(r, k)] if w.shape[0]]
        if wins:
            exp = pack_2bit(canonical(np.concatenate(wins)))
        else:
            exp = np.zeros((0, (k + 31) // 32), np.uint64)
    np.testing.assert_array_equal(out, exp)


@pytest.mark.parametrize("W", [1, 2])
def test_sort_count_merge_parity(W):
    rng = np.random.default_rng(W)
    n = 5000
    # few distinct values so runs are long
    keys = rng.integers(0, 50, size=(n, W)).astype(np.uint64)
    got_k, got_c = nat.sort_count(keys)
    exp_k, exp_c = _np_sorted_counts(keys)
    np.testing.assert_array_equal(got_k, exp_k)
    np.testing.assert_array_equal(got_c, exp_c)

    keys2 = rng.integers(20, 80, size=(n, W)).astype(np.uint64)
    k2, c2 = nat.sort_count(keys2)
    mk, mc = nat.merge_runs(got_k, got_c, k2, c2)
    ek, ec = _np_sorted_counts(np.concatenate([np.repeat(got_k, got_c, axis=0),
                                               np.repeat(k2, c2, axis=0)]))
    np.testing.assert_array_equal(mk, ek)
    np.testing.assert_array_equal(mc, ec)


@pytest.mark.parametrize("seed", [42, 7])
def test_bf_apply_hashed_parity(seed):
    """Fused ctx-test + alt-BF increment kernel vs the numpy two-gather
    path (pipeline._apply_packed_host's Bloom half): identical counter
    planes under dense hits, incl. rows skipped by the context filter
    and rows whose Bloom bit is unset."""
    from malva_tpu.index.bloom_filter import BF

    if nat.load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(seed)
    size = int(rng.choice([1 << 20, 3 << 20]))
    bf = BF(size)
    ctx = BF(size)
    nset = size // 8
    keys = rng.integers(0, 1 << 62, size=nset, dtype=np.uint64)
    idx = keys % np.uint64(size)
    np.bitwise_or.at(
        bf.words, (idx >> 5).astype(np.int64),
        np.uint32(1) << (idx & np.uint64(31)).astype(np.uint32))
    ctxk = rng.integers(0, 1 << 62, size=nset // 2, dtype=np.uint64)
    cidx = ctxk % np.uint64(size)
    np.bitwise_or.at(
        ctx.words, (cidx >> 5).astype(np.int64),
        np.uint32(1) << (cidx & np.uint64(31)).astype(np.uint32))
    bf.switch_mode()
    n = 100_000
    cen_h = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
    ctx_h = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
    cen_h[: n // 2] = keys[rng.integers(0, nset, size=n // 2)]
    ctx_h[: n // 4] = ctxk[rng.integers(0, nset // 2, size=n // 4)]
    cnts = rng.integers(1, 300, size=n).astype(np.uint32)

    zero = bf.counts.copy()
    known = ctx.test_hashed(ctx_h)
    bf.increment_hashed(cen_h[~known], cnts[~known])
    want = bf.counts.copy()
    assert (want != 0).any()  # the fixture must exercise real increments

    bf.counts[:] = zero
    assert nat.bf_apply_hashed(ctx, bf, ctx_h, cen_h, cnts)
    np.testing.assert_array_equal(bf.counts, want)
