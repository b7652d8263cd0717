"""Sequence-op semantics: complement table, canonicalization, packing."""

import numpy as np
import pytest

from malva_tpu.ops import seq


def _scalar_canonical(kmer: bytes) -> bytes:
    """Scalar mirror of the reference's BF::_canonical for testing."""
    rc = bytes(seq.RCN_TABLE[b] for b in kmer)[::-1]
    # strcmp(kmer, ckmer) < 0 -> keep kmer; forward kmer has no NULs so
    # strcmp == bytewise compare over len(kmer) bytes.
    return kmer if kmer < rc else rc


def _b(s: str) -> np.ndarray:
    return np.frombuffer(s.encode(), dtype=np.uint8)[None, :]


def test_complement_table_entries():
    for src, dst in [("A", "T"), ("C", "G"), ("G", "C"), ("T", "A"), ("N", "N")]:
        assert seq.RCN_TABLE[ord(src)] == ord(dst)
    # upstream lowercase quirk: 'g' complements to 'G'
    assert seq.RCN_TABLE[ord("g")] == ord("G")
    # IUPAC / anything else -> NUL
    for c in "RYSWKMBDHV*-@z":
        assert seq.RCN_TABLE[ord(c)] == 0


@pytest.mark.parametrize(
    "kmer",
    [
        "ACGTACGT",
        "TTTTTTTT",
        "AAAAAAAA",
        "ACGTNNAC",
        "GATTACAT",
        "ACGRYACG",  # IUPAC codes -> revcomp contains NULs
        "RRRRRRRR",
        "A",
        "ACGTACGTACGTACGTACGTACGTACGTACGTACG",  # k=35
    ],
)
def test_canonical_matches_scalar(kmer):
    got = seq.canonical(_b(kmer))[0].tobytes()
    assert got == _scalar_canonical(kmer.encode())


def test_canonical_batch_random():
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGTNRY", dtype=np.uint8)
    batch = alpha[rng.integers(0, len(alpha), size=(500, 35))]
    got = seq.canonical(batch)
    for i in range(batch.shape[0]):
        assert got[i].tobytes() == _scalar_canonical(batch[i].tobytes())


def test_canonical_jax_parity():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    alpha = np.frombuffer(b"ACGTN", dtype=np.uint8)
    batch = alpha[rng.integers(0, len(alpha), size=(256, 43))]
    want = seq.canonical(batch)
    got = np.asarray(seq.canonical_jax(jnp.asarray(batch)))
    np.testing.assert_array_equal(got, want)


def test_truncate_at_nul():
    a = np.array([[65, 66, 0, 67, 68], [65, 66, 67, 68, 69]], dtype=np.uint8)
    out = seq.truncate_at_nul(a)
    assert out[0].tolist() == [65, 66, 0, 0, 0]
    assert out[1].tolist() == [65, 66, 67, 68, 69]


def test_pack_unpack_roundtrip_and_order():
    rng = np.random.default_rng(2)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    batch = alpha[rng.integers(0, 4, size=(300, 43))]
    packed = seq.pack_2bit(batch)
    assert packed.shape == (300, 2)
    np.testing.assert_array_equal(seq.unpack_2bit(packed, 43), batch)
    # integer tuple order == ASCII lexicographic order
    order_packed = np.lexsort((packed[:, 1], packed[:, 0]))
    as_str = [batch[i].tobytes() for i in range(300)]
    order_str = np.argsort(np.array(as_str))
    got = [as_str[i] for i in order_packed]
    want = [as_str[i] for i in order_str]
    assert got == want


def test_is_acgt_and_upper():
    a = np.frombuffer(b"ACGTacgtN", dtype=np.uint8)[None, :]
    assert not seq.is_acgt(a)[0]
    up = seq.upper(a)
    assert up.tobytes() == b"ACGTACGTN"
    assert seq.is_acgt(up[:, :8])[0]


def test_native_combs_parity():
    """C++ combination engine == pure Python on random dense blocks."""
    import os

    from malva_tpu.utils.native import CombsNative, load
    from malva_tpu.variants.blocks import VB

    lib = load()
    if lib is None:
        import pytest

        pytest.skip("no native lib / compiler")

    class FV:
        def __init__(self, pos, size, minsz, present):
            self.ref_pos = pos
            self.ref_size = size
            self.min_size = minsz
            self.is_present = present

    rng = np.random.default_rng(17)
    nat = CombsNative(lib)
    for trial in range(200):
        n = int(rng.integers(2, 14))
        pos = np.cumsum(rng.integers(0, 12, size=n)).astype(np.int64)
        size = rng.integers(1, 6, size=n).astype(np.int64)
        minsz = np.minimum(size, rng.integers(1, 4, size=n)).astype(np.int64)
        present = rng.random(n) < 0.85
        vb = VB(13, 0.001)
        vb.variants = [FV(int(p), int(s), int(m), bool(pr))
                       for p, s, m, pr in zip(pos, size, minsz, present)]
        for center in range(n):
            if not present[center]:
                continue
            want = vb._combine_combs(
                vb._grow_combs(center, -1), vb._grow_combs(center, +1), center
            )
            nat.set_block(pos, size, minsz, present.astype(np.uint8))
            got = nat.combs(center, 13)
            assert got == want, (trial, center, got, want)
