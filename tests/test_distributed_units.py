"""Single-process unit tests for the distributed building blocks whose
correctness is ORDER-sensitive: the per-batch ref-key collection must
reproduce the sequential KMAP insertion order exactly (plane reads index
keys by position), including the NUL-truncated / multi-length fallback
path, and the merged union must be first-occurrence stable."""

import numpy as np

from malva_tpu.parallel.distributed import _batch_ref_keys, _merged_kmap


class _FakeFlat:
    """Minimal stand-in for FlatExtract.length_groups()."""

    def __init__(self, groups):
        self._groups = groups

    def length_groups(self):
        for is_ref, mat in self._groups:
            yield is_ref, mat.shape[1], None, mat


def _mat(*rows):
    return np.array([list(r) for r in rows], dtype=np.uint8)


def _seq_order(groups):
    """The sequential single-process insertion order (KMAP.add_keys over
    length_groups in order, canonical already applied here for clarity
    by using palindromic-free uppercase rows whose canonical form is
    themselves or computing via the real helpers)."""
    from malva_tpu.ops.seq import canonical, truncate_at_nul

    seen = {}
    for is_ref, mat in groups:
        if not is_ref:
            continue
        for row in truncate_at_nul(canonical(mat)):
            kb = row.tobytes().rstrip(b"\x00")
            if kb not in seen:
                seen[kb] = 0
    return list(seen)


def test_batch_ref_keys_matches_sequential_order():
    rng = np.random.default_rng(3)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    mat = alpha[rng.integers(0, 4, size=(200, 11))]
    mat[50] = mat[10]  # duplicates: first occurrence must win
    groups = [(True, mat), (False, alpha[rng.integers(0, 4, size=(5, 11))])]
    lens, data = _batch_ref_keys(_FakeFlat(groups))
    got, at = [], 0
    for ln in lens.tolist():
        got.append(data[at : at + ln])
        at += ln
    assert got == _seq_order(groups)


def test_batch_ref_keys_nul_and_multilength_path():
    # IUPAC byte 'R' complements to NUL in the canonical form when the
    # revcomp wins -> NUL-truncated keys; plus two length classes
    m1 = _mat(b"TTTTTTTTTTR", b"AAAAAAAAAAA", b"TTTTTTTTTTR")
    m2 = _mat(b"ACGTACGTACGTA")
    groups = [(True, m1), (True, m2)]
    lens, data = _batch_ref_keys(_FakeFlat(groups))
    got, at = [], 0
    for ln in lens.tolist():
        got.append(data[at : at + ln])
        at += ln
    assert got == _seq_order(groups)
    assert len(set(lens.tolist())) > 1  # really exercised mixed lengths


def test_merged_kmap_single_process_order():
    # H=1: _allgather_padded returns the local arrays; the union must be
    # batch-ascending, first-occurrence-stable
    k1 = [b"AAA", b"CCC"]
    k3 = [b"CCC", b"GGG", b"TT"]
    my = [
        (1, np.array([len(k) for k in k1], np.int32), b"".join(k1)),
        (3, np.array([len(k) for k in k3], np.int32), b"".join(k3)),
    ]
    km = _merged_kmap(my)
    assert list(km.kmers) == [b"AAA", b"CCC", b"GGG", b"TT"]
    assert all(v == 0 for v in km.kmers.values())
