"""Bounded-memory spill counter == in-RAM counter, incl. crash/resume."""

import gzip
import os

import numpy as np
import pytest

from malva_tpu.count import spill as spill_mod
from malva_tpu.count.counter import count_reads_kmers
from malva_tpu.count.spill import count_reads_kmers_spill


def _write_reads(path, n_reads=300, read_len=120, seed=0, err_chars=b"ACGTN"):
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(err_chars, dtype=np.uint8)
    with open(path, "wb") as f:
        for i in range(n_reads):
            seq = alpha[rng.integers(0, len(alpha), size=read_len)].tobytes()
            f.write(b">r%d\n" % i + seq + b"\n")
    return path


def _as_dict(keys, cnts):
    return {keys[i].tobytes(): int(cnts[i]) for i in range(keys.shape[0])}


@pytest.mark.parametrize("ref_k,ci,cs", [(43, 2, 255), (17, 1, 3)])
def test_spill_matches_inram(tmp_path, ref_k, ci, cs):
    reads = _write_reads(str(tmp_path / "reads.fa"), n_reads=400, seed=ref_k)
    keys_ram, cnts_ram = count_reads_kmers(
        reads, ref_k, ci=ci, cs=cs, return_packed=True,
        log=open(os.devnull, "w"),
    )
    got = {}
    for keys, cnts in count_reads_kmers_spill(
        reads, ref_k, str(tmp_path / "spill"), ci=ci, cs=cs,
        chunk_kmers=1 << 12, n_buckets=16, log=open(os.devnull, "w"),
    ):
        d = _as_dict(keys, cnts)
        assert not (set(d) & set(got)), "bucket partition must not overlap"
        got.update(d)
    assert got == _as_dict(keys_ram, cnts_ram)
    # spill dir cleaned up after the iterator is drained
    assert not any(f.endswith(".npy") for f in os.listdir(tmp_path / "spill"))


def test_spill_merge_many_segments_low_fd_limit(tmp_path, monkeypatch):
    """The merge must survive n_segments >> RLIMIT_NOFILE (a 30x human
    genome makes >6,000 segments; holding 2 FDs per segment open blows the
    default 1024 ulimit).  Tiny chunks force ~200 segments, the soft FD
    limit drops to 48, and a 1-record group budget forces the maximum
    number of bucket groups — output must still equal the in-RAM counter."""
    import resource

    reads = _write_reads(str(tmp_path / "reads.fa"), n_reads=500, seed=11,
                         err_chars=b"ACGT")
    keys_ram, cnts_ram = count_reads_kmers(
        reads, 31, return_packed=True, log=open(os.devnull, "w"))

    monkeypatch.setattr(spill_mod.SpillStore, "MERGE_GROUP_RECORDS", 1)
    soft, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
    resource.setrlimit(resource.RLIMIT_NOFILE, (48, hard))
    try:
        got = {}
        n_seg = 0
        it = count_reads_kmers_spill(
            reads, 31, str(tmp_path / "spill"), chunk_kmers=1 << 8,
            n_buckets=64, log=open(os.devnull, "w"), keep_spill=True,
        )
        for keys, cnts in it:
            got.update(_as_dict(keys, cnts))
        n_seg = len([f for f in os.listdir(tmp_path / "spill")
                     if f.endswith(".keys.npy")])
    finally:
        resource.setrlimit(resource.RLIMIT_NOFILE, (soft, hard))
    assert n_seg > 100, f"expected many segments, got {n_seg}"
    assert got == _as_dict(keys_ram, cnts_ram)


def test_spill_resume_after_crash(tmp_path, monkeypatch):
    reads = _write_reads(str(tmp_path / "reads.fa"), n_reads=600, seed=7)
    spill_dir = str(tmp_path / "spill")

    real_iter = spill_mod.iter_read_batches

    def small_batches(path, batch_bases=1 << 26):
        yield from real_iter(path, batch_bases=4000)

    monkeypatch.setattr(spill_mod, "iter_read_batches", small_batches)

    # clean run for reference
    clean = {}
    for keys, cnts in count_reads_kmers_spill(
        reads, 43, str(tmp_path / "clean"), chunk_kmers=1 << 12,
        n_buckets=8, log=open(os.devnull, "w"),
    ):
        clean.update(_as_dict(keys, cnts))

    # crashing run: die mid-stream after a few batches
    class Boom(RuntimeError):
        pass

    def crashing_batches(path, batch_bases=1 << 26):
        for i, b in enumerate(real_iter(path, batch_bases=4000)):
            if i == 5:
                raise Boom()
            yield b

    monkeypatch.setattr(spill_mod, "iter_read_batches", crashing_batches)
    with pytest.raises(Boom):
        gen = count_reads_kmers_spill(
            reads, 43, spill_dir, chunk_kmers=1 << 12, n_buckets=8,
            log=open(os.devnull, "w"),
        )
    assert os.path.exists(os.path.join(spill_dir, "manifest.json"))

    # resume and finish
    monkeypatch.setattr(spill_mod, "iter_read_batches", small_batches)
    resumed = {}
    for keys, cnts in count_reads_kmers_spill(
        reads, 43, spill_dir, chunk_kmers=1 << 12, n_buckets=8,
        log=open(os.devnull, "w"),
    ):
        resumed.update(_as_dict(keys, cnts))
    assert resumed == clean


@pytest.fixture(scope="module")
def haploid_inputs(tmp_path_factory):
    import tarfile

    tar = "/root/reference/example/haploid.tar.gz"
    if not os.path.exists(tar):
        pytest.skip("reference example data not available")
    d = tmp_path_factory.mktemp("haploid")
    with tarfile.open(tar) as tf:
        tf.extractall(d)
    return d


@pytest.mark.slow
def test_spill_e2e_haploid_byte_identical(tmp_path, haploid_inputs):
    """Pipeline with spill_dir == the golden output, byte for byte."""
    import io

    from malva_tpu.pipeline import build_index, call
    from malva_tpu.utils.config import Config

    d = haploid_inputs
    cfg = Config(
        fasta_path=str(d / "haploid.fa"),
        vcf_path=str(d / "haploid.vcf"),
        sample_path=str(d / "haploid.fq"),
        bf_size=Config.bf_gb_to_bits(1),
        freq_key="AF",
        haploid=True,
        spill_dir=str(tmp_path / "spill"),
    )
    index = build_index(cfg)
    out = io.StringIO()
    call(cfg, index, out)
    golden = open("/root/reference/example/haploid.malva.vcf").read()
    assert out.getvalue() == golden


def test_native_bucket_partition_parity():
    """native.bucket_partition must stay bit-identical to _bucket_of
    (a divergence would split one key across buckets between segments of
    one store, breaking the global ci threshold)."""
    import numpy as np

    from malva_tpu.count.spill import _bucket_of
    from malva_tpu.utils import native

    if native.load() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    for w in (1, 2):
        for n in (0, 1, 17, 50000):
            keys = rng.integers(0, 1 << 63, size=(n, w), dtype=np.uint64)
            cnts = rng.integers(1, 300, size=n).astype(np.uint32)
            ok, oc, offs = native.bucket_partition(keys, cnts, 1024)
            b = _bucket_of(keys, 1024)
            order = np.argsort(b, kind="stable")
            assert (ok == keys[order]).all()
            assert (oc == cnts[order]).all()
            ref = np.zeros(1025, np.int64)
            np.add.at(ref, b + 1, 1)
            assert (offs == np.cumsum(ref)).all()
