"""`run`/`batch` persist the index they build and reuse it next time —
the MALVA driver's skip-if-exists intent (MALVA:113-118; broken upstream:
the check tests the filename without the .zst suffix actually written at
main.cpp:407, so the reference always rebuilds)."""

import os

from malva_tpu import cli


def _inputs(tmp_path):
    fa = tmp_path / "r.fa"
    seq = ("ACGTTGCAGGTCAATCGGATCCATGCAAGTCCGATTGCACCA" * 6)[:200]
    fa.write_text(">c\n" + seq + "\n")
    vcf = tmp_path / "v.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        '##INFO=<ID=AF,Number=A,Type=Float,Description="af">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        f"c\t100\t.\t{seq[99]}\tT\t.\t.\tAF=0.5\tGT\t0|1\n"
    )
    fq = tmp_path / "s.fq"
    reads = [seq[i : i + 80] for i in range(0, 120, 20)]
    fq.write_text("".join(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n"
                          for i, r in enumerate(reads)))
    return fa, vcf, fq


def test_run_persists_and_reuses_index(tmp_path, capsys):
    fa, vcf, fq = _inputs(tmp_path)
    args = ["run", "-b", "1", str(fa), str(vcf), str(fq)]
    assert cli.main(args) == 0
    cap1 = capsys.readouterr()
    idx = str(vcf) + ".c43.k35.malvax.npz"
    assert os.path.exists(idx), "run must save the index it builds"

    assert cli.main(args) == 0
    cap2 = capsys.readouterr()
    assert "reusing index" in cap2.err
    assert cap2.out == cap1.out  # identical VCF from the reused index


def test_batch_persists_index(tmp_path, capsys):
    fa, vcf, fq = _inputs(tmp_path)
    out_dir = tmp_path / "out"
    args = ["batch", "-b", "1", "-o", str(out_dir), str(fa), str(vcf), str(fq)]
    assert cli.main(args) == 0
    capsys.readouterr()
    idx = str(vcf) + ".c43.k35.malvax.npz"
    assert os.path.exists(idx), "batch must save the index it builds"
    vcf_out = (out_dir / "s.malva.vcf").read_text()

    assert cli.main(args) == 0
    cap2 = capsys.readouterr()
    assert "reusing index" in cap2.err
    assert (out_dir / "s.malva.vcf").read_text() == vcf_out


def test_saved_index_counters_pristine(tmp_path, capsys):
    """run saves the index asynchronously WHILE the call phase mutates
    the counter planes in place — the saved file must carry zero
    counters (a reused index starts pristine, like one from `index`)."""
    import numpy as np

    from malva_tpu.pipeline import load_index

    fa, vcf, fq = _inputs(tmp_path)
    assert cli.main(["run", "-b", "1", str(fa), str(vcf), str(fq)]) == 0
    capsys.readouterr()
    idx = load_index(str(vcf) + ".c43.k35.malvax.npz")
    assert (np.asarray(idx.bf.counts) == 0).all()
    assert all(v == 0 for v in idx.ref_bf.kmers.values())
