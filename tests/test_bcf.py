"""Binary BCF 2.2 input: round-trip fidelity and pipeline equivalence.

No BCF tooling (bcftools/pysam) exists in this environment, so the writer
is spec-conformant by construction (VCFv4.2 §6) and the reader is gated on
(a) loss-free round trips over every field the genotyper consumes and
(b) byte-identical pipeline output vs the text-VCF path on the committed
haploid golden example.
"""

import gzip
import io
import tarfile

import numpy as np
import pytest

from malva_tpu.io.bcf import BcfReader, is_bcf, write_bcf
from malva_tpu.io.vcf import VcfReader, open_variant_reader

HDR = """##fileformat=VCFv4.2
##INFO=<ID=AF,Number=A,Type=Float,Description="Allele Frequency">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
##contig=<ID=chr1>
##contig=<ID=chr2>
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3
"""

BODY = """chr1\t100\trs1\tA\tT\t50.5\tPASS\tAF=0.25\tGT\t0|1\t1/1\t0/0
chr1\t200\t.\tAC\tA,ACC\t.\tPASS\tAF=0.1,0.05\tGT\t1|2\t0/0\t.
chr2\t50\tid2\tG\tC\t10\tPASS\tAF=0.5\tGT\t1\t0\t0/1
chr2\t75\tid3\tT\tTTT\t.\tPASS\t.\tGT\t./1\t1|.\t0/0
"""


def _text_vcf(tmp_path, body=BODY):
    p = tmp_path / "in.vcf"
    p.write_text(HDR + body)
    return str(p)


def test_roundtrip_fields(tmp_path):
    src = _text_vcf(tmp_path)
    r1 = VcfReader(src)
    recs = list(r1)
    bcf = str(tmp_path / "in.bcf")
    write_bcf(bcf, r1.meta_lines, r1.sample_names, recs, freq_key="AF")

    assert is_bcf(bcf)
    r2 = BcfReader(bcf)
    assert r2.sample_names == r1.sample_names
    out = list(r2)
    assert len(out) == len(recs)
    sel = r1.selected
    for a, b in zip(recs, out):
        assert (a.chrom, a.pos0, a.idx, a.ref, a.alts_raw) == (
            b.chrom, b.pos0, b.idx, b.ref, b.alts_raw
        )
        qa, qb = a.qual(), b.qual()
        assert (np.isnan(qa) and np.isnan(qb)) or qa == qb
        fa, fb = a.info_floats("AF"), b.info_floats("AF")
        if fa is None:
            assert fb is None
        else:
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
        ga = a.genotypes_arrays(sel)
        gb = b.genotypes_arrays(r2.selected)
        assert (ga is None) == (gb is None)
        if ga is not None:
            np.testing.assert_array_equal(ga[0], gb[0])
            assert ga[1] == gb[1]


def test_sample_subsetting(tmp_path):
    src = _text_vcf(tmp_path)
    r1 = VcfReader(src)
    recs = list(r1)
    bcf = str(tmp_path / "in.bcf")
    write_bcf(bcf, r1.meta_lines, r1.sample_names, recs, freq_key="AF")
    sfile = tmp_path / "samples.txt"
    sfile.write_text("S3\nS1\n")
    rt = VcfReader(src, str(sfile))
    rb = BcfReader(bcf, str(sfile))
    for a, b in zip(rt, rb):
        ga = a.genotypes_arrays(rt.selected)
        gb = b.genotypes_arrays(rb.selected)
        np.testing.assert_array_equal(ga[0], gb[0])


def test_sniffing(tmp_path):
    src = _text_vcf(tmp_path)
    assert not is_bcf(src)
    gz = str(tmp_path / "in.vcf.gz")
    with gzip.open(gz, "wt") as f:
        f.write(HDR + BODY)
    assert not is_bcf(gz)
    assert isinstance(open_variant_reader(src), VcfReader)
    r1 = VcfReader(src)
    bcf = str(tmp_path / "in.bcf")
    write_bcf(bcf, r1.meta_lines, r1.sample_names, list(r1), freq_key="AF")
    assert isinstance(open_variant_reader(bcf), BcfReader)


def test_pipeline_output_identical_from_bcf(tmp_path):
    """Full pipeline on the haploid golden example with the VCF converted
    to binary BCF: the emitted VCF must be byte-identical to the text run
    (which itself is byte-identical to the reference golden)."""
    from malva_tpu.pipeline import build_index, call
    from malva_tpu.utils.config import Config

    with tarfile.open("/root/reference/example/haploid.tar.gz") as tf:
        tf.extractall(tmp_path)
    fa = str(tmp_path / "haploid.fa")
    vcf = str(tmp_path / "haploid.vcf")
    fq = str(tmp_path / "haploid.fq")

    r = VcfReader(vcf)
    bcf = str(tmp_path / "haploid.bcf")
    write_bcf(bcf, r.meta_lines, r.sample_names, list(r), freq_key="AF")

    outs = {}
    for variants in (vcf, bcf):
        cfg = Config(
            fasta_path=fa, vcf_path=variants, sample_path=fq,
            k=35, ref_k=43, bf_size=Config.bf_gb_to_bits(1),
            haploid=True, freq_key="AF",
        )
        index = build_index(cfg)
        buf = io.StringIO()
        call(cfg, index, buf)
        outs[variants] = buf.getvalue()

    body_vcf = outs[vcf].split("#CHROM", 1)[1]
    body_bcf = outs[bcf].split("#CHROM", 1)[1]
    assert body_vcf == body_bcf
    with open("/root/reference/example/haploid.malva.vcf") as f:
        assert outs[vcf] == f.read()
