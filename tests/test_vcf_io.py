"""VCF reader semantics: GT encoding, INFO floats, header rewrite."""

import numpy as np
import pytest

from malva_tpu.io.vcf import VECTOR_END, VcfReader, cleaned_header
from malva_tpu.variants.variant import Variant

HDR = """##fileformat=VCFv4.1
##INFO=<ID=AF,Number=A,Type=Float,Description="x">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3
"""


def _write(tmp_path, body):
    p = tmp_path / "t.vcf"
    p.write_text(HDR + body)
    return str(p)


def _read_one(tmp_path, body, **kw):
    reader = VcfReader(_write(tmp_path, body), kw.get("samples", "-"))
    rec = next(iter(reader))
    return reader, rec


def test_gt_flat_diploid(tmp_path):
    _, rec = _read_one(tmp_path, "1\t10\t.\tA\tC\t.\t.\tAF=0.5\tGT\t0|1\t1/1\t.\n")
    flat, ploidy = rec.genotypes_flat([0, 1, 2])
    assert ploidy == 2
    # htslib encoding: (allele+1)<<1 | phased
    assert flat[0:2] == [2, 5]  # 0|1
    assert flat[2:4] == [4, 4]  # 1/1
    assert flat[4] == 0  # '.' -> missing
    assert flat[5] == VECTOR_END


def test_gt_flat_haploid_record(tmp_path):
    _, rec = _read_one(tmp_path, "1\t10\t.\tA\tC\t.\t.\tAF=0.5\tGT\t0\t1\t1\n")
    flat, ploidy = rec.genotypes_flat([0, 1, 2])
    assert ploidy == 1
    assert flat == [2, 4, 4]


def test_variant_haploid_gt_extraction(tmp_path):
    reader, rec = _read_one(tmp_path, "1\t10\t.\tA\tC\t.\t.\tAF=0.5\tGT\t0\t1\t1\n")
    v = Variant(rec, reader.selected, "AF", False)
    # upstream reads the next sample's slot as the second allele when the
    # record's max ploidy is 1; last sample's OOB read is defined as copy
    assert v.genotypes == [(0, 1), (1, 1), (1, 1)]


def test_info_floats_and_missing_key(tmp_path):
    _, rec = _read_one(tmp_path, "1\t10\t.\tA\tC,G\t.\t.\tAF=0.1,0.2;DP=3\tGT\t0|0\t0|0\t0|0\n")
    vals = rec.info_floats("AF")
    assert [float(x) for x in vals] == pytest.approx([0.1, 0.2], abs=1e-7)
    assert rec.info_floats("EUR_AF") is None


def test_variant_frequencies_and_presence(tmp_path):
    reader, rec = _read_one(tmp_path, "1\t10\t.\tA\tC\t.\t.\tAF=0\tGT\t0|0\t0|0\t0|0\n")
    v = Variant(rec, reader.selected, "AF", False)
    # AF=0 -> ref freq 1.0 -> variant not present
    assert not v.is_present
    reader, rec = _read_one(tmp_path, "1\t10\t.\tA\tC\t.\t.\tAF=0.25\tGT\t0|0\t0|0\t0|0\n")
    v = Variant(rec, reader.selected, "AF", False)
    assert v.is_present
    assert float(v.frequencies[0]) == pytest.approx(0.75)


def test_symbolic_alt_dropped_and_freq_misalignment(tmp_path):
    reader, rec = _read_one(
        tmp_path, "1\t10\t.\tA\t<CN0>,C\t.\t.\tAF=0.1,0.2\tGT\t0|0\t0|0\t0|2\n"
    )
    v = Variant(rec, reader.selected, "AF", False)
    assert v.alts == [b"C"]
    # upstream indexes the INFO array by the filtered alt index: C gets 0.1
    assert float(v.frequencies[1]) == pytest.approx(0.1, abs=1e-7)


def test_sample_subset_by_file(tmp_path):
    sf = tmp_path / "samples.txt"
    sf.write_text("S3\nS1\n")
    reader, rec = _read_one(
        tmp_path, "1\t10\t.\tA\tC\t.\t.\tAF=0.5\tGT\t0|0\t1|1\t0|1\n", samples=str(sf)
    )
    assert reader.selected == [2, 0]
    flat, _ = rec.genotypes_flat(reader.selected)
    # S3 "0|1" -> [2, 5]; S1 "0|0" -> [2, 3] (phase bit on second allele)
    assert flat == [2, 5, 2, 3]


def test_cleaned_header_appends_missing_only(tmp_path):
    reader, _ = _read_one(tmp_path, "1\t10\t.\tA\tC\t.\t.\tAF=0.5\tGT\t0|0\t0|0\t0|0\n")
    hdr = cleaned_header(reader.meta_lines, verbose=False)
    assert hdr.count("ID=GT,") == 1  # present in input, not duplicated
    assert "ID=GQ," in hdr
    assert hdr.rstrip("\n").endswith("FORMAT\tDONOR")


def test_no_gt_format_means_no_alts(tmp_path):
    reader, rec = _read_one(tmp_path, "1\t10\t.\tA\tC\t.\t.\tAF=0.5\tDP\t3\t4\t5\n")
    v = Variant(rec, reader.selected, "AF", False)
    assert not v.has_alts  # bcf_get_genotypes <= 0 (variant.hpp:169-174)


def test_native_gt_parser_parity_irregular():
    """Native GT parser == Python slow path on irregular FORMATs (GT with
    siblings, GT not first, mixed ploidy, leading separator, multi-digit
    alleles, triploid)."""
    import numpy as np
    import pytest

    from malva_tpu.io.vcf import VcfRecord, _SelList
    from malva_tpu.utils.native import parse_gt

    cases = [
        ("GT", "0|1\t1/1\t./."),
        ("GT:DP", "0|1:12\t1/1:.\t.:3"),
        ("DP:GT", "12:0|1\t.:1/1\t3:2|."),
        ("GT", "0\t1\t0/1"),
        ("GT", "|1\t0/1/2\t10|11"),
        ("GT:PL", "./.:1,2\t0:9\t.|1:0"),
    ]
    for fmt, tail in cases:
        n = tail.count("\t") + 1
        rec = VcfRecord("c", 0, ".", "A", ["T"] * 12, ".", "PASS", ".", fmt, tail, n)
        sel = _SelList(range(n))
        gt_at = fmt.split(":").index("GT")
        want = rec._genotypes_flat_slow(sel, gt_at)
        got = parse_gt(tail.encode(), n, gt_at)
        if got is None:
            pytest.skip("native library unavailable")
        enc, mp = got
        flat, ploidy = want
        assert mp == ploidy
        np.testing.assert_array_equal(enc.reshape(-1), np.asarray(flat, np.int32))
