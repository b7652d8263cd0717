"""Fuzz: pipeline output must match the compiled reference oracle
byte-for-byte on random diploid/haploid inputs.

The oracle is the reference's own main.cpp/var_block.hpp compiled against
shims (tests/oracle/) — validated to reproduce the committed golden on the
haploid example.  These tests cover the diploid path the missing chr20
example would have covered: dense clusters, indels, multi-allelics,
symbolic ALTs, unphased expansion, IUPAC reference bases.
"""

import io
import os
import subprocess

import numpy as np
import pytest

from malva_tpu.pipeline import build_index, call
from malva_tpu.utils.config import Config

from fuzz_gen import gen_case

ORACLE = "/tmp/malva_oracle/malva-geno-oracle"
BUILD = os.path.join(os.path.dirname(__file__), "oracle", "build_oracle.sh")


@pytest.fixture(scope="module")
def oracle_bin():
    if not os.path.exists("/root/reference/main.cpp"):
        pytest.skip("reference sources unavailable")
    if not os.path.exists(ORACLE):
        subprocess.run(["bash", BUILD, ORACLE], check=True, capture_output=True)
    return ORACLE


def run_oracle(oracle_bin, fa, vcf, reads, haploid, tmp, samples=None, extra=()):
    env = dict(os.environ, MALVA_ORACLE_REFK="43")
    args = ["-k", "35", "-r", "43", "-b", "1", "-f", "AF"] + list(extra)
    if samples:
        args += ["-s", samples]
    if haploid:
        args = ["-1"] + args
    idx = f"{vcf}.c43.k35.malvax.zst"
    if os.path.exists(idx):
        os.unlink(idx)
    subprocess.run(
        [oracle_bin, "index"] + args + [fa, vcf, reads],
        check=True, capture_output=True, env=env, cwd=tmp,
    )
    out = subprocess.run(
        [oracle_bin, "call"] + args + [fa, vcf, reads],
        check=True, capture_output=True, env=env, cwd=tmp, text=True,
    ).stdout
    return out


def run_pipeline(fa, vcf, reads, haploid, samples="-", **cfg_extra):
    cfg = Config(
        fasta_path=fa, vcf_path=vcf, sample_path=reads,
        bf_size=Config.bf_gb_to_bits(1), haploid=haploid, samples=samples,
        **cfg_extra,
    )
    index = build_index(cfg)
    buf = io.StringIO()
    call(cfg, index, buf)
    return buf.getvalue()


@pytest.mark.slow
@pytest.mark.parametrize("seed,haploid,kw", [
    (1, False, {}), (2, False, {}), (3, True, {}), (4, False, {}),
    (5, False, {}), (6, True, {}),
    # near-contig-end variants (empty signatures -> 0/0:0 quirk)
    (8, False, {"edge": True}), (9, True, {"edge": True}),
    # IUPAC-dense reference (NUL-complement canonical forms everywhere)
    (10, False, {"iupac_rate": 0.05}), (11, True, {"iupac_rate": 0.05}),
])
def test_fuzz_matches_oracle(oracle_bin, tmp_path, seed, haploid, kw):
    d = str(tmp_path)
    fa, vcf, reads = gen_case(d, seed, haploid=haploid, **kw)
    want = run_oracle(oracle_bin, fa, vcf, reads, haploid, d)
    got = run_pipeline(fa, vcf, reads, haploid)
    if got != want:
        wl = want.splitlines()
        gl = got.splitlines()
        diffs = [
            f"line {i}:\n  oracle: {a}\n  ours:   {b}"
            for i, (a, b) in enumerate(zip(wl, gl)) if a != b
        ][:10]
        pytest.fail(
            f"output mismatch ({len(diffs)}+ lines differ of {len(wl)}):\n" + "\n".join(diffs)
        )


@pytest.mark.slow
def test_fuzz_sample_subset_matches_oracle(oracle_bin, tmp_path):
    """-s subsetting + mixed-ploidy records (max ploidy spans ALL samples
    in htslib, not just selected ones)."""
    d = str(tmp_path)
    fa, vcf, reads = gen_case(d, 7, n_samples=6, haploid=False)
    sf = f"{d}/samples.txt"
    with open(sf, "w") as f:
        f.write("S4\nS1\nS2\n")
    want = run_oracle(oracle_bin, fa, vcf, reads, False, d, samples=sf)
    got = run_pipeline(fa, vcf, reads, False, samples=sf)
    assert got == want


@pytest.mark.slow
@pytest.mark.parametrize(
    "extra,cfg_kw",
    [
        (["-u"], dict(uniform=True)),
        (["-e", "0.01"], dict(error_rate=np.float32(0.01))),
        (["-c", "3"], dict(max_coverage=3)),  # triggers over-coverage path
        (["-k", "21", "-r", "31"], dict(k=21, ref_k=31)),
        (["-k", "31", "-r", "31"], dict(k=31, ref_k=31)),  # -r == -k edge
        (["-k", "17", "-r", "48"], dict(k=17, ref_k=48)),  # ref_k % 16 == 0
    ],
)
def test_fuzz_flag_combos_match_oracle(oracle_bin, tmp_path, extra, cfg_kw):
    import numpy as np

    d = str(tmp_path)
    fa, vcf, reads = gen_case(d, 31, haploid=False)
    env = dict(os.environ, MALVA_ORACLE_REFK=str(cfg_kw.get("ref_k", 43)))
    k = cfg_kw.get("k", 35)
    rk = cfg_kw.get("ref_k", 43)
    args = ["-k", str(k), "-r", str(rk), "-b", "1", "-f", "AF"] + extra
    idx = f"{vcf}.c{rk}.k{k}.malvax.zst"
    if os.path.exists(idx):
        os.unlink(idx)
    subprocess.run([oracle_bin, "index"] + args + [fa, vcf, reads],
                   check=True, capture_output=True, env=env, cwd=d)
    want = subprocess.run([oracle_bin, "call"] + args + [fa, vcf, reads],
                          check=True, capture_output=True, env=env, cwd=d, text=True).stdout
    cfg = Config(fasta_path=fa, vcf_path=vcf, sample_path=reads,
                 bf_size=Config.bf_gb_to_bits(1), **cfg_kw)
    index = build_index(cfg)
    buf = io.StringIO()
    call(cfg, index, buf)
    assert buf.getvalue() == want


@pytest.mark.slow
@pytest.mark.parametrize("seed,haploid", [(13, False), (14, True)])
def test_fuzz_bcf_input_matches_oracle(oracle_bin, tmp_path, seed, haploid):
    """Fuzz case with the variants converted to binary BCF: our pipeline
    reading BCF must equal the oracle reading the text VCF."""
    from malva_tpu.io.bcf import write_bcf
    from malva_tpu.io.vcf import VcfReader

    d = str(tmp_path)
    fa, vcf, reads = gen_case(d, seed, haploid=haploid)
    want = run_oracle(oracle_bin, fa, vcf, reads, haploid, d)

    r = VcfReader(vcf)
    bcf = f"{d}/vars.bcf"
    write_bcf(bcf, r.meta_lines, r.sample_names, list(r), freq_key="AF")
    got = run_pipeline(fa, bcf, reads, haploid)
    assert got == want


@pytest.mark.slow
@pytest.mark.parametrize("seed,haploid", [(19, False), (20, True)])
def test_fuzz_verbose_matches_oracle(oracle_bin, tmp_path, seed, haploid):
    """-v: COVS/GTS INFO fields + the two extra header lines
    (reference: main.cpp:205-208, var_block.hpp:337-365)."""
    d = str(tmp_path)
    fa, vcf, reads = gen_case(d, seed, haploid=haploid)
    want = run_oracle(oracle_bin, fa, vcf, reads, haploid, d, extra=["-v"])
    got = run_pipeline(fa, vcf, reads, haploid, verbose=True)
    assert got == want


@pytest.mark.slow
def test_fuzz_strip_chr_matches_oracle(oracle_bin, tmp_path):
    """-p strips "chr" from FASTA ids ONLY (main.cpp:288-291,470-473);
    VCF CHROMs pass through untouched.  The intended use: chr-prefixed
    FASTA vs bare VCF contig names.  (A VCF that ALSO says "chrZ" under
    -p aborts the reference outright — refs.at() on a missing contig —
    so that degenerate case stays out of the gate, like other UB.)"""
    d = str(tmp_path)
    fa, vcf, reads = gen_case(d, 21, haploid=False, fa_name="chrZ",
                              vcf_name="Z")
    want = run_oracle(oracle_bin, fa, vcf, reads, False, d, extra=["-p"])
    got = run_pipeline(fa, vcf, reads, False, strip_chr=True)
    assert got == want


@pytest.mark.slow
def test_fuzz_batch_mode_matches_oracle(oracle_bin, tmp_path):
    """call_batch over N read sets == N independent oracle runs, byte for
    byte (counter planes are per-sample by construction)."""
    from malva_tpu.pipeline import call_batch

    d = str(tmp_path)
    fa, vcf, read_sets = gen_case(d, 23, haploid=False, n_read_sets=3)
    wants = [run_oracle(oracle_bin, fa, vcf, r, False, d) for r in read_sets]

    cfg = Config(fasta_path=fa, vcf_path=vcf, sample_path=read_sets[0],
                 bf_size=Config.bf_gb_to_bits(1))
    index = build_index(cfg)
    bufs = [io.StringIO() for _ in read_sets]
    call_batch(cfg, index, read_sets, bufs)
    assert [b.getvalue() for b in bufs] == wants


@pytest.mark.slow
@pytest.mark.parametrize("which", ["device", "spill"])
def test_fuzz_backends_match_oracle(oracle_bin, tmp_path, which):
    """The forced-device call path and the bounded-memory spill counter
    must be byte-identical to the oracle too (the other cases exercise
    the auto/host route)."""
    d = str(tmp_path)
    fa, vcf, reads = gen_case(d, 17, haploid=False)
    want = run_oracle(oracle_bin, fa, vcf, reads, False, d)
    extra = (dict(backend="device") if which == "device"
             else dict(spill_dir=f"{d}/spill"))
    got = run_pipeline(fa, vcf, reads, False, **extra)
    assert got == want
