"""Context-filter semantics, exercised for real.

The committed examples never set a context bit (no alt-allele k-mer of
their VCFs occurs anywhere in the reference), so this test constructs the
scenario the context filter exists for (reference main.cpp:382-401,
SURVEY.md §0): the reference contains a second copy of a variant's
region WITH the alternate allele applied, so the alt signature's k-mers
occur in the reference itself — their sample coverage must be credited to
the reference context, not the alt allele.  Output must match the
compiled reference oracle byte-for-byte AND the context filter must be
non-trivially populated.
"""

import io
import os
import subprocess

import numpy as np
import pytest

from malva_tpu.pipeline import build_index, call
from malva_tpu.utils.config import Config

ORACLE = "/tmp/malva_oracle/malva-geno-oracle"
BUILD = os.path.join(os.path.dirname(__file__), "oracle", "build_oracle.sh")


@pytest.fixture(scope="module")
def oracle_bin():
    if not os.path.exists("/root/reference/main.cpp"):
        pytest.skip("reference sources unavailable")
    if not os.path.exists(ORACLE):
        subprocess.run(["bash", BUILD, ORACLE], check=True, capture_output=True)
    return ORACLE


def _make_case(d: str):
    rng = np.random.default_rng(99)
    bases = "ACGT"
    seg = "".join(rng.choice(list(bases), size=300))
    var_off = 150
    ref_base = seg[var_off]
    alt_base = next(b for b in bases if b != ref_base)
    seg_mut = seg[:var_off] + alt_base + seg[var_off + 1 :]
    pad1 = "".join(rng.choice(list(bases), size=120))
    pad2 = "".join(rng.choice(list(bases), size=90))
    pad3 = "".join(rng.choice(list(bases), size=120))
    ref = pad1 + seg + pad2 + seg_mut + pad3
    var_pos0 = len(pad1) + var_off  # variant inside the FIRST copy

    fa = os.path.join(d, "ref.fa")
    with open(fa, "w") as f:
        f.write(">c1\n")
        for i in range(0, len(ref), 70):
            f.write(ref[i : i + 70] + "\n")

    vcf = os.path.join(d, "vars.vcf")
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.1\n")
        f.write(f"##contig=<ID=c1,length={len(ref)}>\n")
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n')
        f.write('##INFO=<ID=AF,Number=A,Type=Float,Description="AF">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS0\tS1\n")
        f.write(
            f"c1\t{var_pos0 + 1}\tv0\t{ref_base}\t{alt_base}\t.\t.\tAF=0.3\tGT\t0|1\t0|0\n"
        )

    reads = os.path.join(d, "reads.fa")
    with open(reads, "w") as f:
        # reads only from the unmutated reference — any "alt" k-mers the
        # sample shows come from the second (mutated) genomic copy and
        # must be suppressed by the context filter
        for i in range(160):
            s = int(rng.integers(0, len(ref) - 100))
            f.write(f">r{i}\n{ref[s : s + 100]}\n")
    return fa, vcf, reads


@pytest.mark.slow
def test_context_filter_matches_oracle(oracle_bin, tmp_path):
    d = str(tmp_path)
    fa, vcf, reads = _make_case(d)

    cfg = Config(fasta_path=fa, vcf_path=vcf, sample_path=reads,
                 bf_size=Config.bf_gb_to_bits(1))
    index = build_index(cfg)
    # the scenario must actually populate the context filter
    assert len(index.context_bf.counts) > 0

    out = io.StringIO()
    call(cfg, index, out)

    env = dict(os.environ, MALVA_ORACLE_REFK="43")
    args = ["-k", "35", "-r", "43", "-b", "1", "-f", "AF"]
    subprocess.run([oracle_bin, "index"] + args + [fa, vcf, reads],
                   check=True, capture_output=True, env=env, cwd=d)
    want = subprocess.run([oracle_bin, "call"] + args + [fa, vcf, reads],
                          check=True, capture_output=True, env=env, cwd=d, text=True).stdout
    assert out.getvalue() == want
