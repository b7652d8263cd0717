"""End-to-end golden gate: haploid SARS-CoV-2-derived example.

Runs the full pipeline (count -> index -> call) in process on the
reference repo's committed example inputs and requires byte-identical
output to the reference binary's committed golden VCF
(/root/reference/example/haploid.malva.vcf, 418 records) — the correctness
anchor from BASELINE.md.
"""

import io
import os
import tarfile

import numpy as np
import pytest

from malva_tpu.pipeline import build_index, call
from malva_tpu.utils.config import Config

REF_EXAMPLE = "/root/reference/example"


@pytest.fixture(scope="module")
def haploid_inputs(tmp_path_factory):
    tar = os.path.join(REF_EXAMPLE, "haploid.tar.gz")
    if not os.path.exists(tar):
        pytest.skip("reference example data not available")
    d = tmp_path_factory.mktemp("haploid")
    with tarfile.open(tar) as tf:
        tf.extractall(d)
    return d


@pytest.mark.slow
def test_haploid_golden_bit_identical(haploid_inputs):
    d = haploid_inputs
    cfg = Config(
        fasta_path=str(d / "haploid.fa"),
        vcf_path=str(d / "haploid.vcf"),
        sample_path=str(d / "haploid.fq"),
        bf_size=Config.bf_gb_to_bits(1),
        freq_key="AF",
        haploid=True,
    )
    index = build_index(cfg)
    out = io.StringIO()
    call(cfg, index, out)
    golden = open(os.path.join(REF_EXAMPLE, "haploid.malva.vcf")).read()
    assert out.getvalue() == golden
