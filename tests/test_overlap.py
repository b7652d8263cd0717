"""Overlapped `run`: counting runs in a helper process while the index
phase builds (VERDICT r4 ask #2).  Output must be byte-identical to the
serial path — the overlap only reorders work between disjoint inputs."""

import os
import tarfile

import pytest

from malva_tpu import cli

REF_EXAMPLE = "/root/reference/example"


@pytest.fixture(scope="module")
def haploid_inputs(tmp_path_factory):
    tar = os.path.join(REF_EXAMPLE, "haploid.tar.gz")
    if not os.path.exists(tar):
        pytest.skip("reference example data not available")
    d = tmp_path_factory.mktemp("overlap")
    with tarfile.open(tar) as tf:
        tf.extractall(d)
    return d


@pytest.mark.slow
def test_overlapped_run_matches_golden(haploid_inputs, tmp_path, capsys,
                                       monkeypatch):
    d = haploid_inputs
    monkeypatch.setenv("MALVA_OVERLAP_MIN_BYTES", "1")  # force the overlap
    args = ["run", "-1", "-b", "1", "-f", "AF",
            str(d / "haploid.fa"), str(d / "haploid.vcf"),
            str(d / "haploid.fq")]
    assert cli.main(args) == 0
    cap = capsys.readouterr()
    assert "counting overlapped with index build" in cap.err
    golden = open(os.path.join(REF_EXAMPLE, "haploid.malva.vcf")).read()
    assert cap.out == golden
    os.remove(str(d / "haploid.vcf") + ".c43.k35.malvax.npz")


@pytest.mark.slow
def test_overlap_disabled_env(haploid_inputs, tmp_path, capsys, monkeypatch):
    d = haploid_inputs
    monkeypatch.setenv("MALVA_OVERLAP_MIN_BYTES", "1")
    monkeypatch.setenv("MALVA_NO_OVERLAP", "1")
    args = ["run", "-1", "-b", "1", "-f", "AF",
            str(d / "haploid.fa"), str(d / "haploid.vcf"),
            str(d / "haploid.fq")]
    assert cli.main(args) == 0
    cap = capsys.readouterr()
    assert "counting overlapped" not in cap.err
    golden = open(os.path.join(REF_EXAMPLE, "haploid.malva.vcf")).read()
    assert cap.out == golden
    os.remove(str(d / "haploid.vcf") + ".c43.k35.malvax.npz")
