"""Reference .malvax.zst index-format interop, validated BOTH directions
against the compiled reference oracle:

1. oracle `index` writes a .malvax.zst -> our importer + call == golden
2. our build_index + exporter writes a .malvax.zst -> oracle `call`
   reads it == golden
"""

import io
import os
import shutil
import subprocess

import pytest

from malva_tpu.io.malvax import read_malvax, write_malvax, zstd_compress, zstd_decompress
from malva_tpu.pipeline import Index, build_index, call
from malva_tpu.utils.config import Config

D = os.path.join(os.path.dirname(__file__), "data", "diploid")
ORACLE = "/tmp/malva_oracle/malva-geno-oracle"
BUILD = os.path.join(os.path.dirname(__file__), "oracle", "build_oracle.sh")


def test_zstd_roundtrip():
    data = b"malva" * 10000 + bytes(range(256))
    assert zstd_decompress(zstd_compress(data)) == data


@pytest.fixture(scope="module")
def oracle_bin(tmp_path_factory):
    if not os.path.exists("/root/reference/main.cpp"):
        pytest.skip("reference sources unavailable")
    # always rebuild: the sdsl shim layout must be current
    subprocess.run(["bash", BUILD, ORACLE], check=True, capture_output=True)
    return ORACLE


def _cfg(d):
    return Config(
        fasta_path=os.path.join(d, "ref.fa"),
        vcf_path=os.path.join(d, "vars.vcf"),
        sample_path=os.path.join(d, "reads.fa"),
        bf_size=Config.bf_gb_to_bits(1),
    )


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("malvax"))
    for f in ("ref.fa", "vars.vcf", "reads.fa", "golden.vcf"):
        shutil.copy(os.path.join(D, f), d)
    return d


@pytest.mark.slow
def test_import_oracle_index(oracle_bin, workdir):
    d = workdir
    env = dict(os.environ, MALVA_ORACLE_REFK="43")
    args = ["-k", "35", "-r", "43", "-b", "1", "-f", "AF"]
    subprocess.run(
        [oracle_bin, "index"] + args + ["ref.fa", "vars.vcf", "reads.fa"],
        check=True, capture_output=True, env=env, cwd=d,
    )
    bf, km, ctx = read_malvax(os.path.join(d, "vars.vcf.c43.k35.malvax.zst"))
    index = Index(bf=bf, ref_bf=km, context_bf=ctx)
    cfg = _cfg(d)
    out = io.StringIO()
    call(cfg, index, out)
    assert out.getvalue() == open(os.path.join(d, "golden.vcf")).read()


@pytest.mark.slow
def test_export_index_for_oracle(oracle_bin, workdir):
    d = workdir
    cfg = _cfg(d)
    index = build_index(cfg)
    write_malvax(index, os.path.join(d, "vars.vcf.c43.k35.malvax.zst"))
    env = dict(os.environ, MALVA_ORACLE_REFK="43")
    args = ["-k", "35", "-r", "43", "-b", "1", "-f", "AF"]
    out = subprocess.run(
        [oracle_bin, "call"] + args + ["ref.fa", "vars.vcf", "reads.fa"],
        check=True, capture_output=True, env=env, cwd=d, text=True,
    ).stdout
    assert out == open(os.path.join(d, "golden.vcf")).read()
