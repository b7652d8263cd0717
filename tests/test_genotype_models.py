"""Genotype model: host exact path behaviors + device model agreement."""

import math

import numpy as np
import pytest

from malva_tpu.models.genotype import format_variants, genotype_block, log_binomial
from malva_tpu.models.genotype_jax import make_genotype_fn


class FakeVariant:
    def __init__(self, coverages, freqs, seq_name="1", pos=0):
        self.seq_name = seq_name
        self.ref_pos = pos
        self.idx = "."
        self.ref_sub = b"A"
        self.alts = [b"C"] * (len(coverages) - 1)
        self.quality = np.float32("nan")
        self.filt = "PASS"
        self.coverages = list(coverages)
        self.frequencies = [np.float32(f) for f in freqs]
        self.computed_gts = []

    def add_genotype(self, geno, prob):
        self.computed_gts.append((geno, prob))


def test_log_binomial_edges():
    assert log_binomial(0, 0) == 0.0
    assert log_binomial(5, 5) == 0.0
    assert log_binomial(5, 0) == 0.0
    assert log_binomial(10, 3) == pytest.approx(
        10 * math.log(10) - 3 * math.log(3) - 7 * math.log(7)
    )


def test_over_coverage_short_circuit():
    v = FakeVariant([250, 10], [0.5, 0.5])
    genotype_block([v], 200, False, np.float32(0.001))
    # one 0/0-with-0 entry per over-covered allele (upstream quirk)
    assert v.computed_gts == [("0/0", 0.0)]
    v2 = FakeVariant([250, 300], [0.5, 0.5])
    genotype_block([v2], 200, False, np.float32(0.001))
    assert v2.computed_gts == [("0/0", 0.0), ("0/0", 0.0)]


def test_no_coverage_default_genotype():
    v = FakeVariant([0, 0], [0.5, 0.5])
    genotype_block([v], 200, False, np.float32(0.001))
    lines = format_variants([v], haploid=False, verbose=False)
    assert lines[0].endswith("0/0:0")


def test_het_call():
    v = FakeVariant([15, 14], [0.7, 0.3])
    genotype_block([v], 200, False, np.float32(0.001))
    lines = format_variants([v], haploid=False, verbose=False)
    gt, gq = lines[0].split("\t")[-1].split(":")
    assert gt == "0/1"
    assert int(gq) > 90


def test_device_model_agrees_with_host_argmax():
    rng = np.random.default_rng(5)
    B, A = 256, 3
    cov = rng.integers(0, 40, size=(B, A)).astype(np.int32)
    freqs = rng.random((B, A)).astype(np.float32)
    freqs /= freqs.sum(axis=1, keepdims=True)
    n_all = np.full(B, A, dtype=np.int32)

    geno_fn = make_genotype_fn(A, haploid=False, error_rate=0.001, max_cov=200)
    g1, g2, gq = (np.asarray(x) for x in geno_fn(cov, freqs, n_all))

    agree = 0
    for i in range(B):
        v = FakeVariant(cov[i].tolist(), freqs[i].tolist())
        genotype_block([v], 200, False, np.float32(0.001))
        line = format_variants([v], haploid=False, verbose=False)[0]
        gt, hq = line.split("\t")[-1].split(":")
        want = tuple(int(x) for x in gt.split("/"))
        if want == (int(g1[i]), int(g2[i])):
            agree += 1
            # GQ within rounding noise of f32 vs f64
            assert abs(int(hq) - int(gq[i])) <= 2
    # f32 vs f64 may disagree only on near-ties
    assert agree >= B * 0.97


def test_native_genotype_block_parity():
    """Native likelihood kernel == scalar Python mirror, bit-exact
    (libm double log/exp with float32 operand pre-rounding)."""
    import numpy as np

    from malva_tpu.models import genotype as G

    class FakeVariant:
        def __init__(self, cov, freqs):
            self.coverages = list(cov)
            self.frequencies = [np.float32(f) for f in freqs]
            self.computed_gts = []

        def add_genotype(self, g, p):
            self.computed_gts.append((g, p))

    rng = np.random.default_rng(0)
    for haploid in (True, False):
        for trial in range(150):
            n_all = int(rng.integers(1, 6))
            cov = rng.integers(0, 250, size=n_all).tolist()
            freqs = rng.random(n_all).astype(np.float32)
            if trial % 7 == 0:
                freqs[0] = np.float32(0.0)
            if trial % 11 == 0:
                cov = [0] * n_all
            v1, v2 = FakeVariant(cov, freqs), FakeVariant(cov, freqs)
            G.genotype_block_py([v1], 200, haploid, np.float32(0.001))
            if not G._genotype_block_native([v2], 200, haploid, np.float32(0.001)):
                import pytest

                pytest.skip("native library unavailable")
            assert len(v1.computed_gts) == len(v2.computed_gts)
            for (g1, p1), (g2, p2) in zip(v1.computed_gts, v2.computed_gts):
                assert g1 == g2
                assert (p1 == p2) or (np.isnan(p1) and np.isnan(p2))
