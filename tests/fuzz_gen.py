"""Random (reference, VCF, reads) generator for oracle-vs-pipeline fuzzing.

Generates adversarial genotyping inputs: dense variant clusters (to force
combination growth + haplotype expansion), indels, multi-allelics,
symbolic alternates, IUPAC bases in the reference, phased/unphased
mixtures, missing/zero AF values, and reads sampled from mutated
haplotypes with errors.
"""

from __future__ import annotations

import numpy as np

BASES = "ACGT"


def gen_reference(rng, length, iupac_rate=0.002):
    seq = rng.choice(list(BASES), size=length)
    n_iupac = rng.binomial(length, iupac_rate)
    if n_iupac:
        pos = rng.choice(length, size=n_iupac, replace=False)
        seq[pos] = rng.choice(list("RYSWKMN"), size=n_iupac)
    return "".join(seq)


def gen_variants(rng, ref, n_var, n_samples, haploid=False, dense_frac=0.4,
                 edge=False):
    """Returns list of VCF record dicts, position-sorted."""
    L = len(ref)
    positions = []
    if edge:
        # near-contig-end variants (within k of either end): upstream
        # yields empty signatures -> 0/0:0 (var_block.hpp:104-111)
        positions += [1, 3, 9, 20]
    i = 50
    while len(positions) < n_var and i < L - 60:
        if rng.random() < dense_frac:
            step = int(rng.integers(1, 8))  # dense cluster
        else:
            step = int(rng.integers(10, 80))
        i += step
        if i < L - 60:
            positions.append(i)
    if edge:
        positions += [L - 8, L - 3]
    records = []
    for pos in positions:
        r = rng.random()
        if pos + 7 > L:  # end-edge: plain SNP only (ref must fit the contig)
            r = 0.0
        if r < 0.6:  # SNP
            ref_a = ref[pos]
            n_alts = 1 if rng.random() < 0.8 else 2
            alts = list(rng.choice([b for b in BASES if b != ref_a.upper()], size=n_alts, replace=False))
        elif r < 0.8:  # deletion
            dlen = int(rng.integers(1, 6))
            ref_a = ref[pos : pos + 1 + dlen]
            alts = [ref[pos]]
        else:  # insertion
            ilen = int(rng.integers(1, 6))
            ref_a = ref[pos]
            alts = [ref[pos] + "".join(rng.choice(list(BASES), size=ilen))]
        if rng.random() < 0.08:
            # symbolic alt, sometimes first (exercises the upstream AF
            # misalignment where INFO freqs are indexed by filtered position)
            if rng.random() < 0.5:
                alts.insert(0, "<CN0>")
            else:
                alts.append("<CN0>")
        n_real = len([a for a in alts if not a.startswith("<")])
        afs = np.round(rng.random(len(alts)) * 0.4 + 0.01, 4)
        if rng.random() < 0.1:
            afs[0] = 0.0  # absent variant
        gts = []
        for _ in range(n_samples):
            def allele():
                # GT indices beyond 1 + n_real_alts are UB upstream
                # (get_allele reads past the filtered alts vector) — the
                # oracle segfaults there, so the fuzzer stays in defined
                # territory.
                if rng.random() < 0.65:
                    return 0
                return int(rng.integers(1, n_real + 1))
            if haploid:
                gts.append(str(allele()))
            else:
                if rng.random() < 0.05:
                    # mixed ploidy: haploid GT inside a diploid cohort
                    # (htslib pads with vector_end; second allele copies)
                    gts.append(str(allele()))
                    continue
                sep = "|" if rng.random() < 0.5 else "/"
                a, b = allele(), allele()
                if rng.random() < 0.05:
                    gts.append(f".{sep}{b}")
                else:
                    gts.append(f"{a}{sep}{b}")
        records.append({
            "pos": pos,  # 0-based
            "ref": ref_a,
            "alts": alts,
            "afs": afs.tolist(),
            "gts": gts,
        })
    return records


def write_vcf(path, ref_name, ref_len, records, n_samples):
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.1\n")
        f.write('##FILTER=<ID=PASS,Description="All filters passed">\n')
        f.write(f"##contig=<ID={ref_name},length={ref_len}>\n")
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n')
        f.write('##INFO=<ID=AF,Number=A,Type=Float,Description="Allele Frequency">\n')
        cols = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO", "FORMAT"]
        cols += [f"S{i}" for i in range(n_samples)]
        f.write("\t".join(cols) + "\n")
        for i, r in enumerate(records):
            af = ",".join(f"{a:g}" for a in r["afs"])
            row = [
                ref_name, str(r["pos"] + 1), f"v{i}", r["ref"], ",".join(r["alts"]),
                ".", ".", f"AF={af}", "GT",
            ] + r["gts"]
            f.write("\t".join(row) + "\n")


def apply_haplotype(ref, records, rng):
    """Apply a random subset of alt alleles to produce a mutated sequence."""
    out = []
    last = 0
    for r in records:
        if rng.random() < 0.5:
            continue
        real_alts = [a for a in r["alts"] if not a.startswith("<")]
        if not real_alts:
            continue
        pos = r["pos"]
        if pos < last:
            continue
        out.append(ref[last:pos])
        out.append(str(rng.choice(real_alts)))
        last = pos + len(r["ref"])
    out.append(ref[last:])
    return "".join(out)


def write_reads(path, ref, records, rng, n_reads=400, read_len=120, err=0.002):
    with open(path, "w") as f:
        for i in range(n_reads):
            hap = apply_haplotype(ref, records, rng) if rng.random() < 0.7 else ref
            if len(hap) <= read_len:
                start = 0
            else:
                start = int(rng.integers(0, len(hap) - read_len))
            read = list(hap[start : start + read_len])
            for j in range(len(read)):
                if rng.random() < err:
                    read[j] = str(rng.choice(list(BASES)))
            f.write(f">r{i}\n{''.join(read)}\n")


def gen_case(tmpdir, seed, n_samples=4, haploid=False, ref_len=4000, n_var=60,
             iupac_rate=0.002, edge=False, fa_name="ctg1", vcf_name=None,
             n_read_sets=1):
    """``fa_name``/``vcf_name`` let the FASTA id and VCF CHROM differ
    (the -p strip_chr flag only rewrites FASTA ids upstream,
    main.cpp:288-291).  ``n_read_sets`` > 1 returns a list of read paths
    (independent mutated-haplotype samples for batch-mode fuzzing)."""
    rng = np.random.default_rng(seed)
    ref = gen_reference(rng, ref_len, iupac_rate=iupac_rate)
    records = gen_variants(rng, ref, n_var, n_samples, haploid=haploid, edge=edge)
    fa = f"{tmpdir}/ref.fa"
    with open(fa, "w") as f:
        f.write(f">{fa_name}\n")
        for i in range(0, len(ref), 70):
            f.write(ref[i : i + 70] + "\n")
    vcf = f"{tmpdir}/vars.vcf"
    write_vcf(vcf, vcf_name or fa_name, len(ref), records, n_samples)
    if n_read_sets > 1:
        reads = []
        for j in range(n_read_sets):
            reads.append(f"{tmpdir}/reads{j}.fa")
            write_reads(reads[-1], ref, records, rng)
        return fa, vcf, reads
    reads = f"{tmpdir}/reads.fa"
    write_reads(reads, ref, records, rng)
    return fa, vcf, reads
