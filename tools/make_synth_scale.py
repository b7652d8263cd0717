#!/usr/bin/env python
"""Generate a chr20-scale synthetic dataset (genome + cohort VCF + reads).

The reference's chr20 example inputs (data.tar.gz) are absent from its
snapshot (SURVEY.md §2 row 16), so scale validation uses this generator:
a ~30 Mbp contig with N islands, a diploid cohort VCF (SNPs + indels,
multiallelic mix, phased/unphased, AF priors), and an error-free read set
sampled from the reference genome. Deterministic by seed.

Usage: make_synth_scale.py OUTDIR [--mbp 30] [--variants 200000]
       [--samples 50] [--coverage 5] [--seed 0]
"""

import argparse
import os
import sys

import numpy as np

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--mbp", type=float, default=30.0)
    ap.add_argument("--variants", type=int, default=200_000)
    ap.add_argument("--samples", type=int, default=50)
    ap.add_argument("--coverage", type=float, default=5.0)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    L = int(args.mbp * 1e6)
    genome = ALPHA[rng.integers(0, 4, size=L)]
    # N islands (like centromeric gaps)
    for _ in range(5):
        s = int(rng.integers(0, L - 10000))
        genome[s : s + int(rng.integers(100, 10000))] = ord("N")

    fa = os.path.join(args.outdir, "synth.fa")
    with open(fa, "wb") as f:
        f.write(b">syn20\n")
        for i in range(0, L, 60):
            f.write(genome[i : i + 60].tobytes() + b"\n")
    print(f"wrote {fa} ({L} bp)", file=sys.stderr)

    # variants at distinct positions on pure-ACGT ground
    pos = np.sort(rng.choice(L - 100, size=args.variants * 2, replace=False)) + 50
    ok = np.array([genome[p - 1 : p + 9].max() <= ord("T") for p in pos])
    pos = pos[ok][: args.variants]
    S = args.samples
    vcf = os.path.join(args.outdir, "synth.vcf")

    def gt_block(n_alt: int) -> bytes:
        """One record's sample columns ("\ta|b" x S + "\n"), vectorized —
        a 2,504-sample cohort VCF is unwritable with per-sample f-strings."""
        a = rng.integers(0, n_alt + 1, size=(S, 2)).astype(np.uint8) + ord("0")
        sep = np.where(rng.random(S) < 0.5, ord("|"), ord("/")).astype(np.uint8)
        blk = np.empty((S, 4), dtype=np.uint8)
        blk[:, 0] = ord("\t")
        blk[:, 1] = a[:, 0]
        blk[:, 2] = sep
        blk[:, 3] = a[:, 1]
        out = blk.reshape(-1).tobytes() + b"\n"
        return out

    with open(vcf, "wb", buffering=1 << 24) as f:
        f.write(b"##fileformat=VCFv4.2\n")
        f.write(b'##INFO=<ID=AF,Number=A,Type=Float,Description="Allele Frequency">\n')
        f.write(b'##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n')
        f.write(b"##contig=<ID=syn20>\n")
        f.write(("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 + "\t".join(f"S{i}" for i in range(S)) + "\n").encode())
        bases = "ACGT"
        for vi, p in enumerate(pos.tolist()):
            ref_b = chr(genome[p - 1])  # POS is 1-based
            kind = rng.random()
            if kind < 0.8:  # SNP (sometimes multiallelic)
                alts = [b for b in bases if b != ref_b]
                n_alt = 1 if rng.random() < 0.9 else 2
                alt = ",".join(alts[:n_alt])
                ref = ref_b
            elif kind < 0.9:  # insertion
                ins = "".join(bases[i] for i in rng.integers(0, 4, size=int(rng.integers(1, 6))))
                ref = ref_b
                alt = ref_b + ins
                n_alt = 1
            else:  # deletion
                dl = int(rng.integers(1, 6))
                ref = ref_b + "".join(chr(c) for c in genome[p : p + dl])
                if "N" in ref:
                    ref = ref_b
                alt = ref_b if len(ref) > 1 else ref_b + "A"
                if len(ref) == 1:
                    ref = ref_b + "C"
                    alt = ref_b
                n_alt = 1
            afs = np.round(rng.random(n_alt) * 0.5 + 0.001, 4)
            f.write(
                (f"syn20\t{p}\tv{vi}\t{ref}\t{alt}\t.\tPASS\t"
                 f"AF={','.join(str(a) for a in afs)}\tGT").encode()
                + gt_block(n_alt)
            )
    print(f"wrote {vcf} ({len(pos)} records x {S} samples)", file=sys.stderr)

    rl = args.read_len
    n_reads = int(L * args.coverage / rl)
    fq = os.path.join(args.outdir, "synth.fq")
    starts = rng.integers(0, L - rl, size=n_reads)
    qual = b"I" * rl
    with open(fq, "wb") as f:
        for i, s in enumerate(starts.tolist()):
            f.write(b"@r%d\n" % i)
            f.write(genome[s : s + rl].tobytes())
            f.write(b"\n+\n")
            f.write(qual + b"\n")
    print(f"wrote {fq} ({n_reads} reads, {args.coverage}x)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
