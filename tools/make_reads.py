#!/usr/bin/env python
"""Generate a multi-Gbase FASTQ fast (vectorized, fixed-width records).

For the bounded-memory counting demonstration (BASELINE.md): reads are
sampled from a random genome with a per-base error rate, so the distinct
k-mer set is dominated by error singletons exactly like a real 30x WGS
run — the regime KMC's disk spill (and ours) exists for.

Usage: make_reads.py OUT.fq [--genome-mbp 100] [--coverage 30]
       [--read-len 100] [--error 0.01] [--seed 0]
"""

import argparse
import sys
import time

import numpy as np

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--genome-mbp", type=float, default=100.0)
    ap.add_argument("--coverage", type=float, default=30.0)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--error", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    L = int(args.genome_mbp * 1e6)
    genome = ALPHA[rng.integers(0, 4, size=L)]
    rl = args.read_len
    n_reads = int(L * args.coverage / rl)
    print(f"[reads] genome {L} bp, {n_reads} reads x {rl} bp "
          f"({n_reads * rl / 1e9:.2f} Gbase), err {args.error}", file=sys.stderr)

    # fixed-width record: "@rXXXXXXXXX\n" + seq + "\n+\n" + qual + "\n"
    head_w = 12
    rec_w = head_w + rl + 3 + rl + 1
    CHUNK = 1 << 20
    t0 = time.perf_counter()
    with open(args.out, "wb", buffering=1 << 24) as f:
        for base in range(0, n_reads, CHUNK):
            n = min(CHUNK, n_reads - base)
            starts = rng.integers(0, L - rl, size=n)
            seqs = genome[starts[:, None] + np.arange(rl)]
            err = rng.random((n, rl)) < args.error
            # error model: substitute with the next base mod 4 (always a
            # real change; distribution detail is irrelevant to counting)
            if args.error > 0:
                codes = np.searchsorted(ALPHA, seqs)
                seqs = np.where(err, ALPHA[(codes + 1) & 3], seqs)
            rec = np.empty((n, rec_w), dtype=np.uint8)
            heads = np.frombuffer(
                b"".join(b"@r%09d\n" % i for i in range(base, base + n)),
                dtype=np.uint8,
            ).reshape(n, head_w)
            rec[:, :head_w] = heads
            rec[:, head_w : head_w + rl] = seqs
            rec[:, head_w + rl : head_w + rl + 3] = np.frombuffer(b"\n+\n", np.uint8)
            rec[:, head_w + rl + 3 : -1] = ord("I")
            rec[:, -1] = ord("\n")
            f.write(rec.tobytes())
    print(f"[reads] wrote {args.out} ({n_reads * rec_w / 1e9:.2f} GB) in "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
