#!/usr/bin/env python
"""Bounded-memory counting demonstration at WGS scale (BASELINE.md row).

Streams a multi-Gbase FASTQ through count_reads_kmers_spill on the host
backend and reports: total/distinct/kept k-mers, a 64-bit checksum of the
merged (key, count) stream (resume/order-independence witness), wall
time, and peak RSS — the claim under test is peak RSS far below the
reference's `kmc -m4`-style budget regardless of input size.

Usage: demo_spill_wgs.py READS.fq [--ref-k 43] [--spill DIR]
"""

import argparse
import resource
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("reads")
    ap.add_argument("--ref-k", type=int, default=43)
    ap.add_argument("--spill", default="/tmp/malva_spill_demo")
    ap.add_argument("--ci", type=int, default=2)
    ap.add_argument("--cs", type=int, default=255)
    args = ap.parse_args()

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from malva_tpu.count.spill import count_reads_kmers_spill

    t0 = time.perf_counter()
    total = 0
    distinct = 0
    chk = np.uint64(0)
    MIX = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        for keys, cnts in count_reads_kmers_spill(
            args.reads, args.ref_k, args.spill, ci=args.ci, cs=args.cs,
            use_device=False,
        ):
            distinct += keys.shape[0]
            total += int(cnts.sum())
            h = np.zeros(keys.shape[0], dtype=np.uint64)
            for j in range(keys.shape[1]):
                h ^= keys[:, j] * MIX
            h ^= cnts.astype(np.uint64)
            chk ^= np.bitwise_xor.reduce(h) if h.size else np.uint64(0)
    dt = time.perf_counter() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"[spill-demo] kept_distinct={distinct} kept_total={total} "
          f"checksum={int(chk):016x}")
    print(f"[spill-demo] wall={dt:.0f}s peak_rss={rss_gb:.2f}GB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
