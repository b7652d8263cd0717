#!/usr/bin/env python
"""Golden-VCF comparator (reimplements the reference's malva-test tool).

Record-by-record lock-step comparison (reference:
malva_test/malva_test.cpp:162-231): a record matches iff CHROM, POS, ID,
REF+ALTs, GT arity (haploid vs diploid), GT value and GQ-within-tolerance
all agree; prints NOT FOUND lines for mismatches and a final precision %.

Usage: compare_vcf.py [-t GQ_TOLERANCE] <out.vcf> <golden.vcf>
Exit status 0 iff every record matches.
"""

from __future__ import annotations

import argparse
import gzip
import sys


def _records(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            cols = line.rstrip("\n").split("\t")
            gt, gq = (cols[9].split(":") + ["0"])[:2]
            yield {
                "chrom": cols[0],
                "pos": cols[1],
                "id": cols[2],
                "ref": cols[3],
                "alts": cols[4],
                "gt": gt,
                "gq": int(float(gq)),
                "line": line.rstrip("\n"),
            }


def equal_gt(a: str, b: str) -> bool:
    return a == b


def equal_gq(a: int, b: int, tol: int) -> bool:
    lo = max(0, b - tol)
    hi = min(100, b + tol)
    return lo <= a <= hi


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-t", "--tolerance", type=int, default=0)
    ap.add_argument("out_vcf")
    ap.add_argument("golden_vcf")
    args = ap.parse_args()

    total = 0
    matched = 0
    for got, want in zip(_records(args.out_vcf), _records(args.golden_vcf)):
        total += 1
        ok = (
            got["chrom"] == want["chrom"]
            and got["pos"] == want["pos"]
            and got["id"] == want["id"]
            and got["ref"] == want["ref"]
            and got["alts"] == want["alts"]
            and len(got["gt"]) == len(want["gt"])
            and equal_gt(got["gt"], want["gt"])
            and equal_gq(got["gq"], want["gq"], args.tolerance)
        )
        if ok:
            matched += 1
        else:
            print(f"NOT FOUND: {want['line']}")
            print(f"      GOT: {got['line']}")

    n_out = sum(1 for _ in _records(args.out_vcf))
    n_gold = sum(1 for _ in _records(args.golden_vcf))
    if n_out != n_gold:
        print(f"RECORD COUNT MISMATCH: out={n_out} golden={n_gold}")
    precision = 100.0 * matched / total if total else 0.0
    print(f"Matched {matched}/{total} records — precision {precision:.3f}%")
    return 0 if matched == total and n_out == n_gold else 1


if __name__ == "__main__":
    sys.exit(main())
