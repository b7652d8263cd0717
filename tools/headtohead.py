#!/usr/bin/env python
"""One-command head-to-head: ours vs the compiled reference oracle.

Reproduces every BASELINE.md head-to-head row — seeded input generation,
our CLI and the oracle run on the SAME inputs with wall-time + peak-RSS
capture, outputs byte-compared — so each published number is one command:

  python tools/headtohead.py chr            # 10 Mbp / 100k rec x 50 samples
  python tools/headtohead.py 1000g          # 100 Mbp / 1M rec x 2,504 samples
  python tools/headtohead.py sars           # committed SARS VCF + 30x reads
  python tools/headtohead.py haploid        # committed example + golden

The oracle is the reference main.cpp compiled in place against our shims
(tests/oracle/build_oracle.sh; KMC replaced by an independent in-shim
counter with default ci=2/cs=255 semantics, MALVA_ORACLE_REFK=43).
Flags: --skip-oracle reuses a previous oracle output/timing in OUTDIR if
present (the oracle's 1000G run is ~70 min); --keep retains inputs for
re-runs; --ours-only / --oracle-only time one side.

Prints a markdown table row + one JSON line per run; both are appended to
OUTDIR/headtohead.jsonl for the ledger.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("MALVA_REFERENCE", "/root/reference")
ORACLE = "/tmp/malva_oracle/malva-geno-oracle"

SCALES = {
    # name: (synth kwargs | None, haploid, spill)
    "chr": (dict(mbp=10.0, variants=100_000, samples=50, coverage=5.0,
                 seed=7), False, False),
    "1000g": (dict(mbp=100.0, variants=1_000_000, samples=2504, coverage=5.0,
                   seed=11), False, True),
    "sars": (None, True, False),     # committed SARS VCF + sampled 30x reads
    "haploid": (None, True, False),  # committed example, golden-checked
}


def log(msg: str) -> None:
    print(f"[headtohead] {msg}", file=sys.stderr)


def timed_run(args, env, stdout_path, tag):
    """Run a child to completion; return (wall_s, peak_rss_gb, rc)."""
    log(f"{tag}: {' '.join(args[:6])} ...")
    t0 = time.perf_counter()
    with open(stdout_path, "wb") as out, open(stdout_path + ".err", "wb") as err:
        p = subprocess.Popen(args, env=env, stdout=out, stderr=err)
        _, status, ru = os.wait4(p.pid, 0)
    wall = time.perf_counter() - t0
    rss_gb = ru.ru_maxrss / 1e6  # linux: KB
    rc = os.waitstatus_to_exitcode(status)
    log(f"{tag}: {wall:.1f} s, peak {rss_gb:.2f} GB, rc={rc}")
    if rc != 0:
        sys.stderr.write(open(stdout_path + ".err").read()[-4000:])
    return wall, rss_gb, rc


def gen_inputs(scale: str, outdir: str) -> tuple[str, str, str]:
    """Generate (or stage) inputs deterministically; returns fa, vcf, fq."""
    synth, _, _ = SCALES[scale]
    if synth is not None:
        fa = os.path.join(outdir, "synth.fa")
        vcf = os.path.join(outdir, "synth.vcf")
        fq = os.path.join(outdir, "synth.fq")
        if not (os.path.exists(fa) and os.path.exists(vcf) and os.path.exists(fq)):
            log(f"generating {scale} inputs (seed {synth['seed']})")
            subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "make_synth_scale.py"),
                 outdir, "--mbp", str(synth["mbp"]),
                 "--variants", str(synth["variants"]),
                 "--samples", str(synth["samples"]),
                 "--coverage", str(synth["coverage"]),
                 "--seed", str(synth["seed"])],
                check=True,
            )
        return fa, vcf, fq
    if scale == "haploid":
        import tarfile

        tar = os.path.join(REF, "example", "haploid.tar.gz")
        with tarfile.open(tar) as tf:
            tf.extractall(outdir)
        d = os.path.join(outdir)
        return (os.path.join(d, "haploid.fa"), os.path.join(d, "haploid.vcf"),
                os.path.join(d, "haploid.fq"))
    # sars: committed reference + cohort VCF, reads sampled from the
    # committed genome at 30x (seeded, error-free)
    fa = os.path.join(REF, "example", "reference_sarsCov2.fasta")
    vcf_gz = os.path.join(REF, "example", "sars_cov2.vcf.gz")
    vcf = os.path.join(outdir, "sars_cov2.vcf")
    if not os.path.exists(vcf):
        import gzip

        with gzip.open(vcf_gz, "rb") as fin, open(vcf, "wb") as fout:
            shutil.copyfileobj(fin, fout)
    fq = os.path.join(outdir, "sars30x.fq")
    if not os.path.exists(fq):
        log("sampling 30x SARS reads (seed 3)")
        genome = []
        for line in open(fa):
            if not line.startswith(">"):
                genome.append(line.strip().upper())
        g = np.frombuffer("".join(genome).encode(), dtype=np.uint8)
        rng = np.random.default_rng(3)
        rl, cov = 100, 30.0
        n = int(len(g) * cov / rl)
        starts = rng.integers(0, len(g) - rl, size=n)
        qual = b"I" * rl
        with open(fq, "wb") as f:
            for i, s in enumerate(starts.tolist()):
                f.write(b"@r%d\n" % i + g[s : s + rl].tobytes() + b"\n+\n"
                        + qual + b"\n")
    return fa, vcf, fq


def build_oracle() -> str:
    if not os.path.exists(ORACLE):
        subprocess.run(
            ["bash", os.path.join(REPO, "tests", "oracle", "build_oracle.sh"),
             ORACLE],
            check=True, capture_output=True,
        )
    return ORACLE


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("scale", choices=sorted(SCALES))
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--skip-oracle", action="store_true",
                    help="reuse OUTDIR/oracle.vcf + recorded timing if present")
    ap.add_argument("--ours-only", action="store_true")
    ap.add_argument("--oracle-only", action="store_true")
    ap.add_argument("--keep", action="store_true", help="keep generated inputs")
    ap.add_argument("--backend", default="host",
                    help="our backend (host|device|auto); host matches the "
                         "published 2-core rows")
    a = ap.parse_args()
    outdir = a.outdir or f"/tmp/h2h_{a.scale}"
    os.makedirs(outdir, exist_ok=True)

    synth, haploid, spill = SCALES[a.scale]
    fa, vcf, fq = gen_inputs(a.scale, outdir)
    flags = ["-k", "35", "-r", "43", "-b", "1", "-f", "AF"]
    if haploid:
        flags = ["-1"] + flags

    rec = {"scale": a.scale, "flags": " ".join(flags)}

    # ours: one `run` process (count + index + call), host backend by
    # default to match the published CPU-vs-CPU rows; a stale persisted
    # index would skip the index phase, so clear it first
    ours_vcf = os.path.join(outdir, "ours.vcf")
    if not a.oracle_only:
        for stale in (f"{vcf}.c43.k35.malvax.npz", f"{vcf}.c43.k35.malvax.zst"):
            if os.path.exists(stale):
                os.remove(stale)
        env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
        args = [sys.executable, "-m", "malva_tpu.cli", "run",
                "--backend", a.backend] + flags
        if spill:
            spill_dir = os.path.join(outdir, "spill")
            shutil.rmtree(spill_dir, ignore_errors=True)
            args += ["--spill-dir", spill_dir]
        args += [fa, vcf, fq]
        wall, rss, rc = timed_run(args, env, ours_vcf, "ours")
        if rc != 0:
            return 1
        rec.update(ours_s=round(wall, 1), ours_gb=round(rss, 2))

    # oracle: index + call (its KMC shim counts inside call)
    oracle_vcf = os.path.join(outdir, "oracle.vcf")
    oracle_meta = os.path.join(outdir, "oracle.meta.json")
    if not a.ours_only:
        if a.skip_oracle and os.path.exists(oracle_vcf) and os.path.exists(oracle_meta):
            m = json.load(open(oracle_meta))
            rec.update(oracle_s=m["oracle_s"], oracle_gb=m["oracle_gb"],
                       oracle_cached=True)
            log(f"oracle: reusing recorded run ({m['oracle_s']} s)")
        else:
            exe = build_oracle()
            env = dict(os.environ, MALVA_ORACLE_REFK="43")
            idx = f"{vcf}.c43.k35.malvax.zst"
            if os.path.exists(idx):
                os.remove(idx)
            w1, r1, rc1 = timed_run([exe, "index"] + flags + [fa, vcf, fq],
                                    env, os.path.join(outdir, "oracle.idx.log"),
                                    "oracle index")
            w2, r2, rc2 = timed_run([exe, "call"] + flags + [fa, vcf, fq],
                                    env, oracle_vcf, "oracle call")
            if rc1 != 0 or rc2 != 0:
                return 1
            rec.update(oracle_s=round(w1 + w2, 1), oracle_gb=round(max(r1, r2), 2))
            json.dump({"oracle_s": rec["oracle_s"], "oracle_gb": rec["oracle_gb"]},
                      open(oracle_meta, "w"))

    # byte compare
    if not a.ours_only and not a.oracle_only:
        identical = open(ours_vcf, "rb").read() == open(oracle_vcf, "rb").read()
        rec["identical"] = identical
        if a.scale == "haploid":
            golden = open(os.path.join(REF, "example", "haploid.malva.vcf"),
                          "rb").read()
            rec["matches_golden"] = open(ours_vcf, "rb").read() == golden
        if "ours_s" in rec and "oracle_s" in rec and rec["ours_s"] > 0:
            rec["speedup"] = round(rec["oracle_s"] / rec["ours_s"], 2)
            if rec.get("ours_gb", 0) > 0 and rec.get("oracle_gb", 0) > 0:
                rec["ram_ratio"] = round(rec["oracle_gb"] / rec["ours_gb"], 2)

    with open(os.path.join(outdir, "headtohead.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    if rec.get("identical") is not None:
        ident = "byte-identical" if rec["identical"] else "**OUTPUT DIFFERS**"
        print(
            f"| {a.scale} head-to-head | ours {rec.get('ours_s', '?')} s / "
            f"{rec.get('ours_gb', '?')} GB — oracle {rec.get('oracle_s', '?')} s / "
            f"{rec.get('oracle_gb', '?')} GB → {rec.get('speedup', '?')}x, "
            f"{ident} |"
        )
    if not a.keep and synth is not None and rec.get("identical"):
        for p in (fa, vcf, fq):
            os.remove(p)
    return 0 if rec.get("identical", True) else 2


if __name__ == "__main__":
    sys.exit(main())
