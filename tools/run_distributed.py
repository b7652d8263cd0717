#!/usr/bin/env python
"""Multi-process pipeline driver (jax.distributed).

One OS process per "host": pass the same coordinator to every process,
plus its process id.  Works over local CPU processes (Gloo collectives,
tests/test_distributed.py) and, unchanged, over real multi-host pods
(coordinator + ids from the scheduler).  Rank 0 writes the VCF.

  python tools/run_distributed.py --num-processes 2 --process-id 0 \
      --out /tmp/out.vcf -1 -b 1 -f AF ref.fa vars.vcf reads0.fq reads1.fq
"""

import argparse
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="127.0.0.1:19765")
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--spill-dir", default=None)
    ap.add_argument("--timeout", type=float,
                    default=float(os.environ.get("MALVA_DIST_TIMEOUT", 0)) or None,
                    help="watchdog: abort with a one-line ERROR if the run "
                         "has not completed after this many seconds.  Gloo "
                         "collectives HANG when a peer dies or the topology "
                         "is mismatched — without a timeout a lost peer "
                         "stalls the cluster forever")
    ap.add_argument("-1", dest="haploid", action="store_true")
    ap.add_argument("-k", type=int, default=35)
    ap.add_argument("-r", type=int, default=43)
    ap.add_argument("-b", type=int, default=1)
    ap.add_argument("-f", dest="freq_key", default="AF")
    ap.add_argument("reference")
    ap.add_argument("variants")
    ap.add_argument("reads", nargs="+")
    a = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    watchdog = None
    if a.timeout:
        import threading

        def _die():
            print(
                f"ERROR: distributed run exceeded {a.timeout:.0f}s "
                f"(peer lost mid-collective or process topology mismatch); "
                f"aborting", file=sys.stderr,
            )
            sys.stderr.flush()
            os._exit(1)

        watchdog = threading.Timer(a.timeout, _die)
        watchdog.daemon = True
        watchdog.start()

    import numpy as np

    from malva_tpu.parallel.distributed import (
        build_index_distributed, call_distributed, initialize,
    )
    from malva_tpu.pipeline import build_index
    from malva_tpu.utils.config import Config

    # initialize()'s topology cross-check runs one collective; with
    # divergent world views that collective can itself hang (Gloo), so it
    # gets its OWN bounded watchdog even when no --timeout was given —
    # init + check complete in seconds on a healthy cluster.
    import threading

    init_timeout = a.timeout or float(os.environ.get(
        "MALVA_INIT_TIMEOUT", 120.0))

    def _init_die():
        print(
            f"ERROR: distributed init/topology check exceeded "
            f"{init_timeout:.0f}s (mismatched process topology or "
            f"unreachable peers); aborting", file=sys.stderr,
        )
        sys.stderr.flush()
        os._exit(1)

    init_watchdog = threading.Timer(init_timeout, _init_die)
    init_watchdog.daemon = True
    init_watchdog.start()
    try:
        initialize(a.coordinator, a.num_processes, a.process_id)
    except Exception as e:  # mirror the CLI's one-line ERROR contract
        print(f"ERROR: distributed init failed: {e}", file=sys.stderr)
        return 1
    finally:
        init_watchdog.cancel()

    cfg = Config(
        fasta_path=a.reference,
        vcf_path=a.variants,
        sample_path=a.reads[0],
        k=a.k,
        ref_k=a.r,
        error_rate=np.float32(0.001),
        bf_size=Config.bf_gb_to_bits(a.b),
        freq_key=a.freq_key,
        haploid=a.haploid,
    )
    # overlap (mirrors the single-host `run`): each host's spill-count
    # producers run in helper processes while the sharded index builds;
    # count_distributed later resumes the completed stores at the merge.
    # Production is ci/cs-independent (thresholds apply at the merge),
    # so the producer's defaults compose with count_distributed's raw
    # ci=1 merge.
    producers = []
    if a.spill_dir and not os.environ.get("MALVA_NO_OVERLAP"):
        import subprocess

        from malva_tpu.parallel.distributed import host_shard

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        for i, path in enumerate(host_shard(a.reads)):
            producers.append(subprocess.Popen(
                [sys.executable, "-m", "malva_tpu.count.spill",
                 path, str(a.r), f"{a.spill_dir}/h{a.process_id}_{i}"],
                env=env, stdout=subprocess.DEVNULL,
            ))

    # index phase sharded across processes (batches round-robin, merged
    # bit planes + deterministic key union); single-process keeps the
    # in-process builder
    if a.num_processes > 1:
        index = build_index_distributed(cfg)
    else:
        index = build_index(cfg)
    for p in producers:
        if p.wait() != 0:
            print(
                "[malva-tpu/dist] overlapped counting producer failed; "
                "counting will resume/restart inline", file=sys.stderr,
            )
    if jax.process_index() == 0:
        out = open(a.out, "w")
    else:
        out = io.StringIO()
    call_distributed(cfg, index, a.reads, out, spill_dir=a.spill_dir)
    if jax.process_index() == 0:
        out.close()
    if watchdog is not None:
        watchdog.cancel()
    return 0


if __name__ == "__main__":
    sys.exit(main())
