#!/usr/bin/env python
"""Decode-pool scaling benchmark (VERDICT r2 #9).

Measures the native C++ decode pool (native/decode_pool.cpp) at worker
counts 1/2/4/8 with synthetic ``bench://`` jobs, so the queue/condvar
machinery can be characterized even on a 1-core container:

- sleep-bound jobs (sleep_us=J, iters=0) model what each decode looks
  like when cores are plentiful (production eval hosts) or when decode
  waits on IO: throughput must scale ~linearly with workers if the pool
  adds no serialization.
- work-bound jobs (iters=K, fixed arithmetic work calibrated to the same
  per-job ms) model CPU-bound ffmpeg decode on THIS host: on a 1-core
  container they cannot scale (expected ~1.0x), which calibrates how much
  of any observed speedup is machinery vs physics.  On a multi-core
  production host this same sweep shows the real decode scaling ceiling.

Reference counterpart: the mp_tools one-python-process-per-GPU worker loop
(SURVEY.md C17/C18) — cross-video parallelism there is process-level; here
it is native threads feeding one TPU process.

Usage:
  python scripts/bench_decode_pool.py [--jobs 64] [--job-ms 30]
Prints a table + one JSON line; record results in docs/KERNELS.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tspo_tpu.video.native import DecodePool, pool_available  # noqa: E402


def run(workers: int, jobs: int, sleep_us: int, iters: int) -> float:
    """Submit `jobs` synthetic jobs, wait for all; return wall seconds."""
    with DecodePool(workers=workers) as pool:
        t0 = time.perf_counter()
        ids = [pool.submit_bench(sleep_us=sleep_us, iters=iters)
               for _ in range(jobs)]
        for j in ids:
            pool.result(j)
        return time.perf_counter() - t0


def calibrate_iters(target_ms: float) -> int:
    """Find the iteration count whose single-worker job cost ~= target_ms."""
    probe = 2_000_000
    wall = run(1, 4, 0, probe) / 4
    return max(int(probe * (target_ms / 1000.0) / wall), 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=64)
    ap.add_argument("--job-ms", type=float, default=30.0,
                    help="per-job cost in ms (sleep for the sleep-bound "
                         "sweep, spin for the spin-bound sweep)")
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    if not pool_available():
        print("native decode pool unavailable (toolchain/ffmpeg missing)")
        return 1

    job_us = int(args.job_ms * 1000)
    ncores = os.cpu_count() or 1
    iters = calibrate_iters(args.job_ms)
    print(f"host cores: {ncores}; jobs: {args.jobs}; "
          f"per-job: {args.job_ms} ms ({iters} iters work-bound)")

    results = {"cores": ncores, "jobs": args.jobs, "job_ms": args.job_ms,
               "sleep_bound": {}, "work_bound": {}}
    for kind, sleep_us, niters in (("sleep_bound", job_us, 0),
                                   ("work_bound", 0, iters)):
        base = None
        print(f"\n{kind} jobs:")
        print(f"{'workers':>8} {'wall s':>8} {'jobs/s':>8} {'speedup':>8}")
        for w in args.workers:
            wall = run(w, args.jobs, sleep_us, niters)
            jps = args.jobs / wall
            if base is None:
                base = wall
            results[kind][str(w)] = {"wall_s": round(wall, 3),
                                     "jobs_per_s": round(jps, 1),
                                     "speedup": round(base / wall, 2)}
            print(f"{w:>8} {wall:>8.3f} {jps:>8.1f} {base / wall:>8.2f}x")

    print("\n" + json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
