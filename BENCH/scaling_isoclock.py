"""Iso-clock scaling evidence: hold the CPU frequency regime constant
across the two parallelism levels.

Problem this solves: on this host, a 1- or 2-core run turbo-boosts
(~1.6-2x the per-core clock of a busy box), so the plain
throughput(4N) / (4 x throughput(N)) ratio conflates PARALLELIZATION
overhead (what cluster scaling measures — shuffles, scheduling,
stragglers) with FREQUENCY scaling (a single-socket artifact a real
N-node→4N-node cluster does not have: added nodes run at the same
clock).

Method: both levels keep the SAME number of cores busy —

  level N : P concurrent single-process builds at N cores each
            (P*N cores busy), each over its own copy of the input;
            per-core throughput = files / (N * median completion time)
  level 4N: P/4 concurrent builds at 4N cores each (same P*N cores
            busy); per-core throughput likewise.

  efficiency = per_core_throughput(4N) / per_core_throughput(N)

This is exactly what "N executors → 4N executors" measures on a real
cluster (fixed clock, more parallel lanes), expressed with the
concurrency this sandbox can host. Writes results to stdout as JSON;
merge into BENCH/BASELINE.md by hand.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def launch(cpus: int, n_files: int, tag: str):
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        BENCH_FILES=str(n_files),
        BENCH_SHUFFLE="16",
        BENCH_SHARDS="16",
        BENCH_WORKDIR_TAG=tag,  # distinct /tmp work dirs per process
    )
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )


def run_level(cpus: int, nprocs: int, n_files: int) -> dict:
    t0 = time.time()
    procs = [launch(cpus, n_files, f"iso_{cpus}c_{i}") for i in range(nprocs)]
    builds = []
    for p in procs:
        out, _ = p.communicate(timeout=3600)
        line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
        builds.append(json.loads(line)["queries"]["build"])
    wall = time.time() - t0
    med_build = statistics.median(builds)
    per_core = n_files / (cpus * med_build)
    return {
        "cpus_per_proc": cpus,
        "nprocs": nprocs,
        "files_each": n_files,
        "build_secs": [round(b, 1) for b in builds],
        "median_build_sec": round(med_build, 1),
        "per_core_files_per_sec": round(per_core, 1),
        "wall_sec": round(wall, 1),
    }


def main() -> None:
    n_files = int(os.environ.get("ISO_FILES", "150000"))
    n_low = int(os.environ.get("ISO_N", "1"))
    n_high = 4 * n_low
    nprocs_low = int(os.environ.get("ISO_PROCS", "4"))
    nprocs_high = max(1, nprocs_low // 4)
    reps = int(os.environ.get("ISO_REPS", "2"))

    results = {"low": [], "high": []}
    for rep in range(reps):  # alternate levels
        hi = run_level(n_high, nprocs_high, n_files)
        print("high", json.dumps(hi), flush=True)
        results["high"].append(hi)
        lo = run_level(n_low, nprocs_low, n_files)
        print("low", json.dumps(lo), flush=True)
        results["low"].append(lo)

    best_lo = max(results["low"], key=lambda r: r["per_core_files_per_sec"])
    best_hi = max(results["high"], key=lambda r: r["per_core_files_per_sec"])
    eff = best_hi["per_core_files_per_sec"] / best_lo["per_core_files_per_sec"]
    print(
        json.dumps(
            {
                "pair": f"{n_low}->{n_high} cores (iso-clock, {nprocs_low*n_low} cores busy both levels)",
                "files_each": n_files,
                "best_low": best_lo,
                "best_high": best_hi,
                "scaling_efficiency": round(eff, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
