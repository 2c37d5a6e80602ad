#!/usr/bin/env python
"""Pinned extraction-config sweep with steal-sentinel gating.

Usage: python tools/extract_sweep.py [cores] [corpus]

For each (partitions, arrow_batch) config: run the pinned bench child,
bracketing it with a single-thread CPU sentinel. A run whose sentinel
exceeds 1.5x the session-best sentinel is flagged STEAL (the VM is in a
hypervisor-throttle episode — BASELINE.md) and should be ignored when
reading results. Prints one line per run; finishes with the best clean
config.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
CORPUS = sys.argv[2] if len(sys.argv) > 2 else "/tmp/smartreader_bench_corpus_x16.parquet"
CPU_LIST = f"0-{CORES - 1}"


def sentinel() -> float:
    t0 = time.time()
    x = 0
    for i in range(20_000_000):
        x += i
    return time.time() - t0


def run(partitions: int, batch: int) -> tuple[float, float, float]:
    s_before = sentinel()
    env = dict(os.environ)
    env["BENCH_ARROW_BATCH"] = str(batch)
    cmd = [
        "taskset", "-c", CPU_LIST, sys.executable,
        os.path.join(REPO, "bench.py"), "--extract-run",
        str(CORES), str(partitions), CORPUS,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=280)
    if out.returncode != 0 or not out.stdout.strip():
        raise RuntimeError(out.stderr[-500:])
    d = json.loads(out.stdout.strip().splitlines()[-1])
    s_after = sentinel()
    return d["wall"], s_before, s_after


def main() -> None:
    base_sent = sentinel()
    print(f"calibration sentinel: {base_sent:.2f}s")
    configs = [(24, 4), (32, 4), (48, 4), (96, 4), (24, 2), (24, 8), (28, 4)]
    results = []
    best_sent = base_sent
    for rep in range(2):
        for partitions, batch in configs:
            wall, s0, s1 = run(partitions, batch)
            best_sent = min(best_sent, s0, s1)
            steal = max(s0, s1) > 1.5 * best_sent
            flag = "STEAL" if steal else "clean"
            print(
                f"p={partitions:3d} batch={batch} wall={wall:6.1f}s "
                f"sent=({s0:.2f},{s1:.2f}) {flag}",
                flush=True,
            )
            results.append((wall, partitions, batch, steal))
    clean = [r for r in results if not r[3]]
    pool = clean or results
    wall, p, b, _ = min(pool)
    print(f"\nBEST {'clean' if clean else 'ANY'}: p={p} batch={b} wall={wall:.1f}s")


if __name__ == "__main__":
    main()
