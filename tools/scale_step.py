#!/usr/bin/env python
"""Scale-step experiment (VERDICT r3 #4): extraction throughput at an
sf1-equivalent corpus (fixtures ×160 re-keyed ≈ 22.7k docs, ~10× the
bench corpus) to expose memory behavior, Arrow batch sizing, and the
straggler tail at 10× volume.

Protocol: same pinned-32-core, sentinel-gated, best-of-N child protocol
as bench.py (its machinery is imported, not duplicated). Linear scaling
expectation: docs/sec@32 within ~15% of the x16 corpus mark; a worker
OOM or a >15% drop indicates batch-size or skew work to do.

    python tools/scale_step.py [--replicas 160] [--attempts 2]

Prints one JSON line (not the driver bench contract — this is an
experiment tool; record results in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=160)
    ap.add_argument("--attempts", type=int, default=2)
    ap.add_argument("--partitions", type=int, default=96)
    args = ap.parse_args()

    corpus = f"/tmp/smartreader_bench_corpus_x{args.replicas}.parquet"
    if not os.path.exists(corpus):
        from smartreader_spark.pipeline.corpus import load_corpus, scale_corpus

        spark = bench.make_session(16)
        scale_corpus(load_corpus(spark), args.replicas).repartition(128).write.mode(
            "overwrite"
        ).parquet(corpus)
        spark.stop()

    os.environ["BENCH_CHILD_REPEATS"] = "1"  # one pass per child: the
    # outer attempts provide the best-of-N at this corpus size
    best_sent = [bench._sentinel()]
    walls = []
    docs = 0
    clean_total = 0
    for _ in range(args.attempts):
        d, wall, clean = bench._gated_extract(
            32, args.partitions, "0-31", corpus, attempts=1,
            best_sentinel=best_sent, timeout=900,
        )
        docs, walls = d, walls + [wall]
        clean_total += clean
    wall = min(walls)
    out = {
        "replicas": args.replicas,
        "docs": docs,
        "walls_sec": [round(w, 1) for w in walls],
        "best_wall_sec": round(wall, 1),
        "docs_per_sec_at_32": round(docs / wall, 1),
        "sentinel_best_sec": round(best_sent[0], 2),
        "clean_attempts": clean_total,
        "partitions": args.partitions,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
