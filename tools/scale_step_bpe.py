#!/usr/bin/env python
"""BPE-trainer scale step (round 6 continuation): run
`learn_bpe_merges` on ×K replicas of the sf0.1 documents table and
compare wall against the ×1 run in the same session/phase window.

Replica design: identical text (same corpus builder as the seqpack and
unigram steps — the /tmp corpus is shared), so the word VOCABULARY is
exactly the same and counts scale ×K. That pins the operator's scale
claim exactly: the k merge rounds operate on the vocabulary table
(pair counting, argmax, merge application) and their cost must be
corpus-growth-INVARIANT — only the one corpus-wide word-count shuffle
that builds w0 grows with volume. The learned merge table must be
value-identical with every pair_count exactly ×K (ties scale with their
tie partners, so the (count DESC, lhs, rhs) argmax picks identical
pairs every round).

    python tools/scale_step_bpe.py [--replicas 10]

Prints one JSON line (experiment tool, not the driver bench contract —
record results in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

import bench
from scale_step_seqpack import SF_DIR, build_scaled_docs


def run_train(spark, sf_dir: str, attempts: int = 2) -> dict:
    from smartreader_spark.functions import bpe

    best = None
    for _ in range(attempts):
        bpe._TRAIN_CACHE.clear()  # a cache hit would time nothing
        spark.catalog.clearCache()
        t0 = time.time()
        merges = [
            (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
            for r in bpe.learn_bpe_merges(spark, sf_dir).collect()
        ]
        wall = time.time() - t0
        if best is None or wall < best["wall_sec"]:
            best = {"wall_sec": round(wall, 1), "merges": merges}
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--attempts", type=int, default=2)
    args = ap.parse_args()

    spark = bench.make_session(32)
    scaled_dir = build_scaled_docs(spark, args.replicas)

    s0 = bench._sentinel()
    small = run_train(spark, SF_DIR, attempts=args.attempts)
    s1 = bench._sentinel()
    big = run_train(spark, scaled_dir, attempts=args.attempts)
    s2 = bench._sentinel()
    spark.stop()

    same_rules = [(m[0], m[1], m[2]) for m in small["merges"]] == [
        (m[0], m[1], m[2]) for m in big["merges"]
    ]
    counts_scaled = all(
        b[3] == s[3] * args.replicas
        for s, b in zip(small["merges"], big["merges"])
    ) and len(small["merges"]) == len(big["merges"])

    ratio = big["wall_sec"] / max(small["wall_sec"], 0.1)
    out = {
        "replicas": args.replicas,
        "sf_dir": SF_DIR,
        "x1_wall_sec": small["wall_sec"],
        "xk_wall_sec": big["wall_sec"],
        "n_merges": len(small["merges"]),
        "merge_rules_identical": same_rules,
        "pair_counts_exactly_scaled": counts_scaled,
        "wall_ratio": round(ratio, 2),
        "wall_ratio_vs_linear": round(ratio / args.replicas, 2),
        "sentinels_sec": [round(s, 2) for s in (s0, s1, s2)],
        "sentinel_clean": max(s0, s1, s2) <= 1.3 * min(s0, s1, s2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
