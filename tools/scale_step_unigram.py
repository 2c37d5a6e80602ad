#!/usr/bin/env python
"""Unigram-LM-filter scale step (round 6): run `unigram_surprisal` on
×K replicas of the sf0.1 documents table and compare wall against the
×1 run in the same session/phase window.

Replica design: identical text (doc_id′ = doc_id×K + rep, same corpus
builder as the seqpack step — the /tmp corpus is shared). That pins the
operator's scale shape exactly: the token stream grows ×K while the
vocab table — the thing that is localCheckpointed and then joined —
stays EXACTLY the same size (same distinct tokens, counts ×K). So the
claim under test is: wall tracks the corpus scan + one map-side-partial
token groupBy, and the scoring join's build side is corpus-growth-
invariant. (A growing vocab is the min_count knob's job, orthogonal to
volume.) Per-doc means are unchanged by replication up to the smoothing
denominator shift — the report prints both sides' score aggregates so
the drift is visible and explainable.

    python tools/scale_step_unigram.py [--replicas 10]

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


def run_filter(spark, sf_dir: str, attempts: int = 2) -> dict:
    from pyspark.sql import functions as F

    from smartreader_spark.functions.textqa import unigram_surprisal

    best = None
    for _ in range(attempts):
        spark.catalog.clearCache()
        t0 = time.time()
        agg = (
            unigram_surprisal(spark, sf_dir)
            .agg(
                F.count("*").alias("docs"),
                F.sum("n_tokens").alias("tokens"),
                F.sum(F.col("passes_lm").cast("long")).alias("passed"),
                F.round(F.avg("mean_surprisal_nats"), 4).alias("avg_nats"),
            )
            .collect()[0]
        )
        wall = time.time() - t0
        if best is None or wall < best["wall_sec"]:
            best = {
                "wall_sec": round(wall, 1),
                "docs": agg["docs"],
                "tokens": agg["tokens"],
                "passed": agg["passed"],
                "avg_nats": agg["avg_nats"],
            }
    return best


def vocab_size(spark, sf_dir: str) -> int:
    from pyspark.sql import functions as F

    from smartreader_spark.functions.textqa import _load, _norm

    docs = _load(spark, sf_dir)
    return (
        docs.select(F.explode(F.split(_norm(F.col("text")), " ")).alias("t"))
        .where(F.col("t") != "")
        .agg(F.countDistinct("t"))
        .collect()[0][0]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--attempts", type=int, default=2)
    args = ap.parse_args()

    spark = bench.make_session(32)
    scaled_dir = build_scaled_docs(spark, args.replicas)

    s0 = bench._sentinel()
    small = run_filter(spark, SF_DIR, attempts=args.attempts)
    s1 = bench._sentinel()
    big = run_filter(spark, scaled_dir, attempts=args.attempts)
    s2 = bench._sentinel()
    v1, vk = vocab_size(spark, SF_DIR), vocab_size(spark, scaled_dir)
    spark.stop()

    ratio = big["wall_sec"] / max(small["wall_sec"], 0.1)
    out = {
        "replicas": args.replicas,
        "sf_dir": SF_DIR,
        "x1": small,
        "xk": big,
        "vocab_x1": v1,
        "vocab_xk": vk,
        "wall_ratio": round(ratio, 2),
        "wall_ratio_vs_linear": round(ratio / args.replicas, 2),
        "token_ratio": round(big["tokens"] / max(small["tokens"], 1), 2),
        "sentinels_sec": [round(s, 2) for s in (s0, s1, s2)],
        "sentinel_clean": max(s0, s1, s2) <= 1.3 * min(s0, s1, s2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
