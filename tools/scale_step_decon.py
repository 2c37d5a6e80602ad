#!/usr/bin/env python
"""Decontamination scale step (round 6): run `decontaminate_ngrams` on
×K replicas of the sf0.1 documents table and compare wall, gram volume,
and the broadcast side against the ×1 run in the same session/phase
window.

Replica design: doc_id' = doc_id × K + rep with IDENTICAL text. Because
K and 97 are coprime for the default K=10, each replica contributes its
own ~1% benchmark slice (doc_id' % 97 == 0 lands on different base docs
per replica), so the broadcast side (distinct benchmark gram digests)
grows ~linearly with K — the experiment stresses exactly the assumption
the operator's plan makes: the benchmark set stays broadcastable while
the corpus side scales. Identical replica text also means every
benchmark doc has K-1 corpus twins, so the contaminated count jumps —
the realistic "eval set leaked into the training corpus" shape, and a
check that the overlap count is exercised at volume, not just in the
planted unit test.

    python tools/scale_step_decon.py [--replicas 10]

Prints one JSON line (experiment tool, not the driver bench contract —
record results in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_scaled_docs(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    out_dir = f"/tmp/smartreader_decon_docs_x{replicas}"
    path = f"{out_dir}/documents.parquet"
    if os.path.exists(path):
        return out_dir
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = F.explode(F.array([F.lit(i) for i in range(replicas)])).alias("rep")
    scaled = base.select("doc_id", "text", rep).select(
        (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
        F.col("text"),
    )
    scaled.repartition(32).write.mode("overwrite").parquet(path)
    return out_dir


def run_decon(spark, sf_dir: str, attempts: int = 2) -> dict:
    from pyspark.sql import functions as F

    from smartreader_spark.functions.curation import decontaminate_ngrams

    best = None
    for _ in range(attempts):
        spark.catalog.clearCache()
        t0 = time.time()
        agg = (
            decontaminate_ngrams(spark, sf_dir)
            .agg(
                F.count("*").alias("docs"),
                F.sum("n_grams").alias("grams"),
                F.sum("n_overlap").alias("overlap"),
                F.sum(F.col("contaminated").cast("int")).alias("contaminated"),
            )
            .collect()[0]
        )
        wall = time.time() - t0
        if best is None or wall < best["wall_sec"]:
            best = {
                "wall_sec": round(wall, 1),
                "docs": agg["docs"],
                "grams": agg["grams"],
                "overlap": agg["overlap"],
                "contaminated": agg["contaminated"],
            }
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--attempts", type=int, default=2)
    args = ap.parse_args()

    spark = bench.make_session(32)
    scaled_dir = build_scaled_docs(spark, args.replicas)

    s0 = bench._sentinel()
    small = run_decon(spark, SF_DIR, attempts=args.attempts)
    s1 = bench._sentinel()
    big = run_decon(spark, scaled_dir, attempts=args.attempts)
    s2 = bench._sentinel()
    spark.stop()

    ratio = big["wall_sec"] / max(small["wall_sec"], 0.1)
    out = {
        "replicas": args.replicas,
        "sf_dir": SF_DIR,
        "x1": small,
        "xk": big,
        "wall_ratio": round(ratio, 2),
        "wall_ratio_vs_linear": round(ratio / args.replicas, 2),
        "gram_ratio": round(big["grams"] / max(small["grams"], 1), 2),
        "sentinels_sec": [round(s, 2) for s in (s0, s1, s2)],
        "sentinel_clean": max(s0, s1, s2) <= 1.3 * min(s0, s1, s2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
