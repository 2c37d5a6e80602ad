#!/usr/bin/env python
"""Sequence-packing scale step (round 6): run `sequence_pack` on ×K
replicas of the sf0.1 documents table and compare wall and layout volume
against the ×1 run in the same session/phase window.

Replica design: doc_id' = doc_id × K + rep with IDENTICAL text and the
SAME source — the replicas land in the existing sources, so each
per-source window partition carries K× the rows/tokens. That stresses
exactly the operator's scale claim: the only shuffle is the window's
hash on `source`, and per-partition cost is the sort + one running-sum
pass, so wall should track ~K× per-source volume with no new exchanges.
(The deliberate non-goal: a single mega-source would need the standard
two-phase salted prefix-sum — documented in the operator docstring; this
experiment measures the per-shard path a production layout actually
uses.)

    python tools/scale_step_seqpack.py [--replicas 10]

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

    out_dir = f"/tmp/smartreader_seqpack_docs_x{replicas}"
    path = f"{out_dir}/documents.parquet"
    if os.path.exists(path):
        return out_dir
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = F.explode(F.array([F.lit(i) for i in range(replicas)])).alias("rep")
    scaled = base.select("doc_id", "text", "source", rep).select(
        (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
        F.col("text"),
        F.col("source"),
    )
    scaled.repartition(32).write.mode("overwrite").parquet(path)
    return out_dir


def run_pack(spark, sf_dir: str, attempts: int = 2) -> dict:
    from pyspark.sql import functions as F

    from smartreader_spark.functions.curation import sequence_pack

    best = None
    for _ in range(attempts):
        spark.catalog.clearCache()
        t0 = time.time()
        agg = (
            sequence_pack(spark, sf_dir)
            .groupBy("source")
            .agg(
                F.count("*").alias("docs"),
                F.sum("n_tokens").alias("tokens"),
                (F.max(F.col("seq_first") + F.col("n_seqs")) - 1).alias("last_seq"),
                F.max("n_seqs").alias("max_span"),
            )
            .agg(
                F.sum("docs").alias("docs"),
                F.sum("tokens").alias("tokens"),
                (F.sum("last_seq") + F.count("*")).alias("sequences"),
                F.max("max_span").alias("max_span"),
                F.count("*").alias("sources"),
            )
            .collect()[0]
        )
        wall = time.time() - t0
        if best is None or wall < best["wall_sec"]:
            best = {
                "wall_sec": round(wall, 1),
                "docs": agg["docs"],
                "tokens": agg["tokens"],
                "sequences": agg["sequences"],
                "max_span": agg["max_span"],
                "sources": agg["sources"],
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
    small = run_pack(spark, SF_DIR, attempts=args.attempts)
    s1 = bench._sentinel()
    big = run_pack(spark, scaled_dir, attempts=args.attempts)
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
        "token_ratio": round(big["tokens"] / max(small["tokens"], 1), 2),
        "sentinels_sec": [round(s, 2) for s in (s0, s1, s2)],
        "sentinel_clean": max(s0, s1, s2) <= 1.3 * min(s0, s1, s2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
