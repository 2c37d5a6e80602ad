#!/usr/bin/env python
"""Composed-pipeline scale step (VERDICT r4 #6): run the FULL training
pipeline (extract ∪ PDF → exact dedup → simhash near-dup → quality →
tokens) on a ×K replica of the sf0.1 documents table and compare wall +
funnel against the ×1 run in the same session/phase window.

Replicas are PERTURBED (each replica k>0 appends a replica-specific
token to the text), so they survive exact dedup and land in the simhash
near-dup stage as genuine near-duplicate families — the one stage whose
cost is not trivially linear. The experiment therefore measures exactly
what the verdict asked to prove: that banding + the bucket-size valve
keep candidate volume (and wall) under control when near-dup density
explodes, not just when volume grows.

    python tools/scale_step_pipeline.py [--replicas 10]

Prints one JSON line (experiment tool, not the driver bench contract —
record results in BASELINE.md). Funnel counts at ×K have exact
expectations: 00_extracted = K×docs + pdf_docs, 10_exact_deduped equal
(perturbed replicas are not exact dups), 20_near_deduped ≈ the ×1 count
(each replica family collapses to one survivor when K ≤ hamming reach).
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
    """Deterministic perturbed ×K documents dir under /tmp."""
    from pyspark.sql import functions as F

    out_dir = f"/tmp/smartreader_pipeline_docs_x{replicas}"
    path = f"{out_dir}/documents.parquet"
    if os.path.exists(path):
        return out_dir
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = F.explode(F.array([F.lit(i) for i in range(replicas)])).alias("rep")
    scaled = (
        base.select("doc_id", "text", rep)
        .select(
            (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" rev"), F.col("rep")))
            .alias("text"),
        )
    )
    scaled.repartition(32).write.mode("overwrite").parquet(path)
    return out_dir


def run_pipeline(spark, sf_dir: str, attempts: int = 2) -> dict:
    """Best-of-N composed-pipeline wall. Each attempt clears the stage
    memo + Spark cache so it pays the full extraction (the memoization
    exists for the gate's pipeline+funnel pair, not for benchmarks)."""
    from smartreader_spark.pipeline.training import (
        _STAGES_CACHE,
        training_funnel,
        training_pipeline,
    )

    best = None
    for _ in range(attempts):
        _STAGES_CACHE.clear()
        spark.catalog.clearCache()
        t0 = time.time()
        survivors = training_pipeline(spark, sf_dir).count()
        wall_pipeline = time.time() - t0
        t1 = time.time()
        funnel = {
            r["stage"]: r["n_rows"] for r in training_funnel(spark, sf_dir).collect()
        }
        wall_funnel = time.time() - t1
        if best is None or wall_pipeline < best["wall_pipeline_sec"]:
            best = {
                "survivors": survivors,
                "funnel": funnel,
                "wall_pipeline_sec": round(wall_pipeline, 1),
                "wall_funnel_sec": round(wall_funnel, 1),
            }
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--attempts", type=int, default=2)
    args = ap.parse_args()

    spark = bench.make_session(32)
    scaled_dir = build_scaled_docs(spark, args.replicas)

    # warm the Python worker pool + JIT so the ×1 measurement isn't
    # pool-creation-dominated (the first mapInPandas job pays it)
    from pyspark.sql import functions as F

    from smartreader_spark.pipeline.extract import extract_articles
    from smartreader_spark.pipeline.corpus import wrap_plain_documents
    from smartreader_spark.pipeline.session import warm_python_workers

    warm_python_workers(spark, 32)
    extract_articles(
        wrap_plain_documents(spark, SF_DIR).limit(100)
    ).agg(F.count("*")).collect()

    s0 = bench._sentinel()
    small = run_pipeline(spark, SF_DIR, attempts=args.attempts)
    s1 = bench._sentinel()
    big = run_pipeline(spark, scaled_dir, attempts=args.attempts)
    s2 = bench._sentinel()
    spark.stop()

    ratio = big["wall_pipeline_sec"] / max(small["wall_pipeline_sec"], 0.1)
    out = {
        "replicas": args.replicas,
        "sf_dir": SF_DIR,
        "x1": small,
        "xk": big,
        "wall_ratio": round(ratio, 2),
        "wall_ratio_vs_linear": round(ratio / args.replicas, 2),
        "sentinels_sec": [round(s, 2) for s in (s0, s1, s2)],
        "sentinel_clean": max(s0, s1, s2) <= 1.3 * min(s0, s1, s2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
