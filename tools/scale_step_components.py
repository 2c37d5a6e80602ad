#!/usr/bin/env python
"""Connected-components scale step (round 6): run `dedup_components` on
×K perturbed replicas of the sf0.1 documents table and compare wall,
convergence rounds, and component structure against the ×1 run in the
same session/phase window.

Replica design (same perturbation as scale_step_pipeline): replica k>0
appends a replica-specific " rev{k}" token, so each base document's K
replicas land within simhash hamming reach of each other — every base
doc becomes a near-dup family, and pre-existing sf0.1 families merge
ACROSS replicas into larger components. The scale claims under test:

* wall grows sub-linearly at this volume (pair mining dominates; the
  label table is one (long, long) row per vertex and each round is two
  fixed-width-key shuffles);
* convergence rounds grow at most logarithmically — pointer jumping
  keeps the round count near-flat as components get larger and chainier
  (measured r6: 5 rounds at ×1 → 9 at ×10, see BASELINE.md);
* component count tracks the corpus: the one-token " rev{k}"
  perturbation pushes most base↔replica pairs past simhash hamming
  reach, so replica families mostly stay distinct — the experiment
  stresses volume, not family merging (cross-replica chains that DO
  pair exercise the chain-merge path).

    python tools/scale_step_components.py [--replicas 10]

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
    """Deterministic perturbed ×K documents dir under /tmp (identical
    scheme to scale_step_pipeline so the corpora are comparable)."""
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


def run_components(spark, sf_dir: str, attempts: int = 2) -> dict:
    from pyspark.sql import functions as F

    from smartreader_spark.functions import components as C

    best = None
    for _ in range(attempts):
        spark.catalog.clearCache()
        t0 = time.time()
        agg = (
            C.dedup_components(spark, sf_dir)
            .agg(
                F.count("*").alias("docs"),
                F.sum(F.col("is_canonical").cast("int")).alias("components"),
            )
            .collect()[0]
        )
        wall = time.time() - t0
        if best is None or wall < best["wall_sec"]:
            best = {
                "wall_sec": round(wall, 1),
                "docs": agg["docs"],
                "components": agg["components"],
                "rounds": C.LAST_ROUNDS,
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
    small = run_components(spark, SF_DIR, attempts=args.attempts)
    s1 = bench._sentinel()
    big = run_components(spark, scaled_dir, attempts=args.attempts)
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
        "component_ratio": round(
            big["components"] / max(small["components"], 1), 2
        ),
        "sentinels_sec": [round(s, 2) for s in (s0, s1, s2)],
        "sentinel_clean": max(s0, s1, s2) <= 1.3 * min(s0, s1, s2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
