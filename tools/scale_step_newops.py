#!/usr/bin/env python
"""Scale step (round 6, continuation) for the three late operators:
semantic_dedup, bm25_search, dsir_importance — each run at ×1 and on ×K
replicas of the sf0.1 tables in the same session/phase window.

Replica design: id' = id × K + rep with IDENTICAL payloads (text /
embedding / source). Consequences the experiment is meant to exercise:

* semantic_dedup — every replica is an exact within-cell duplicate, so
  duplicate families of size K appear (the realistic "crawl full of
  mirrors" shape) and cell populations grow K× while the codebook stays
  fixed — the documented quadratic-in-cell-size hazard. The experiment
  runs the ×K corpus TWICE: once with the ×1 codebook (n_cells=16,
  expect super-linear wall) and once with a √K-scaled codebook
  (n_cells=64, the paper's mitigation — clusters grow with the corpus).
  The gap between those two walls is the measured value of the knob.
* bm25_search — tf rows, df counts and the per-query candidate sets all
  grow K×; the query table stays 17 literal terms. Expect ~linear.
* dsir_importance — the feature stream grows K× but the model stays 64
  buckets; target slice grows with its source. Expect ~linear.

    python tools/scale_step_newops.py [--replicas 10]

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


def build_scaled(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    out_dir = f"/tmp/smartreader_newops_x{replicas}"
    docs_path = f"{out_dir}/documents.parquet"
    emb_path = f"{out_dir}/embeddings.parquet"
    rep = F.explode(F.array([F.lit(i) for i in range(replicas)])).alias("rep")
    if not os.path.exists(docs_path):
        base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        scaled = base.select("doc_id", "text", "lang", "source", "n_chars", rep).select(
            (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        scaled.repartition(32).write.mode("overwrite").parquet(docs_path)
    if not os.path.exists(emb_path):
        base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        # block-offset ids (vec_id + rep*n_base), NOT interleaved: the
        # codebook/query/training slots (vec_id < 40) must stay the
        # ORIGINAL base vectors, so the experiment measures "corpus grew
        # K×, codebook fixed" rather than a degenerate collapsed
        # quantizer (replicas of 2 base vectors as all 16 centroids —
        # measured separately as the collapse stress, BASELINE.md)
        n_base = base.count()
        scaled = base.select("vec_id", "embedding", "label", rep).select(
            (F.col("vec_id") + F.col("rep") * n_base).alias("vec_id"),
            "embedding", "label",
        )
        scaled.repartition(32).write.mode("overwrite").parquet(emb_path)
    return out_dir


def _timed(fn, attempts: int):
    best = None
    for _ in range(attempts):
        t0 = time.time()
        rows = fn()
        wall = time.time() - t0
        if best is None or wall < best[0]:
            best = (wall, rows)
    return {"wall_sec": round(best[0], 1), **best[1]}


def run_semdedup(spark, sf_dir: str, n_cells: int, attempts: int) -> dict:
    from pyspark.sql import functions as F

    from smartreader_spark.functions.similarity import semantic_dedup

    def go():
        spark.catalog.clearCache()
        agg = (
            semantic_dedup(spark, sf_dir, n_cells=n_cells)
            .agg(
                F.count("*").alias("vecs"),
                F.sum((~F.col("is_kept")).cast("int")).alias("removed"),
            )
            .collect()[0]
        )
        return {"vecs": agg["vecs"], "removed": agg["removed"], "n_cells": n_cells}

    return _timed(go, attempts)


def run_ann_pq(spark, sf_dir: str, attempts: int) -> dict:
    from pyspark.sql import functions as F

    from smartreader_spark.functions.similarity import ann_pq

    def go():
        spark.catalog.clearCache()
        agg = ann_pq(spark, sf_dir).agg(
            F.count("*").alias("hits"), F.max("score").alias("top_score")
        ).collect()[0]
        return {"hits": agg["hits"], "top_score": float(agg["top_score"])}

    return _timed(go, attempts)


def run_bm25(spark, sf_dir: str, attempts: int) -> dict:
    from pyspark.sql import functions as F

    from smartreader_spark.functions.retrieval import bm25_search

    def go():
        spark.catalog.clearCache()
        agg = bm25_search(spark, sf_dir).agg(
            F.count("*").alias("hits"), F.sum("n_terms_matched").alias("matched")
        ).collect()[0]
        return {"hits": agg["hits"], "matched": agg["matched"]}

    return _timed(go, attempts)


def run_dsir(spark, sf_dir: str, attempts: int) -> dict:
    from pyspark.sql import functions as F

    from smartreader_spark.functions.curation import dsir_importance

    def go():
        spark.catalog.clearCache()
        agg = dsir_importance(spark, sf_dir).agg(
            F.count("*").alias("docs"),
            F.sum(F.col("selected").cast("int")).alias("selected"),
            F.sum("n_feats").alias("feats"),
        ).collect()[0]
        return {"docs": agg["docs"], "selected": agg["selected"], "feats": agg["feats"]}

    return _timed(go, attempts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--attempts", type=int, default=2)
    args = ap.parse_args()
    k = args.replicas

    spark = bench.make_session(32)
    scaled_dir = build_scaled(spark, k)

    out = {"replicas": k, "sf_dir": SF_DIR, "ops": {}}
    sentinels = [bench._sentinel()]
    for name, runner in (
        ("semantic_dedup", lambda d, nc=16: run_semdedup(spark, d, nc, args.attempts)),
        ("bm25_search", lambda d: run_bm25(spark, d, args.attempts)),
        ("dsir_importance", lambda d: run_dsir(spark, d, args.attempts)),
        ("ann_pq", lambda d: run_ann_pq(spark, d, args.attempts)),
    ):
        x1 = runner(SF_DIR)
        xk = runner(scaled_dir)
        rec = {
            "x1": x1,
            "xk": xk,
            "wall_ratio": round(xk["wall_sec"] / max(x1["wall_sec"], 0.1), 2),
        }
        rec["wall_ratio_vs_linear"] = round(rec["wall_ratio"] / k, 2)
        if name == "semantic_dedup":
            # the mitigation: codebook scaled ~sqrt(K) with the corpus
            xk_scaled = run_semdedup(spark, scaled_dir, 64, args.attempts)
            rec["xk_scaled_codebook"] = xk_scaled
            rec["scaled_codebook_speedup"] = round(
                xk["wall_sec"] / max(xk_scaled["wall_sec"], 0.1), 2
            )
        out["ops"][name] = rec
        sentinels.append(bench._sentinel())
    spark.stop()

    out["sentinels_sec"] = [round(s, 2) for s in sentinels]
    out["sentinel_clean"] = max(sentinels) <= 1.3 * min(sentinels)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
