#!/usr/bin/env python
"""Event-operator scale step (round 6 continuation): run
`event_sessions` and `events_asof_error` on ×K replicas of the sf0.1
events table and compare walls against the ×1 runs in the same
session/phase window.

Replica design: each replica shifts user_id by a disjoint offset (and
re-keys event_id), so the ENTITY count grows ×K while every entity's
event history — and therefore its sessions and as-of matches — is
byte-identical to the original. Both operators are one hash shuffle on
user_id + an in-partition sort, so wall must track volume ~linearly
with no super-linear term; the session/match counts must be exactly ×K
(value evidence that replication preserved the semantics).

    python tools/scale_step_events.py [--replicas 10]

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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
USER_STRIDE = 1_000_000


def build_scaled_events(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    out_dir = f"/tmp/smartreader_events_x{replicas}"
    path = f"{out_dir}/events.parquet"
    if os.path.exists(path):
        return out_dir
    base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rep = F.explode(F.array([F.lit(i) for i in range(replicas)])).alias("rep")
    scaled = base.select(
        "event_id", "ts", "user_id", "event_type", "value", "props", rep
    ).select(
        (F.col("event_id") * replicas + F.col("rep")).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep") * USER_STRIDE).alias("user_id"),
        "event_type", "value", "props",
    )
    scaled.repartition(32).write.mode("overwrite").parquet(path)
    return out_dir


def run_ops(spark, sf_dir: str, attempts: int = 2) -> dict:
    from pyspark.sql import functions as F

    from smartreader_spark.functions.events import (
        event_sessions,
        events_asof_error,
    )

    best = None
    for _ in range(attempts):
        spark.catalog.clearCache()
        t0 = time.time()
        sess = (
            event_sessions(spark, sf_dir)
            .agg(
                F.count("*").alias("sessions"),
                F.sum("n_events").alias("events"),
                F.sum("value_cents").alias("cents"),
            )
            .collect()[0]
        )
        t_sess = time.time() - t0
        t0 = time.time()
        asof = (
            events_asof_error(spark, sf_dir)
            .agg(
                F.count("*").alias("rows"),
                F.sum(
                    F.col("last_error_id").isNotNull().cast("long")
                ).alias("matched"),
                F.sum("micros_since_error").alias("age_sum"),
            )
            .collect()[0]
        )
        t_asof = time.time() - t0
        cand = {
            "sessions_wall_sec": round(t_sess, 1),
            "asof_wall_sec": round(t_asof, 1),
            "sessions": sess["sessions"],
            "events": sess["events"],
            "cents": sess["cents"],
            "asof_rows": asof["rows"],
            "asof_matched": asof["matched"],
            "asof_age_sum": asof["age_sum"],
        }
        if best is None or (cand["sessions_wall_sec"] + cand["asof_wall_sec"]
                            < best["sessions_wall_sec"] + best["asof_wall_sec"]):
            best = cand
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--attempts", type=int, default=2)
    args = ap.parse_args()

    spark = bench.make_session(32)
    scaled_dir = build_scaled_events(spark, args.replicas)

    s0 = bench._sentinel()
    small = run_ops(spark, SF_DIR, attempts=args.attempts)
    s1 = bench._sentinel()
    big = run_ops(spark, scaled_dir, attempts=args.attempts)
    s2 = bench._sentinel()
    spark.stop()

    k = args.replicas
    out = {
        "replicas": k,
        "sf_dir": SF_DIR,
        "x1": small,
        "xk": big,
        "sessions_exactly_scaled": big["sessions"] == small["sessions"] * k
        and big["cents"] == small["cents"] * k,
        "asof_exactly_scaled": big["asof_rows"] == small["asof_rows"] * k
        and big["asof_matched"] == small["asof_matched"] * k
        and big["asof_age_sum"] == small["asof_age_sum"] * k,
        "sessions_wall_ratio_vs_linear": round(
            big["sessions_wall_sec"] / max(small["sessions_wall_sec"], 0.1) / k, 2
        ),
        "asof_wall_ratio_vs_linear": round(
            big["asof_wall_sec"] / max(small["asof_wall_sec"], 0.1) / k, 2
        ),
        "sentinels_sec": [round(s, 2) for s in (s0, s1, s2)],
        "sentinel_clean": max(s0, s1, s2) <= 1.3 * min(s0, s1, s2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
