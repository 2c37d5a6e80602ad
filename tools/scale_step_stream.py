#!/usr/bin/env python
"""Streaming windowed-aggregation scale step (round 6 continuation):
drain ×K replicas of the sf0.1 events table through the WATERMARKED
tumbling-window streaming plan (bounded replay, exactly-once file sink)
and compare wall + emitted windows against the ×1 run.

Replica design: the same user-offset replicas as scale_step_events —
window keys (window × event_type) are user-independent, so every
emitted window's n_events/value_cents must be exactly ×K while the
WINDOW COUNT stays identical (state size is windows × types, NOT
volume — the claim that makes watermarked aggregation viable on an
unbounded stream). Wall covers the full replay: source re-layout,
micro-batched drain through the state store, sink, readback.

    python tools/scale_step_stream.py [--replicas 10]

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
from scale_step_events import SF_DIR, build_scaled_events


def run_stream(spark, sf_dir: str, attempts: int = 2) -> dict:
    from pyspark.sql import functions as F

    from smartreader_spark.streaming.window_stream import (
        stream_event_windows_bounded,
    )

    best = None
    for _ in range(attempts):
        spark.catalog.clearCache()
        t0 = time.time()
        agg = (
            stream_event_windows_bounded(spark, sf_dir)
            .agg(
                F.count("*").alias("windows"),
                F.sum("n_events").alias("events"),
                F.sum("value_cents").alias("cents"),
            )
            .collect()[0]
        )
        wall = time.time() - t0
        if best is None or wall < best["wall_sec"]:
            best = {
                "wall_sec": round(wall, 1),
                "windows": agg["windows"],
                "events": agg["events"],
                "cents": agg["cents"],
            }
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--attempts", type=int, default=2)
    args = ap.parse_args()

    spark = bench.make_session(32)
    scaled_dir = build_scaled_events(spark, args.replicas)

    s0 = bench._sentinel()
    small = run_stream(spark, SF_DIR, attempts=args.attempts)
    s1 = bench._sentinel()
    big = run_stream(spark, scaled_dir, attempts=args.attempts)
    s2 = bench._sentinel()
    spark.stop()

    k = args.replicas
    ratio = big["wall_sec"] / max(small["wall_sec"], 0.1)
    out = {
        "replicas": k,
        "sf_dir": SF_DIR,
        "x1": small,
        "xk": big,
        "window_count_volume_invariant": big["windows"] == small["windows"],
        "aggregates_exactly_scaled": big["events"] == small["events"] * k
        and big["cents"] == small["cents"] * k,
        "events_per_sec_x1": round(small["events"] / small["wall_sec"]),
        "events_per_sec_xk": round(big["events"] / big["wall_sec"]),
        "wall_ratio": round(ratio, 2),
        "wall_ratio_vs_linear": round(ratio / k, 2),
        "sentinels_sec": [round(s, 2) for s in (s0, s1, s2)],
        "sentinel_clean": max(s0, s1, s2) <= 1.3 * min(s0, s1, s2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
