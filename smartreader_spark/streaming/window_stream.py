"""Watermarked event-time windowed aggregation over the events stream —
the classic Structured Streaming stateful shape the engine had not yet
put under the value oracle (extract_stream is stateless; dedup_stream is
custom-stateful via applyInPandasWithState; this is the BUILT-IN
watermark + tumbling-window aggregation path, state managed by Spark's
streaming aggregation operator).

Reference parity: SmartReader has no streaming surface (SURVEY §2.12);
this serves the pipeline-telemetry tier (events-per-window rollups of
crawl/ingest streams).

Semantics proven by the gate: append-mode windowed aggregation emits a
window exactly once, when the event-time watermark passes its end. The
bounded replay rations files into micro-batches (so windows genuinely
close across batch boundaries, not in one degenerate batch), and a
far-future FLUSH sentinel row drives the final watermark past every
real window — with the default no-data micro-batch, every real window
is emitted exactly once. The sentinel's own (still-open) window is
excluded by its event_type.

Replay-order discipline (measured, not assumed): the file source
advances the watermark from each batch's max event time, and a window
evicted at batch N's commit silently DROPS rows for it arriving in
batch N+1. A hash-partitioned layout puts near-max timestamps in every
file, so the very first batch hoists the watermark over the whole
stream and correctness then hangs on accidental batch slicing. The
source layout here is `repartitionByRange(ts)` with strictly increasing
file mtimes (the source lists files in mtime order): ranges are
disjoint and time-ordered, so every row of batch N+1 is >= batch N's
max and NOTHING is ever late — exactly-once emission holds for ANY
file count and any maxFilesPerTrigger, which is also the realistic
shape of a replayed event log.

Determinism discipline: event-time arithmetic in integer epoch micros
(tumbling windows are epoch-aligned, so the DuckDB oracle restates the
window as floor-division on epoch_us); money as integer cents.

At scale: state is one row per (open window × event_type) per
partition — bounded by the watermark delay, not the stream length; the
shuffle key is the group key, and late data beyond the 1 h watermark is
dropped by contract (the knob a real deployment tunes).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: tumbling window width (6 h) and allowed lateness (1 h)
WINDOW_MICROS = 6 * 3600 * 1_000_000
WINDOW_SPEC = "6 hours"
WATERMARK_SPEC = "1 hour"

#: session-window gap — same 12 h the batch sessionizer uses
#: (functions/events.SESSION_GAP_MICROS). Probed: Spark merges TOUCHING
#: session windows, so an exactly-12 h gap stays in-session — the gap
#: rule is the identical strict-> of the batch operator
SESSION_WINDOW_SPEC = "12 hours"

FLUSH_TYPE = "__flush__"
#: far-future sentinel (2100-01-01T00:00:00) — past every real event,
#: so the final watermark closes every real window
FLUSH_TS = "2100-01-01 00:00:00"

EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)


def windowed_event_counts(events_stream: DataFrame) -> DataFrame:
    """The streaming plan fragment: watermark on event time, tumbling
    6 h windows per event_type, integer-exact aggregates. Spark's
    watermark machinery requires TIMESTAMP (not NTZ) — callers must pin
    the session timezone to UTC so the cast is the identity wall-clock
    mapping."""
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", WATERMARK_SPEC)
        .groupBy(F.window("ts", WINDOW_SPEC), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("value_cents"),
        )
    )


def _build_time_ordered_source(spark: SparkSession, sf_dir: str) -> str:
    """Write the events table as a time-ordered multi-file stream source
    (range-partitioned on ts, strictly increasing mtimes) plus the
    far-future flush sentinel as the last-arriving file. Caller removes
    the returned directory."""
    import glob
    import os

    src = tempfile.mkdtemp(prefix="smartreader_eventstream_src_")
    try:
        return _fill_time_ordered_source(spark, sf_dir, src, glob, os)
    except BaseException:
        shutil.rmtree(src, ignore_errors=True)
        raise


def _fill_time_ordered_source(spark, sf_dir, src, glob, os) -> str:
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .repartitionByRange(4, "ts")
        .write.mode("append")
        .parquet(src)
    )
    # range partition k holds the k-th time slice and the writer names
    # it part-0000k — mtime-order the files to match, so the
    # mtime-ordered stream listing replays the log in time order
    t0 = os.path.getmtime(src)
    real = sorted(glob.glob(f"{src}/part-*.parquet"))
    for i, p in enumerate(real):
        os.utime(p, (t0 + 2 * i, t0 + 2 * i))
    spark.createDataFrame(
        [(-1, FLUSH_TS, -1, FLUSH_TYPE, 0.0, "{}")],
        "event_id long, ts_s string, user_id long, "
        "event_type string, value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp_ntz").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).coalesce(1).write.mode("append").parquet(src)
    for p in glob.glob(f"{src}/part-*.parquet"):
        if p not in real:
            os.utime(p, (t0 + 1000, t0 + 1000))
    return src


def _drain(spark: SparkSession, src: str, plan_fn,
           max_files_per_trigger: int) -> DataFrame:
    from .extract_stream import run_bounded_to_df

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(src)
    )
    return run_bounded_to_df(plan_fn(stream), spark)


def stream_event_windows_bounded(spark: SparkSession, sf_dir: str,
                                 max_files_per_trigger: int = 1) -> DataFrame:
    """Bounded replay of the events table through the WATERMARKED
    windowed aggregation: the batch table is re-laid-out as a multi-file
    stream source plus the flush sentinel, drained with
    trigger(availableNow=True) through the exactly-once file sink, and
    returned as a batch DataFrame of closed windows (epoch-micro bounds,
    sentinel rows excluded)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = _build_time_ordered_source(spark, sf_dir)
    try:
        out = _drain(spark, src, windowed_event_counts, max_files_per_trigger)
    finally:
        shutil.rmtree(src, ignore_errors=True)

    micros = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    return (
        out.where(F.col("event_type") != FLUSH_TYPE)
        .select(
            micros("window.start").alias("window_start_micros"),
            micros("window.end").alias("window_end_micros"),
            "event_type",
            "n_events",
            "value_cents",
        )
        .orderBy("window_start_micros", "event_type")
    )


def session_event_windows(events_stream: DataFrame) -> DataFrame:
    """SESSION-window streaming aggregation: per user, events merge into
    one session while each arrives less than SESSION_WINDOW_SPEC after
    the previous (Spark's session_window — dynamic merging windows, the
    third stateful streaming shape here next to tumbling windows and the
    custom applyInPandasWithState gate). Boundary semantics PROBED, not
    assumed: Spark merges touching windows, so an event exactly gap
    after its predecessor stays in-session — the same strict-> rule as
    the batch `functions/events.event_sessions`, and the streaming and
    batch sessionizations therefore agree except that this one reports
    session end as last-event + gap."""
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", WATERMARK_SPEC)
        .groupBy(F.session_window("ts", SESSION_WINDOW_SPEC), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("value_cents"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("n_errors"),
        )
    )


def stream_event_sessions_bounded(spark: SparkSession, sf_dir: str,
                                  max_files_per_trigger: int = 1) -> DataFrame:
    """Bounded replay through the session-window aggregation; a session
    is emitted exactly once, when the watermark passes its end (last
    event + gap) — the flush sentinel closes every real session. The
    sentinel's own session is keyed by user_id -1 and excluded."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = _build_time_ordered_source(spark, sf_dir)
    try:
        out = _drain(spark, src, session_event_windows, max_files_per_trigger)
    finally:
        shutil.rmtree(src, ignore_errors=True)

    micros = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    return (
        out.where(F.col("user_id") >= 0)
        .select(
            "user_id",
            micros("session_window.start").alias("session_start_micros"),
            micros("session_window.end").alias("session_end_micros"),
            "n_events",
            "value_cents",
            "n_errors",
        )
        .orderBy("user_id", "session_start_micros")
    )
