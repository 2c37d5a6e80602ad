"""Event-stream relational operators: gap sessionization and as-of
(most-recent-prior) joins over the `events` table.

Reference parity: SmartReader is a single-document extraction engine
with no event/relational surface (SURVEY §2.12 "relational shell") —
these serve the training-data-pipeline tier, where ingest telemetry
(crawl events, fetch errors, pipeline lineage events) is analyzed with
exactly these two shapes: "split each user's activity into sessions"
and "attach the most recent prior error to every event".

Scale shape
-----------
Both operators are ONE hash shuffle on the entity key (user_id) and one
sort within partitions — the minimum any per-entity ordered computation
can do. The as-of join is deliberately NOT a join at all: the right
side (error events) is folded into the same window pass as a
`max(struct(ts, id))` over a strict RANGE frame, so there is no second
shuffle, no range-explosion, and no skew amplification beyond the
entity key's own (a hot user salts the same way the extraction skew
strategies do). DuckDB restates it with its native ASOF JOIN — a
genuinely independent implementation of the same semantics.

Determinism discipline: all time arithmetic is integer epoch
MICROSECONDS (`unix_micros`, session timezone pinned to UTC for the
NTZ→TS cast); money sums are integer cents. No IEEE accumulation
anywhere, so cross-engine hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: a new session starts after 12 h of inactivity (the corpus' per-user
#: inter-event median is ~7.3 h, p90 ~25 h — the threshold lands between,
#: so sessions are plural per user but non-trivial)
SESSION_GAP_MICROS = 12 * 3600 * 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the parquet column is TIMESTAMP_NTZ; pin the session tz so the
    # NTZ->TIMESTAMP cast is the identity wall-clock mapping and
    # unix_micros agrees with DuckDB's epoch_us on the same file
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.withColumn(
        "micros", F.unix_micros(F.col("ts").cast("timestamp"))
    )


def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: per user, a new session begins at the
    first event and at every event more than SESSION_GAP_MICROS after
    its predecessor. Output is one row per session with integer-exact
    aggregates (micros, cents)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("micros", "event_id")
    is_new = F.when(
        F.lag("micros").over(w).isNull()
        | (F.col("micros") - F.lag("micros").over(w) > SESSION_GAP_MICROS),
        1,
    ).otherwise(0)
    cents = F.round(F.col("value") * 100).cast("long")
    sessions = ev.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("micros").alias("start_micros"),
            F.max("micros").alias("end_micros"),
            F.sum(cents).alias("value_cents"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("n_errors"),
        )
        .withColumn(
            "duration_micros", F.col("end_micros") - F.col("start_micros")
        )
        .select(
            "user_id", "session_seq", "n_events", "start_micros",
            "end_micros", "duration_micros", "value_cents", "n_errors",
        )
        .orderBy("user_id", "session_seq")
    )


def events_asof_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every event annotated with the most recent STRICTLY
    EARLIER error event of the same user (id + age in micros; null when
    no prior error). Implemented joinlessly: errors are marked inline as
    struct(micros, event_id) and the winner is `max(...)` over a RANGE
    frame ending at -1 micros — max over structs is order-independent,
    so ties at the same microsecond break to the larger event_id
    deterministically in both engines."""
    ev = _events(spark, sf_dir)
    err_mark = F.when(
        F.col("event_type") == "error",
        F.struct(F.col("micros").alias("m"), F.col("event_id").alias("i")),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("micros")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    # materialize the window max ONCE (field access on the struct
    # column, not per-field window instances — three identical max
    # buffers otherwise survive into the physical plan)
    return (
        ev.withColumn("_last_err", F.max(err_mark).over(w))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("_last_err.i").alias("last_error_id"),
            F.when(
                F.col("_last_err.m").isNotNull(),
                F.col("micros") - F.col("_last_err.m"),
            ).alias("micros_since_error"),
        )
        .orderBy("event_id")
    )
