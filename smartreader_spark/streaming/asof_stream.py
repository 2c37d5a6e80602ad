"""Custom-stateful streaming as-of enrichment: annotate every event with
the most recent strictly-earlier error of the same user, carried in the
streaming STATE STORE — the streaming twin of the batch
`functions/events.events_asof_error`.

Why this exists as a second `applyInPandasWithState` operator (next to
the dedup gate): stream-stream joins cannot express as-of semantics
(their state buffers BOTH sides within a time interval; as-of needs
"the single latest left-row forever"), and the built-in window
aggregations cannot either — per-key custom state is the right tool,
exactly as on a real ingest pipeline where every document event should
carry "time since this host last errored". State per user is ONE
(micros, event_id) pair — fixed-width, unbounded lifetime, the same
entity-key shuffle discipline as the batch operator.

Correctness contract (the oracle is the SAME DuckDB ASOF JOIN as the
batch op): rows within each Arrow feed are sorted by (micros,
event_id) and annotated sequentially; the state update keeps the MAX
(micros, event_id) error, which is commutative, and the
strictly-earlier comparison (state.micros < row.micros) excludes
same-microsecond errors regardless of which side of a micro-batch (or
range-partition file) boundary they landed on. The time-ordered replay
guarantees batch N+1 rows are >= batch N's max, so state never has to
"look ahead"."""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .window_stream import EVENTS_SCHEMA, _build_time_ordered_source

ASOF_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("last_error_id", T.LongType()),
        T.StructField("micros_since_error", T.LongType()),
    ]
)

#: state: the max (micros, event_id) error seen for this user
ASOF_STATE_SCHEMA = T.StructType(
    [
        T.StructField("err_micros", T.LongType()),
        T.StructField("err_id", T.LongType()),
    ]
)


def _asof_group(key, pdfs, state):
    import pandas as pd

    (user_id,) = key
    err_m, err_i = state.get if state.exists else (None, None)

    frames = []
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["micros", "event_id"], kind="mergesort")
        out_err, out_age = [], []
        for m, i, et in zip(pdf["micros"], pdf["event_id"], pdf["event_type"]):
            m = int(m)
            i = int(i)
            if err_m is not None and err_m < m:
                out_err.append(err_i)
                out_age.append(m - err_m)
            else:
                out_err.append(None)
                out_age.append(None)
            if et == "error" and (err_m is None or (m, i) > (err_m, err_i)):
                err_m, err_i = m, i
        frames.append(
            pd.DataFrame(
                {
                    "event_id": pdf["event_id"].to_numpy(),
                    "user_id": user_id,
                    "event_type": pdf["event_type"].to_numpy(),
                    "last_error_id": pd.array(out_err, dtype="Int64"),
                    "micros_since_error": pd.array(out_age, dtype="Int64"),
                }
            )
        )
    if err_m is not None:
        state.update((err_m, err_i))
    if not frames:
        frames.append(
            pd.DataFrame(
                columns=[
                    "event_id", "user_id", "event_type",
                    "last_error_id", "micros_since_error",
                ]
            )
        )
    yield from frames


def stream_asof_error(events_stream: DataFrame) -> DataFrame:
    """(events schema) stream → every row annotated with the most recent
    strictly-earlier same-user error from the state store."""
    keyed = events_stream.withColumn(
        "micros", F.unix_micros(F.col("ts").cast("timestamp"))
    ).select("event_id", "user_id", "event_type", "micros")
    return keyed.groupBy("user_id").applyInPandasWithState(
        _asof_group,
        outputStructType=ASOF_OUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def stream_asof_error_bounded(spark: SparkSession, sf_dir: str,
                              max_files_per_trigger: int = 1) -> DataFrame:
    """Bounded time-ordered replay through the stateful as-of gate —
    value-compared by the driver against the SAME DuckDB ASOF JOIN
    oracle as the batch operator (batch/stream parity for custom
    state). The flush sentinel row is excluded by user_id."""
    from .extract_stream import run_bounded_to_df

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = _build_time_ordered_source(spark, sf_dir)
    try:
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(src)
        )
        out = run_bounded_to_df(stream_asof_error(stream), spark)
    finally:
        shutil.rmtree(src, ignore_errors=True)

    return (
        out.where(F.col("user_id") >= 0)
        .select(
            "event_id", "user_id", "event_type",
            "last_error_id", "micros_since_error",
        )
        .orderBy("event_id")
    )
