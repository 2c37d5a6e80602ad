"""Checkpoint / resume: per-partition lineage + done-ledger (north_rule).

Pattern (SURVEY.md §2.12, §4.2): the output table itself is the ledger —
every successfully written doc_id is done. Resume = left-anti join the
input against the ledger's doc_id projection (broadcast when small, AQE
otherwise) and append only the remainder. Appends are atomic per job on
Iceberg (snapshot isolation); on plain parquet we emulate with directory
-per-run appends, which is what this sandbox exercises.

Lineage/metrics: one row per (run_id, partition) with document counts and
aggregated extraction metrics, appended alongside the data so a failed run
is diagnosable and a resumed run auditable.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def remaining_input(input_df: DataFrame, ledger_df: DataFrame | None) -> DataFrame:
    """Anti-join input against the done-ledger. Spark chooses broadcast for
    a small ledger under AQE; we hint it when the ledger is provably small."""
    if ledger_df is None:
        return input_df
    done = ledger_df.select("doc_id").distinct()
    return input_df.join(done, "doc_id", "left_anti")


def load_ledger(
    spark: SparkSession,
    output_path: str,
    done_predicate: "F.Column | None" = None,
) -> DataFrame | None:
    """The output table IS the ledger (doc_id projection → column-pruned,
    predicate-pushed scan).

    `done_predicate` marks rows a resume should NOT retry; the default
    (`error IS NULL`) retries every errored doc — right for the HTML leg
    where failures are transient. Legs with a permanent-error taxonomy
    pass a wider predicate: the PDF leg uses
    `pdf_ingest.pdf_done_predicate()` (= error IS NULL OR
    is_permanent_error()) so permanently-bad blobs are ledgered as done
    instead of being re-parsed on every resume."""
    try:
        if os.path.exists(output_path):
            pred = (
                done_predicate
                if done_predicate is not None
                else F.col("error").isNull()
            )
            return spark.read.parquet(output_path).filter(pred).select("doc_id")
    except Exception:
        return None
    return None


def read_extracted(spark: SparkSession, output_path: str) -> DataFrame:
    """Canonical read of the extraction output: exactly one row per doc_id.

    The retry policy (load_ledger excludes errored docs from the ledger)
    means a document that errored in run K and succeeded in run K+1 has
    TWO rows in the output, under different run_id= partitions. On
    Iceberg the write path is MERGE INTO (sources/io.write_ledgered), so
    the duplicate never exists; on the plain-parquet emulation this
    reader collapses it — error-free row preferred, then the latest run.

    Cost note for 100-TB reads: the window shuffles on doc_id. Pay it
    only when retries actually happened (any lineage row with errors >
    0); a clean history has no duplicates and the table can be read
    directly."""
    from pyspark.sql.window import Window

    df = spark.read.parquet(output_path)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("error").isNotNull().cast("int"), F.col("run_id").desc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def lineage_metrics(extracted: DataFrame, key: "F.Column | None" = None) -> DataFrame:
    """Per-partition lineage + metrics aggregation — runs as a second,
    cheap aggregation over the extraction output (map-side partial agg;
    the shuffle moves only counters).

    `key` defaults to the physical spark_partition_id (per-task lineage,
    the production shape). Pass a deterministic content-derived key (e.g.
    an md5 bucket of doc_id) when the rollup must be reproducible across
    cluster topologies — the correctness-gate query does this so the same
    rollup is restatable in plain SQL on any engine."""
    key = F.spark_partition_id() if key is None else key
    return (
        extracted.withColumn("_part", key)
        .groupBy("_part")
        .agg(
            F.count("*").alias("docs"),
            F.count(F.col("error")).alias("errors"),
            F.sum(F.when(F.col("is_readable"), 1).otherwise(0)).alias("readable"),
            F.sum("metrics.candidates_scored").alias("candidates_scored"),
            F.sum("metrics.nodes_stripped").alias("nodes_stripped"),
            F.sum("metrics.chars_retained").alias("chars_retained"),
        )
        .withColumnRenamed("_part", "partition_id")
    )


def run_resumable_extraction(
    spark: SparkSession,
    input_df: DataFrame,
    output_path: str,
    *,
    num_partitions: int | None = None,
    options: dict | None = None,
    run_id: str | None = None,
) -> dict:
    """One resumable extraction job: anti-join → extract → append data +
    lineage. Returns a summary dict. Idempotent across restarts: rerunning
    after a crash extracts only the documents missing from the output.

    Duplicate-row consequence of the retry policy: a doc that errored in
    an earlier run and succeeded on retry has BOTH rows in the raw
    output (append-only parquet). Consumers must read through
    `read_extracted` (error-free row wins, then latest run) or filter
    `error IS NULL`; on Iceberg the MERGE-INTO path upserts instead."""
    from .extract import extract_articles

    run_id = run_id or f"run-{time.time_ns()}"
    ledger = load_ledger(spark, output_path)
    todo = remaining_input(input_df, ledger)

    extracted = extract_articles(todo, num_partitions=num_partitions, options=options)

    # write data under a run_id= partition directory (the plain-parquet
    # analog of an Iceberg snapshot: on Iceberg this would be
    # df.writeTo(table).append() and the snapshot id would scope the run)
    extracted.withColumn("run_id", F.lit(run_id)).write.mode("append").partitionBy(
        "run_id"
    ).parquet(output_path)

    # per-run lineage from the run's own delta: partition pruning on
    # run_id= restricts the scan to exactly the files this run wrote —
    # the (possibly huge) output table is never rescanned, and re-reading
    # the committed files (instead of a cached plan) is immune to the
    # ledger anti-join now seeing this run's own output
    delta = spark.read.parquet(output_path).filter(F.col("run_id") == run_id)
    lineage = lineage_metrics(delta.drop("run_id")).withColumn("run_id", F.lit(run_id))
    lineage_path = output_path.rstrip("/") + "_lineage"
    lineage.write.mode("append").parquet(lineage_path)

    run_docs = (
        spark.read.parquet(lineage_path)
        .filter(F.col("run_id") == run_id)
        .agg(F.sum("docs"))
        .collect()[0][0]
        or 0
    )
    return {"run_id": run_id, "output_path": output_path, "run_docs": int(run_docs)}
