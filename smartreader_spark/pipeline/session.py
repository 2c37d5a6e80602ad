"""SparkSession factory with the engine's recommended configs."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# THE Arrow batch-size surface (env SMARTREADER_ARROW_BATCH): every
# session factory in the repo (here, bench.py, tests) derives its
# spark.sql.execution.arrow.maxRecordsPerBatch from this one knob.
# 8 is measured-best on this box (BASELINE.md r2 sweep: 4→8 at 24
# workers cut best wide walls 16.7s→8.2s; 16 regressed tail latency on
# MB-sized pages). The record-count cap approximates a BYTE cap only
# when batch doc sizes are homogeneous — which is exactly what
# extract.salted_size_bucket_repartition provides (each partition holds
# docs of one size bucket), so tune the two together: coarse buckets +
# this cap ⇒ bounded, even Arrow transfer per worker.
ARROW_MAX_RECORDS = int(os.environ.get("SMARTREADER_ARROW_BATCH", "8"))


def make_session(
    master: str | None = None,
    app_name: str = "smartreader-spark",
    shuffle_partitions: int | None = None,
    arrow_max_records: int | None = None,
) -> SparkSession:
    """Local/test session. On a real cluster these land in spark-submit
    conf; the Arrow batch cap bounds Python-worker memory when documents
    are MB-sized (median fixture ≈115 KB → a 256-doc batch ≈30 MB)."""
    if arrow_max_records is None:
        arrow_max_records = ARROW_MAX_RECORDS
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_max_records))
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        # Arrow feeding of MB-sized documents churns the old gen; G1's
        # humongous-allocation handling stalls feeder threads under many
        # concurrent mapInPandas tasks (measured: 3-10x wall blowup).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UseParallelGC -Xms2g",
        )
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def package_zip(out_path: str = "/tmp/smartreader_spark_pkg.zip") -> str:
    """Zip the smartreader_spark package for --py-files shipment to
    executors (multi-executor clusters don't share the driver's cwd).
    Idempotent per content: rebuilt when any source file is newer."""
    import os
    import zipfile

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest = 0.0
    files = []
    for dirpath, _dirnames, filenames in os.walk(pkg_root):
        if "__pycache__" in dirpath:
            continue
        for fn in filenames:
            if fn.endswith(".py"):
                p = os.path.join(dirpath, fn)
                files.append(p)
                newest = max(newest, os.path.getmtime(p))
    if not os.path.exists(out_path) or os.path.getmtime(out_path) < newest:
        parent = os.path.dirname(pkg_root)
        with zipfile.ZipFile(out_path + ".tmp", "w", zipfile.ZIP_DEFLATED) as zf:
            for p in files:
                zf.write(p, os.path.relpath(p, parent))
        os.replace(out_path + ".tmp", out_path)
    return out_path


def ship_package(spark: SparkSession) -> None:
    """Make smartreader_spark importable on executors (addPyFile)."""
    spark.sparkContext.addPyFile(package_zip())


def warm_python_workers(spark: SparkSession, n_workers: int) -> None:
    """Pre-fork the Python worker pool while the cluster is otherwise idle.
    Creating workers lazily *during* the first real mapInPandas stage
    serializes their startup behind busy cores (measured: first-job wall
    up to 4× the steady state)."""
    import pandas as pd

    def noop(batches):
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    spark.range(n_workers * 4).repartition(n_workers).mapInPandas(
        noop, "n long"
    ).count()
