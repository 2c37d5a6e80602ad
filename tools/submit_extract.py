#!/usr/bin/env python
"""Production job entry for spark-submit (the north_rule's launch shape):

    spark-submit --py-files $(python -c 'from smartreader_spark.pipeline.session \
        import package_zip; print(package_zip())') \
        tools/submit_extract.py <input_parquet> <output_path> [num_partitions]

Runs the resumable extraction (anti-join ledger + per-run lineage) over an
interleaved (doc_id, spans) table. On a multi-executor cluster the
--py-files zip makes smartreader_spark importable on every executor; in
this sandbox the same command line runs against local[*].

Prints ONE json line: {"run_id": ..., "run_docs": N, "output_path": ...}.
"""

from __future__ import annotations

import json
import os
import sys

# local-mode fallback: under spark-submit the --py-files zip provides the
# package; run directly, the repo root does
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    input_path = sys.argv[1]
    output_path = sys.argv[2]
    num_partitions = int(sys.argv[3]) if len(sys.argv) > 3 else None

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("smartreader-extract").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from smartreader_spark.pipeline.checkpoint import run_resumable_extraction

    df = spark.read.parquet(input_path)
    summary = run_resumable_extraction(
        spark, df, output_path, num_partitions=num_partitions
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
