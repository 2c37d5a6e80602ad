#!/usr/bin/env python
"""Production job entry for the COMPOSED training-data pipeline
(pipeline/training.py) via spark-submit — the full north_rule job shape:

    spark-submit --py-files $(python -c 'from smartreader_spark.pipeline.session \
        import package_zip; print(package_zip())') \
        tools/submit_pipeline.py <sf_dir> <output_dir> \
        [--pdf-source PATH] [--pdf-partitions N]

--pdf-source points the PDF leg at a real corpus: a parquet table with
(doc_id:long, pdf:binary) columns; without it the deterministic synthetic
corpus runs (gate-sized). --pdf-partitions sizes that leg's round-robin
spread (default: the HTML leg's partition count when --pdf-source is
given).

Writes two parquet tables under <output_dir>:
    survivors/  the quality-passed deduplicated documents with token stats
    funnel/     per-stage lineage counts (incl. the simhash skew valve's
                dropped-bucket count — recall loss is recorded, not silent)

Prints ONE json line with the funnel so an orchestrator can assert
stage-level expectations without re-reading the table.
"""

from __future__ import annotations

import json
import os
import sys

# local-mode fallback: under spark-submit the --py-files zip provides the
# package; run directly, the repo root does
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--pdf-source", default=None,
                    help="parquet path with (doc_id:long, pdf:binary) rows")
    ap.add_argument("--pdf-partitions", type=int, default=None)
    args = ap.parse_args()
    sf_dir = args.sf_dir
    out_dir = args.out_dir.rstrip("/")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("smartreader-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from smartreader_spark.pipeline.training import (
        training_funnel,
        training_pipeline,
    )

    training_pipeline(
        spark, sf_dir,
        pdf_source=args.pdf_source, pdf_partitions=args.pdf_partitions,
    ).write.mode("overwrite").parquet(f"{out_dir}/survivors")
    funnel = training_funnel(
        spark, sf_dir,
        pdf_source=args.pdf_source, pdf_partitions=args.pdf_partitions,
    )
    funnel.write.mode("overwrite").parquet(f"{out_dir}/funnel")
    stages = {r["stage"]: r["n_rows"] for r in funnel.collect()}
    print(json.dumps({"output": out_dir, "funnel": stages}))
    spark.stop()


if __name__ == "__main__":
    main()
