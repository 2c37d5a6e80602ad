"""PDF ingestion operator: (doc_id, pdf binary) → the interleaved span
table (BASELINE.json input_hint shape).

This is the "PDF/layout parse" leg of the north rule: kernel/pdfkit.py
parses each blob into the SAME ``spans array<struct<kind,text,media_ref,
offset>>`` rows the HTML corpus uses, so PDF documents flow into one
Iceberg/parquet table and every downstream operator — extraction
metrics, dedup, textqa, similarity — runs on them unchanged.

Execution shape mirrors pipeline/extract.py: prune → round-robin
repartition (PDFs skew like HTML pages; see spread_repartition's
rationale) → mapInPandas with Arrow-batched binary columns. Per-document
failures land in the `error` column instead of failing the task (the
resume ledger then retries them, pipeline/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)

PDF_SPANS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("spans", SPAN_TYPE),
        T.StructField("n_pdf_bytes", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def _pdf_batch(batches):
    import pandas as pd

    from smartreader_spark.kernel.pdfkit import PdfParseError, pdf_to_spans

    for pdf in batches:
        recs = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["pdf"]):
            raw = bytes(blob)
            try:
                spans = [
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in pdf_to_spans(raw)
                ]
                recs.append((doc_id, spans, len(raw), None))
            except PdfParseError as e:
                recs.append((doc_id, [], len(raw), str(e)))
            except Exception as e:  # noqa: BLE001 — at 100 TB one
                # pathological blob must cost one error row, not the task
                recs.append((doc_id, [], len(raw), f"pdf crash: {e!r:.200}"))
        yield pd.DataFrame(recs, columns=["doc_id", "spans", "n_pdf_bytes", "error"])


def pdf_to_span_table(df: DataFrame, *, num_partitions: int | None = None) -> DataFrame:
    """(doc_id, pdf) → (doc_id, spans, n_pdf_bytes, error) rows in the
    interleaved-span input shape. `df` needs columns doc_id:long and
    pdf:binary; everything else is pruned before the shuffle."""
    from .extract import spread_repartition

    pruned = df.select("doc_id", "pdf")
    if num_partitions:
        pruned = spread_repartition(pruned, num_partitions)
    return pruned.mapInPandas(_pdf_batch, PDF_SPANS_SCHEMA)
