#!/usr/bin/env python
"""Materialize expected-output tables for the extraction-kernel queries.

The DOM kernel is not SQL-expressible, so its driver-gate oracle is a
*precomputed expected table*: this tool runs the same pure-Python kernel
the Spark pipeline ships to executors (smartreader_spark.kernel) over the
same inputs the gated queries read, and writes the results as parquet.
The kernel itself is independently verified against the reference's 142
golden fixtures (tools/fixture_report.py) — the expected tables inherit
that grounding; the driver gate then proves the *distributed* pipeline
(Arrow batching, reassembly, schema, partitioning) reproduces the kernel
bit-for-bit.

Inputs replicated exactly as the queries build them:
  * fixtures/corpus.parquet spans, reassembled by ascending offset
    (pipeline.extract.reassemble_html_expr's JVM logic, Python-side)
  * /root/testdata/sf0.01 documents wrapped per __spark_entry__'s
    _docs_as_span_table html template

Outputs (committed):
  * fixtures/expected_extract_corpus.parquet
  * fixtures/expected_extract_testdata_sf001.parquet

Rerun after ANY kernel change: python tools/build_expected.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.path.join(REPO, "fixtures", "corpus.parquet")
SF001 = "/root/testdata/sf0.01"


def reassemble(spans) -> str:
    # mirror reassemble_html_expr: sort by offset, concat text, skip nulls
    parts = sorted((s for s in spans), key=lambda s: s["offset"])
    return "".join(s["text"] for s in parts if s["text"] is not None)


def extract_corpus_rows() -> list[dict]:
    from smartreader_spark.kernel.reader import extract_html

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, spans FROM read_parquet('{CORPUS}/*.parquet') ORDER BY doc_id"
    ).fetchall()
    rows = []
    for doc_id, spans in docs:
        r = extract_html(reassemble(spans))
        rows.append(
            {
                "doc_id": doc_id,
                "title": r["title"],
                "byline": r["byline"],
                "language": r["language"],
                "is_readable": bool(r["is_readable"]),
                "n_spans": len(r["spans"]),
                "chars_retained": r["metrics"]["chars_retained"],
                "candidates_scored": r["metrics"]["candidates_scored"],
                "nodes_stripped": r["metrics"]["nodes_stripped"],
                "error": r["error"],
            }
        )
    return rows


def extract_testdata_rows() -> list[dict]:
    from smartreader_spark.kernel.reader import extract_html

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id::VARCHAR, text FROM read_parquet('{SF001}/documents.parquet') ORDER BY doc_id::BIGINT"
    ).fetchall()
    rows = []
    for doc_id, text in docs:
        html = (
            f"<html><head><title>doc {doc_id}</title></head>"
            f"<body><article><p>{text}</p></article></body></html>"
        )
        r = extract_html(html)
        rows.append(
            {
                "doc_id": doc_id,
                "title": r["title"],
                "reading_time_sec": r["reading_time_sec"],
                "is_readable": bool(r["is_readable"]),
                "n_spans": len(r["spans"]),
            }
        )
    return rows


def pdf_spans_rows() -> list[dict]:
    """Expected flat spans for the deterministic synthetic PDF corpus
    (sources/pdf_corpus.py, 8 docs) parsed by the same kernel the Spark
    operator ships (kernel/pdfkit.py) — gates the distributed pipeline
    (binary Arrow batching, schema, partitioning), like extract_*."""
    from smartreader_spark.kernel.pdfkit import pdf_to_spans
    from smartreader_spark.sources.pdf_corpus import pdf_corpus_rows

    rows = []
    for doc_id, blob in pdf_corpus_rows(8):
        for s in pdf_to_spans(blob):
            rows.append(
                {
                    "doc_id": doc_id,
                    "seq": s["offset"],
                    "kind": s["kind"],
                    "text": s["text"],
                    "media_ref": s["media_ref"],
                }
            )
    return rows


def pipeline_docs_rows() -> list[dict]:
    """Expected unified (doc_id, source, text) table for the composed
    training pipeline (pipeline/training.py::unified_doc_table): both
    extraction legs run through the SAME kernel the Spark operators ship,
    with the same error/empty filtering and the same ordered text-span
    concat (TEXT_JOIN). The downstream dedup/quality/token stages are
    restated directly in the oracle SQL over this table, so the gate
    verifies the composition end-to-end."""
    from smartreader_spark.kernel.pdfkit import PdfParseError, pdf_to_spans
    from smartreader_spark.kernel.reader import extract_html
    from smartreader_spark.pipeline.training import PDF_DOCS, TEXT_JOIN
    from smartreader_spark.sources.pdf_corpus import pdf_corpus_rows

    def doc_text(spans) -> str:
        parts = sorted(spans, key=lambda s: s["offset"])
        return TEXT_JOIN.join(
            s["text"] for s in parts
            if s["kind"] == "text" and s["text"] is not None
        )

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id::VARCHAR, text FROM read_parquet('{SF001}/documents.parquet') ORDER BY doc_id::BIGINT"
    ).fetchall()
    rows = []
    for doc_id, text in docs:
        html = (
            f"<html><head><title>doc {doc_id}</title></head>"
            f"<body><article><p>{text}</p></article></body></html>"
        )
        r = extract_html(html)
        if r["error"] is not None:
            continue
        t = doc_text(r["spans"])
        if t:
            rows.append({"doc_id": doc_id, "source": "html", "text": t})
    for doc_id, blob in pdf_corpus_rows(PDF_DOCS):
        # mirror the Spark leg's error semantics exactly (ADVICE r4): the
        # pipeline drops every row with a non-null error, which includes
        # PdfDegraded (diagnostics) and PdfParseError/PdfCrash rows
        diags: list[str] = []
        try:
            spans = pdf_to_spans(blob, diagnostics=diags)
        except PdfParseError:
            continue
        except Exception:  # the operator's PdfCrash class — also dropped
            continue
        if diags:
            continue  # PdfDegraded → error non-null → dropped by the pipeline
        t = doc_text(spans)
        if t:
            rows.append({"doc_id": str(doc_id), "source": "pdf", "text": t})
    return rows


def write(rows: list[dict], path: str, schema: pa.schema) -> None:
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, path)
    print(f"wrote {len(rows)} rows -> {path}")


def main() -> None:
    write(
        extract_corpus_rows(),
        os.path.join(REPO, "fixtures", "expected_extract_corpus.parquet"),
        pa.schema(
            [
                ("doc_id", pa.string()),
                ("title", pa.string()),
                ("byline", pa.string()),
                ("language", pa.string()),
                ("is_readable", pa.bool_()),
                ("n_spans", pa.int32()),
                ("chars_retained", pa.int32()),
                ("candidates_scored", pa.int32()),
                ("nodes_stripped", pa.int32()),
                ("error", pa.string()),
            ]
        ),
    )
    write(
        extract_testdata_rows(),
        os.path.join(REPO, "fixtures", "expected_extract_testdata_sf001.parquet"),
        pa.schema(
            [
                ("doc_id", pa.string()),
                ("title", pa.string()),
                ("reading_time_sec", pa.int32()),
                ("is_readable", pa.bool_()),
                ("n_spans", pa.int32()),
            ]
        ),
    )
    write(
        pipeline_docs_rows(),
        os.path.join(REPO, "fixtures", "expected_pipeline_docs.parquet"),
        pa.schema(
            [
                ("doc_id", pa.string()),
                ("source", pa.string()),
                ("text", pa.string()),
            ]
        ),
    )
    write(
        pdf_spans_rows(),
        os.path.join(REPO, "fixtures", "expected_pdf_spans.parquet"),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("seq", pa.int32()),
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
            ]
        ),
    )


if __name__ == "__main__":
    main()
