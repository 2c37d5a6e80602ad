"""The extraction operator: DataFrame[(doc_id, spans)] → DataFrame[article].

The relational shell around the kernel (SURVEY.md §2.12). Everything
outside the kernel call is built-in Spark expressions so Catalyst can
push/prune/plan it; the kernel runs inside an Arrow-batched
``mapInPandas`` (vectorized dispatch, one Python call per batch — the
north-star's "no per-row Python": per-row work happens in the C HTML
tokenizer and compiled regexes, amortized over ~batch-size documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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

INPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", SPAN_TYPE),
    ]
)

METRICS_TYPE = T.StructType(
    [
        T.StructField("candidates_scored", T.IntegerType()),
        T.StructField("nodes_stripped", T.IntegerType()),
        T.StructField("chars_retained", T.IntegerType()),
    ]
)

# Output row: mirrors the reference's Article (Article.cs:18-103) in
# Spark-native types (SURVEY.md §1.2).
EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", SPAN_TYPE),
        T.StructField("title", T.StringType()),
        T.StructField("byline", T.StringType()),
        T.StructField("dir", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("excerpt", T.StringType()),
        T.StructField("site_name", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("published_at", T.TimestampType()),
        T.StructField("featured_image", T.StringType()),
        T.StructField(
            "alternative_language_uris", T.MapType(T.StringType(), T.StringType())
        ),
        T.StructField("reading_time_sec", T.IntegerType()),
        T.StructField("is_readable", T.BooleanType()),
        T.StructField("metrics", METRICS_TYPE),
        T.StructField("error", T.StringType()),
    ]
)

_OUT_COLS = [f.name for f in EXTRACT_SCHEMA.fields]


def doc_bytes_expr() -> "F.Column":
    """Approximate document size from span text lengths — pure built-in
    expressions (whole-stage codegen, no Python)."""
    return F.aggregate(
        "spans", F.lit(0).cast("long"), lambda acc, s: acc + F.length(s["text"])
    )


def spread_repartition(df: DataFrame, num_partitions: int) -> DataFrame:
    """Skew-spreading repartition for the extraction stage — round-robin.

    Chosen after measuring the alternatives (see also
    salted_size_bucket_repartition below, kept as the explicit size-aware
    strategy):

    1. *Balance*: round-robin gives exact per-partition row counts and
       interleaves input order, so consecutive giant pages land on
       different partitions; with hundreds of documents per partition the
       byte totals equalize (law of large numbers).
    2. *Memory shaping*: the Arrow record cap
       (spark.sql.execution.arrow.maxRecordsPerBatch, session default 4-16)
       bounds the byte size of any batch reaching Python to
       ~cap × max-doc-size, so one burst of giant pages cannot OOM a
       worker.
    3. *Straggler bound*: at cluster scale pass num_partitions ≈ 3-4× the
       total task slots; the scheduler's work stealing then absorbs any
       residual byte imbalance (a partition is at most a few seconds of
       work, so the slowest tail is bounded by one partition's wall).

    Measured rejects (round 1, BASELINE.md): a coarse (size_bucket, salt)
    composite key with ~100 distinct values hash-collided into few
    partitions (one task got 2× the bytes → 2× wall); an in-partition
    descending-size sort delayed first-batch delivery to every Python
    worker and cost more than it saved."""
    return df.repartition(num_partitions)


def salted_size_bucket_repartition(
    df: DataFrame, num_partitions: int, salt: int | None = None
) -> DataFrame:
    """The north-star's literal skew strategy: hash-repartition on a
    (size_bucket, salt) composite key so giant documents spread across
    partitions regardless of input order.

    The salt cardinality scales with the partition count (default
    16 × num_partitions) so the composite key space is ≫ num_partitions
    and the coarse-key collision lumpiness measured in round 1 (~100 keys
    → 2× byte skew) disappears; the salt itself is pmod(hash(doc_id)) —
    deterministic, no RNG. One shuffle, same as round-robin; no sort.

    Kept as an explicit strategy because it also *co-locates* size classes
    (useful when a downstream stage wants per-batch docs of similar cost);
    for pure balance the round-robin default measures equal or better."""
    salt = salt if salt is not None else 16 * num_partitions
    size_bucket = F.floor(F.log2(doc_bytes_expr() + F.lit(1)))
    key = size_bucket * F.lit(salt) + F.pmod(F.hash("doc_id"), F.lit(salt))
    return df.repartition(num_partitions, key)


def reassemble_html_expr():
    """Ordered-concat reassembly of interleaved spans — pure built-in
    expressions (JVM-side, codegen). Sorting by offset then concatenating
    text is the lossless inverse of the input codec (FIXTURES.md §1), so
    only ONE flat string column crosses the JVM→Python Arrow boundary
    (measured ~2× cheaper than shipping array<struct> rows)."""
    return F.concat_ws(
        "",
        F.transform(
            F.array_sort(
                F.transform(
                    "spans",
                    lambda s: F.struct(s["offset"].alias("o"), s["text"].alias("t")),
                )
            ),
            lambda s: s["t"],
        ),
    )


def _make_extract_batch(options_kwargs: dict | None, base_uri: str):
    """Build the mapInPandas function. The closure carries only plain
    Python values (broadcast-friendly, no SparkContext capture)."""

    def extract_batch(batches):
        import pandas as pd

        # imports inside the worker: one-time per executor interpreter
        from smartreader_spark.kernel.extractor import Options
        from smartreader_spark.kernel.reader import extract_html
        from smartreader_spark.kernel.regexes import build_regexes

        options = None
        if options_kwargs:
            kw = dict(options_kwargs)
            # regex table customization ships as plain pattern strings
            # (SmartReader.cs:2440-2508 Add/ReplaceRegularExpression)
            overrides = kw.pop("regex_overrides", None)
            additions = kw.pop("regex_additions", None)
            if overrides or additions:
                kw["regexes"] = build_regexes(overrides=overrides, additions=additions)
            options = Options(**kw)

        for pdf in batches:
            recs = []
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                r = extract_html(html, uri=base_uri, options=options)
                recs.append(
                    (
                        doc_id,
                        [
                            (s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in r["spans"]
                        ],
                        r["title"],
                        r["byline"],
                        r["dir"],
                        r["language"],
                        r["excerpt"],
                        r["site_name"],
                        r["author"],
                        r["published_at"],
                        r["featured_image"],
                        r["alternative_language_uris"],
                        r["reading_time_sec"],
                        r["is_readable"],
                        (
                            r["metrics"]["candidates_scored"],
                            r["metrics"]["nodes_stripped"],
                            r["metrics"]["chars_retained"],
                        ),
                        r["error"],
                    )
                )
            yield pd.DataFrame(recs, columns=_OUT_COLS)

    return extract_batch


def extract_articles(
    df: DataFrame,
    *,
    base_uri: str = "https://localhost/",
    options: dict | None = None,
    num_partitions: int | None = None,
    skew_strategy: str = "round_robin",
) -> DataFrame:
    """The headline operator: (doc_id, spans) → extracted article rows.

    Column-prunes to exactly (doc_id, spans) first so the upstream scan
    reads only what the kernel needs, spreads skew across partitions
    (``skew_strategy``: "round_robin" default, or "size_bucket" for the
    salted size-bucket key — see spread_repartition /
    salted_size_bucket_repartition for the measured trade), reassembles
    the HTML JVM-side, and maps the kernel over flat (doc_id, html)
    Arrow batches.
    """
    pruned = df.select("doc_id", "spans")
    if num_partitions:
        if skew_strategy == "size_bucket":
            pruned = salted_size_bucket_repartition(pruned, num_partitions)
        else:
            pruned = spread_repartition(pruned, num_partitions)
    flat = pruned.select("doc_id", reassemble_html_expr().alias("html"))
    return flat.mapInPandas(_make_extract_batch(options, base_uri), EXTRACT_SCHEMA)
