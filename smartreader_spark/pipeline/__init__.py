"""Spark DataFrame tier: scan → salt → mapInPandas(kernel) → write.

Design notes for 100 TB / 10^12-document scale:

* The kernel is a pure function; all state lives in the DataFrame plan.
* One Arrow batch of span-arrays at a time streams through the Python
  worker (iterator→iterator mapInPandas) — a partition is never
  materialized in Python memory.
* Skew is handled *before* the UDF: document byte size is computed with
  built-in expressions (aggregate over span text lengths — JVM-side,
  codegen), bucketed by log2, and the repartition key is
  (size_bucket, hash(doc_id) % salt) so a handful of 10 MB pages cannot
  straggle one task while 195-byte pages starve the rest.
* Resumability: a done-ledger table keyed by doc_id; restart = left-anti
  join input against the ledger (broadcast when small) and append.
* Arrow batch size is bounded by records AND indirectly by the size
  bucketing (homogeneous batches), so executor-python memory is stable.
"""

from .extract import (  # noqa: F401
    EXTRACT_SCHEMA,
    INPUT_SCHEMA,
    SPAN_TYPE,
    extract_articles,
    salted_size_bucket_repartition,
    spread_repartition,
)
