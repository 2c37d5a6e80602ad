"""smartreader_spark — a PySpark-native main-content extraction engine.

A from-scratch reimplementation of the extraction semantics of
Strumenta/SmartReader (itself a port of Mozilla Readability) designed for
Spark's execution model: a pure-Python per-document kernel (no Spark
dependency, pytest-testable) wrapped in vectorized Arrow ``mapInPandas``
batches, with explicit skew salting, checkpoint/resume ledger and
per-partition lineage + metrics.

Layout:
  kernel/    pure-Python extraction kernel (DOM parse -> article spans + metadata)
  pipeline/  Spark DataFrame tier (scan, salt, mapInPandas, ledger, metrics)
  functions/ corpus-level ops (dedup, similarity, text QA) on plain tables
"""

__version__ = "0.1.0"
