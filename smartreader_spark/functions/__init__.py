"""Corpus-level operations a large-scale training-data pipeline needs:
deduplication, similarity search, text quality analysis, fingerprinting.

Each op is a plain function ``(spark, sf_dir) -> DataFrame`` over the
driver's synthetic tables (documents / embeddings), built exclusively from
JVM-side expressions (no Python UDFs) so the plan stays in whole-stage
codegen, and paired with an ANSI-SQL oracle in __spark_entry__.py.

Cross-engine determinism: every hash these ops rely on is md5 (identical
hex in Spark and DuckDB); floats are rounded before comparison.
"""

from .dedup import (  # noqa: F401
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from .similarity import brute_force_topk, lsh_bucketed_topk  # noqa: F401
from .textqa import doc_fingerprints, language_guess, quality_scores, token_counts  # noqa: F401
