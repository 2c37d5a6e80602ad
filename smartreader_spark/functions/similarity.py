"""Similarity search over the `embeddings` table (array<float> column).

* brute_force_topk — exact cosine top-k of every query against the corpus
  via a joined reduce (F.zip_with + F.aggregate, JVM-side); the baseline
  and the verifier for approximate variants.
* lsh_bucketed_topk — sign-random-projection LSH: embeddings bucketed by
  the sign pattern of d deterministic pseudo-random hyperplanes; top-k is
  computed within each bucket only. At 100 TB the bucket join replaces the
  full cross product with an equi-join on a d-bit key.

No Python UDFs; the dot products run inside codegen'd higher-order
functions. Scores are rounded to 6 decimals for cross-engine comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_K = 5
DEFAULT_QUERIES = 8  # vec_id < 8 are the query set (deterministic)


def _load(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cast float32 → double up front so the dot-product accumulates in
    # double on both engines (bit-identical with DuckDB's DOUBLE[] math)
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(spark: SparkSession, sf_dir: str,
                     k: int = DEFAULT_K, n_queries: int = DEFAULT_QUERIES) -> DataFrame:
    """Exact top-k cosine neighbors for the first `n_queries` vectors.
    The query side is tiny → broadcast; corpus side streams once."""
    from pyspark.sql.window import Window

    emb = _load(spark, sf_dir).select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine(F.col("q"), F.col("embedding")), 6))
        .select("query_id", "vec_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
        .orderBy("query_id", "rank")
    )


def _srp_bucket(col, n_planes: int = 8):
    """Sign-random-projection bucket id: plane p = deterministic pseudo-
    random unit-free vector derived from md5(p||i) (same formula is
    reproducible in SQL); bucket bit p = sign of dot(plane_p, v).

    The per-plane weight index runs over the row's own embedding length
    (F.size) so plan construction needs no driver-side action to learn the
    dimension — the whole expression stays inside codegen."""
    # weight(p, i) = (conv(md5(p|i)[:4],16,10) / 32768) - 1  ∈ [-1, 1)
    def plane_dot(p):
        return F.aggregate(
            F.zip_with(
                col,
                F.sequence(F.lit(0), F.size(col) - 1),
                lambda x, i: x
                * (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(str(p) + "|"), i.cast("string"))), 1, 4
                        ),
                        16,
                        10,
                    ).cast("double")
                    / F.lit(32768.0)
                    - F.lit(1.0)
                ),
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )

    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket + F.when(plane_dot(p) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_bucketed_topk(spark: SparkSession, sf_dir: str,
                      k: int = DEFAULT_K, n_queries: int = DEFAULT_QUERIES,
                      n_planes: int = 4) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's SRP bucket.
    The scale path — equi-join on the bucket id instead of a cross join."""
    from pyspark.sql.window import Window

    emb = _load(spark, sf_dir).select("vec_id", "embedding")
    emb_b = emb.withColumn("bucket", _srp_bucket(F.col("embedding"), n_planes))
    queries = emb_b.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        emb_b.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("score", F.round(cosine(F.col("q"), F.col("embedding")), 6))
        .select("query_id", "vec_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
        .orderBy("query_id", "rank")
    )
