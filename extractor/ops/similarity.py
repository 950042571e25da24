"""Similarity search over the ``embeddings`` table (``array<float>`` column).

- brute-force cosine top-k: the exact baseline — broadcast the (small) query
  set against the full corpus; per-pair math stays JVM-side via higher-order
  functions (zip_with/aggregate), no Python in the loop.
- LSH-bucketed ANN: random-hyperplane signatures as the scale path — each
  vector maps to a bit-bucket; candidate search touches only same-bucket
  rows.  Hyperplanes are derived deterministically from md5 so the bucket
  assignment itself is reproducible everywhere.

Scale: brute force is O(corpus × queries) but shuffle-free (queries
broadcast); the ANN variant turns that into O(corpus) bucketing + small
per-bucket joins — the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.window import Window

N_QUERIES = 5
TOP_K = 5
N_PLANES = 16


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the first N query vectors.
    Query side is tiny -> broadcast nested-loop join, no shuffle of the
    corpus; ranking via window with deterministic tiebreak."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    pairs = emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("embedding"), F.col("q")) / (
        _norm(F.col("embedding")) * _norm(F.col("q"))
    )
    scored = pairs.select(
        "query_id", "vec_id", F.round(cos, 4).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cosine")
    )


_BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("bucket", T.LongType()),
    ]
)


def lsh_ann_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket per vector (vectorized numpy kernel,
    deterministic planes from md5(plane_idx, dim)).  Returns bucket sizes —
    the candidate-generation stage of ANN search.  Rows-only check (bit/
    float math not portable to the SQL oracle)."""
    emb = _emb(spark, sf_dir)

    def kernel(iterator):
        import hashlib

        import numpy as np
        import pandas as pd

        planes = None
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            dim = len(pdf["embedding"].iloc[0])
            if planes is None:
                rows = []
                for p in range(N_PLANES):
                    seed = int.from_bytes(
                        hashlib.md5(f"plane{p}".encode()).digest()[:8], "big"
                    )
                    rng = np.random.default_rng(seed)
                    rows.append(rng.standard_normal(dim))
                planes = np.stack(rows)  # (P, dim)
            mat = np.stack(pdf["embedding"].to_numpy())  # (n, dim)
            bits = (mat @ planes.T) > 0  # (n, P)
            weights = (1 << np.arange(N_PLANES, dtype=np.int64))
            buckets = (bits * weights).sum(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "bucket": buckets}
            )

    assignments = emb.select("vec_id", "embedding").mapInPandas(
        kernel, _BUCKET_SCHEMA
    )
    return (
        assignments.groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
        .where(F.col("n_vectors") >= 1)
    )


def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection for adjacent id pairs —
    the linear oracle-able variant (scale path = lsh_ann_buckets candidates)."""
    emb = _emb(spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(
        (F.col("vec_id") - 1).alias("id_a"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
    )
    joined = a.join(b, "id_a")
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return joined.select(
        "id_a",
        "id_b",
        F.round(cos, 4).alias("cosine"),
        (cos >= 0.95).alias("is_near_dup"),
    )
