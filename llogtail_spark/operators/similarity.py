"""Similarity search over an embedding column (array<float>).

- cosine_sim / brute_force_topk: exact baseline. The dot product is a
  pure Catalyst expression (zip_with + aggregate folded in double) —
  deterministic left-to-right summation, which keeps results bit-
  comparable with an oracle that folds the same way.
- lsh_bucket / lsh_topk: the scale path — random-hyperplane signed
  bits bucket vectors (vectorized numpy matmul inside one Arrow
  pandas_udf), candidates come from same-bucket joins (plus optional
  multi-probe), exact rerank only inside buckets. At 10^12 vectors
  brute force is O(N*Q); LSH keeps the join near-linear and the
  shuffle keyed on bucket ids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a, b) -> "F.Column":
    """Exact-order double-precision dot product expression."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a) -> "F.Column":
    sq = F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    return F.sqrt(sq)


def cosine_sim(a, b) -> "F.Column":
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (Q << N always at scale), so the scan
    of the big side stays shuffle-free; the only shuffle is the
    per-query top-k (tiny: N_q * k rows after partial sort).
    Output: (query_id, neighbor_id, rank, cos_x10000).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    n = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"))
    scored = (
        n.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("_cos", cosine_sim("_qv", "_nv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.floor(F.col("_cos") * 10000).cast("long").alias("cos_x10000"),
        )
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, n_bits)).astype(np.float64)


def make_bucket_udf(dim: int, n_bits: int = 12, seed: int = 7):
    """Arrow pandas_udf: embedding -> LSH bucket id (signed-bit code).
    One numpy matmul per Arrow batch — fully vectorized."""
    planes = _hyperplanes(dim, n_bits, seed)

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        bits = (m @ planes) > 0
        code = np.zeros(len(m), dtype=np.int64)
        for j in range(n_bits):
            code |= bits[:, j].astype(np.int64) << j
        return pd.Series(code)

    return bucket


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: bucket both sides with the same hyperplanes,
    equi-join on bucket, exact cosine rerank within buckets.

    Shuffle is keyed on the bucket id (2^n_bits keys) — tune n_bits so
    buckets hold ~N/2^bits vectors; skewed buckets are split by AQE.
    Output schema matches brute_force_topk (recall < 1 by design).
    """
    bucket = make_bucket_udf(dim, n_bits, seed)
    n = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    ).withColumn("_bkt", bucket(F.col("_nv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("_bkt", bucket(F.col("_qv")))
    scored = (
        n.join(F.broadcast(q), on="_bkt")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("_cos", cosine_sim("_qv", "_nv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.floor(F.col("_cos") * 10000).cast("long").alias("cos_x10000"),
        )
    )
