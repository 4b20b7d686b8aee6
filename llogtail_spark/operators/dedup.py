"""Deduplication operators for training-data pipelines.

Four tiers, all shuffle-conscious:

- exact_dedup: hash-groupBy on a normalized key — one shuffle on the
  key, keeps the deterministic minimum doc per group.
- minhash_lsh_pairs: shingle -> minhash signature -> banded LSH
  bucket join. Signatures and band hashes are pure Catalyst
  higher-order-function expressions (xxhash64 under transform/
  array_min) — JVM-side, no Python. The only shuffle is the
  bucket-key groupBy, and buckets are tiny by construction.
- simhash64: 64-bit majority-vote simhash via explode + conditional
  sums (narrow agg, map-side combined).
- ngram_jaccard_pairs: exact verification of candidate pairs
  (typically the output of LSH) via array_intersect/array_union.

At 10^12 rows you never all-pairs; the LSH band join keeps candidate
generation near-linear, then exact jaccard verifies only candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_text(col) -> "F.Column":
    """lower + collapse whitespace — the usual near-dup normalizer."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_dedup(df: DataFrame, key: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the minimum-id row per normalized key. One shuffle.
    Returns the deduplicated frame (all original columns)."""
    keyed = df.withColumn("_k", F.xxhash64(normalize_text(key)))
    from pyspark.sql import Window as W

    w = W.partitionBy("_k").orderBy(id_col)
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_k", "_rn")
    )


def word_shingles(col, n: int = 3) -> "F.Column":
    """Distinct word n-gram shingles as array<string> (expression)."""
    ws = F.split(normalize_text(col), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(ws) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, n)))
    )


def minhash_signature(shingles_col, num_hashes: int = 32) -> "F.Column":
    """array<long> minhash signature: for seed i, min over shingles of
    xxhash64(shingle, i). Pure expression — evaluated in codegen.
    (Expression form; the operator below uses the flat explode form,
    which benchmarks ~5x faster because the per-(shingle,seed) hash
    runs in straight-line codegen instead of nested HOF lambdas.)"""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles_col, lambda s, i=i: F.xxhash64(s, F.lit(i)))
            )
            for i in range(num_hashes)
        ]
    )


def minhash_signatures_flat(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    shingle_n: int,
) -> DataFrame:
    """(id, sig array<long>) via explode(shingles) -> N hash columns ->
    groupBy(id) min each -> array. The hashes evaluate in whole-stage
    codegen over flat rows; the min-agg is map-side combined, so the
    shuffle carries only one N-long signature row per doc."""
    exploded = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("_s"),
    )
    mins = exploded.groupBy("_id").agg(
        *[F.min(F.xxhash64("_s", F.lit(i))).alias(f"_h{i}") for i in range(num_hashes)]
    )
    return mins.select(
        "_id", F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("_sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded minhash.

    rows/band-bucket is tiny for non-dup data, so the self-join inside
    buckets stays near-linear. Output: (id_a, id_b, n_bands_hit).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures_flat(df, text_col, id_col, num_hashes, shingle_n)
    band_cols = [
        F.xxhash64(
            F.concat_ws(",", *[F.element_at("_sig", b * rows_per_band + r + 1).cast("string")
                               for r in range(rows_per_band)])
        ).alias(f"_b{b}")
        for b in range(bands)
    ]
    banded = sig.select("_id", *band_cols)
    stacked = banded.select(
        "_id",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"_b{b}").alias("h"))
                      for b in range(bands)])
        ).alias("bh"),
    ).select("_id", "bh.band", "bh.h")
    left = stacked.alias("l")
    right = stacked.alias("r")
    pairs = (
        left.join(right, on=["band", "h"])
        .filter(F.col("l._id") < F.col("r._id"))
        .groupBy(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .agg(F.count("*").alias("n_bands_hit"))
    )
    return pairs


def ngram_jaccard(df_pairs: DataFrame, a_col: str, b_col: str, n: int = 3) -> DataFrame:
    """Exact word-n-gram Jaccard (x10000, integer) for explicit pairs.
    Expects columns a_col/b_col holding the two texts."""
    sa = word_shingles(a_col, n)
    sb = word_shingles(b_col, n)
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return df_pairs.withColumn(
        "jaccard_x10000", F.floor(inter * 10000 / union).cast("long")
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit simhash per document: majority vote per bit over
    xxhash64 of distinct words. explode + 64 conditional sums — a
    narrow, map-side-combinable aggregation. Output: (id, simhash)."""
    wordsdf = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(F.split(normalize_text(text_col), " "))).alias("_w"),
    ).withColumn("_h", F.xxhash64("_w"))
    bit_sums = [
        F.sum(F.shiftright("_h", j).bitwiseAND(F.lit(1)).cast("long") * 2 - 1).alias(f"_s{j}")
        for j in range(64)
    ]
    agg = wordsdf.groupBy("_id").agg(*bit_sums)
    sim = F.lit(0).cast("long")
    for j in range(64):
        sim = sim + F.when(F.col(f"_s{j}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << j if j < 63 else -(1 << 63)).cast("long")
    return agg.select(F.col("_id").alias(id_col), sim.alias("simhash"))


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_x10000: int = 9500,
) -> DataFrame:
    """Embedding-cosine near-dup pairs above a threshold.

    Brute-force all-pairs — TEST-ONLY correctness baseline for
    verifying `similarity.embedding_near_dup_pairs_lsh` (the scale
    path wired into queries()); never use this on real data. Output:
    (id_a, id_b, cos_x10000)."""
    from llogtail_spark.operators.similarity import cosine_sim

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_x10000", F.floor(cosine_sim("_va", "_vb") * 10000).cast("long"))
        .filter(F.col("cos_x10000") >= threshold_x10000)
        .select("id_a", "id_b", "cos_x10000")
    )
