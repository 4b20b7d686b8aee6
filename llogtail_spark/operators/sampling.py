"""Deterministic sampling & batch-shaping operators for training-data
pipelines.

All three are pure Catalyst expressions — no RNG state, no shuffle in
the filter itself, no Python — so they are reproducible across runs,
cluster sizes, and partition layouts (the property that matters when
a 100 TB corpus is re-materialized and the sample must not drift):

- deterministic_sample: keep a fixed pseudo-random fraction keyed on a
  stable id (hash-threshold sampling). Unlike `df.sample()`, the same
  row set survives re-runs, repartitioning, and speculative retries.
- mixture_weights: per-category keep-rates (the "data mixing" step of
  LLM corpus prep — e.g. downsample web, upsample wiki) as one CASE
  expression over the same hash, so a row's fate is a pure function of
  (key, category, weights).
- length_buckets: power-of-two sequence-length histogram (the batch-
  shaping / bucketed-batching prep step) — floor(log2(n)) computed as
  length(bin(n))-1 in exact integer arithmetic, then one map-side-
  combinable aggregation.

Hashing uses the engine-portable char-fold family
(functions/portable_hash.py) so every operator has a value-exact
DuckDB oracle; production can swap xxhash64 in one place.
Reference anchor: cheap-identity-first routing (utils.go:36-46) — a
row's destiny is decided by an O(row) pure function, never by state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llogtail_spark.functions.portable_hash import char_fold_hash, seeded_hash


def sample_bucket(key, seed_i: int = 0) -> "F.Column":
    """0..99 pseudo-random bucket for a key column: the hash-threshold
    sampling primitive. Different seed_i values give (affinely)
    decorrelated bucketings, so a 10% eval split (seed 1) is not a
    subset of a 30% train sample (seed 0)."""
    c = F.col(key) if isinstance(key, str) else key
    return seeded_hash(char_fold_hash(c.cast("string")), seed_i) % 100


def deterministic_sample(
    df: DataFrame, key_col: str, rate_pct: int, seed_i: int = 0
) -> DataFrame:
    """Keep ~rate_pct% of rows, decided per-row by hash(key) — stable
    under re-runs, retries, and any partitioning. The filter is a
    scan-level predicate (no shuffle, no RNG state to coordinate)."""
    return df.filter(sample_bucket(key_col, seed_i) < rate_pct)


def mixture_weights(
    df: DataFrame,
    category_col: str,
    key_col: str,
    weights: dict[str, int],
    default_pct: int = 100,
    seed_i: int = 0,
) -> DataFrame:
    """Per-category hash-threshold sampling: category c keeps
    ~weights[c]% of its rows (default default_pct). One CASE over a
    broadcast-free literal map — weights are config, not data."""
    cat = F.col(category_col)
    rate = F.lit(default_pct)
    for k, v in sorted(weights.items()):
        rate = F.when(cat == k, F.lit(int(v))).otherwise(rate)
    return df.filter(sample_bucket(key_col, seed_i) < rate)


def len_bucket(n) -> "F.Column":
    """floor(log2(n)) for n >= 1 via exact integer arithmetic
    (length of the binary representation minus one) — no float log,
    no boundary rounding hazard at powers of two."""
    c = F.col(n) if isinstance(n, str) else n
    return (F.length(F.bin(c.cast("long"))) - 1).cast("long")


def length_buckets(df: DataFrame, len_col: str) -> DataFrame:
    """Power-of-two length histogram: (bucket, n_rows, len_total,
    len_min, len_max). One hash aggregation, map-side combined; at
    100 TB this is a single near-free pass that sizes the bucketed-
    batching plan."""
    return (
        df.withColumn("bucket", len_bucket(len_col))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col(len_col).cast("long")).alias("len_total"),
            F.min(F.col(len_col).cast("long")).alias("len_min"),
            F.max(F.col(len_col).cast("long")).alias("len_max"),
        )
    )


def stratified_fixed_n(
    df: DataFrame,
    group_col: str,
    key_col: str,
    n: int,
    seed_i: int = 0,
) -> DataFrame:
    """EXACT-quota stratified sample: the first `n` rows per stratum
    in seeded-hash order (ties broken by the key) — the balanced-
    eval-subset primitive that Bernoulli hash-threshold sampling
    can't give (its per-stratum counts are binomial, not exact).

    One shuffle keyed on the stratum; the rank filter plans as
    WindowGroupLimit (per-partition top-n heaps before the exchange),
    so a 10^12-row stratum ships at most n rows per map task. Order is
    (hash, key): deterministic under re-runs and any layout, and
    decorrelated across seed_i values.
    """
    from pyspark.sql import Window as W

    from llogtail_spark.functions.portable_hash import order_hash

    c = F.col(key_col)
    # order_hash, not seeded_hash: the threshold family's small
    # multipliers never wrap MOD for short-key folds, so its "hash
    # order" degenerates to key order (measured: identical samples
    # for every seed)
    h = order_hash(char_fold_hash(c.cast("string")), seed_i)
    w = W.partitionBy(group_col).orderBy(h.asc(), c.asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def leakage_safe_split(
    labels: DataFrame,
    train_pct: int = 90,
    rep_col: str = "rep",
    seed_i: int = 3,
) -> DataFrame:
    """Train/val assignment that can never leak near-duplicates
    across the split: the decision hashes the dedup COMPONENT
    representative, not the document id, so every member of a
    near-dup cluster lands on the same side. Input is
    resolve_components' output (doc_id, rep, keep); the split is a
    pure projection — zero extra shuffle on top of resolution."""
    bucket = sample_bucket(F.col(rep_col).cast("string"), seed_i)
    return labels.withColumn(
        "split",
        F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("val")),
    )


# ---- SQL twins (DuckDB dialect) ----

def sample_bucket_sql(key_expr: str, seed_i: int = 0) -> str:
    from llogtail_spark.functions.portable_hash import (
        char_fold_hash_sql,
        seeded_hash_sql,
    )

    return (
        "("
        + seeded_hash_sql(char_fold_hash_sql(f"CAST({key_expr} AS VARCHAR)"), seed_i)
        + ") % 100"
    )


def len_bucket_sql(n_expr: str) -> str:
    return f"(length(bin(CAST({n_expr} AS BIGINT))) - 1)"
