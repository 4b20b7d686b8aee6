"""Per-sink rollups and order-insensitive content checksums.

The reference's only 'aggregate' is a logged byte count per push
(file_sink.go:78); the north rule promotes per-sink row counts and
byte/token totals to a first-class, exactly-verified output.

Checksum design: BIT_XOR of xxhash64(doc_id, tokens) — order-
insensitive (XOR is commutative), overflow-free under ANSI mode, and
collision-unlikely, playing the role of llogtail's first-1KB MD5
identity (utils.go:36-46) at partition/sink granularity. Catalyst
runs this as partial+final aggregation automatically: map-side XOR
per partition, tiny shuffle.

Skew: per-sink aggregation keys on `sink` — very low cardinality, so
one hot sink (the reference's one noisy log) would bottleneck a
single reducer. `salted_sink_aggregates` pre-aggregates on
(sink, salt) then folds salts — two narrow shuffles, no hot reducer.
AQE skew handling stays on as belt-and-braces (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BYTES_PER_TOKEN = 4  # int32 tokens — byte totals derive exactly


def content_checksum(doc_id_col: str = "doc_id", tokens_col: str = "tokens"):
    """Order-insensitive row-content checksum aggregate expression."""
    return F.bit_xor(F.xxhash64(F.col(doc_id_col), F.col(tokens_col)))


def sink_aggregates(routed: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Rollup over a routed frame (must carry a `sink` column)."""
    group_cols = group_cols or ["sink"]
    return routed.groupBy(*group_cols).agg(
        F.count("*").alias("row_count"),
        F.sum("n_tok").alias("tok_total"),
        (F.sum("n_tok") * BYTES_PER_TOKEN).alias("byte_total"),
        F.countDistinct("source").alias("n_sources"),
        content_checksum().alias("checksum"),
    )


def salted_sink_aggregates(routed: DataFrame, n_salts: int = 64) -> DataFrame:
    """Two-phase (salted) variant producing IDENTICAL results.

    Phase 1 groups on (sink, salt) — spreads a pathological single-
    sink distribution over n_salts reducers; phase 2 folds the salts.
    All component aggregates are decomposable (count/sum -> sum,
    bit_xor -> bit_xor); countDistinct is rebuilt exactly from the
    phase-1 (sink, salt, source)-level grouping.
    """
    salted = routed.withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(n_salts))
    )
    partial = salted.groupBy("sink", "_salt", "source").agg(
        F.count("*").alias("c"),
        F.sum("n_tok").alias("t"),
        F.bit_xor(F.xxhash64("doc_id", "tokens")).alias("x"),
    )
    return (
        partial.groupBy("sink")
        .agg(
            F.sum("c").alias("row_count"),
            F.sum("t").alias("tok_total"),
            (F.sum("t") * BYTES_PER_TOKEN).alias("byte_total"),
            F.countDistinct("source").alias("n_sources"),
            F.bit_xor("x").alias("checksum"),
        )
    )


def partition_stats(df: DataFrame, part_col: str = "part") -> DataFrame:
    """Per-partition lineage stats for the manifest: the
    (row_count, checksum) identity that validates resume
    (validateCpt analog, utils.go:128-133)."""
    return df.groupBy(part_col).agg(
        F.count("*").alias("row_count"),
        F.sum("n_tok").alias("tok_total"),
        content_checksum().alias("checksum"),
    )
