"""Data-governance operators: k-anonymity auditing over
quasi-identifier combinations.

Complements the row-local PII redaction path (functions/text.py
redact_pii — the analog of llogtail's per-line filter stage,
log_filter.go:16-24) with the CORPUS-level privacy property row-local
filters cannot see: a document whose (lang, source, length-bucket)
combination is shared by fewer than k rows is re-identifiable even
after every explicit identifier is scrubbed.

Scale shape (10^12 rows):
- pass 1: groupBy the quasi-identifier tuple — ONE shuffle with full
  map-side combine (the QI domain is tiny relative to the corpus);
- pass 2: re-aggregate the group-size table by lang — dim-sized
  input, negligible;
- nothing is ever collected; the risk report is bounded by the QI
  domain, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_ANON = 5
LEN_BUCKET = 100


def k_anonymity(df: DataFrame, k: int = K_ANON,
                len_bucket: int = LEN_BUCKET) -> DataFrame:
    """k-anonymity audit of documents under the quasi-identifier
    (lang, source, n_chars // len_bucket): per lang, the number of QI
    groups, groups below k, rows in those groups (re-identifiable
    rows), and the at-risk rate in basis points.

    Returns (lang, n_groups, groups_below_k, rows_at_risk, risk_bp),
    one row per lang."""
    qi = df.groupBy(
        "lang", "source",
        F.floor(F.col("n_chars") / len_bucket).cast("long").alias("len_b"),
    ).agg(F.count("*").alias("g"))
    return (
        qi.groupBy("lang")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum((F.col("g") < k).cast("long")).alias("groups_below_k"),
            F.sum(F.when(F.col("g") < k, F.col("g")).otherwise(F.lit(0)))
            .alias("rows_at_risk"),
            F.floor(
                F.sum(F.when(F.col("g") < k, F.col("g")).otherwise(F.lit(0)))
                * 10000 / F.sum("g")
            ).cast("long").alias("risk_bp"),
        )
    )


def k_anonymity_sql(k: int = K_ANON, len_bucket: int = LEN_BUCKET) -> str:
    """DuckDB twin: identical QI tuple, thresholds, and bp floor."""
    return f"""
        WITH qi AS (
            SELECT lang, source,
                   CAST(floor(n_chars / {len_bucket}) AS BIGINT) AS len_b,
                   count(*) AS g
            FROM documents GROUP BY lang, source, len_b)
        SELECT lang,
               count(*) AS n_groups,
               CAST(sum(CASE WHEN g < {k} THEN 1 ELSE 0 END) AS BIGINT)
                   AS groups_below_k,
               CAST(sum(CASE WHEN g < {k} THEN g ELSE 0 END) AS BIGINT)
                   AS rows_at_risk,
               CAST(floor(sum(CASE WHEN g < {k} THEN g ELSE 0 END)
                          * 10000 / sum(g)) AS BIGINT) AS risk_bp
        FROM qi GROUP BY lang
    """
