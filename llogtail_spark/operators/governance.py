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


# ---------------------------------------------------------------------------
# Referential-integrity audit (FK orphan counts)
# ---------------------------------------------------------------------------


def fk_audit(spark, tables: dict) -> DataFrame:
    """Foreign-key conformance audit across the warehouse: for each
    declared (child, fk) -> (parent, pk) relationship, how many child
    rows are orphans (fk NOT NULL but no matching parent) and how
    many carry a NULL fk — the data-quality gate a pipeline runs
    before trusting joins downstream (an orphan rate that jumps
    between loads is how partial ingests get caught).

    `tables` maps name -> DataFrame for: orders, customer, lineitem,
    part, supplier.

    Shape: each check is ONE left-anti join of the child against the
    parent's key projection — the parent side is key-only (column-
    pruned to one attribute) and Spark broadcasts it when dim-sized,
    while fact-fact checks (lineitem -> orders) shuffle both sides
    co-keyed; NULL counts ride the same scan as a conditional sum.
    The per-relation results are 1-row aggregates unioned together —
    a fixed-size report regardless of warehouse size.

    Output: (relation:string, n_child:long, n_null_fk:long,
    n_orphan:long, orphan_bp:long).
    """
    checks = [
        ("orders.custkey->customer", tables["orders"], "o_custkey",
         tables["customer"], "c_custkey"),
        ("lineitem.orderkey->orders", tables["lineitem"], "l_orderkey",
         tables["orders"], "o_orderkey"),
        ("lineitem.partkey->part", tables["lineitem"], "l_partkey",
         tables["part"], "p_partkey"),
        ("lineitem.suppkey->supplier", tables["lineitem"], "l_suppkey",
         tables["supplier"], "s_suppkey"),
    ]
    outs = []
    for name, child, fk, parent, pk in checks:
        base = child.select(F.col(fk).alias("fk"))
        keys = parent.select(F.col(pk).alias("fk")).distinct()
        totals = base.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(F.when(F.col("fk").isNull(), 1).otherwise(0))
            .alias("n_null_fk"),
        )
        orphans = (
            base.where(F.col("fk").isNotNull())
            .join(keys, "fk", "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphan"))
        )
        outs.append(
            totals.crossJoin(F.broadcast(orphans)).select(
                F.lit(name).alias("relation"),
                F.col("n_child").cast("long").alias("n_child"),
                F.col("n_null_fk").cast("long").alias("n_null_fk"),
                F.col("n_orphan").cast("long").alias("n_orphan"),
                F.floor(F.col("n_orphan") * 10000 / F.col("n_child"))
                .cast("long").alias("orphan_bp"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def fk_audit_sql() -> str:
    """DuckDB twin of fk_audit — the same four checks as anti-join
    aggregates."""
    def check(name, child, fk, parent, pk):
        return f"""
            SELECT '{name}' AS relation,
                   CAST(count(*) AS BIGINT) AS n_child,
                   CAST(sum(CASE WHEN {fk} IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_null_fk,
                   CAST(sum(CASE WHEN {fk} IS NOT NULL AND NOT EXISTS (
                            SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk})
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan,
                   CAST(floor(sum(CASE WHEN {fk} IS NOT NULL AND NOT EXISTS (
                            SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk})
                        THEN 1 ELSE 0 END) * 10000 / count(*)) AS BIGINT)
                       AS orphan_bp
            FROM {child} c"""

    parts = " UNION ALL ".join([
        check("orders.custkey->customer", "orders", "o_custkey",
              "customer", "c_custkey"),
        check("lineitem.orderkey->orders", "lineitem", "l_orderkey",
              "orders", "o_orderkey"),
        check("lineitem.partkey->part", "lineitem", "l_partkey",
              "part", "p_partkey"),
        check("lineitem.suppkey->supplier", "lineitem", "l_suppkey",
              "supplier", "s_suppkey"),
    ])
    return parts


# ---------------------------------------------------------------------------
# Table profiling (ANALYZE-style per-column statistics)
# ---------------------------------------------------------------------------

PROFILE_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def table_profile(df: DataFrame, cols: tuple = PROFILE_COLS) -> DataFrame:
    """ANALYZE-style column statistics — the stats-collection
    primitive a cost-based optimizer (and cm_join_size's consumers)
    feed on: per column, row count, NULL count, and exact distinct
    count. At 10^12 rows the exact per-column distincts are the
    expensive part; production swaps approx_count_distinct (HLL++)
    per column — the plan shape is identical (ONE pass, Spark plans
    the multi-distinct via Expand), and this exact version is what
    the oracle can verify bit-for-bit.

    Output: (column:string, n:long total rows, n_null:long,
    n_distinct:long NULLs excluded), one row per profiled column.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"_nd_{c}"))
    row = df.agg(*aggs)
    out = None
    for c in cols:
        one = row.select(
            F.lit(c).alias("column"),
            F.col("_n").cast("long").alias("n"),
            F.col(f"_nn_{c}").cast("long").alias("n_null"),
            F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
        )
        out = one if out is None else out.unionByName(one)
    return out


def table_profile_sql(cols: tuple = PROFILE_COLS,
                      table: str = "events") -> str:
    """DuckDB twin of table_profile — identical exact statistics."""
    parts = " UNION ALL ".join(
        f"""SELECT '{c}' AS column, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM {table}"""
        for c in cols
    )
    return parts
