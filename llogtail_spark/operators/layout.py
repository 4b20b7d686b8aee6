"""Data-layout operators: Z-order (Morton-curve) clustering keys for
multi-dimensional file pruning.

The reference prunes work one-dimensionally: a sink reads only the
files its glob matched and only past its checkpoint offset
(log_watcher.go:97-126, utils.go:218-228). A 100 TB table queried by
BOTH user and time can't pick one sort key without destroying pruning
on the other dimension; the standard warehouse answer (Delta/Iceberg
`OPTIMIZE ZORDER BY`) is to sort by an interleaved-bit Morton code so
files stay tight ranges in BOTH dimensions at once.

`zorder_key` is the write-time layout primitive: a pure projection
(zero shuffle, whole-stage codegen — the bit interleave compiles to
shifts/ands/ors) followed by `repartitionByRange(z)` at write time.
`zorder_shards` is its audit query: per Z-shard row counts plus the
span each shard covers in each dimension — the numbers that prove a
min/max-zone-map index would prune multi-dimensional predicates.

Scale shape (10^12 rows):
- key computation is embarrassingly parallel (scan-local projection);
- the audit aggregation is ONE combinable groupBy on a bounded key
  domain (256 shards here — min/max/count all map-side combine);
- at write time, `repartitionByRange` over z samples ranges (AQE
  handles skew) and each output file covers a contiguous Morton
  range, i.e. a small rectangle in (user, hour) space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bits per dimension in the Morton code (8+8 -> 16-bit z)
ZBITS = 8
# audit granularity: shard id = top 8 bits of z (<= 256 shards)
SHARD_SHIFT = 8


def morton16(bx: Column, by: Column) -> Column:
    """Interleave the low 8 bits of two non-negative ints into a
    16-bit Morton code: bit i of bx lands at 2i+1, bit i of by at 2i.
    Pure integer expression — stays inside whole-stage codegen."""
    z = F.lit(0)
    for i in range(ZBITS):
        z = z + F.shiftleft(
            F.shiftright(bx, i).bitwiseAND(F.lit(1)), 2 * i + 1
        ) + F.shiftleft(
            F.shiftright(by, i).bitwiseAND(F.lit(1)), 2 * i
        )
    return z


def _morton16_sql(bx: str, by: str) -> str:
    terms = []
    for i in range(ZBITS):
        terms.append(f"((({bx} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({by} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def zorder_key(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts") -> DataFrame:
    """Append the 16-bit Morton layout key over (user bucket, hour
    bucket). Buckets: user_id mod 256; hour index (epoch // 3600)
    mod 256. Write path: `.repartitionByRange(n, "z").write...` —
    each file then covers a rectangle in (user, hour) space."""
    bx = (F.col(user_col) % 256).cast("int")
    # TIMESTAMP_NTZ cannot cast to BIGINT directly; hop via timestamp
    # (session tz pinned UTC, matching DuckDB's naive epoch())
    by = (F.floor(F.col(ts_col).cast("timestamp").cast("long") / 3600)
          % 256).cast("int")
    return (
        # a layout key needs both dimensions; rows missing either
        # can't be placed on the curve (engines also disagree on how
        # NULL aggregates/stringifies, so the audit twin would drift)
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .withColumn("_bx", bx).withColumn("_by", by)
        .withColumn("z", morton16(F.col("_bx"), F.col("_by")).cast("int"))
    )


def zorder_shards(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts") -> DataFrame:
    """Z-order layout audit: per Z-shard (top 8 Morton bits) row count
    and the min/max span covered in each source dimension. A tight
    layout shows every shard spanning a small user range AND a small
    hour range — the precondition for zone-map pruning on either
    predicate. Returns (zshard, n, user_lo, user_hi, hour_lo,
    hour_hi), <= 256 rows."""
    keyed = zorder_key(df, user_col, ts_col)
    return (
        keyed.groupBy(
            F.shiftright(F.col("z"), SHARD_SHIFT).cast("int").alias("zshard")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("_bx").cast("int").alias("user_lo"),
            F.max("_bx").cast("int").alias("user_hi"),
            F.min("_by").cast("int").alias("hour_lo"),
            F.max("_by").cast("int").alias("hour_hi"),
        )
    )


def zorder_shards_sql(user_col: str = "user_id", ts_col: str = "ts") -> str:
    """DuckDB twin: identical bucketing (mod 256 / epoch-hour mod 256),
    identical bit interleave, identical shard shift."""
    z = _morton16_sql("bx", "by")
    return f"""
        WITH keyed AS (
            SELECT CAST({user_col} % 256 AS INTEGER) AS bx,
                   CAST(CAST(floor(epoch({ts_col}) / 3600) AS BIGINT) % 256
                        AS INTEGER) AS by
            FROM events
            WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL),
        coded AS (SELECT bx, by, ({z}) AS zval FROM keyed)
        SELECT CAST(zval >> {SHARD_SHIFT} AS INTEGER) AS zshard,
               count(*) AS n,
               CAST(min(bx) AS INTEGER) AS user_lo,
               CAST(max(bx) AS INTEGER) AS user_hi,
               CAST(min(by) AS INTEGER) AS hour_lo,
               CAST(max(by) AS INTEGER) AS hour_hi
        FROM coded GROUP BY zshard
    """


# ---------------------------------------------------------------------------
# Global ordinals without a single-reducer sort
# ---------------------------------------------------------------------------

# range partitions for the ordinal assignment at test scale; at
# cluster scale size this to ~the input partition count.
ORD_PARTS = 32


def global_ordinals(df: DataFrame, order_cols: list[str],
                    n_parts: int = ORD_PARTS) -> DataFrame:
    """Assign each row its 1-based ordinal in the GLOBAL order of
    `order_cols` — without ever collapsing the data onto one reducer.

    The naive formulation (row_number over an un-partitioned window)
    plans a single-partition Exchange: one task sorts 10^12 rows.
    The scalable classic instead: (1) range-repartition on the order
    key (sampled boundaries; any split is fine because the final
    order is data-defined, not boundary-defined), (2) sort within
    partitions, (3) count rows per partition — a partition-count-sized
    aggregate — and prefix-sum those counts on the driver into per-
    partition offsets, (4) per-partition row_number + offset. Every
    stage is parallel; the only driver work is the K-entry prefix sum
    (the same shape as llogtail's per-file offset bookkeeping,
    utils.go:218-228: a tiny ordered ledger over big parallel chunks).

    `order_cols` must be a total order (add a unique tiebreak);
    NULL order keys are dropped (a global rank over NULL is
    undefined across engines). Returns the input columns + `ordinal`.
    """
    from pyspark.sql import Window

    from llogtail_spark.operators.ckpt import checkpoint

    for c in order_cols:
        df = df.filter(F.col(c).isNotNull())
    ranged = checkpoint(
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id()),
        # pin ONE materialization: the counts job and the ordinal job
        # must see the identical partition assignment (range boundaries
        # are sampled; re-execution is deterministic here but pinning
        # makes that a non-assumption — same discipline as
        # dedup.resolve_components). Reliable when sc.setCheckpointDir
        # is configured, localCheckpoint otherwise.
        eager=True,
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").count()
        .withColumnRenamed("count", "cnt").collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_col = F.element_at(
        F.create_map(*[
            F.lit(x) for pid in sorted(offsets)
            for x in (pid, offsets[pid])
        ]),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.withColumn(
            "ordinal",
            (F.row_number().over(w) + off_col).cast("long"),
        )
        .drop("_pid")
    )


def pareto_front(df: DataFrame, min_col: str, max_col: str,
                 n_parts: int = ORD_PARTS) -> DataFrame:
    """2-D skyline (pareto frontier): the (min_col, max_col) points
    not dominated by any other row — dominated = another row has
    min_col <= x AND max_col >= y with at least one strict. The
    corpus-curation use: "cheapest order per recency level" /
    "shortest doc per quality level" efficient-frontier reports.

    Scale shape (10^12 rows): the naive formulation is a running max
    over `ORDER BY min_col` with no PARTITION BY — Spark plans that as
    a SINGLE-partition Exchange (one task sorts everything), the same
    trap global_ordinals avoids. Instead:
    (1) collapse to one candidate per distinct min_col value
        (max(max_col) — a map-side-combinable agg; a frontier never
        holds two points with equal min_col),
    (2) range-repartition by min_col, in-partition cumulative max
        (window PARTITIONED by _pid — parallel),
    (3) per-partition maxima -> K-entry driver prefix-max (the same
        tiny-ordered-ledger shape as llogtail's per-file offset
        bookkeeping, utils.go:218-228),
    (4) keep rows strictly above the running max of everything with a
        smaller min_col.
    Every stage is parallel; driver work is K entries. NULLs in either
    column are dropped (dominance against NULL is undefined).

    Returns (min_col, max_col) — the frontier, one row per surviving
    min_col value.
    """
    from pyspark.sql import Window

    from llogtail_spark.operators.ckpt import checkpoint

    cand = (
        df.filter(F.col(min_col).isNotNull() & F.col(max_col).isNotNull())
        .groupBy(min_col)
        .agg(F.max(max_col).alias("_best"))
    )
    ranged = checkpoint(
        # pin ONE materialization: the maxima job and the filter job
        # must see the identical (sampled) range boundaries
        cand.repartitionByRange(n_parts, F.col(min_col))
        .withColumn("_pid", F.spark_partition_id()),
        eager=True,
    )
    maxima = {
        r["_pid"]: r["m"]
        for r in ranged.groupBy("_pid").agg(F.max("_best").alias("m")).collect()
    }
    prefix, best = {}, None
    for pid in sorted(maxima):
        if best is not None:
            prefix[pid] = best  # max(_best) over ALL prior partitions
        best = maxima[pid] if best is None or maxima[pid] > best else best
    # rows in the first non-empty partition have no prior-partition max:
    # element_at on a key absent from the map yields NULL, which the
    # greatest() below ignores — exactly "nothing smaller exists yet"
    off_col = (
        F.element_at(
            F.create_map(*[
                F.lit(x) for pid in sorted(prefix)
                for x in (pid, prefix[pid])
            ]),
            F.col("_pid"),
        )
        if prefix
        else F.lit(None).cast(ranged.schema["_best"].dataType)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(min_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = F.greatest(F.max("_best").over(w), off_col)
    return (
        ranged.withColumn("_run", run)
        .filter(F.col("_run").isNull() | (F.col("_best") > F.col("_run")))
        .select(F.col(min_col), F.col("_best").alias(max_col))
    )


def hilbert256(bx: Column, by: Column) -> Column:
    """16-bit Hilbert-curve index of two 8-bit buckets — the
    locality-superior sibling of morton16 (a Hilbert walk never jumps
    across the square, so consecutive key ranges cover tighter
    rectangles: the property range-partitioned file layout wants).

    The classic xy->d loop (reflect + swap at each of 8 bit levels)
    runs as ONE Catalyst aggregate fold with a (x, y, d) struct
    accumulator — expression size stays LINEAR in the bit depth (a
    naive unroll doubles the expression tree per level: new_x and
    new_y each reference both old coords, 2^8 blow-up by level 8).
    Pure integer ops, whole-stage codegen, bit-identical in the
    DuckDB twin.
    """
    levels = F.array(*[F.lit(1 << i).cast("long") for i in range(7, -1, -1)])
    init = F.struct(
        bx.cast("long").alias("x"),
        by.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc, s):
        x, y, d = acc["x"], acc["y"], acc["d"]
        rx = F.when(x.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        d2 = d + s * s * (rx * 3).bitwiseXOR(ry)
        xr = F.when(rx == 1, s - 1 - x).otherwise(x)
        yr = F.when(rx == 1, s - 1 - y).otherwise(y)
        nx = F.when(ry == 0, yr).otherwise(x)
        ny = F.when(ry == 0, xr).otherwise(y)
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    return F.aggregate(levels, init, step, lambda acc: acc["d"])


def _hilbert_levels_sql() -> str:
    """DuckDB twin of hilbert256 as EIGHT CHAINED CTE levels of plain
    scalar CASE expressions (columns x0,y0,d0 -> ... -> x8,y8,d8).

    Why not list_reduce with a struct accumulator (the direct
    translation of the Spark fold): DuckDB 1.0.0 returns WRONG values
    from struct-accumulator list_reduce at vector width — the same
    (bx,by)=(1,0) row yields d=1 under a WHERE filter but d=2 inside
    a 512-row scan (verified this session; 4-row scans are correct,
    512+ are not). Scalar CASE columns are vector-safe in every
    engine. Expects a CTE named l0 providing (bx, by, x0, y0, d0).
    """
    parts = []
    for i, s_ in enumerate([128, 64, 32, 16, 8, 4, 2, 1]):
        p, n = i, i + 1
        rx = f"CASE WHEN (x{p} & {s_}) > 0 THEN 1 ELSE 0 END"
        ry = f"CASE WHEN (y{p} & {s_}) > 0 THEN 1 ELSE 0 END"
        parts.append(f"""l{n} AS (
            SELECT bx, by,
                   CASE WHEN (y{p} & {s_}) > 0 THEN x{p}
                        WHEN (x{p} & {s_}) > 0 THEN {s_} - 1 - y{p}
                        ELSE y{p} END AS x{n},
                   CASE WHEN (y{p} & {s_}) > 0 THEN y{p}
                        WHEN (x{p} & {s_}) > 0 THEN {s_} - 1 - x{p}
                        ELSE x{p} END AS y{n},
                   d{p} + {s_ * s_} * xor(3 * ({rx}), {ry}) AS d{n}
            FROM l{p})""")
    return ",\n        ".join(parts)


def hilbert_shards(df: DataFrame, user_col: str = "user_id",
                   ts_col: str = "ts") -> DataFrame:
    """Hilbert layout audit — the zorder_shards twin on the Hilbert
    index: per H-shard (top 8 of 16 bits) row count and min/max span
    in each source dimension. Tighter per-shard spans than the Morton
    audit on the same data = better zone-map pruning after a
    `.repartitionByRange(n, "h")` write. Returns (hshard, n,
    user_lo, user_hi, hour_lo, hour_hi), <= 256 rows; same
    scan+rollup shape as zorder_shards (one combinable agg, no
    Python, no extra shuffle)."""
    bx = (F.col(user_col) % 256).cast("int")
    by = (F.floor(F.col(ts_col).cast("timestamp").cast("long") / 3600)
          % 256).cast("int")
    keyed = (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .withColumn("_bx", bx).withColumn("_by", by)
        .withColumn("h", hilbert256(F.col("_bx"), F.col("_by")).cast("int"))
    )
    return (
        keyed.groupBy(
            F.shiftright(F.col("h"), SHARD_SHIFT).cast("int").alias("hshard")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("_bx").cast("int").alias("user_lo"),
            F.max("_bx").cast("int").alias("user_hi"),
            F.min("_by").cast("int").alias("hour_lo"),
            F.max("_by").cast("int").alias("hour_hi"),
        )
    )


def hilbert_shards_sql(user_col: str = "user_id", ts_col: str = "ts") -> str:
    """DuckDB twin of hilbert_shards (chained-level formulation)."""
    return f"""
        WITH keyed AS (
            SELECT CAST({user_col} % 256 AS INTEGER) AS bx,
                   CAST(CAST(floor(epoch({ts_col}) / 3600) AS BIGINT) % 256
                        AS INTEGER) AS by
            FROM events
            WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL),
        l0 AS (
            SELECT bx, by, CAST(bx AS BIGINT) AS x0, CAST(by AS BIGINT) AS y0,
                   CAST(0 AS BIGINT) AS d0
            FROM keyed),
        {_hilbert_levels_sql()}
        SELECT CAST(d8 // {1 << SHARD_SHIFT} AS INTEGER) AS hshard,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(bx) AS INTEGER) AS user_lo,
               CAST(max(bx) AS INTEGER) AS user_hi,
               CAST(min(by) AS INTEGER) AS hour_lo,
               CAST(max(by) AS INTEGER) AS hour_hi
        FROM l8 GROUP BY d8 // {1 << SHARD_SHIFT}
    """
