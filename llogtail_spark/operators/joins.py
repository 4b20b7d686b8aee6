"""Temporal joins: as-of and point-in-interval (range), Spark-first.

Neither exists as a Spark builtin; both are re-expressed as
compositions whose plans scale:

- asof_join: tag + union both sides, ONE window pass per key carries
  the latest right-side values forward (last ignoreNulls over rows
  unbounded-preceding), filter back to left rows. Single shuffle on
  the key, no range explosion, no per-key loop — the standard
  union-merge formulation. Equal timestamps resolve right-before-left
  (>= / "backward" semantics, matching DuckDB ASOF JOIN).
- range_join_bucketed: quantize interval starts/ends and points to
  fixed-width buckets, explode each interval to the buckets it covers
  (few, when intervals are short relative to the bucket), equi-join on
  (key, bucket), exact post-filter. Turns an inequality join a generic
  engine would nested-loop into a hash join keyed on (key, bucket);
  a point matches an interval in exactly the point's own bucket, so no
  dedup pass is needed.

Reference anchor: llogtail keys every event to its file and processes
strictly in offset order (collector.go:74-78) — these operators are
the batch generalization of "latest state at or before this offset".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_sec: int | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    right_ts <= left_ts within the same `on` key (backward as-of).

    right MUST be unique per (on, right_ts) — dedupe upstream,
    deterministically, or the carried values are undefined.
    Output: all left columns + `_asof_ts` (the matched right_ts) +
    right_cols, all taken from the SAME right row; the entire group
    (including _asof_ts) is null when no prior right row exists or the
    match is older than `tolerance_sec`.
    """
    lcols = left.columns
    # the whole right row travels as ONE struct so the carried values
    # always come from the SAME right row — per-column last(ignorenulls)
    # would splice values across rows whenever a right column is null
    rstruct = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols]
    )
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(
            right.select(rstruct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    # a NULL right_ts can never satisfy right_ts <= left_ts (ASOF
    # semantics; DuckDB agrees) — but it would sort FIRST under the
    # default asc-nulls-first window order and be carried by
    # last(ignorenulls) as a spurious whole-struct match for left rows
    # preceding all real right rows (ADVICE r02). Drop such rows, the
    # same way minhash_lsh_pairs drops null text.
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        *[F.col(c) for c in on],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        rstruct.alias("_r"),
    ).select(*l.columns)  # align column order for unionByName safety
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        u.select(*u.columns, F.last("_r", ignorenulls=True).over(w).alias("_c"))
        .filter(F.col("_tag") == 1)
    )
    carried = F.col("_c")
    if tolerance_sec is not None:
        # timestamp->double keeps microsecond precision; unix_timestamp
        # would truncate to whole seconds and misclassify sub-second
        # gaps on either side of the tolerance boundary (e.g. a 5.9s
        # gap passing tolerance_sec=5). The intermediate timestamp cast
        # keeps string-typed ts columns working.
        within = (
            carried.isNotNull()
            & (F.col("_ts").cast("timestamp").cast("double")
               - carried["_rts"].cast("timestamp").cast("double")
               <= tolerance_sec)
        )
        carried = F.when(within, carried)  # stale match -> whole row null
    return out.select(
        *lcols,
        carried["_rts"].alias("_asof_ts"),
        *[carried[c].alias(c) for c in right_cols],
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_sec: int = 3600,
) -> DataFrame:
    """Inner join of points to the intervals containing them:
    start_ts < point_ts <= end_ts, same `on` key.

    Columns from both sides are kept (qualify duplicates upstream).
    The equi-join key is (on..., bucket); intervals explode to
    ceil(len/bucket)+1 buckets. Pick bucket_sec ~ the typical interval
    length: shuffle stays keyed and skew-safe (AQE splits hot keys).
    """
    us = 1_000_000 * bucket_sec

    def _micros(c):  # unix_micros rejects TIMESTAMP_NTZ; session is UTC
        return F.unix_micros(F.col(c).cast("timestamp"))

    pb = points.withColumn("_bkt", F.floor(_micros(point_ts) / us))
    # inverted intervals (end < start) would make sequence() count
    # DOWN and fabricate buckets — they can never match, so drop them
    ib = intervals.filter(F.col(end_ts) >= F.col(start_ts)).withColumn(
        "_bkt",
        F.explode(
            F.sequence(F.floor(_micros(start_ts) / us), F.floor(_micros(end_ts) / us))
        ),
    )
    return pb.join(ib, on=[*on, "_bkt"]).filter(
        (F.col(point_ts) > F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    ).drop("_bkt")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Skew-proof shuffled equi-join: salt the big (skewed) side,
    replicate the small side across all salts, join on (on..., salt).

    A shuffled join on a hot key puts every row of that key in ONE
    reducer task — the straggler that stalls a 1000-executor stage.
    Salting splits each key's rows across `n_salts` shuffle partitions
    (salt = pmod(xxhash64(salt_on...), n_salts), deterministic under
    retry) at the cost of writing the small side n_salts times; each
    matching (big, small) pair still meets exactly once, so the result
    is row-identical to the plain join for 'inner' and 'left' (NULL
    keys never equi-match on either path, and an unmatched left row
    survives exactly once). This is the explicit form of the north
    rule's "salted repartitioning ... before the per-sink aggregation
    stage"; AQE skew-split (session.py) stays on as the runtime
    backstop, but AQE cannot split a hot key finer than one reducer's
    input — salting can. Reference anchor: llogtail shards work by
    file, so one hot source serializes a worker the same way
    (collector.go:74-78); salting is the shard-split it lacks.

    salt_on defaults to all big-side columns: duplicate rows collide
    on a salt, which only skews the spread when the table is mostly
    copies of one row. Pass a row-unique column (an id) when you have
    one — cheaper to hash and perfectly uniform.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_src = [F.col(c) for c in (salt_on or big.columns)]
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_src), F.lit(n_salts)).cast("int")
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, on=[*on, "_salt"], how=how).drop("_salt")
