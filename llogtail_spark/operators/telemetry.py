"""Telemetry/product analytics over the event stream: cohort
retention and ordered funnels — the rollups a log pipeline's
consumers actually ask of routed event sinks.

Reference anchor: llogtail's per-sink aggregate counts
(collector.go:125-174) are per-route rollups; retention and funnels
are the same discipline keyed on user lifecycle instead of sink.

Scale notes (10^12 events):
- cohort_retention never joins events to a per-user dim: events
  collapse to DISTINCT (user, week) first (map-side combinable), the
  per-user cohort min REUSES that shuffle's partitioning, and the
  final rollup is dim-sized (cohorts x offsets). One wide shuffle.
- funnel_counts shuffles once on user_id and folds each user's
  sorted events with a Catalyst HOF (no Python). Per-user event
  counts bound the fold (documented caveat: a single user with
  billions of events would need a per-(user, day) pre-fold).
  The greedy earliest-advance fold equals the sequential-min chain
  (t_k = min ts of step k with ts > t_{k-1}) — the standard funnel
  definition the DuckDB twin states directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SECONDS_PER_WEEK = 7 * 86400

# Ordered funnel steps over the events table.
FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def _week_idx(ts_col):
    # epoch-week index: cast timestamp -> long gives whole epoch
    # seconds (truncation == floor for post-1970 data); integer div
    # by 604800 is exact in both engines. The parquet column is
    # TIMESTAMP_NTZ, which cannot cast to BIGINT directly — hop via
    # timestamp (session tz is pinned UTC, matching DuckDB's naive
    # epoch()).
    return F.floor(
        ts_col.cast("timestamp").cast("long") / SECONDS_PER_WEEK
    ).cast("long")


def cohort_retention(df: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention: users are cohorted by their first
    active epoch-week; for every (cohort_week, week_offset) report
    the number of cohort users active that week and the retention in
    basis points of the cohort size.

    Returns (cohort_week, week_offset, n_users, retained_bp).
    """
    active = (
        df.select(
            F.col(user_col).alias("u"),
            _week_idx(F.col(ts_col)).alias("week"),
        )
        .where(F.col("u").isNotNull() & F.col("week").isNotNull())
        .distinct()
    )
    # min-week per user reuses the distinct's hash partitioning on
    # (u, week) ... not exactly: distinct partitions on both cols, so
    # the per-user min is one more (narrow, combinable) shuffle on u.
    cohort = active.groupBy("u").agg(F.min("week").alias("cohort_week"))
    joined = active.join(cohort, "u").select(
        "cohort_week",
        (F.col("week") - F.col("cohort_week")).alias("week_offset"),
    )
    counts = joined.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("long").alias("n_users"))
    w = Window.partitionBy("cohort_week")
    # cohort size = offset-0 count; window over the dim-sized rollup
    size = F.sum(
        F.when(F.col("week_offset") == 0, F.col("n_users"))).over(w)
    return counts.select(
        "cohort_week",
        F.col("week_offset").cast("long").alias("week_offset"),
        "n_users",
        F.floor(F.col("n_users") * 10000 / size).cast("long")
        .alias("retained_bp"),
    )


def cohort_retention_sql() -> str:
    """DuckDB twin of cohort_retention: identical epoch-week index
    (epoch seconds // 604800), distinct-activity grain, cohort min,
    and bp floor arithmetic."""
    return f"""
        WITH active AS (
            SELECT DISTINCT user_id AS u,
                   CAST(floor(epoch(ts) / {SECONDS_PER_WEEK}) AS BIGINT)
                       AS week
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        cohort AS (
            SELECT u, min(week) AS cohort_week FROM active GROUP BY u),
        j AS (
            SELECT c.cohort_week, a.week - c.cohort_week AS week_offset
            FROM active a JOIN cohort c USING (u)),
        counts AS (
            SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM j GROUP BY 1, 2)
        SELECT cohort_week, week_offset, n_users,
               CAST(floor(n_users * 10000 / sum(
                   CASE WHEN week_offset = 0 THEN n_users END)
                   OVER (PARTITION BY cohort_week)) AS BIGINT)
                   AS retained_bp
        FROM counts
    """


def funnel_counts(df: DataFrame, steps: tuple = FUNNEL_STEPS,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Ordered funnel: how many users reach step k — where reaching
    step k means an event of type steps[k-1] STRICTLY after the
    earliest chain through steps[0..k-2]. Greedy earliest-advance
    over the user's time-sorted events == the sequential-min chain
    (advancing at the first qualifying event can only leave more room
    for later steps), which is what the SQL twin computes.

    Returns (step, step_type, n_users, conv_bp) — conv_bp relative to
    step 1.
    """
    step_arr = F.array(*[F.lit(s) for s in steps])
    relevant = df.where(
        F.col(type_col).isin(*steps) & F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
    )
    per_user = relevant.groupBy(F.col(user_col).alias("u")).agg(
        F.array_sort(
            F.collect_list(F.struct(
                F.col(ts_col).alias("t"), F.col(type_col).alias("y")))
        ).alias("evs")
    )
    acc0 = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("timestamp").alias("t"),
    )

    def _merge(a, e):
        # try_element_at: once a user has completed the funnel
        # (stage == len(steps)) the lookup index overflows — NULL
        # never equals e.y, so the accumulator just carries through
        # (ANSI element_at would raise).
        nxt = F.try_element_at(step_arr, a.stage + 1)
        adv = (e.y == nxt) & ((a.stage == 0) | (e.t > a.t))
        return F.struct(
            F.when(adv, a.stage + 1).otherwise(a.stage).alias("stage"),
            F.when(adv, e.t).otherwise(a.t).alias("t"),
        )

    stages = per_user.select(
        F.aggregate("evs", acc0, _merge, lambda a: a.stage).alias("stage")
    ).where(F.col("stage") >= 1)
    # each user at stage s counts toward steps 1..s: explode the
    # (tiny, <= len(steps)) step range and count — combinable, no
    # join against a step dim.
    counts = (
        stages.select(
            F.explode(F.sequence(F.lit(1), F.col("stage"))).alias("step"))
        .groupBy("step")
        .agg(F.count("*").cast("long").alias("n_users"))
    )
    w = Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    # single-partition window over <= len(steps) rows — bounded.
    first_n = F.first("n_users").over(w)
    return counts.select(
        F.col("step").cast("int").alias("step"),
        F.element_at(step_arr, F.col("step")).alias("step_type"),
        "n_users",
        F.floor(F.col("n_users") * 10000 / first_n).cast("long")
        .alias("conv_bp"),
    )


def funnel_counts_sql(steps: tuple = FUNNEL_STEPS) -> str:
    """DuckDB twin of funnel_counts: the sequential-min chain stated
    directly — t1 = min ts of step 1, t_k = min ts of step k with
    ts > t_{k-1} — then per-step user counts and conv bp."""
    ctes = [
        f"""f1 AS (
            SELECT user_id AS u, min(ts) AS t1 FROM events
            WHERE event_type = '{steps[0]}' AND user_id IS NOT NULL
                  AND ts IS NOT NULL
            GROUP BY 1)"""
    ]
    for k in range(2, len(steps) + 1):
        ctes.append(f"""f{k} AS (
            SELECT e.user_id AS u, min(e.ts) AS t{k}
            FROM events e JOIN f{k-1} p ON e.user_id = p.u
            WHERE e.event_type = '{steps[k-1]}' AND e.ts > p.t{k-1}
            GROUP BY 1)""")
    unions = "\n            UNION ALL ".join(
        f"SELECT {k} AS step, '{steps[k-1]}' AS step_type, "
        f"CAST(count(*) AS BIGINT) AS n_users FROM f{k}"
        for k in range(1, len(steps) + 1)
    )
    return f"""
        WITH {', '.join(ctes)},
        counts AS (
            {unions})
        SELECT CAST(step AS INTEGER) AS step, step_type, n_users,
               CAST(floor(n_users * 10000 / first_value(n_users)
                   OVER (ORDER BY step)) AS BIGINT) AS conv_bp
        FROM counts WHERE n_users > 0
    """
