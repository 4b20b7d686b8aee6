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


RATE_SPIKE_FACTOR = 2  # a minute is a spike at >= FACTOR x median rate


def rate_spikes(df: DataFrame, ts_col: str = "ts",
                type_col: str = "event_type") -> DataFrame:
    """Per-event-type rate-spike detection over minute buckets: a
    minute is a spike when its event count reaches RATE_SPIKE_FACTOR
    times the type's median minute-rate (exact lower median by rank —
    no engine-specific quantile interpolation).

    Returns only the spiking minutes:
      (event_type, minute_idx:long, n_events:long, med_rate:long)

    Scale shape (10^12 events): the ONLY wide operation is the
    map-side-combinable groupBy(type, minute); everything after runs
    over the (types x observed-minutes) histogram, which is dim-sized
    (a year of minutes is ~5e5 rows per type). Median is over
    OBSERVED minutes — silent minutes don't dilute it (documented;
    that is the alert-engineering convention for sparse sources).
    Reference anchor: llogtail's per-sink rollup counts
    (collector.go:125-174) — this is the same rollup keyed on time,
    promoted to an alert.
    """
    per_min = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(type_col).alias("event_type"),
            F.floor(F.col(ts_col).cast("timestamp").cast("long") / 60)
            .cast("long").alias("minute_idx"),
        )
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    w = Window.partitionBy("event_type").orderBy("n_events", "minute_idx")
    ranked = per_min.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("event_type"))
    )
    med = ranked.filter(F.col("rn") == F.ceil(F.col("n") / 2)).select(
        "event_type", F.col("n_events").alias("med_rate")
    )
    # med is dim-sized (one row per type) -> broadcast.
    return (
        per_min.join(F.broadcast(med), "event_type")
        .filter(F.col("n_events") >= RATE_SPIKE_FACTOR * F.col("med_rate"))
        .select("event_type", "minute_idx", "n_events", "med_rate")
    )


def rate_spikes_sql(factor: int = RATE_SPIKE_FACTOR) -> str:
    """DuckDB twin of rate_spikes: identical minute index
    (epoch // 60), identical rank-based lower median, identical
    spike predicate."""
    return f"""
        WITH per_min AS (
            SELECT event_type,
                   CAST(floor(epoch(ts) / 60) AS BIGINT) AS minute_idx,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events WHERE ts IS NOT NULL
            GROUP BY 1, 2),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY event_type
                       ORDER BY n_events, minute_idx) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM per_min),
        med AS (
            SELECT event_type, n_events AS med_rate FROM ranked
            WHERE rn = CAST(ceil(n / 2.0) AS BIGINT))
        SELECT p.event_type, p.minute_idx, p.n_events, m.med_rate
        FROM per_min p JOIN med m USING (event_type)
        WHERE p.n_events >= {factor} * m.med_rate
    """


INTERARRIVAL_P = 95  # upper percentile reported (exact, by histogram)


def interarrival_stats(df: DataFrame, user_col: str = "user_id",
                       ts_col: str = "ts",
                       type_col: str = "event_type") -> DataFrame:
    """Per-event-type inter-arrival statistics: the gap (whole epoch
    seconds) between consecutive events of the SAME user, attributed
    to the type of the LATER event.

    Returns (event_type, n_gaps, avg_gap_x100, max_gap_s, p95_gap_s)
    — avg floored at 2 decimals, p95 the exact lower-rank percentile.

    Scale shape (10^12 events): one shuffle on user_id for the lag
    window (per-user partitions are user-history-sized, bounded), then
    gaps collapse to a (type, gap_s) HISTOGRAM (map-side combinable)
    before any ranking — the p95 cumulative runs over the histogram
    (gap domain is bounded by the corpus time range in seconds), never
    over the 10^12 raw gaps. Same decomposition as
    corpus.length_quantiles.
    """
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gaps = (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .withColumn("_e", epoch)
        .withColumn("_gap", F.col("_e") - F.lag("_e").over(w))
        .where(F.col("_gap").isNotNull())
        .select(F.col(type_col).alias("event_type"),
                F.col("_gap").cast("long").alias("gap_s"))
    )
    hist = gaps.groupBy("event_type", "gap_s").agg(
        F.count("*").cast("long").alias("cnt")
    )
    wt = Window.partitionBy("event_type")
    wcum = wt.orderBy("gap_s").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        hist.withColumn("n_gaps", F.sum("cnt").over(wt))
        .withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("sum_gap", F.sum(F.col("gap_s") * F.col("cnt")).over(wt))
        .withColumn("max_gap", F.max("gap_s").over(wt))
    )
    # p95 rank over raw gaps = ceil(P/100 * n); the smallest histogram
    # row whose cumulative count reaches it holds the exact value.
    target = F.ceil(F.col("n_gaps") * INTERARRIVAL_P / 100)
    p95 = (
        cum.filter(F.col("cum") >= target)
        .groupBy("event_type")
        .agg(F.min("gap_s").alias("p95_gap_s"))
    )
    # every histogram row of a type carries identical window totals;
    # max() just picks that shared value deterministically.
    per_type = cum.groupBy("event_type").agg(
        F.max("n_gaps").alias("n_gaps"),
        F.max("sum_gap").alias("sum_gap"),
        F.max("max_gap").alias("max_gap_s"),
    )
    return per_type.join(p95, "event_type").select(
        "event_type",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        F.floor(F.col("sum_gap") * 100 / F.col("n_gaps")).cast("long")
        .alias("avg_gap_x100"),
        F.col("max_gap_s").cast("long").alias("max_gap_s"),
        F.col("p95_gap_s").cast("long").alias("p95_gap_s"),
    )


def interarrival_stats_sql(p: int = INTERARRIVAL_P) -> str:
    """DuckDB twin of interarrival_stats: identical lag ordering
    (ts, event_id), floored-epoch gaps, histogram-cumulative exact
    percentile, and floor arithmetic."""
    return f"""
        WITH g AS (
            SELECT event_type,
                   CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS gap_s
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        hist AS (
            SELECT event_type, gap_s, CAST(count(*) AS BIGINT) AS cnt
            FROM g WHERE gap_s IS NOT NULL GROUP BY 1, 2),
        cum AS (
            SELECT *,
                   sum(cnt) OVER (PARTITION BY event_type) AS n_gaps,
                   sum(cnt) OVER (PARTITION BY event_type ORDER BY gap_s
                       ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(gap_s * cnt) OVER (PARTITION BY event_type)
                       AS sum_gap,
                   max(gap_s) OVER (PARTITION BY event_type) AS max_gap
            FROM hist),
        p95 AS (
            SELECT event_type, min(gap_s) AS p95_gap_s FROM cum
            WHERE cum >= ceil(n_gaps * {p} / 100.0) GROUP BY 1)
        SELECT t.event_type,
               CAST(t.n_gaps AS BIGINT) AS n_gaps,
               CAST(floor(t.sum_gap * 100 / t.n_gaps) AS BIGINT)
                   AS avg_gap_x100,
               CAST(t.max_gap AS BIGINT) AS max_gap_s,
               CAST(p.p95_gap_s AS BIGINT) AS p95_gap_s
        FROM (SELECT DISTINCT event_type, n_gaps, sum_gap, max_gap
              FROM cum) t
        JOIN p95 p USING (event_type)
    """


WAU_WINDOW_DAYS = 7


def active_users_7d(df: DataFrame, user_col: str = "user_id",
                    ts_col: str = "ts") -> DataFrame:
    """Daily + trailing-7-day active users per epoch-day.

    Returns (day_idx:long, dau:long, wau:long) for every day with at
    least one active user; wau counts distinct users active in
    [day-6, day].

    Scale shape (10^12 events): ONE wide shuffle collapses the stream
    to the DISTINCT (user, day) activity grain (map-side combinable);
    the trailing window is an explode of each activity row into the
    <= 7 future days it covers (linear, no self-join over a day
    range), then a per-day distinct-user count whose partial
    aggregation dedupes map-side. At extreme cardinalities the exact
    count-distinct swaps for the KMV sketch (operators/sketches.py)
    with the same plan shape. Reference anchor: per-sink rollup
    counts keyed on time (collector.go:125-174).
    """
    day = F.floor(F.col(ts_col).cast("timestamp").cast("long") / 86400)
    ud = (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("u"), day.cast("long").alias("day"))
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    contrib = ud.select(
        "u",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + (WAU_WINDOW_DAYS - 1))
        ).alias("day_out"),
    )
    wau = contrib.groupBy("day_out").agg(
        F.count_distinct("u").cast("long").alias("wau")
    )
    return dau.join(wau, dau["day"] == wau["day_out"]).select(
        F.col("day").alias("day_idx"), "dau", "wau"
    )


def active_users_7d_sql(window_days: int = WAU_WINDOW_DAYS) -> str:
    """DuckDB twin of active_users_7d: identical epoch-day index and
    explode-into-covered-days window."""
    return f"""
        WITH ud AS (
            SELECT DISTINCT user_id AS u,
                   CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        dau AS (
            SELECT day, CAST(count(*) AS BIGINT) AS dau
            FROM ud GROUP BY 1),
        contrib AS (
            SELECT u, day + g.range AS day_out
            FROM ud CROSS JOIN range(0, {window_days}) g),
        wau AS (
            SELECT day_out, CAST(count(DISTINCT u) AS BIGINT) AS wau
            FROM contrib GROUP BY 1)
        SELECT d.day AS day_idx, d.dau, w.wau
        FROM dau d JOIN wau w ON w.day_out = d.day
    """


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


# ------------------------------------------------------------- SCD-2

def scd2_intervals(df: DataFrame) -> DataFrame:
    """Slowly-changing-dimension type-2 derivation: compress each
    user's event stream into state-validity intervals (state =
    event_type; an interval opens when the state CHANGES and closes
    when the next change arrives), then roll the intervals up per
    state.

    This is the warehouse twin of llogtail's rotation handling: a
    file identity is 'current' until a rotation event supersedes it
    and the old identity keeps its recorded span (log_watcher.go:
    228-261); SCD-2 keeps every superseded state row with its
    [valid_from, valid_to) span instead of overwriting.

    Scale shape (10^12 events): ONE shuffle on user_id; both windows
    (change detection lag, closing lead) and the change filter reuse
    that single (user_id, ts, event_id) sort — Spark plans one
    Exchange + one Sort. The final rollup is dim-sized (one row per
    event_type). Deterministic tie-break: (ts, event_id).

    Returns (event_type, n_intervals, n_closed, open_now,
    avg_dur_sec, max_dur_sec) — durations floored to whole seconds
    over CLOSED intervals; open intervals (the user's current state)
    counted separately."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        df.select("user_id", "ts", "event_id", "event_type")
        # an event without a timestamp or user cannot be ordered into
        # a state stream — and Spark (NULLS FIRST asc) and ANSI SQL
        # engines (NULLS LAST) would order it differently anyway
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .withColumn("_prev", F.lag("event_type").over(w))
        .filter(F.col("_prev").isNull()
                | (F.col("_prev") != F.col("event_type")))
    )
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = changes.select(
        "user_id", "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wc).alias("valid_to"),
    )
    # NTZ -> timestamp -> long (session tz pinned UTC; see _week_idx)
    dur = (F.col("valid_to").cast("timestamp").cast("long")
           - F.col("valid_from").cast("timestamp").cast("long"))
    return (
        iv.groupBy("event_type")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum(F.col("valid_to").isNotNull().cast("long"))
            .alias("n_closed"),
            F.sum(F.col("valid_to").isNull().cast("long")).alias("open_now"),
            F.floor(F.avg(dur)).cast("long").alias("avg_dur_sec"),
            F.max(dur).cast("long").alias("max_dur_sec"),
        )
    )


def scd2_intervals_sql() -> str:
    """DuckDB twin: identical change compression, (ts, event_id)
    tie-break, epoch-second floor arithmetic."""
    return """
        WITH marked AS (
            SELECT user_id, ts, event_id, event_type,
                   lag(event_type) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)
                       AS prev_type
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        changes AS (
            SELECT user_id, ts, event_id, event_type FROM marked
            WHERE prev_type IS NULL OR prev_type <> event_type),
        iv AS (
            SELECT user_id, event_type, ts AS valid_from,
                   lead(ts) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)
                       AS valid_to
            FROM changes)
        SELECT event_type,
               count(*) AS n_intervals,
               CAST(sum(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_closed,
               CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS open_now,
               CAST(floor(avg(CAST(floor(epoch(valid_to)) AS BIGINT)
                              - CAST(floor(epoch(valid_from)) AS BIGINT)))
                    AS BIGINT) AS avg_dur_sec,
               CAST(max(CAST(floor(epoch(valid_to)) AS BIGINT)
                        - CAST(floor(epoch(valid_from)) AS BIGINT))
                    AS BIGINT) AS max_dur_sec
        FROM iv GROUP BY event_type
    """


# -------------------------------------------------- Markov / drift

def markov_transitions(df: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: count consecutive (prev_type -> type) pairs and the
    per-origin transition probability in basis points.

    The routing analog: llogtail's dispatch consults a static
    sink-name -> files table (collector.go:125-174); the transition
    matrix is the data-derived routing table of user behavior.

    Scale shape (10^12 events): ONE shuffle on user_id for the lag
    window; the pair rollup is combinable onto a bounded key domain
    (|event types|^2), and the per-origin total reuses that tiny
    aggregate (window over <=|types| rows). Tie-break (ts, event_id).

    Returns (from_type, to_type, n, p_bp)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        df.select("user_id", "ts", "event_id", "event_type")
        # NULL ts/user can't be ordered into a stream (and the two
        # engines disagree on NULL placement in window ORDER BY)
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    worigin = Window.partitionBy("from_type")
    return pairs.select(
        "from_type", "to_type", F.col("n").cast("long").alias("n"),
        F.floor(F.col("n") * 10000 / F.sum("n").over(worigin))
        .cast("long").alias("p_bp"),
    )


def markov_transitions_sql() -> str:
    """DuckDB twin: identical lag grain, tie-break, and bp floor."""
    return """
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)
                       AS from_type
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        pairs AS (
            SELECT from_type, event_type AS to_type, count(*) AS n
            FROM seq WHERE from_type IS NOT NULL
            GROUP BY from_type, to_type)
        SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
               CAST(floor(n * 10000 / sum(n) OVER
                          (PARTITION BY from_type)) AS BIGINT) AS p_bp
        FROM pairs
    """


def event_type_drift(df: DataFrame) -> DataFrame:
    """Day-over-day distribution drift of the event-type mix: per
    day, the total-variation distance (in basis points, over
    floor-bp shares so both engines agree bit-for-bit) between that
    day's event-type share vector and the previous day's. The alarm
    a pipeline raises when a source changes behavior — llogtail's
    per-sink counts (collector.go:125-174) watched as a distribution
    rather than a total.

    Scale shape: events collapse to the (day, type) grid in ONE
    combinable shuffle (grid is days x types — dim-sized); the dense
    grid completion (cross join of two tiny aggregates), share
    computation, and lag window all run on that dim table.

    Returns (day_idx, tv_bp) for every day with a predecessor IN THE
    GRID (consecutive day indexes; gaps documented: lag is over the
    observed day sequence)."""
    day = F.floor(F.col("ts").cast("timestamp").cast("long") / 86400)
    counts = (
        # a NULL day/type cell would poison the dense grid (NULL keys
        # never equi-join, so its share divides by an empty total)
        df.filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .groupBy(day.cast("long").alias("day_idx"),
                 F.col("event_type"))
        .agg(F.count("*").alias("n"))
    )
    days = counts.select("day_idx").distinct()
    types = counts.select("event_type").distinct()
    grid = (
        days.crossJoin(types)
        .join(counts, ["day_idx", "event_type"], "left")
        .select("day_idx", "event_type",
                F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    )
    wday = Window.partitionBy("day_idx")
    share = grid.select(
        "day_idx", "event_type",
        F.floor(F.col("n") * 10000 / F.sum("n").over(wday))
        .cast("long").alias("share_bp"),
    )
    wtype = Window.partitionBy("event_type").orderBy("day_idx")
    diff = share.withColumn(
        "prev_bp", F.lag("share_bp").over(wtype)
    ).filter(F.col("prev_bp").isNotNull())
    return (
        diff.groupBy("day_idx")
        .agg(F.floor(F.sum(F.abs(F.col("share_bp") - F.col("prev_bp"))) / 2)
             .cast("long").alias("tv_bp"))
    )


def event_type_drift_sql() -> str:
    """DuckDB twin: identical day index, dense grid, bp floor,
    lag-over-observed-days, and halved L1."""
    return """
        WITH counts AS (
            SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
                   event_type, count(*) AS n
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
            GROUP BY day_idx, event_type),
        grid AS (
            SELECT d.day_idx, t.event_type, coalesce(c.n, 0) AS n
            FROM (SELECT DISTINCT day_idx FROM counts) d
            CROSS JOIN (SELECT DISTINCT event_type FROM counts) t
            LEFT JOIN counts c
              ON c.day_idx = d.day_idx AND c.event_type = t.event_type),
        share AS (
            SELECT day_idx, event_type,
                   CAST(floor(n * 10000 / sum(n) OVER
                              (PARTITION BY day_idx)) AS BIGINT)
                       AS share_bp
            FROM grid),
        diff AS (
            SELECT day_idx, share_bp,
                   lag(share_bp) OVER
                       (PARTITION BY event_type ORDER BY day_idx)
                       AS prev_bp
            FROM share)
        SELECT day_idx,
               CAST(floor(sum(abs(share_bp - prev_bp)) / 2) AS BIGINT)
                   AS tv_bp
        FROM diff WHERE prev_bp IS NOT NULL
        GROUP BY day_idx
    """


def time_weighted_avg(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", val_col: str = "value",
                      tiebreak_col: str = "event_id") -> DataFrame:
    """Per-user time-weighted average of a gauge value: each reading
    holds until the next one, so it weighs by its holding duration
    (microseconds) — the standard telemetry rollup for irregular
    samples, where a plain AVG over-counts bursts. llogtail ships
    readings at whatever rate the file grows (log_watcher.go tail
    loop); the TWA is the value a downstream dashboard should show.

    Exactness across engines: the value is fixed-pointed FIRST
    (floor(value*1000) as int64), durations are integer epoch-micro
    gaps, so numerator sum(v_fp*dt) and denominator sum(dt) are exact
    integer sums in any order; twa_x1000 = num div den (values are
    non-negative). The last reading per user has no successor and
    carries zero weight — dropped, as is a user with a single reading.

    Scale shape (10^12 rows): ONE shuffle on user for the lead
    window; the aggregate rides the same partitioning (no second
    exchange — pinned for the analogous moving-avg plan in
    test_plans.py); output is user-dim-sized.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # tiebreak_col makes (ts, tiebreak) a total order; ties at equal
    # ts carry dt=0 weight, so the tiebreak never changes the sums —
    # it only pins WHICH row is "last" (dropped) deterministically
    w = (Window.partitionBy(user_col)
         .orderBy(F.col(ts_col), F.col(tiebreak_col)))
    gaps = (
        df.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
                  & F.col(val_col).isNotNull())
        .select(
            F.col(user_col),
            F.floor(F.col(val_col) * 1000).cast("long").alias("v_fp"),
            (F.lead(us).over(w) - us).alias("dt_us"),
        )
        .filter(F.col("dt_us").isNotNull())
    )
    return (
        gaps.groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("dt_us").alias("dur_us"),
            F.sum(F.col("v_fp") * F.col("dt_us")).alias("_num"),
        )
        .filter(F.col("dur_us") > 0)
        .select(
            user_col, "n_gaps", "dur_us",
            F.expr("_num div dur_us").alias("twa_x1000"),
        )
    )


def time_weighted_avg_sql() -> str:
    """DuckDB twin: identical fixed-point, micro gaps, integer div.
    (ts, event_id) ordering matches the Spark window; ties at equal
    ts contribute dt=0 so the tie order cannot change the sums."""
    return """
        WITH gaps AS (
            SELECT user_id,
                   CAST(floor(value * 1000) AS BIGINT) AS v_fp,
                   lead(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)
                       - epoch_us(ts) AS dt_us
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
              AND value IS NOT NULL),
        agg AS (
            SELECT user_id, count(*) AS n_gaps,
                   sum(dt_us) AS dur_us,
                   sum(v_fp * dt_us) AS num
            FROM gaps WHERE dt_us IS NOT NULL
            GROUP BY user_id)
        SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
               CAST(dur_us AS BIGINT) AS dur_us,
               CAST(num // dur_us AS BIGINT) AS twa_x1000
        FROM agg WHERE dur_us > 0
    """


# MAD outlier gate: |v - median| > MAD_FACTOR * MAD flags a reading.
MAD_FACTOR = 6


def mad_outliers(df: DataFrame, group_col: str = "event_type",
                 val_col: str = "value") -> DataFrame:
    """Robust per-group outlier census: exact lower median and median
    absolute deviation (MAD) of the fixed-point value, plus how many
    readings sit beyond MAD_FACTOR*MAD — the robust alternative to
    z-scores when the gauge itself misbehaves (a mean/stddev gate
    moves with the outliers it should flag).

    Everything derives from ONE combinable histogram shuffle:
    group the data once onto the (group, v_fp) grid (v_fp =
    floor(value*100), dim-sized: |groups| x |distinct values|);
    medians come from cumulative-count windows over that histogram,
    the deviation histogram is a re-keying of the SAME histogram
    (|v_fp - med| with counts summed — no second data scan), and the
    outlier census is a filtered sum over it. At 10^12 rows the raw
    data is touched exactly once; llogtail's analog is the per-sink
    byte/count rollup (collector.go:125-174) — this is that rollup
    made robust.

    Lower median = smallest v with cum >= ceil(n/2) — integer-exact
    and identical in the DuckDB twin (no interpolation semantics to
    disagree on).
    """
    hist = (
        df.filter(F.col(val_col).isNotNull() & F.col(group_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("g"),
            F.floor(F.col(val_col) * 100).cast("long").alias("v_fp"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = (Window.partitionBy("g").orderBy("v_fp")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wg = Window.partitionBy("g")
    med = (
        hist.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("n", F.sum("cnt").over(wg))
        .filter(F.col("cum") * 2 >= F.col("n"))
        .groupBy("g")
        .agg(F.min("v_fp").alias("med_fp"), F.first("n").alias("n"))
    )
    dev = (
        hist.join(med, "g")
        .groupBy("g", F.abs(F.col("v_fp") - F.col("med_fp")).alias("d"))
        .agg(F.sum("cnt").alias("cnt"),
             F.first("n").alias("n"), F.first("med_fp").alias("med_fp"))
    )
    wdev = (Window.partitionBy("g").orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    mad = (
        dev.withColumn("cum", F.sum("cnt").over(wdev))
        .filter(F.col("cum") * 2 >= F.col("n"))
        .groupBy("g")
        .agg(F.min("d").alias("mad_fp"))
    )
    return (
        dev.join(mad, "g")
        .groupBy("g")
        .agg(
            F.first("n").alias("n"),
            F.first("med_fp").alias("med_fp"),
            F.first("mad_fp").alias("mad_fp"),
            F.sum(
                F.when(F.col("d") > MAD_FACTOR * F.col("mad_fp"),
                       F.col("cnt")).otherwise(F.lit(0))
            ).alias("n_outliers"),
        )
        .select(F.col("g").alias("event_type"), "n", "med_fp", "mad_fp",
                "n_outliers")
    )


def mad_outliers_sql(factor: int = MAD_FACTOR) -> str:
    """DuckDB twin: identical histogram decomposition, lower-median
    rule (cum*2 >= n), deviation re-key, and outlier census."""
    return f"""
        WITH hist AS (
            SELECT event_type AS g,
                   CAST(floor(value * 100) AS BIGINT) AS v_fp,
                   count(*) AS cnt
            FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
            GROUP BY g, v_fp),
        med AS (
            SELECT g, min(v_fp) AS med_fp, any_value(n) AS n FROM (
                SELECT g, v_fp,
                       sum(cnt) OVER (PARTITION BY g ORDER BY v_fp) AS cum,
                       sum(cnt) OVER (PARTITION BY g) AS n
                FROM hist)
            WHERE cum * 2 >= n GROUP BY g),
        dev AS (
            SELECT h.g, abs(h.v_fp - m.med_fp) AS d, sum(h.cnt) AS cnt,
                   any_value(m.n) AS n, any_value(m.med_fp) AS med_fp
            FROM hist h JOIN med m USING (g)
            GROUP BY h.g, d),
        mad AS (
            SELECT g, min(d) AS mad_fp FROM (
                SELECT g, d, n,
                       sum(cnt) OVER (PARTITION BY g ORDER BY d) AS cum
                FROM dev)
            WHERE cum * 2 >= n GROUP BY g)
        SELECT dev.g AS event_type,
               CAST(any_value(dev.n) AS BIGINT) AS n,
               CAST(any_value(dev.med_fp) AS BIGINT) AS med_fp,
               CAST(any_value(mad.mad_fp) AS BIGINT) AS mad_fp,
               CAST(sum(CASE WHEN dev.d > {factor} * mad.mad_fp
                             THEN dev.cnt ELSE 0 END) AS BIGINT)
                   AS n_outliers
        FROM dev JOIN mad USING (g)
        GROUP BY dev.g
    """


# ---------------------------------------------------------------------------
# User journey paths (ordered string aggregation)
# ---------------------------------------------------------------------------

JOURNEY_K = 5        # first K events define the journey prefix
JOURNEY_TOP = 25     # paths reported


def journey_paths(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type",
                  k: int = JOURNEY_K, top: int = JOURNEY_TOP) -> DataFrame:
    """Most common user-journey prefixes: each user's first `k`
    events (ordered by ts, event_id — a total order, so both engines
    agree on every path) joined into a '>' path string, then the
    `top` most frequent paths.

    The classical ORDER-SENSITIVE string aggregation (SQL
    string_agg(x ORDER BY y)) Spark lacks as a builtin — expressed
    as sort_array(collect_list(struct(ord, val))) + transform +
    array_join, with the collect bounded to k rows per user because
    the rank filter sits BELOW it (WindowGroupLimit plans a bounded
    top-k heap under the user exchange, so a user with 10^9 events
    contributes k rows to the collect, not 10^9).

    Output: (path:string, n_users:long), top rows by (n_users DESC,
    path) — TakeOrderedAndProject, no global sort.
    """
    ranked = (
        df.select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("ts"),
            F.col("event_id").alias("eid"), F.col(type_col).alias("et"),
        )
        .where(F.col("u").isNotNull() & F.col("ts").isNotNull()
               & F.col("eid").isNotNull())
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("u").orderBy("ts", "eid")
            ),
        )
        .filter(F.col("rn") <= k)
    )
    paths = ranked.groupBy("u").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "et"))),
                lambda s: s["et"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(top)
    )


def journey_paths_sql(k: int = JOURNEY_K, top: int = JOURNEY_TOP) -> str:
    """DuckDB twin of journey_paths — string_agg with ORDER BY states
    the ordered aggregation directly."""
    return f"""
        WITH ranked AS (
            SELECT user_id AS u, event_type AS et,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
                  AND event_id IS NOT NULL),
        paths AS (
            SELECT u, string_agg(et, '>' ORDER BY rn) AS path
            FROM ranked WHERE rn <= {k} GROUP BY u)
        SELECT path, CAST(count(*) AS BIGINT) AS n_users
        FROM paths GROUP BY path
        ORDER BY n_users DESC, path LIMIT {top}
    """


# ---------------------------------------------------------------------------
# Weighted median (histogram cumsum, the mad_outliers discipline + weights)
# ---------------------------------------------------------------------------


def weighted_median(df: DataFrame, group_col: str = "l_returnflag",
                    val_col: str = "l_extendedprice",
                    weight_col: str = "l_quantity") -> DataFrame:
    """Exact weighted median per group: the smallest value v where
    the cumulative weight of all rows <= v reaches half the group's
    total weight (2*cum >= tot — no division, no midpoint
    interpolation, so both engines agree bit-for-bit).

    Shape: collapse to the per-(group, value) weight histogram first
    (ONE combinable shuffle — the mad_outliers discipline), then a
    running-sum window over the histogram, NOT the rows: state and
    the window partition scale with DISTINCT values per group, not
    row count. Quantized domains (prices, durations in ms) keep that
    small at any scale; for unbounded-cardinality doubles, bin to
    fixed-width buckets upstream. Weights cast to long (the fixture's
    quantities are integral), so cumulative sums are exact integers —
    no float-associativity hazard across engines.

    Output: (group_col, w_median:double, tot_weight:long).
    """
    hist = (
        df.select(
            F.col(group_col).alias("g"), F.col(val_col).alias("v"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .where(F.col("g").isNotNull() & F.col("v").isNotNull()
               & F.col("w").isNotNull())
        .groupBy("g", "v").agg(F.sum("w").alias("w"))
    )
    cum = hist.select(
        "g", "v",
        F.sum("w").over(
            Window.partitionBy("g").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("w").over(Window.partitionBy("g")).alias("tot"),
    )
    return (
        cum.filter(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("g")
        .agg(F.min("v").alias("w_median"),
             F.first("tot").cast("long").alias("tot_weight"))
        .select(F.col("g").alias(group_col), "w_median", "tot_weight")
    )


def weighted_median_sql(group_col: str = "l_returnflag",
                        val_col: str = "l_extendedprice",
                        weight_col: str = "l_quantity",
                        table: str = "lineitem") -> str:
    """DuckDB twin of weighted_median — identical histogram + cumsum
    + threshold arithmetic."""
    return f"""
        WITH hist AS (
            SELECT {group_col} AS g, {val_col} AS v,
                   sum(CAST({weight_col} AS BIGINT)) AS w
            FROM {table}
            WHERE {group_col} IS NOT NULL AND {val_col} IS NOT NULL
                  AND {weight_col} IS NOT NULL
            GROUP BY g, v),
        cum AS (
            SELECT g, v,
                   sum(w) OVER (PARTITION BY g ORDER BY v) AS cum,
                   sum(w) OVER (PARTITION BY g) AS tot
            FROM hist)
        SELECT g AS {group_col}, min(v) AS w_median,
               CAST(any_value(tot) AS BIGINT) AS tot_weight
        FROM cum WHERE cum * 2 >= tot GROUP BY g
    """


# ---------------------------------------------------------------------------
# Benford leading-digit audit
# ---------------------------------------------------------------------------

# Benford expected frequencies log10(1 + 1/d) in basis points —
# LITERAL constants so no engine evaluates a log at runtime.
BENFORD_BP = (3010, 1761, 1249, 969, 792, 669, 580, 512, 458)


def benford_digits(df: DataFrame, group_col: str = "event_type",
                   val_col: str = "value") -> DataFrame:
    """Leading-digit distribution of a value column per group vs
    Benford's law — the classical numeric-data forgery/generation
    audit (synthetic or fabricated metrics rarely match it).

    Portability: the leading digit comes from CAST(floor(value*100)
    AS BIGINT) rendered as a string — float->int flooring and
    int->string are bit-identical across engines, unlike
    double->string formatting (which differs and is never used).
    Rows with value <= 0.005 (cent-floor 0) are excluded.

    obs_bp = floor(10000 * n_digit / n_group); dev_bp = |obs - exp|.
    Shape: ONE combinable (group, digit) count, then a dim-sized
    (9 rows per group) window for the group total. Output:
    (group_col, digit:int, n:long, obs_bp:long, exp_bp:long,
    dev_bp:long).
    """
    exp_arr = F.array(*[F.lit(b) for b in BENFORD_BP])
    digits = (
        df.select(
            F.col(group_col).alias("g"),
            F.floor(F.col(val_col) * 100).cast("long").alias("cents"),
        )
        .where(F.col("g").isNotNull() & (F.col("cents") > 0))
        .select(
            "g",
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("int").alias("digit"),
        )
    )
    counts = digits.groupBy("g", "digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.withColumn(
        "tot", F.sum("n").over(Window.partitionBy("g"))
    )
    obs = F.floor(F.col("n") * 10000 / F.col("tot")).cast("long")
    exp = F.element_at(exp_arr, F.col("digit")).cast("long")
    return tot.select(
        F.col("g").alias(group_col), "digit",
        F.col("n").cast("long").alias("n"),
        obs.alias("obs_bp"), exp.alias("exp_bp"),
        F.abs(obs - exp).alias("dev_bp"),
    )


def benford_digits_sql(group_col: str = "event_type",
                       val_col: str = "value",
                       table: str = "events") -> str:
    """DuckDB twin of benford_digits — identical cent-floor digit
    extraction and integer bp arithmetic."""
    exp_list = "[" + ", ".join(str(b) for b in BENFORD_BP) + "]"
    return f"""
        WITH digits AS (
            SELECT {group_col} AS g,
                   CAST(substr(CAST(CAST(floor({val_col} * 100) AS BIGINT)
                               AS VARCHAR), 1, 1) AS INTEGER) AS digit
            FROM {table}
            WHERE {group_col} IS NOT NULL
                  AND CAST(floor({val_col} * 100) AS BIGINT) > 0),
        counts AS (
            SELECT g, digit, count(*) AS n
            FROM digits GROUP BY g, digit),
        tot AS (
            SELECT g, digit, n, sum(n) OVER (PARTITION BY g) AS tot
            FROM counts)
        SELECT g AS {group_col}, digit, CAST(n AS BIGINT) AS n,
               CAST(floor(n * 10000 / tot) AS BIGINT) AS obs_bp,
               CAST({exp_list}[digit] AS BIGINT) AS exp_bp,
               CAST(abs(floor(n * 10000 / tot) - {exp_list}[digit])
                    AS BIGINT) AS dev_bp
        FROM tot
    """


# ---------------------------------------------------------------------------
# Per-group OLS trend slope (integer sufficient statistics)
# ---------------------------------------------------------------------------

TREND_X6 = 1_000_000


def trend_slope(df: DataFrame, group_col: str = "event_type",
                ts_col: str = "ts", val_col: str = "value") -> DataFrame:
    """Ordinary-least-squares trend of a value column against time,
    per group — "is this metric drifting?" as a single slope per
    event type.

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)

    x = whole HOURS since the group's first event (recentring plus
    the coarse unit keep every product far inside int64: x <= ~1e4
    for year-scale windows, so n*Sxx <= 1e5-row groups * 1e8 — nine
    orders of headroom); y = value in whole cents. All five
    sufficient statistics are EXACT BIGINTs from one combinable
    shuffle (plus a dim-sized first-hour broadcast); the only float
    op is the final numer/denom division, done identically in both
    engines from identical integers (IEEE round-to-nearest), and
    floored into x6 fixed point.

    Output: (group_col, n:long, numer:long, denom:long,
    slope_x6:long cents-per-hour x 1e6; 0 when denom = 0).
    """
    base = df.select(
        F.col(group_col).alias("g"),
        F.floor(F.col(ts_col).cast("timestamp").cast("long") / 3600)
        .cast("long").alias("hr"),
        F.floor(F.col(val_col) * 100).cast("long").alias("cents"),
    ).where(F.col("g").isNotNull() & F.col("hr").isNotNull()
            & F.col("cents").isNotNull())
    first = base.groupBy("g").agg(F.min("hr").alias("hr0"))
    xy = base.join(F.broadcast(first), "g").select(
        "g", (F.col("hr") - F.col("hr0")).alias("x"), F.col("cents").alias("y")
    )
    s = xy.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    numer = s["n"] * F.col("sxy") - F.col("sx") * F.col("sy")
    denom = s["n"] * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        numer.cast("long").alias("numer"),
        denom.cast("long").alias("denom"),
        F.when(denom == 0, F.lit(0)).otherwise(
            F.floor(numer.cast("double") * TREND_X6 / denom.cast("double"))
        ).cast("long").alias("slope_x6"),
    )


def trend_slope_sql(group_col: str = "event_type", ts_col: str = "ts",
                    val_col: str = "value", table: str = "events") -> str:
    """DuckDB twin of trend_slope — identical integer sufficient
    statistics and the same single IEEE division."""
    return f"""
        WITH base AS (
            SELECT {group_col} AS g,
                   CAST(floor(epoch({ts_col}) / 3600) AS BIGINT) AS hr,
                   CAST(floor({val_col} * 100) AS BIGINT) AS y
            FROM {table}
            WHERE {group_col} IS NOT NULL AND {ts_col} IS NOT NULL
                  AND {val_col} IS NOT NULL),
        first AS (SELECT g, min(hr) AS hr0 FROM base GROUP BY g),
        xy AS (
            SELECT base.g, base.hr - first.hr0 AS x, y
            FROM base JOIN first USING (g)),
        s AS (
            SELECT g, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx
            FROM xy GROUP BY g)
        SELECT g AS {group_col}, CAST(n AS BIGINT) AS n,
               CAST(n * sxy - sx * sy AS BIGINT) AS numer,
               CAST(n * sxx - sx * sx AS BIGINT) AS denom,
               CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                    ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
                               * {TREND_X6}
                               / CAST(n * sxx - sx * sx AS DOUBLE))
               END AS BIGINT) AS slope_x6
        FROM s
    """


# ---------------------------------------------------------------------------
# Mergeable equi-width histogram quantile sketch
# ---------------------------------------------------------------------------

HQ_BIN_CENTS = 800          # bin width: 8 dollars in cents
HQ_PCTS = (50, 95, 99)      # percentiles reported


def hist_quantiles(df: DataFrame, group_col: str = "event_type",
                   val_col: str = "value",
                   bin_cents: int = HQ_BIN_CENTS) -> DataFrame:
    """Per-group quantiles from a fixed-width histogram SKETCH — the
    mergeable alternative to exact sorts when the value domain is
    bounded: every partition contributes bin counts (combinable, the
    merge is addition), and any percentile resolves to a bin upper
    edge with error <= one bin width. This is the streaming-friendly
    quantile summary (t-digest's fixed-grid cousin) — unlike the
    exact rank machinery (median_value_by_type), the state per group
    is the FIXED bin count regardless of row count or distinct
    values.

    p-th percentile = upper edge (in cents) of the first bin where
    100 * cum >= p * n — pure integer; ties and engine order cannot
    matter because bins are keyed, not row-ordered.

    Output: (group_col, n:long, p50_cents, p95_cents, p99_cents).
    """
    bins = (
        df.select(
            F.col(group_col).alias("g"),
            (F.floor(F.floor(F.col(val_col) * 100) / bin_cents))
            .cast("long").alias("b"),
        )
        .where(F.col("g").isNotNull() & F.col("b").isNotNull())
        .groupBy("g", "b").agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = bins.select(
        "g", "b", "cnt",
        F.sum("cnt").over(
            Window.partitionBy("g").orderBy("b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("g")).alias("n"),
    )
    aggs = [F.first("n").cast("long").alias("n")]
    for p in HQ_PCTS:
        aggs.append(
            F.min(
                F.when(F.lit(100) * F.col("cum") >= F.lit(p) * F.col("n"),
                       (F.col("b") + 1) * bin_cents)
            ).cast("long").alias(f"p{p}_cents")
        )
    return cum.groupBy("g").agg(*aggs).select(
        F.col("g").alias(group_col), "n",
        *[f"p{p}_cents" for p in HQ_PCTS],
    )


def hist_quantiles_sql(group_col: str = "event_type",
                       val_col: str = "value",
                       bin_cents: int = HQ_BIN_CENTS,
                       table: str = "events") -> str:
    """DuckDB twin of hist_quantiles — identical binning and integer
    percentile thresholds."""
    pcols = ", ".join(
        f"CAST(min(CASE WHEN 100 * cum >= {p} * n "
        f"THEN (b + 1) * {bin_cents} END) AS BIGINT) AS p{p}_cents"
        for p in HQ_PCTS
    )
    return f"""
        WITH bins AS (
            SELECT {group_col} AS g,
                   CAST(floor(floor({val_col} * 100) / {bin_cents})
                        AS BIGINT) AS b,
                   count(*) AS cnt
            FROM {table}
            WHERE {group_col} IS NOT NULL AND {val_col} IS NOT NULL
            GROUP BY g, b),
        cum AS (
            SELECT g, b, cnt,
                   sum(cnt) OVER (PARTITION BY g ORDER BY b) AS cum,
                   sum(cnt) OVER (PARTITION BY g) AS n
            FROM bins)
        SELECT g AS {group_col}, CAST(any_value(n) AS BIGINT) AS n, {pcols}
        FROM cum GROUP BY g
    """


# ---------------------------------------------------------------------------
# Rank normalization (percent-rank feature scaling, integer fixed point)
# ---------------------------------------------------------------------------


def rank_normalize(df: DataFrame, group_col: str = "event_type",
                   val_col: str = "value",
                   id_col: str = "event_id") -> DataFrame:
    """Per-group percent-rank feature scaling in x6 fixed point: the
    rank-based normalization that makes heavy-tailed metrics
    comparable across groups (the feature-engineering step before
    mixing signals of different scales).

        prank_x6 = floor(10^6 * (rank - 1) / (n - 1))   (n > 1)

    with rank over (val, id) — a total order, so both engines agree
    on every tie. Classical percent_rank, restated in integers
    because the builtin returns a double whose engine-side division
    is the only nondeterminism risk worth removing.

    Shape: one rank window per group + a dim-sized group-count join;
    output is row-sized (it IS a per-row feature). Single-row groups
    emit 0.

    Output: (id_col, group_col, prank_x6:long).
    """
    w = Window.partitionBy("g").orderBy("v", "i")
    ranked = (
        df.select(
            F.col(id_col).alias("i"), F.col(group_col).alias("g"),
            F.col(val_col).alias("v"),
        )
        .where(F.col("g").isNotNull() & F.col("v").isNotNull()
               & F.col("i").isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("g")))
    )
    return ranked.select(
        F.col("i").alias(id_col), F.col("g").alias(group_col),
        F.when(F.col("n") > 1,
               F.floor(F.lit(1_000_000) * (F.col("rk").cast("long") - 1)
                       / (F.col("n") - 1)))
        .otherwise(F.lit(0)).cast("long").alias("prank_x6"),
    )


def rank_normalize_sql(group_col: str = "event_type",
                       val_col: str = "value", id_col: str = "event_id",
                       table: str = "events") -> str:
    """DuckDB twin of rank_normalize — identical total order and
    integer arithmetic."""
    return f"""
        WITH ranked AS (
            SELECT {id_col} AS i, {group_col} AS g, {val_col} AS v,
                   row_number() OVER (PARTITION BY {group_col}
                                      ORDER BY {val_col}, {id_col}) AS rk,
                   count(*) OVER (PARTITION BY {group_col}) AS n
            FROM {table}
            WHERE {group_col} IS NOT NULL AND {val_col} IS NOT NULL
                  AND {id_col} IS NOT NULL)
        SELECT i AS {id_col}, g AS {group_col},
               CAST(CASE WHEN n > 1
                    THEN floor(1000000 * (rk - 1) / (n - 1))
                    ELSE 0 END AS BIGINT) AS prank_x6
        FROM ranked
    """


# ---------------------------------------------------------------------------
# Sequence mining: event-type trigrams via lag windows (no collect)
# ---------------------------------------------------------------------------

TRIGRAM_TOP = 30


def event_trigrams(df: DataFrame, user_col: str = "user_id",
                   ts_col: str = "ts", type_col: str = "event_type",
                   top: int = TRIGRAM_TOP) -> DataFrame:
    """Most frequent within-user event-type trigrams — sequence
    mining one order up from markov_transitions' bigrams, built from
    TWO lag windows instead of any per-user collect: state per user
    is O(1) regardless of how many events a user has (the
    journey_paths collect is bounded by its rank filter; this needs
    no bound at all, which is the right shape for power users with
    10^9 events).

    Order is the (ts, event_id) total order; trigram counts are the
    usual combinable shuffle; top `top` by (n DESC, trigram) plans
    TakeOrderedAndProject.

    Output: (trigram:string "a>b>c", n:long).
    """
    w = Window.partitionBy("u").orderBy("ts", "eid")
    lagged = (
        df.select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("ts"),
            F.col("event_id").alias("eid"), F.col(type_col).alias("et"),
        )
        .where(F.col("u").isNotNull() & F.col("ts").isNotNull()
               & F.col("eid").isNotNull())
        .select(
            "u", "et",
            F.lag("et", 1).over(w).alias("p1"),
            F.lag("et", 2).over(w).alias("p2"),
        )
        .where(F.col("p2").isNotNull())
    )
    return (
        lagged.groupBy(
            F.concat_ws(">", "p2", "p1", "et").alias("trigram")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("trigram"))
        .limit(top)
    )


def event_trigrams_sql(top: int = TRIGRAM_TOP) -> str:
    """DuckDB twin of event_trigrams — identical lag order and
    counts."""
    return f"""
        WITH lagged AS (
            SELECT lag(event_type, 2) OVER w AS p2,
                   lag(event_type, 1) OVER w AS p1,
                   event_type AS et
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
                  AND event_id IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT concat_ws('>', p2, p1, et) AS trigram,
               CAST(count(*) AS BIGINT) AS n
        FROM lagged WHERE p2 IS NOT NULL
        GROUP BY trigram ORDER BY n DESC, trigram LIMIT {top}
    """


# ---------------------------------------------------------------------------
# OHLC bars (ordered-argument aggregates)
# ---------------------------------------------------------------------------


def ohlc_bars(df: DataFrame, group_col: str = "event_type",
              ts_col: str = "ts", val_col: str = "value") -> DataFrame:
    """Daily open/high/low/close bars per group — the classical
    ordered-argument aggregation family (SQL arg_min/arg_max, Spark
    min_by/max_by), stated here as conditional aggregates over the
    (ts, event_id) total order so both engines agree on ties
    bit-for-bit: open = the value at the MIN (ts, event_id) of the
    (group, day), close = at the MAX; high/low are plain extremes.

    ONE combinable shuffle: min/max of (ts, event_id, value) structs
    combine associatively map-side (the struct comparison IS the
    total order, value riding along), so no window and no second
    pass. Output: (group_col, day:long epoch-day, open, high, low,
    close, n:long).
    """
    day = F.floor(
        F.col(ts_col).cast("timestamp").cast("long") / 86400
    ).cast("long")
    base = df.select(
        F.col(group_col).alias("g"), day.alias("day"),
        F.col(ts_col).cast("timestamp").cast("long").alias("sec"),
        F.col("event_id").alias("eid"), F.col(val_col).alias("v"),
    ).where(F.col("g").isNotNull() & F.col("day").isNotNull()
            & F.col("v").isNotNull() & F.col("eid").isNotNull())
    return (
        base.groupBy("g", "day")
        .agg(
            F.min(F.struct("sec", "eid", "v")).alias("o"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.max(F.struct("sec", "eid", "v")).alias("c"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            F.col("g").alias(group_col), "day",
            F.col("o.v").alias("open"), "high", "low",
            F.col("c.v").alias("close"), "n",
        )
    )


def ohlc_bars_sql(group_col: str = "event_type", ts_col: str = "ts",
                  val_col: str = "value", table: str = "events") -> str:
    """DuckDB twin of ohlc_bars — arg_min/arg_max over the identical
    (sec, event_id) total order, packed into one HUGEINT key
    (sec * 2^64 + eid — collision-free for any non-negative int64
    event id; DuckDB 1.0's arg_min does not take struct keys)."""
    key = ("CAST(sec AS HUGEINT) * "
           "CAST('18446744073709551616' AS HUGEINT) + eid")
    return f"""
        WITH base AS (
            SELECT {group_col} AS g,
                   CAST(floor(epoch({ts_col}) / 86400) AS BIGINT) AS day,
                   CAST(epoch({ts_col}) AS BIGINT) AS sec,
                   event_id AS eid, {val_col} AS v
            FROM {table}
            WHERE {group_col} IS NOT NULL AND {ts_col} IS NOT NULL
                  AND {val_col} IS NOT NULL AND event_id IS NOT NULL)
        SELECT g AS {group_col}, day,
               arg_min(v, {key}) AS open,
               max(v) AS high, min(v) AS low,
               arg_max(v, {key}) AS close,
               CAST(count(*) AS BIGINT) AS n
        FROM base GROUP BY g, day
    """


# ---------------------------------------------------------------------------
# Exponentially time-decayed scores (powers-of-two exact arithmetic)
# ---------------------------------------------------------------------------

DECAY_HALFLIFE_S = 7 * 86400     # one-week half-life
DECAY_TOP = 20


def decayed_scores(df: DataFrame, key_col: str = "user_id",
                   ts_col: str = "ts",
                   halflife_s: int = DECAY_HALFLIFE_S,
                   top: int = DECAY_TOP) -> DataFrame:
    """Exponentially time-decayed activity leaderboard — the
    feed-ranking primitive (recent events count full, events one
    half-life old count half, ...), made CROSS-ENGINE EXACT by
    quantizing the decay to whole half-lives: each event contributes
    2^-k with k = floor((t_ref - ts)/halflife), t_ref = the corpus's
    max timestamp (a broadcast 1-row aggregate, so the score is a
    pure function of the data, not of wall-clock).

    Why this is bit-exact in floating point: each 2^-k is an exact
    IEEE double; per-(key, k) COUNTS are integers; and the final
    sum_k count_k * 2^-k has every term an exact multiple of
    2^-k_max with total magnitude << 2^53 ulps of that unit, so no
    rounding ever occurs in either engine, in any summation order.
    The x4096 integer output makes that visible: score_x4096 =
    sum_k count_k * 2^(12-k) is computed in BIGINTs (k <= 12
    clamped; beyond 12 half-lives an event's weight < 1/4096 ~ 0 and
    clamps to the floor contribution of 1).

    Shape: one combinable (key, k) count shuffle (k has <= 13
    values), dim-sized rollup, TakeOrderedAndProject top-`top` by
    (score DESC, key). Output: (key_col, n_events:long,
    score_x4096:long).
    """
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).cast("timestamp").cast("long").alias("sec"),
    ).where(F.col("k").isNotNull() & F.col("sec").isNotNull())
    tref = base.agg(F.max("sec").alias("tref"))
    withk = base.crossJoin(F.broadcast(tref)).select(
        "k",
        F.least(
            F.floor((F.col("tref") - F.col("sec")) / halflife_s),
            F.lit(12),
        ).cast("int").alias("hk"),
    )
    counts = withk.groupBy("k", "hk").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.groupBy("k")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.sum(F.col("n") * F.expr("shiftleft(1, 12 - hk)"))
            .cast("long").alias("score_x4096"),
        )
        .orderBy(F.desc("score_x4096"), F.asc("k"))
        .limit(top)
        .select(F.col("k").alias(key_col), "n_events", "score_x4096")
    )


def decayed_scores_sql(key_col: str = "user_id", ts_col: str = "ts",
                       halflife_s: int = DECAY_HALFLIFE_S,
                       top: int = DECAY_TOP, table: str = "events") -> str:
    """DuckDB twin of decayed_scores — identical half-life buckets
    and BIGINT shift arithmetic."""
    return f"""
        WITH base AS (
            SELECT {key_col} AS k, CAST(epoch({ts_col}) AS BIGINT) AS sec
            FROM {table}
            WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL),
        tref AS (SELECT max(sec) AS tref FROM base),
        withk AS (
            SELECT k, least(CAST(floor((tref - sec) / {halflife_s})
                                 AS BIGINT), 12) AS hk
            FROM base CROSS JOIN tref),
        counts AS (SELECT k, hk, count(*) AS n FROM withk GROUP BY k, hk)
        SELECT k AS {key_col}, CAST(sum(n) AS BIGINT) AS n_events,
               CAST(sum(n * (1 << (12 - hk))) AS BIGINT) AS score_x4096
        FROM counts GROUP BY k
        ORDER BY score_x4096 DESC, k LIMIT {top}
    """
