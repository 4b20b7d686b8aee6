"""Cohort retention and ordered-funnel semantics, hand-computed."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


def test_cohort_retention_hand_values(spark):
    """Two users cohorted in week 0 of Jan-2024, one returning the
    next week; one user cohorted a week later. Weeks are epoch-week
    indexes; retention bp is vs the offset-0 cohort size."""
    from llogtail_spark.operators.telemetry import cohort_retention

    # 2024-01-01 is a Monday; epoch weeks split on Thursdays (epoch
    # day 0 = Thu 1970-01-01), so Jan 1-3 and Jan 4-10 are different
    # epoch weeks. Use day 1 (week A), day 5 (week B), day 12 (week C).
    rows = [
        (1, _ts(1)), (1, _ts(1, 5)),   # u1 week A (dup same week)
        (2, _ts(1)), (2, _ts(5)),      # u2 weeks A and B
        (3, _ts(5)), (3, _ts(12)),     # u3 weeks B and C
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r["cohort_week"], r["week_offset"]): r
           for r in cohort_retention(df).collect()}
    wa = min(k[0] for k in out)
    assert out[(wa, 0)]["n_users"] == 2
    assert out[(wa, 0)]["retained_bp"] == 10000
    assert out[(wa, 1)]["n_users"] == 1
    assert out[(wa, 1)]["retained_bp"] == 5000
    assert out[(wa + 1, 0)]["n_users"] == 1
    assert out[(wa + 1, 1)]["n_users"] == 1


def test_funnel_strict_ordering(spark):
    """A step only counts strictly after the earliest chain: u1
    completes all 4; u2's purchase precedes its click so it stalls at
    click; u3 views before signing up and its only view is too early."""
    from llogtail_spark.operators.telemetry import funnel_counts

    rows = [
        (1, "signup", _ts(1)), (1, "view", _ts(2)),
        (1, "click", _ts(3)), (1, "purchase", _ts(4)),
        (2, "signup", _ts(1)), (2, "view", _ts(2)),
        (2, "purchase", _ts(3)), (2, "click", _ts(4)),
        (3, "view", _ts(1)), (3, "signup", _ts(2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r["step"]: r.asDict() for r in funnel_counts(df).collect()}
    assert out[1]["n_users"] == 3 and out[1]["step_type"] == "signup"
    assert out[2]["n_users"] == 2
    assert out[3]["n_users"] == 2   # u2 clicks after its view chain
    assert out[4]["n_users"] == 1   # only u1's purchase follows click
    assert out[2]["conv_bp"] == 6666 and out[4]["conv_bp"] == 3333


def test_funnel_greedy_equals_sequential_min(spark):
    """The greedy fold must equal the sequential-min chain even when
    a LATER first-step event would enable a longer chain is not the
    semantics: chain is anchored at the EARLIEST signup. u4's signup
    at t5 is after its view at t1, and the chain anchored at its
    first signup (t0) does catch the view at t1."""
    from llogtail_spark.operators.telemetry import funnel_counts

    rows = [
        (4, "signup", _ts(1, 0)), (4, "view", _ts(1, 2)),
        (4, "signup", _ts(1, 5)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r["step"]: r["n_users"] for r in funnel_counts(df).collect()}
    assert out == {1: 1, 2: 1}


def test_funnel_plan_no_python_no_join(spark):
    """One shuffle on user + HOF fold: no Python eval, no join in the
    plan (step counting is an explode, not a step-dim join)."""
    from llogtail_spark.operators.telemetry import funnel_counts

    df = spark.range(0, 1000).selectExpr(
        "id % 50 AS user_id",
        "element_at(array('signup','view','click','purchase'), "
        "cast(id % 4 + 1 as int)) AS event_type",
        "timestamp_seconds(1700000000 + id * 60) AS ts")
    plan = funnel_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "Join" not in plan


def test_rate_spikes_hand_values(spark):
    """Type 'a': minute counts [1,1,1,1,6] -> median 1, spike at the
    6-count minute (6 >= 2*1). Type 'b': counts [3,3] -> median 3, no
    minute reaches 2*3."""
    from llogtail_spark.operators.telemetry import rate_spikes

    def ev(i, typ, minute, within=0):
        return (i, typ, datetime(2024, 1, 1, 0, minute, within), 100 + i)

    rows = []
    i = 0
    for m in range(4):
        rows.append(ev(i, "a", m)); i += 1
    for s in range(6):
        rows.append(ev(i, "a", 4, s)); i += 1
    for s in range(3):
        rows.append(ev(i, "b", 0, s)); i += 1
        rows.append(ev(i, "b", 1, s)); i += 1
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, user_id long")
    out = rate_spikes(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["event_type"] == "a" and r["n_events"] == 6 and r["med_rate"] == 1
    assert r["minute_idx"] == int(datetime(2024, 1, 1).timestamp() // 60) + 4


def test_rate_spikes_single_wide_shuffle(spark):
    """Everything after the (type, minute) rollup is dim-sized: the
    median join must be a broadcast, never a shuffled join."""
    from llogtail_spark.operators.telemetry import rate_spikes

    df = spark.range(0, 2000).selectExpr(
        "id AS event_id", "'t' || cast(id % 3 AS string) AS event_type",
        "timestamp_seconds(1700000000 + id * 7) AS ts", "id % 50 AS user_id")
    plan = rate_spikes(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_interarrival_hand_values(spark):
    """u1 events at t=0,10,30 (type x at 10, y at 30); u2 at t=0,100.
    Gaps attributed to the LATER event's type: x:[10], y:[20,100].
    y: n=2, avg=60.00, max=100, p95 -> ceil(1.9)=2nd smallest = 100."""
    from llogtail_spark.operators.telemetry import interarrival_stats

    base = datetime(2024, 1, 1)

    def at(sec):
        return datetime(2024, 1, 1, sec // 3600, (sec % 3600) // 60, sec % 60)

    rows = [
        (0, 1, "x", base), (1, 1, "x", at(10)), (2, 1, "y", at(30)),
        (3, 2, "x", base), (4, 2, "y", at(100)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    out = {r["event_type"]: r for r in interarrival_stats(df).collect()}
    assert out["x"]["n_gaps"] == 1 and out["x"]["avg_gap_x100"] == 1000
    assert out["y"]["n_gaps"] == 2
    assert out["y"]["avg_gap_x100"] == 6000
    assert out["y"]["max_gap_s"] == 100
    assert out["y"]["p95_gap_s"] == 100


def test_interarrival_percentile_is_exact_rank(spark):
    """101 gaps of 1..101 seconds for one type: p95 rank = ceil(95.95)
    = 96 -> the 96th smallest gap. Layout must not matter."""
    from llogtail_spark.operators.telemetry import interarrival_stats

    rows = [(0, 1, "t", datetime(2024, 1, 1))]
    sec, eid = 0, 1
    for g in range(1, 102):
        sec += g
        rows.append((eid, 1, "t",
                     datetime(2024, 1, 1, sec // 3600, (sec % 3600) // 60,
                              sec % 60)))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    a = interarrival_stats(df.repartition(1)).collect()[0]
    b = interarrival_stats(df.repartition(8, "event_id")).collect()[0]
    assert a == b
    assert a["p95_gap_s"] == 96
    assert a["max_gap_s"] == 101


def test_active_users_7d_hand_values(spark):
    """u1 active on days 0 and 10; u2 on days 0 and 3. DAU: d0=2,
    d3=1, d10=1. WAU(d0)=2, WAU(d3)=2 (u1 from d0 still in window,
    u2 active), WAU(d10)=1 (d0/d3 activity out of the 7-day window
    ending d10... d3 covers d3..d9, so only u1's d10 row counts)."""
    from datetime import datetime, timedelta

    from llogtail_spark.operators.telemetry import active_users_7d

    base = datetime(2024, 1, 1)

    def at(day):
        return base + timedelta(days=day)

    rows = [
        (0, 1, "x", at(0)), (1, 1, "x", at(10)),
        (2, 2, "x", at(0)), (3, 2, "x", at(3)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    out = {r["day_idx"]: r for r in active_users_7d(df).collect()}
    d0 = min(out)
    assert out[d0]["dau"] == 2 and out[d0]["wau"] == 2
    assert out[d0 + 3]["dau"] == 1 and out[d0 + 3]["wau"] == 2
    assert out[d0 + 10]["dau"] == 1 and out[d0 + 10]["wau"] == 1
    assert set(out) == {d0, d0 + 3, d0 + 10}


def test_active_users_7d_window_edges(spark):
    """A user active on day 0 counts toward WAU(day 6) but not
    WAU(day 7)."""
    from datetime import datetime, timedelta

    from llogtail_spark.operators.telemetry import active_users_7d

    base = datetime(2024, 1, 1)
    rows = [
        (0, 1, "x", base),
        (1, 2, "x", base + timedelta(days=6)),
        (2, 3, "x", base + timedelta(days=7)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    out = {r["day_idx"]: r for r in active_users_7d(df).collect()}
    d0 = min(out)
    assert out[d0 + 6]["wau"] == 2   # u1 (d0) + u2 (d6)
    assert out[d0 + 7]["wau"] == 2   # u2 (d6) + u3 (d7); u1 aged out


# ---------------------------------------------------------------------------
# journey_paths / weighted_median / benford_digits
# ---------------------------------------------------------------------------


def test_journey_paths_hand_case(spark):
    from datetime import datetime

    from llogtail_spark.operators.telemetry import journey_paths

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    # user 1 & 2: identical a>b>c; user 3: seven events, truncated to
    # first 5; user 4: two events at the SAME ts — event_id breaks
    # the tie deterministically.
    rows = []
    for u in (1, 2):
        rows += [(u * 10 + i, t(i), u, et, 0.0, None)
                 for i, et in enumerate(["a", "b", "c"])]
    rows += [(100 + i, t(i), 3, f"e{i}", 0.0, None) for i in range(7)]
    rows += [(201, t(0), 4, "x", 0.0, None), (200, t(0), 4, "y", 0.0, None)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r["path"]: r["n_users"] for r in journey_paths(df).collect()}
    assert out["a>b>c"] == 2
    assert out["e0>e1>e2>e3>e4"] == 1          # truncated at k=5
    assert out["y>x"] == 1                     # event_id 200 before 201


def test_weighted_median_hand_and_split_invariance(spark):
    from llogtail_spark.operators.telemetry import weighted_median

    # weights: v=1 w=3, v=2 w=1, v=10 w=2 -> tot 6, cum(1)=3, 2*3>=6
    # -> lower weighted median = 1.
    rows = [("A", 1.0, 3.0), ("A", 2.0, 1.0), ("A", 10.0, 2.0),
            # B: v=5 w=1, v=7 w=1 -> cum(5)=1, 2>=2 -> median 5
            ("B", 5.0, 1.0), ("B", 7.0, 1.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    out = {r["g"]: r for r in
           weighted_median(df, "g", "v", "w").collect()}
    assert out["A"]["w_median"] == 1.0 and out["A"]["tot_weight"] == 6
    assert out["B"]["w_median"] == 5.0 and out["B"]["tot_weight"] == 2

    # splitting a weight-3 row into three weight-1 rows is identity
    split = [("A", 1.0, 1.0)] * 3 + rows[1:]
    df2 = spark.createDataFrame(split, "g string, v double, w double")
    out2 = {r["g"]: r for r in
            weighted_median(df2, "g", "v", "w").collect()}
    assert out2["A"]["w_median"] == 1.0 and out2["A"]["tot_weight"] == 6


def test_benford_digits_hand_case(spark):
    from llogtail_spark.operators.telemetry import BENFORD_BP, benford_digits

    # 19.x -> leading digit of 19xx cents = 1; 0.25 -> 25 -> 2;
    # 3.00 -> 300 -> 3; 0.004 -> cents 0 -> EXCLUDED.
    rows = [(1, None, 1, "t", 19.5, None), (2, None, 1, "t", 0.25, None),
            (3, None, 1, "t", 3.0, None), (4, None, 1, "t", 0.004, None),
            (5, None, 1, "t", 150.0, None)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r["digit"]: r for r in benford_digits(df).collect()}
    assert sorted(out) == [1, 2, 3]
    assert out[1]["n"] == 2          # 19.5 and 150.0
    assert out[1]["obs_bp"] == 5000  # 2 of 4 kept rows
    assert out[1]["exp_bp"] == BENFORD_BP[0]
    assert out[1]["dev_bp"] == 5000 - BENFORD_BP[0]
    assert sum(r["n"] for r in out.values()) == 4


def test_trend_slope_recovers_planted_line(spark):
    """y = 3.00 + 0.50*hours (in dollars): slope_x6 must recover 50
    cents/hour exactly; a constant series has denom > 0, numer 0."""
    from datetime import datetime, timedelta

    from llogtail_spark.operators.telemetry import trend_slope

    t0 = datetime(2024, 1, 1)
    rows = [(i, t0 + timedelta(hours=i), 1, "lin", 3.0 + 0.5 * i, None)
            for i in range(24)]
    rows += [(100 + i, t0 + timedelta(hours=i), 1, "flat", 7.25, None)
             for i in range(24)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r["event_type"]: r for r in trend_slope(df).collect()}
    assert out["lin"]["slope_x6"] == 50 * 1_000_000   # 50 cents/hour
    assert out["flat"]["numer"] == 0 and out["flat"]["slope_x6"] == 0
    assert out["flat"]["denom"] > 0


def test_trend_slope_single_point_group(spark):
    """One event -> denom = 0 -> slope 0, no division error."""
    from datetime import datetime

    from llogtail_spark.operators.telemetry import trend_slope

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 1, "solo", 5.0, None)],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string")
    r = trend_slope(df).collect()[0]
    assert r["denom"] == 0 and r["slope_x6"] == 0


def test_hist_quantiles_hand_case_and_merge_invariance(spark):
    from llogtail_spark.operators.telemetry import hist_quantiles

    # 100 values 0.01..1.00 dollars -> cents 1..100, bin width 800
    # puts everything in bin 0 -> every percentile = 800; add one
    # 50-dollar outlier -> p99 jumps to its bin edge.
    rows = [(i, None, 1, "t", (i + 1) / 100.0, None) for i in range(100)]
    rows.append((200, None, 1, "t", 50.0, None))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    r = hist_quantiles(df).collect()[0]
    assert r["n"] == 101
    assert r["p50_cents"] == 800
    assert r["p95_cents"] == 800
    assert r["p99_cents"] == 800   # 100*100 >= 99*101 -> still bin 0
    # drop to 50 base values: p99 must now hit the outlier's bin
    df2 = spark.createDataFrame(
        rows[:50] + [rows[-1]],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string")
    r2 = hist_quantiles(df2).collect()[0]
    assert r2["p99_cents"] == (5000 // 800 + 1) * 800
    # bin counts are combinable: layout invariance
    a = sorted(map(tuple, hist_quantiles(df.repartition(1)).collect()))
    b = sorted(map(tuple, hist_quantiles(df.repartition(8, "event_id")).collect()))
    assert a == b


def test_rank_normalize_hand_case(spark):
    from llogtail_spark.operators.telemetry import rank_normalize

    rows = [(i, None, 1, "t", float(v), None)
            for i, v in enumerate([10, 20, 30, 40, 50])]
    rows.append((99, None, 1, "solo", 7.0, None))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r["event_id"]: r["prank_x6"] for r in rank_normalize(df).collect()}
    assert [out[i] for i in range(5)] == [0, 250000, 500000, 750000, 1000000]
    assert out[99] == 0


def test_event_trigrams_hand_case(spark):
    from datetime import datetime

    from llogtail_spark.operators.telemetry import event_trigrams

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    # user 1: a b c a b c -> trigrams a>b>c x2, b>c>a, c>a>b
    rows = [(i, t(i), 1, et, 0.0, None)
            for i, et in enumerate(["a", "b", "c", "a", "b", "c"])]
    # user 2: two events only -> no trigram
    rows += [(10, t(0), 2, "x", 0.0, None), (11, t(1), 2, "y", 0.0, None)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r["trigram"]: r["n"] for r in event_trigrams(df).collect()}
    assert out == {"a>b>c": 2, "b>c>a": 1, "c>a>b": 1}


def test_ohlc_bars_hand_case(spark):
    from datetime import datetime

    from llogtail_spark.operators.telemetry import ohlc_bars

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    # same-second open tie broken by event_id: eid 0 before eid 1
    rows = [(0, t(0), 1, "t", 5.0, None), (1, t(0), 1, "t", 9.0, None),
            (2, t(30), 1, "t", 1.0, None), (3, t(59), 1, "t", 7.0, None)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    r = ohlc_bars(df).collect()[0]
    assert (r["open"], r["high"], r["low"], r["close"], r["n"]) == \
        (5.0, 9.0, 1.0, 7.0, 4)


def test_decayed_scores_exact_halflife_arithmetic(spark):
    from datetime import datetime, timedelta

    from llogtail_spark.operators.telemetry import (
        DECAY_HALFLIFE_S, decayed_scores,
    )

    t0 = datetime(2024, 6, 1)
    hl = timedelta(seconds=DECAY_HALFLIFE_S)
    # user 1: events at t_ref, t_ref-1hl, t_ref-2hl -> 4096+2048+1024
    # user 2: one event 20 half-lives back -> clamped to k=12 -> 1
    rows = [(0, t0, 1, "t", 0.0, None),
            (1, t0 - hl, 1, "t", 0.0, None),
            (2, t0 - 2 * hl, 1, "t", 0.0, None),
            (3, t0 - 20 * hl, 2, "t", 0.0, None)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r["user_id"]: r for r in decayed_scores(df).collect()}
    assert out[1]["score_x4096"] == 4096 + 2048 + 1024
    assert out[1]["n_events"] == 3
    assert out[2]["score_x4096"] == 1


def test_decayed_scores_layout_invariance(spark):
    """The power-of-two design means NO summation-order rounding:
    repartitioning cannot move the score by even one ulp."""
    from datetime import datetime, timedelta

    from llogtail_spark.operators.telemetry import decayed_scores

    t0 = datetime(2024, 6, 1)
    rows = [(i, t0 - timedelta(seconds=i * 50000), i % 7, "t", 0.0, None)
            for i in range(500)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    a = sorted(map(tuple, decayed_scores(df.repartition(1)).collect()))
    b = sorted(map(tuple, decayed_scores(df.repartition(16, "event_id")).collect()))
    assert a == b


def test_order_sensitive_ops_drop_null_event_ids(spark):
    """NULL order keys are excluded in BOTH engines (Spark sorts
    NULLS FIRST, DuckDB NULLS LAST — the known cross-engine
    divergence class): a NULL event_id row must not shift journey
    paths, trigrams, or OHLC open/close."""
    from datetime import datetime

    from llogtail_spark.operators.telemetry import (
        event_trigrams, journey_paths, ohlc_bars,
    )

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [(0, t(0), 1, "a", 5.0, None), (None, t(0), 1, "z", 99.0, None),
            (1, t(1), 1, "b", 7.0, None), (2, t(2), 1, "c", 6.0, None)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    assert [r["path"] for r in journey_paths(df).collect()] == ["a>b>c"]
    assert {r["trigram"] for r in event_trigrams(df).collect()} == {"a>b>c"}
    by_type = {r["event_type"]: r for r in ohlc_bars(df).collect()}
    assert "z" not in by_type
    assert by_type["a"]["n"] == 1
