"""Deterministic sampling / mixture / length-bucket operators:
layout invariance, rate accuracy, seed decorrelation, exact bucket
math, shuffle-free plans."""

import math

import pytest
from pyspark.sql import functions as F

from llogtail_spark.operators.sampling import (
    deterministic_sample,
    len_bucket,
    length_buckets,
    mixture_weights,
    sample_bucket,
)

N = 2000


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"doc-{i:06d}", ["en", "de", "fr", "es", "zh"][i % 5], 40 + (i * 37) % 900)
        for i in range(N)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, name string, lang string, n_chars long"
    ).cache()


def test_sample_stable_under_repartition(docs):
    """The sampled row SET is a pure function of the keys — identical
    across partition layouts (what df.sample() does NOT guarantee)."""
    a = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 30).collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(13), "doc_id", 30).collect()
    }
    assert a == b and a


def test_sample_rate_accuracy(docs):
    got = deterministic_sample(docs, "doc_id", 30).count()
    assert abs(got / N - 0.30) < 0.05


def test_sample_seeds_decorrelated(docs):
    """Seed 0 at 30% and seed 1 at 30%: overlap ~= 9%, not 30%
    (a nested split would be a correlated-eval-set bug)."""
    a = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 30, 0).collect()}
    b = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 30, 1).collect()}
    overlap = len(a & b) / N
    assert 0.04 < overlap < 0.16, overlap


def test_mixture_rates_per_category(docs):
    w = {"en": 100, "de": 50, "zh": 10}
    out = (
        mixture_weights(docs, "lang", "doc_id", w, default_pct=80)
        .groupBy("lang")
        .count()
        .collect()
    )
    per = {r["lang"]: r["count"] / (N / 5) for r in out}
    assert per["en"] == 1.0
    assert abs(per["de"] - 0.5) < 0.1
    assert per.get("zh", 0.0) < 0.2
    for lang in ("fr", "es"):  # default bucket
        assert abs(per[lang] - 0.8) < 0.1


def test_len_bucket_exact(spark):
    vals = [1, 2, 3, 4, 7, 8, 255, 256, 1023, 1024, 99999]
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    got = {r["n"]: r["b"] for r in df.select("n", len_bucket("n").alias("b")).collect()}
    for v in vals:
        assert got[v] == int(math.floor(math.log2(v))), v


def test_length_buckets_totals(docs):
    rows = length_buckets(docs, "n_chars").collect()
    assert sum(r["n_rows"] for r in rows) == N
    for r in rows:
        assert 2 ** r["bucket"] <= r["len_min"] <= r["len_max"] < 2 ** (r["bucket"] + 1)


def test_sample_plan_is_shuffle_free(docs):
    plan = (
        deterministic_sample(docs, "doc_id", 30)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_bucket_range(docs):
    rows = docs.select(sample_bucket("doc_id").alias("b")).collect()
    assert all(0 <= r["b"] < 100 for r in rows)


def test_stratified_fixed_n_exact_quota_and_determinism(spark):
    """Exactly n per stratum (or the whole stratum when smaller),
    identical under different partitioning, decorrelated across
    seeds."""
    from llogtail_spark.operators.sampling import stratified_fixed_n

    rows = [(i, "big" if i % 3 else "small") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = stratified_fixed_n(df, "grp", "id", n=10, seed_i=0)
    counts = {r["grp"]: r["n"] for r in
              out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 10, "small": 10}
    # stratum smaller than n: keep all of it
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "id long, grp string")
    assert stratified_fixed_n(tiny, "grp", "id", 10).count() == 2
    # layout invariance
    a = set(r["id"] for r in out.collect())
    b = set(r["id"] for r in
            stratified_fixed_n(df.repartition(13), "grp", "id", 10, 0).collect())
    assert a == b
    # seed decorrelation: different seeds pick different members
    c = set(r["id"] for r in
            stratified_fixed_n(df, "grp", "id", 10, seed_i=7).collect())
    assert a != c


def test_stratified_plan_uses_window_group_limit(spark):
    """The rank filter must push per-partition top-n heaps BELOW the
    stratum exchange (WindowGroupLimit) — a 10^12-row stratum ships
    at most n rows per map task, not the stratum."""
    from llogtail_spark.operators.sampling import stratified_fixed_n

    df = spark.range(0, 10000).withColumn("grp", (F.col("id") % 5).cast("string"))
    plan = stratified_fixed_n(df, "grp", "id", 10)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_leakage_safe_split_keeps_clusters_whole(spark):
    """No near-dup component may straddle train/val: every doc in a
    component inherits the representative's split."""
    from llogtail_spark.operators.sampling import leakage_safe_split

    labels = spark.createDataFrame(
        [(i, i // 10 * 10, 1 if i % 10 == 0 else 0) for i in range(200)],
        "doc_id long, rep long, keep int",
    )
    out = leakage_safe_split(labels, train_pct=70)
    per_rep = out.groupBy("rep").agg(
        F.countDistinct("split").alias("nsplits")).collect()
    assert all(r["nsplits"] == 1 for r in per_rep)
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"train", "val"}  # both sides populated at 70%


def test_mixture_resample_exact_quotas(spark):
    """Realized mixture hits the target basis points exactly, total is
    the largest feasible without upsampling, layout-invariant, and
    missing target groups yield a loudly-empty result (never a
    silently skewed mixture)."""
    from llogtail_spark.operators.sampling import mixture_resample

    # groups sized 500/300/200; targets 50/30/20 % are exactly feasible
    rows = [(i, "a" if i < 500 else ("b" if i < 800 else "c"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = mixture_resample(df, "grp", "id", {"a": 5000, "b": 3000, "c": 2000})
    counts = {r["grp"]: r["n"] for r in
              out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 500, "b": 300, "c": 200}

    # scarce group caps the total: c has 200 but target 40% -> T=500
    out2 = mixture_resample(df, "grp", "id", {"a": 3000, "b": 3000, "c": 4000})
    counts2 = {r["grp"]: r["n"] for r in
               out2.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts2 == {"a": 150, "b": 150, "c": 200}

    # non-target group dropped; layout invariance
    a = set(r["id"] for r in out.collect())
    b = set(r["id"] for r in mixture_resample(
        df.repartition(13), "grp", "id",
        {"a": 5000, "b": 3000, "c": 2000}).collect())
    assert a == b

    # a target group absent from df -> empty, not skewed
    assert mixture_resample(
        df, "grp", "id", {"a": 5000, "zz": 5000}).count() == 0

    with pytest.raises(ValueError):
        mixture_resample(df, "grp", "id", {"a": 5000})


def test_temperature_mixture_flattens_shares(spark):
    """Sqrt temperature damps the dominant source and lifts the small
    one; integer outputs are layout-invariant; bp columns are exact
    floor arithmetic on BIGINTs."""
    import math

    from llogtail_spark.operators.sampling import temperature_mixture

    rows = ([(i, "w %s" % (" x" * 80), "big") for i in range(90)]
            + [(1000 + i, "y z", "small") for i in range(10)])
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r.asDict() for r in temperature_mixture(df).collect()}
    big, small = out["big"], out["small"]
    assert big["n_docs"] == 90 and small["n_docs"] == 10
    # tempering moves share toward uniform
    assert big["temp_bp"] < big["share_bp"]
    assert small["temp_bp"] > small["share_bp"]
    # exact integer reconstruction
    w_big = math.floor(math.sqrt(big["tok_total"]))
    w_small = math.floor(math.sqrt(small["tok_total"]))
    assert big["temp_bp"] == (w_big * 10000) // (w_big + w_small)
    # layout invariance
    out2 = {r["source"]: r.asDict()
            for r in temperature_mixture(df.repartition(7)).collect()}
    assert out == out2


def test_priority_sample_exact_topk_and_layout_invariant(spark):
    """Priority sampling (Duffield-Lund-Thorup) selection must equal
    the brute-force integer-arithmetic top-k exactly, survive
    repartitioning unchanged (u is a pure function of the key), and
    favor heavy rows (weight-coverage sanity)."""
    import random

    from llogtail_spark.operators.sampling import priority_sample

    rng = random.Random(9)
    docs = [(i, rng.randint(1, 400)) for i in range(1, 4001)]
    df = spark.createDataFrame(docs, "doc_id long, n_chars long")
    exp = sorted(
        ((w * 2**32) // ((i * 2654435761) % 2**32 + 1), -i, i, w)
        for i, w in docs
    )[::-1][:150]
    exp_rows = [(i, w, p) for p, _, i, w in exp]
    got = [
        (r["doc_id"], r["n_chars"], r["priority"])
        for r in priority_sample(df, "doc_id", "n_chars", 150).collect()
    ]
    assert got == exp_rows
    got2 = [
        (r["doc_id"], r["n_chars"], r["priority"])
        for r in priority_sample(df.repartition(13), "doc_id", "n_chars", 150).collect()
    ]
    assert sorted(got2) == sorted(exp_rows)
    # heavier rows overrepresented: the sample's mean weight must beat
    # the population's (weighted-without-replacement property)
    pop_mean = sum(w for _, w in docs) / len(docs)
    samp_mean = sum(w for _, w, _ in got) / len(got)
    assert samp_mean > pop_mean


def test_priority_sample_plans_take_ordered(spark):
    """Top-k must plan as TakeOrderedAndProject (per-partition heaps),
    never a global range-partition sort."""
    from llogtail_spark.operators.sampling import priority_sample

    df = spark.createDataFrame([(i, i % 7 + 1) for i in range(1, 500)],
                               "doc_id long, n_chars long")
    out = priority_sample(df, "doc_id", "n_chars", 25)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_priority_sample_per_group_exact_and_plan(spark):
    # pure-Python replication per group + WindowGroupLimit pin.
    from llogtail_spark.operators.sampling import priority_sample_per_group

    rows = [(i, f"g{i % 3}", 1 + (i * 7) % 50) for i in range(1, 91)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    k = 5
    got = sorted(
        (r["source"], r["doc_id"], r["w"], r["priority"])
        for r in priority_sample_per_group(df, "doc_id", "w", "source", k)
        .collect()
    )
    expect = []
    by_g = {}
    for i, g, w in rows:
        u = (i * 2654435761) % 4294967296 + 1
        by_g.setdefault(g, []).append((w * 4294967296 // u, i, w))
    for g, lst in by_g.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        expect += [(g, i, w, p) for p, i, w in lst[:k]]
    assert got == sorted(expect)
    # layout invariance
    again = sorted(
        (r["source"], r["doc_id"], r["w"], r["priority"])
        for r in priority_sample_per_group(
            df.repartition(16, "w"), "doc_id", "w", "source", k
        ).collect()
    )
    assert again == got
    plan = priority_sample_per_group(df, "doc_id", "w", "source", k) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Exchange SinglePartition" not in plan
