"""Hashed-linear quality classifier: feature arithmetic, the integer
keep threshold, and the zero-shuffle inference-as-scan plan shape."""

import os

import pytest
from pyspark.sql import functions as F

from llogtail_spark.operators.classify import (
    CLS_BIAS_M,
    CLS_THRESH_M,
    CLS_W_SPAN,
    quality_classifier,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_feature_count_and_determinism(spark):
    # n_feats = unigrams + adjacent bigrams = 2n - 1; identical text
    # scores identically regardless of doc identity.
    rows = [(1, "a", "alpha beta gamma"), (2, "b", "alpha beta gamma"),
            (3, "a", "solo")]
    out = {r["doc_id"]: r for r in quality_classifier(_docs(spark, rows)).collect()}
    assert out[1]["n_feats"] == 5 and out[3]["n_feats"] == 1
    assert out[1]["logit_m"] == out[2]["logit_m"]
    assert out[1]["keep"] == (out[1]["logit_m"] > CLS_THRESH_M * 5)


def test_empty_and_whitespace_docs_dropped(spark):
    rows = [(1, "a", ""), (2, "a", "   \t  "), (3, "a", None), (4, "a", "ok")]
    got = quality_classifier(_docs(spark, rows)).select("doc_id").collect()
    assert [r["doc_id"] for r in got] == [4]


def test_weight_bounds_imply_logit_bounds(spark):
    # every per-feature weight lies in [-W, W], so the logit is
    # bounded by bias +/- W * n_feats — a cheap invariant that would
    # catch any overflow/wraparound in the weight projection.
    rows = [(i, "s", " ".join(f"w{i}_{j}" for j in range(30)))
            for i in range(50)]
    bad = (
        quality_classifier(_docs(spark, rows))
        .filter(
            (F.col("logit_m") > CLS_BIAS_M + CLS_W_SPAN * F.col("n_feats"))
            | (F.col("logit_m") < CLS_BIAS_M - CLS_W_SPAN * F.col("n_feats"))
        )
        .count()
    )
    assert bad == 0


def _sf_docs(spark):
    if not os.path.isdir("/root/testdata/sf0.001"):
        pytest.skip("driver testdata fixture not present")
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_inference_is_scan_no_exchange(spark):
    # the POINT of the operator: classification at 10^12 docs is a
    # projection — the executed plan must contain no Exchange of any
    # kind and no join.
    df = quality_classifier(_sf_docs(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_keep_fraction_sane_on_fixture(spark):
    # pseudo-random weights with a small positive threshold: the keep
    # rate should be a real split, not 0% or 100%.
    agg = quality_classifier(_sf_docs(spark)).agg(
        F.avg(F.col("keep").cast("double")).alias("frac")
    ).collect()[0]
    assert 0.15 < agg["frac"] < 0.85
