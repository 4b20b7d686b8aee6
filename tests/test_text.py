"""Text-analysis function units vs hand-computed values."""

import pytest
from pyspark.sql import functions as F

from llogtail_spark.functions.text import (
    bpe_ish_token_count,
    lang_id,
    quality_features,
    rolling_fingerprint,
    ws_token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on a mat"),
        (2, "der hund und die katze"),
        (3, "foo-bar, baz! qux?"),
        (4, "zzz yyy xxx"),
    ]
    return spark.createDataFrame(rows, "id int, text string")


def test_token_counts(docs):
    got = {r["id"]: (r["ws"], r["bpe"]) for r in docs.select(
        "id", ws_token_count("text").alias("ws"),
        bpe_ish_token_count("text").alias("bpe")).collect()}
    assert got[1] == (6, 6)
    # "foo-bar, baz! qux?" -> foo - bar , baz ! qux ?  = 8 BPE-ish
    assert got[3] == (3, 8)


def test_quality_features(docs):
    r = docs.filter("id = 1").select(quality_features("text").alias("q")).first()["q"]
    # words: the cat sat on a mat -> stopwords: the, a => 2/6
    assert r["stop_x10000"] == 3333
    assert r["n_punct"] == 0
    # mean word len = (3+3+3+2+1+3)/6 = 2.5
    assert r["wlen_x100"] == 250
    r3 = docs.filter("id = 3").select(quality_features("text").alias("q")).first()["q"]
    assert r3["n_punct"] == 4  # - , ! ?


def test_lang_id(docs):
    got = {r["id"]: r["l"] for r in docs.select("id", lang_id("text").alias("l")).collect()}
    assert got[1] == "en"   # the, a
    assert got[2] == "de"   # der, und, die
    assert got[4] == "und"  # no markers


def test_rolling_fingerprint_formula(spark):
    df = spark.createDataFrame([(1, "ab cde")], "id int, text string")
    # fp = 1*(31*2+97) + 2*(31*3+99) = 159 + 384 = 543
    assert df.select(rolling_fingerprint("text").alias("fp")).first()["fp"] == 543


def test_fingerprint_position_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "bb aa")], "id int, text string"
    )
    fps = [r["fp"] for r in df.select(rolling_fingerprint("text").alias("fp")).collect()]
    assert fps[0] != fps[1]  # same bag of words, different order
