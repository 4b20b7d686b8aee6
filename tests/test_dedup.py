"""Dedup operators: planted duplicates must be found; clean corpora
must stay clean."""

import pytest
from pyspark.sql import functions as F

from llogtail_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash64,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill in the afternoon sun light"
)
NEAR = BASE.replace("lazy", "sleepy")  # one word differs
FAR = (
    "completely different content about spark shuffles partitions "
    "broadcast joins catalyst optimizer whole stage codegen arrow batches"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, BASE), (2, BASE), (3, "  THE  quick brown fox jumps over the lazy dog "
                                  "while the cat watches from the warm windowsill "
                                  "in the afternoon sun light"),
        (4, NEAR), (5, FAR),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_dedup_normalized(corpus):
    out = exact_dedup(corpus)
    kept = sorted(r["doc_id"] for r in out.collect())
    # 1,2,3 normalize to the same text -> keep min id 1; 4 and 5 unique
    assert kept == [1, 4, 5]


def test_minhash_lsh_finds_near_dup(corpus):
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(corpus, num_hashes=16, bands=8).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs  # exact dups always collide
    assert (1, 4) in pairs                      # near dup caught by some band
    assert (1, 5) not in pairs and (4, 5) not in pairs


def test_ngram_jaccard_values(spark):
    df = spark.createDataFrame(
        [(BASE, BASE), (BASE, FAR)], "a string, b string"
    )
    got = [r["jaccard_x10000"] for r in ngram_jaccard(df, "a", "b").collect()]
    assert got[0] == 10000  # identical
    assert got[1] == 0      # disjoint shingles


def test_simhash_near_texts_close(spark, corpus):
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(corpus).collect()}
    assert sh[1] == sh[2] == sh[3]  # identical normalized word sets

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(sh[1], sh[4]) < hamming(sh[1], sh[5])
    assert hamming(sh[1], sh[4]) <= 12  # one-word edit stays close


def test_embedding_near_dup_planted(spark):
    from llogtail_spark.operators.dedup import embedding_near_dup_pairs

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.04, 0.0, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),     # orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dup_pairs(emb, threshold_x10000=9500).collect()}
    assert pairs == {(1, 2)}
