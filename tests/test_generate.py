"""Generator determinism + schema invariants (no Spark)."""

import numpy as np

from llogtail_spark.generate import (
    VOCAB_SIZE,
    build_vocab,
    generate_lookup,
    generate_sequences,
)


def test_deterministic_same_seed():
    a = generate_sequences(500, seed=7)
    b = generate_sequences(500, seed=7)
    assert a.equals(b)


def test_different_seed_differs():
    a = generate_sequences(200, seed=1)
    b = generate_sequences(200, seed=2)
    assert not a.equals(b)


def test_schema_and_invariants():
    t = generate_sequences(300, seed=42).to_pandas()
    assert list(t.columns) == ["doc_id", "tokens", "n_tok", "source"]
    assert (t["n_tok"] == t["tokens"].map(len)).all()
    assert t["doc_id"].is_unique
    lens = t["n_tok"].to_numpy()
    assert lens.min() >= 16 and lens.max() <= 512
    flat = np.concatenate(t["tokens"].to_numpy())
    assert flat.min() >= 0 and flat.max() < VOCAB_SIZE


def test_skewed_source_distribution():
    t = generate_sequences(3000, seed=42).to_pandas()
    frac = (t["source"] == "app.log").mean()
    assert 0.6 < frac < 0.8  # the hot-source fixture


def test_doc_id_encodes_per_source_order():
    t = generate_sequences(400, seed=42).to_pandas()
    for src, grp in t.groupby("source"):
        nums = grp["doc_id"].str.split(":").str[1].astype(int).to_numpy()
        assert (np.sort(nums) == np.arange(len(grp))).all()


def test_vocab_structure():
    v = build_vocab()
    assert len(v) == VOCAB_SIZE
    assert v[0] == "TRACE" and v[4] == "ERROR"
    assert v[1000] == "code=0" and v[1999] == "code=999"


def test_lookup_has_ghost_and_missing_source():
    lk = generate_lookup().to_pandas()
    assert "ghost.log" in set(lk["source"])  # never appears in data
    assert "warn.log" not in set(lk["source"])  # null-enrichment case
