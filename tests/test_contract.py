"""Driver-contract consistency: queries()/oracle_sql()/bench names
stay aligned, and every query plans with unique, non-empty column
names (the driver's value-hash compare sorts columns by name, so a
duplicate name silently corrupts the comparison)."""

import os

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_oracle_keys_match_query_keys():
    q = set(entry.queries().keys())
    o = set(entry.oracle_sql().keys())
    assert o <= q, f"oracles without queries: {o - q}"
    assert q <= o, f"queries missing oracles (rows-only check): {q - o}"


def test_bench_queries_exist():
    import bench

    q = set(entry.queries().keys())
    missing = [n for n in bench.BENCH_QUERIES if n not in q]
    assert not missing, missing


def test_bench_queries_cover_full_surface():
    """The per-query timing map must cover every queries() entry —
    a new operator without a bench row is invisible to the
    per-round BENCH artifact."""
    import bench

    q = set(entry.queries().keys())
    unbenched = sorted(q - set(bench.BENCH_QUERIES))
    assert not unbenched, unbenched
    assert len(bench.BENCH_QUERIES) == len(set(bench.BENCH_QUERIES))


def test_all_queries_plan_with_unique_columns(spark):
    if not os.path.isdir(SF):
        pytest.skip("driver testdata not present")
    for name, fn in entry.queries().items():
        df = fn(spark, SF)  # plan only — no execution
        cols = df.columns
        assert cols, name
        assert len(cols) == len(set(cols)), (name, cols)
