"""Footer-metadata input identity (reader.file_identity) — the
validateCpt analog (utils.go:128-133): cheap, metadata-only, and
sensitive to the changes that matter (row count, content layout)."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from llogtail_spark.sources.reader import file_identity, files_identity


def _write(path, ids, toks):
    t = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.string()),
            "tokens": pa.array(toks, type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(x) for x in toks], type=pa.int32()),
            "source": pa.array(["s"] * len(ids)),
        }
    )
    pq.write_table(t, path)


def test_identity_stable_across_rewrites(tmp_path):
    p = str(tmp_path / "a.parquet")
    _write(p, ["a", "b"], [[1, 2], [3]])
    rc1, ck1 = file_identity(p)
    os.unlink(p)
    _write(p, ["a", "b"], [[1, 2], [3]])  # identical content rewrite
    rc2, ck2 = file_identity(p)
    assert (rc1, ck1) == (rc2, ck2)
    assert rc1 == 2


def test_identity_detects_row_count_change(tmp_path):
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    _write(p1, ["a", "b"], [[1], [2]])
    _write(p2, ["a", "b", "c"], [[1], [2], [3]])
    assert file_identity(p1) != file_identity(p2)


def test_identity_detects_doc_id_change(tmp_path):
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    _write(p1, ["a", "b"], [[1], [2]])
    _write(p2, ["a", "z"], [[1], [2]])  # max doc_id stat differs
    assert file_identity(p1)[1] != file_identity(p2)[1]


def test_files_identity_batch_and_uri_scheme(tmp_path):
    p = str(tmp_path / "a.parquet")
    _write(p, ["a"], [[7]])
    out = files_identity({"part-a": "file://" + p, "part-b": p})
    assert out["part-a"] == out["part-b"]


def test_read_table_iceberg_mode_is_explicit(spark, data_dir):
    """fmt='iceberg' without the runtime jar must FAIL LOUDLY unless
    the caller explicitly opts into the documented parquet-only
    sandbox fallback — a silent downgrade would hide that snapshot
    isolation and manifest pruning are gone."""
    import pytest

    from llogtail_spark.sources.reader import read_table

    path = os.path.join(data_dir, "sequences")

    with pytest.raises(RuntimeError, match="iceberg"):
        read_table(spark, path, fmt="iceberg")

    df = read_table(spark, path, fmt="iceberg", parquet_fallback=True)
    assert df.count() == spark.read.parquet(path).count()

    assert read_table(spark, path).count() == df.count()


def test_ensure_parallelism_gate(spark):
    """Below the core floor: hash-repartition to defaultParallelism.
    At or above it: identity (production inputs never pay the
    exchange)."""
    from llogtail_spark.sources.reader import ensure_parallelism

    target = spark.sparkContext.defaultParallelism
    small = spark.range(100)  # planned with few partitions
    if small.rdd.getNumPartitions() < target:
        up = ensure_parallelism(small, "id")
        assert up.rdd.getNumPartitions() == target
        assert sorted(r["id"] for r in up.collect()) == list(range(100))
    wide = spark.range(100).repartition(target + 4, "id")
    assert ensure_parallelism(wide, "id") is wide
