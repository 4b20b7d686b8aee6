"""Pipeline orchestration: scan -> parse -> enrich -> route -> ship
-> checkpoint, with skip-committed resume.

This is the LogCollector.handleEvent/listenEvent analog
(log_collector.go:134-221) with the event loop replaced by one
declarative DAG per run: the Iceberg/parquet snapshot IS the set of
"modify events"; partitions above the committed manifest are the
un-consumed bytes; there is nothing to poll.

Consistency contract preserved (SURVEY.md §3.5):
- sink write strictly before manifest commit (push-then-checkpoint,
  log_collector.go:208-215);
- idempotent dynamic-partition overwrite upgrades the reference's
  at-least-once to effectively-once across kill/resume;
- per-row atomicity: a routed row carries its full token array —
  never a partial record (line-framing analog, buffer.go:103-104).

Scale shape:
- resume pruning happens at the FILE LIST level (driver-side set
  difference, metadata-only) so committed data is never scanned;
- parse output is persisted MEMORY_AND_DISK and shared by K sink
  writes (one Arrow parse pass total), or recomputed per sink with
  per-sink predicate pushdown (scan_strategy config);
- per-partition stats for the manifest come from ONE aggregation per
  sink (groupBy part — narrow, map-side combined).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llogtail_spark import manifest as mf
from llogtail_spark.config import PipelineConf
from llogtail_spark.operators.aggregate import partition_stats, sink_aggregates
from llogtail_spark.operators.enrich import enrich_stage
from llogtail_spark.operators.parse import parse_stage
from llogtail_spark.operators.route import explode_routed
from llogtail_spark.sources import reader

# failpoint(stage, sink, part) — tests inject crashes between the sink
# write and the manifest commit to prove effectively-once resume.
Failpoint = Callable[[str, str, str], None]


@dataclass
class RunResult:
    processed: dict[str, list[str]]  # sink -> newly committed parts
    skipped: dict[str, list[str]]  # sink -> parts already committed
    metrics: DataFrame | None  # per-sink aggregates (None if no-op run)


def _prepare(spark: SparkSession, conf: PipelineConf, files: list[str]) -> DataFrame:
    df = reader.read_files(spark, files)
    df = reader.with_partition_id(df)
    df = parse_stage(df, conf.grok)
    if conf.lookup_path:
        lookup = spark.read.parquet(conf.lookup_path)
        df = enrich_stage(df, lookup, defaults=conf.enrich_defaults)
    return df


def validate_manifest(spark: SparkSession, conf: PipelineConf) -> list[str]:
    """Recompute input-partition identities and drop stale manifest
    entries (validateCpt analog, utils.go:128-133). Returns the parts
    invalidated. Full-scan of committed inputs — optional."""
    entries = mf.read_all(conf.manifest_dir)
    if not entries:
        return []
    parts = reader.list_parts(spark, conf.input_path)
    live = {
        r["part"]: (r["row_count"], r["checksum"])
        for r in partition_stats(
            reader.with_partition_id(reader.read_files(spark, list(parts.values())))
        ).collect()
    }
    stale = []
    for e in entries:
        got = live.get(e.part)
        if got is None or not mf.validate(e, got[0], got[1]):
            mf.invalidate(conf.manifest_dir, e.sink, e.part)
            stale.append(f"{e.sink}/{e.part}")
    return stale


def run_pipeline(
    spark: SparkSession,
    conf: PipelineConf,
    failpoint: Failpoint | None = None,
) -> RunResult:
    if conf.validate_on_start:
        validate_manifest(spark, conf)

    parts = reader.list_parts(spark, conf.input_path)  # {part: file}
    pending: dict[str, list[str]] = {}
    skipped: dict[str, list[str]] = {}
    for rule in conf.sinks:
        done = mf.committed_parts(conf.manifest_dir, rule.name)
        pending[rule.name] = sorted(set(parts) - done)
        skipped[rule.name] = sorted(set(parts) & done)

    union_parts = sorted({p for ps in pending.values() for p in ps})
    if not union_parts:
        return RunResult(processed={r.name: [] for r in conf.sinks},
                         skipped=skipped, metrics=None)

    files = [parts[p] for p in union_parts]
    df = _prepare(spark, conf, files)

    use_persist = conf.scan_strategy == "persist" and len(conf.sinks) > 1
    if use_persist:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)

    # input-partition identity (pre-filter) — recorded in every manifest
    # entry and later compared by validate_manifest (FileMeta analog)
    in_stats = {r["part"]: r for r in partition_stats(df).collect()}

    processed: dict[str, list[str]] = {}
    try:
        for rule in conf.sinks:
            todo = pending[rule.name]
            if not todo:
                processed[rule.name] = []
                continue
            src = df if use_persist else _prepare(
                spark, conf, [parts[p] for p in todo]
            )
            sdf = src.filter(F.expr(rule.predicate)).filter(
                F.col("part").isin(todo)
            )
            # ship: idempotent per-partition overwrite (dynamic mode) —
            # a crashed-and-retried partition replaces itself exactly
            (
                sdf.write.format(rule.format)
                .mode("overwrite")
                .partitionBy("part")
                .options(**rule.options)
                .save(rule.path)
            )
            # checkpoint: stats from the same frame, committed AFTER
            # the sink write (push-then-checkpoint ordering)
            stats = {r["part"]: r for r in partition_stats(sdf).collect()}
            committed = []
            for p in todo:
                if failpoint:
                    failpoint("before_commit", rule.name, p)
                s = stats.get(p)
                rc = int(s["row_count"]) if s else 0
                ins = in_stats.get(p)
                mf.commit(
                    conf.manifest_dir,
                    mf.ManifestEntry(
                        sink=rule.name,
                        part=p,
                        row_count=rc,
                        tok_total=int(s["tok_total"]) if s else 0,
                        checksum=int(s["checksum"]) if s and s["checksum"] is not None else 0,
                        watermark_offset=int(ins["row_count"]) if ins else 0,
                        committed_at=conf.committed_at,
                        in_row_count=int(ins["row_count"]) if ins else 0,
                        in_checksum=int(ins["checksum"]) if ins and ins["checksum"] is not None else 0,
                    ),
                )
                committed.append(p)
                if failpoint:
                    failpoint("after_commit", rule.name, p)
            processed[rule.name] = committed
    finally:
        if use_persist:
            df.unpersist()

    metrics = sink_aggregates(explode_routed(_prepare(spark, conf, list(parts.values())), conf.sinks))
    return RunResult(processed=processed, skipped=skipped, metrics=metrics)


def read_sink(spark: SparkSession, conf: PipelineConf, sink: str) -> DataFrame:
    rule = next(r for r in conf.sinks if r.name == sink)
    return spark.read.format(rule.format).load(rule.path)
