"""Streaming tail: the Structured Streaming twin of the batch pipeline.

Semantics parity with the reference's live loop:
- file-source `readStream` discovery of new files under the input dir
  == inotify Discover/Modify events (log_watcher.go:369-394) — Spark's
  file-stream source tracks seen files in its checkpoint exactly the
  way llogtail tracks per-file offsets;
- `foreachBatch` applies the same parse -> enrich -> route stages and
  writes each sink, then commits manifest rows — push-then-checkpoint
  ordering preserved per micro-batch (log_collector.go:208-215);
- the streaming checkpointLocation + our manifest give resumability:
  a restarted stream reprocesses at most the last uncommitted batch,
  and idempotent per-partition overwrite keeps sinks exact;
- Trigger.AvailableNow drains everything currently discoverable and
  stops — the batch-catch-up mode (poller analog, log_watcher.go:167).

At cluster scale this runs continuously against a landing directory /
Iceberg table feed; maxFilesPerTrigger bounds micro-batch size the
way the 4 MB buffer bounds a fetch (buffer.go:31-36).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from llogtail_spark import manifest as mf
from llogtail_spark.config import PipelineConf
from llogtail_spark.operators.enrich import enrich_stage
from llogtail_spark.operators.parse import parse_stage
from llogtail_spark.sources import reader

SEQUENCES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def _process_batch(spark: SparkSession, conf: PipelineConf, batch_df: DataFrame,
                   batch_id: int) -> None:
    """One micro-batch through parse -> enrich -> route -> ship -> cpt."""
    df = reader.with_partition_id(batch_df)
    df = parse_stage(df, conf.grok)
    if conf.lookup_path:
        lookup = spark.read.parquet(conf.lookup_path)
        df = enrich_stage(df, lookup, defaults=conf.enrich_defaults)
    df = df.persist()
    try:
        from llogtail_spark.operators.aggregate import pipeline_stats

        # ONE stats job per micro-batch for per-sink lineage counts.
        stats = {r["part"]: r for r in pipeline_stats(df, conf.sinks).collect()}
        # input identity from parquet FOOTER metadata — the SAME
        # definition validate_manifest recomputes (a content-hash
        # in_checksum here would make every streamed entry look
        # stale). batch_df.inputFiles() is empty for streaming frames,
        # so resolve the batch's parts against the table's file list.
        all_parts = reader.list_parts(spark, conf.input_path)
        in_ids = reader.files_identity(
            {p: all_parts[p] for p in stats if p in all_parts}
        )
        for rule in conf.sinks:
            sdf = df.filter(F.expr(rule.predicate))
            (
                sdf.write.format(rule.format)
                .mode("overwrite")
                .partitionBy("part")
                .save(rule.path)
            )
            for p, s in stats.items():
                ins = in_ids.get(p)
                mf.commit(
                    conf.manifest_dir,
                    mf.ManifestEntry(
                        sink=rule.name, part=p,
                        row_count=int(s[f"rc__{rule.name}"]),
                        tok_total=int(s[f"tt__{rule.name}"]),
                        checksum=int(s[f"ck__{rule.name}"]),
                        watermark_offset=int(ins[0]) if ins else int(s["in_row_count"]),
                        committed_at=conf.committed_at,
                        in_row_count=int(ins[0]) if ins else int(s["in_row_count"]),
                        in_checksum=int(ins[1]) if ins else 0,
                    ),
                )
    finally:
        df.unpersist()


def stream_pipeline(
    spark: SparkSession,
    conf: PipelineConf,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Start the streaming tail. Returns the StreamingQuery.

    available_now=True drains all currently-visible files then stops
    (deterministic for tests); False runs continuously.
    """
    opts = {}
    if max_files_per_trigger:
        opts["maxFilesPerTrigger"] = str(max_files_per_trigger)
    stream = (
        spark.readStream.schema(SEQUENCES_SCHEMA)
        .options(**opts)
        .parquet(conf.input_path)
    )
    writer = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: _process_batch(spark, conf, bdf, bid)
        )
        .option("checkpointLocation", os.path.join(conf.workdir, "stream_cpt"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_severity_counts(
    events: DataFrame, window: str = "5 minutes", slide: str | None = None,
    watermark: str = "10 minutes",
):
    """Streaming windowed aggregation with late-data handling — the
    generic severity/rate rollup (tumbling when slide is None)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
    )
