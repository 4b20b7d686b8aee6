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

KNOWN LIMIT (deliberate, documented): Spark's file-stream source
assumes files are IMMUTABLE once seen. llogtail's live loop handles
in-place rename/rotation of a file it is mid-tail through
(log_watcher.go:228-261); here that case is covered by the BATCH
path's identity validation (pipeline.validate_manifest + footer
identity — a rotated/replaced input partition is detected and
reprocessed), not by the streaming twin. Under the batch north rule
(immutable token-table partitions) rotation-during-tail cannot occur;
a landing dir fed by rotating writers should rotate files INTO the
directory (create-then-move), which both paths handle.
"""

from __future__ import annotations

import os
import sys

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


def _resolve_batch_files(
    spark: SparkSession, input_path: str, parts: list[str], cache: dict
) -> dict[str, str]:
    """{part: file} for just this micro-batch's partitions — O(batch),
    not O(table). Partition ids are file basenames directly under the
    table dir, so the common case is a pure path construction with no
    listing at all; a part that doesn't resolve (nested layout, URI
    scheme) falls back to ONE table listing cached for the stream's
    lifetime and refreshed only when a part is genuinely unknown."""
    def _alive(path: str) -> bool:
        # the vanished-file staleness check only applies to files we
        # can stat locally; remote paths (hdfs://, s3a://) are trusted
        # as listed — a wrong guess there would force an O(table)
        # re-list per batch AND never resolve, the worst of both
        lp = reader.local_path(path)
        return True if lp is None else os.path.exists(lp)

    out: dict[str, str] = {}
    missing: list[str] = []
    local_root = reader.local_path(input_path)
    for p in parts:
        cand = os.path.join(local_root, f"{p}.parquet") if local_root else None
        if cand is not None and os.path.exists(cand):
            out[p] = cand
        else:
            missing.append(p)
    if missing:
        listed = cache.get("parts")
        # a cached entry whose local file has vanished is STALE, not
        # resolved — feeding a dead path to the footer reader would
        # kill the stream instead of hitting the skip-commit branch
        if listed is None or any(
            p not in listed or not _alive(listed[p]) for p in missing
        ):
            listed = cache["parts"] = reader.list_parts(spark, input_path)
        for p in missing:
            f = listed.get(p)
            if f is not None and _alive(f):
                out[p] = f
            # else: unresolved -> caller skips the manifest commit
    return out


def _process_batch(spark: SparkSession, conf: PipelineConf, batch_df: DataFrame,
                   batch_id: int, cache: dict | None = None) -> None:
    """One micro-batch through parse -> enrich -> route -> ship -> cpt."""
    df = reader.with_partition_id(batch_df)
    df = parse_stage(df, conf.grok)
    if conf.lookup_path:
        lookup = spark.read.parquet(conf.lookup_path)
        df = enrich_stage(df, lookup, defaults=conf.enrich_defaults)
    # schema parity with the batch pipeline's sinks: the same per-row
    # content hash ships WITH the data, so batch and streaming runs
    # against the same sink paths stay single-schema.
    df = df.withColumn("row_hash", F.xxhash64("doc_id", "tok_hash")).persist()
    try:
        from llogtail_spark.operators.aggregate import pipeline_stats

        # ONE stats job per micro-batch for per-sink lineage counts.
        stats = {r["part"]: r for r in pipeline_stats(df, conf.sinks).collect()}
        # input identity from parquet FOOTER metadata — the SAME
        # definition validate_manifest recomputes (a content-hash
        # in_checksum here would make every streamed entry look
        # stale). batch_df.inputFiles() is empty for streaming frames,
        # so resolve only THIS batch's parts to files (O(batch) work).
        batch_files = _resolve_batch_files(
            spark, conf.input_path, list(stats), cache if cache is not None else {}
        )
        in_ids = reader.files_identity(batch_files) if batch_files else {}
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
                if ins is None:
                    # identity unresolved (file vanished/renamed mid-
                    # batch): committing in_checksum=0 would create an
                    # entry validate_manifest always flags stale. Leave
                    # the part UNCOMMITTED — the sink write above is
                    # idempotent, so the reprocess on restart is exact.
                    print(
                        f"llogtail_spark: batch {batch_id} part {p!r} has no "
                        "resolvable input identity; skipping manifest commit",
                        file=sys.stderr,
                    )
                    continue
                mf.commit(
                    conf.manifest_dir,
                    mf.ManifestEntry(
                        sink=rule.name, part=p,
                        row_count=int(s[f"rc__{rule.name}"]),
                        tok_total=int(s[f"tt__{rule.name}"]),
                        checksum=int(s[f"ck__{rule.name}"]),
                        watermark_offset=int(ins[0]),
                        committed_at=conf.committed_at,
                        in_row_count=int(ins[0]),
                        in_checksum=int(ins[1]),
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
    cache: dict = {}  # per-stream part->file listing cache (fallback only)
    writer = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: _process_batch(spark, conf, bdf, bid, cache)
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


def stream_interval_join(
    purchases: DataFrame,
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
):
    """Stream-stream interval join: attach to each purchase the
    follow-on events of the same user within `horizon` — the
    streaming twin of the batch `range_join_purchase_window` query.

    Both sides carry watermarks and the join condition bounds event
    time on BOTH ends (p.ts < e.ts <= p.ts + horizon), which is what
    lets Spark evict join state: a buffered purchase can be dropped
    once the event-side watermark passes its horizon, so state is
    O(in-flight window), not O(stream). Without the time bound the
    state store grows forever — the streaming analog of an unbounded
    shuffle. llogtail anchor: the collector correlates lines only
    within a file's active tail window, never across the whole
    history (log_watcher.go tail loop).

    Returns (purchase_id, user_id, purchase_ts, event_id, event_ts);
    inner join — purchases with no follow-on events don't appear
    (counting them needs an outer interval join, which Spark emits
    only after watermark close; the batch twin covers that census).
    """
    p = (
        purchases.withWatermark(ts_col, watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col(key).alias("p_user"),
            F.col(ts_col).alias("p_ts"),
        )
    )
    e = (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col("event_id").alias("event_id"),
            F.col(key).alias("e_user"),
            F.col(ts_col).alias("e_ts"),
        )
    )
    return p.join(
        e,
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") > F.col("p_ts"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        F.col("p_ts").alias("purchase_ts"),
        "event_id",
        F.col("e_ts").alias("event_ts"),
    )
