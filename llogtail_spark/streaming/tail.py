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

IN-PLACE ROTATION (log_watcher.go:228-261): Spark's file-stream
source assumes files are IMMUTABLE once seen, so a file rewritten in
place under a running stream would stay shipped with its OLD content
forever. Two coverage modes:
- default (rescan=False): the BATCH path's identity validation
  (pipeline.validate_manifest + footer identity) detects and
  reprocesses the replaced partition on the next batch run. The
  stream itself never re-ships, which preserves the strict
  O(batch)-per-trigger driver-work guarantee
  (test_stream_identity_work_is_per_batch_not_per_table) — the right
  default under the north rule's immutable token-table partitions.
- rescan=True: `rescan_rewritten` runs after each micro-batch — the
  live-loop twin of the reference's rotation branch. Stat-gated
  (O(table) stats per trigger, the poller cadence; footer reads only
  O(changed)), it re-ships exactly the rewritten partitions through
  the same stages with the same idempotent per-partition overwrite +
  manifest recommit. For landing dirs fed by rewriting writers.
Writers that rotate files INTO the directory (create-then-move) are
handled by both modes without rescan.
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


def _run_stages(spark: SparkSession, conf: PipelineConf, df: DataFrame) -> DataFrame:
    """The shared parse -> enrich -> hash stage chain (batch parity)."""
    df = reader.with_partition_id(df)
    df = parse_stage(df, conf.grok)
    if conf.lookup_path:
        lookup = spark.read.parquet(conf.lookup_path)
        df = enrich_stage(df, lookup, defaults=conf.enrich_defaults)
    # schema parity with the batch pipeline's sinks: the same per-row
    # content hash ships WITH the data, so batch and streaming runs
    # against the same sink paths stay single-schema.
    return df.withColumn("row_hash", F.xxhash64("doc_id", "tok_hash"))


def _ship_and_commit(
    spark: SparkSession,
    conf: PipelineConf,
    df: DataFrame,
    in_ids_for,
    batch_label,
) -> dict:
    """Route `df` (already staged + persisted) to every sink and commit
    manifest rows. `in_ids_for(parts)` resolves the input identity for
    exactly the parts present — O(batch) work, never O(table)."""
    from llogtail_spark.operators.aggregate import pipeline_stats

    # ONE stats job per micro-batch for per-sink lineage counts.
    stats = {r["part"]: r for r in pipeline_stats(df, conf.sinks).collect()}
    in_ids = in_ids_for(list(stats)) if stats else {}
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
                    f"llogtail_spark: batch {batch_label} part {p!r} has no "
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
    return stats


def _process_batch(spark: SparkSession, conf: PipelineConf, batch_df: DataFrame,
                   batch_id: int, cache: dict | None = None) -> None:
    """One micro-batch through parse -> enrich -> route -> ship -> cpt."""
    df = _run_stages(spark, conf, batch_df).persist()
    batch_files: dict[str, str] = {}
    try:
        # input identity from parquet FOOTER metadata — the SAME
        # definition validate_manifest recomputes (a content-hash
        # in_checksum here would make every streamed entry look
        # stale). batch_df.inputFiles() is empty for streaming frames,
        # so resolve only THIS batch's parts to files (O(batch) work).
        def _in_ids(parts: list[str]) -> dict:
            batch_files.update(_resolve_batch_files(
                spark, conf.input_path, parts,
                cache if cache is not None else {},
            ))
            return reader.files_identity(batch_files) if batch_files else {}

        _ship_and_commit(spark, conf, df, _in_ids, batch_id)
    finally:
        df.unpersist()
    if cache is not None and cache.get("rescan"):
        ledger = cache.setdefault("ledger", {})
        # seed the ledger with this batch's just-committed files so the
        # rescan's footer reads stay O(changed), not O(committed)
        for p, f in batch_files.items():
            ledger[p] = _stat_of(f)
        rescan_rewritten(spark, conf, ledger)


def _stat_of(path: str):
    """(mtime_ns, size) for a local file, None when not statable
    (remote URI or vanished) — the cheap pre-filter before a footer
    read, the analog of the watcher's (dev, inode, size) check
    (utils.go:128-133)."""
    lp = reader.local_path(path)
    if lp is None:
        return None
    try:
        st = os.stat(lp)
    except OSError:
        return None
    return (st.st_mtime_ns, st.st_size)


def rescan_rewritten(spark: SparkSession, conf: PipelineConf,
                     ledger: dict | None = None) -> list[str]:
    """Detect and re-ship input partitions REWRITTEN IN PLACE under a
    running stream — the streaming twin of llogtail's in-place
    rotation branch (log_watcher.go:228-261) and of the batch path's
    validate_manifest, run on the poller cadence.

    Spark's file-stream source never re-delivers a seen path, so a
    file rewritten in place would otherwise keep its OLD content in
    every sink forever. This rescan stat-scans the input dir (O(table)
    driver stat() calls — the poller analog, metadata only), footer-
    reads only parts whose stat moved since the ledger saw them
    (O(changed); a cold ledger — fresh stream or restart — pays one
    metadata-only footer sweep over committed parts, exactly the
    batch validate_manifest cost), and pushes just the rewritten
    files through the same parse -> enrich -> route -> ship -> commit
    stages. Per-partition dynamic overwrite + manifest recommit make
    it idempotent. A file mid-rewrite (unreadable footer) is skipped
    this round and re-checked next rescan — the writer is still
    active, the same wait-for-quiesce the watcher applies to a file
    growing under its tail.

    Returns the sorted list of re-shipped partition ids."""
    entries = mf.read_all(conf.manifest_dir)
    by_part: dict[str, mf.ManifestEntry] = {}
    for e in entries:
        by_part.setdefault(e.part, e)  # input identity is per-part, not per-sink
    if not by_part:
        return []
    local_root = reader.local_path(conf.input_path)
    if local_root is None:
        # loud, never silent: a remote landing dir can't be stat-scanned
        # driver-side; schedule pipeline.validate_manifest + run_pipeline
        # (or an Iceberg snapshot-diff feed) instead.
        raise NotImplementedError(
            "rescan_rewritten requires a local input dir; for remote "
            "landing dirs run the batch validate path on a schedule"
        )
    ledger = {} if ledger is None else ledger
    changed: dict[str, str] = {}
    ids: dict[str, tuple[int, int]] = {}
    for name in sorted(os.listdir(local_root)):
        if not name.endswith(".parquet"):
            continue
        part = reader.part_of(name)
        e = by_part.get(part)
        if e is None:
            continue  # never shipped — the file source will deliver it
        path = os.path.join(local_root, name)
        st = _stat_of(path)
        if st is not None and ledger.get(part) == st:
            continue  # stat unchanged since last look: no footer read
        try:
            rc, ck = reader.file_identity(path)
        except Exception:
            # truncated/in-flight rewrite: drop the ledger entry so the
            # next rescan re-checks once the writer quiesces
            ledger.pop(part, None)
            continue
        ledger[part] = st
        if not mf.validate(e, rc, ck):
            changed[part] = path
            ids[part] = (rc, ck)
    if changed:
        df = _run_stages(
            spark, conf, reader.read_files(spark, list(changed.values()))
        ).persist()
        try:
            _ship_and_commit(
                spark, conf, df,
                lambda parts: {p: ids[p] for p in parts if p in ids},
                "rescan",
            )
        finally:
            df.unpersist()
    return sorted(changed)


def stream_pipeline(
    spark: SparkSession,
    conf: PipelineConf,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    rescan: bool = False,
):
    """Start the streaming tail. Returns the StreamingQuery.

    available_now=True drains all currently-visible files then stops
    (deterministic for tests); False runs continuously.
    rescan=True additionally runs `rescan_rewritten` after each
    micro-batch — in-place-rewritten files are detected and re-shipped
    by the stream itself (see module header for the trade).
    """
    opts = {}
    if max_files_per_trigger:
        opts["maxFilesPerTrigger"] = str(max_files_per_trigger)
    stream = (
        spark.readStream.schema(SEQUENCES_SCHEMA)
        .options(**opts)
        .parquet(conf.input_path)
    )
    # per-stream part->file listing cache (fallback only) + the
    # rescan flag/ledger when in-place rotation handling is on
    cache: dict = {"rescan": True} if rescan else {}
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
