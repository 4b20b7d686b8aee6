"""llogtail_spark — a PySpark-native batch log/telemetry pipeline.

A from-scratch reimagination of the semantics of noneback/llogtail
(a Go inotify log tailer, see /root/reference) as an idiomatic Spark
batch engine:

    tail   -> scan of an immutable parquet/Iceberg table of
              pre-tokenized sequences (doc_id, tokens, n_tok, source)
    frame  -> rows are pre-framed; the line-framing contract of
              buffer.go:87-116 becomes per-row token-array atomicity
    parse  -> vectorized grok/regex extraction over decoded token
              spans (Arrow pandas_udf, no per-row Python)
    enrich -> broadcast hash join on `source` against lookup tables
    route  -> named-sink fan-out driven by JSON rules
              (example/collector.json analog)
    ship   -> partitioned parquet writes, idempotent per partition
    cpt    -> per-partition lineage manifest (kCheckpoint analog,
              log_collector.go:35-40) written AFTER the sink commit
              (ordering per log_collector.go:208-215), enabling
              skip-committed resume via a left-anti join

Everything is DataFrame/SQL + built-in functions; pandas UDFs only
where Spark lacks the primitive (token decode + regex parse).
"""

from llogtail_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
