"""Checkpoint strategy shared by the iterative operators.

pagerank (indexing.py), global_ordinals (layout.py) and
resolve_components (dedup.py) all cut lineage with localCheckpoint so
each round re-reads a materialized table instead of re-deriving the
whole upstream subtree. localCheckpoint stores blocks on executors:
fast, zero config, but an executor loss mid-iteration kills the
lineage — fine on local[N], wrong at 1000-executor scale.

The knob is Spark's own: call `sc.setCheckpointDir(path)` (any
HDFS/S3/posix path all executors can reach) and `checkpoint(df)`
below switches to reliable `DataFrame.checkpoint`, which survives
executor loss. Unset (the local/test default), it stays
localCheckpoint. Reference anchor: llogtail persists its offset
checkpoints to durable storage for exactly this reason
(checkpoint.go:34-58).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_is_reliable(df: DataFrame) -> bool:
    """True iff the session has a reliable checkpoint dir configured
    (``sc.setCheckpointDir``)."""
    return df.sparkSession.sparkContext.getCheckpointDir() is not None


def checkpoint(df: DataFrame, eager: bool = False) -> DataFrame:
    """Cut lineage: reliable ``checkpoint()`` when the session has a
    checkpoint dir configured, else ``localCheckpoint()``. `eager`
    passes through — the iterative operators use lazy cuts so the
    round's convergence action materializes the checkpoint and no
    extra driver job is scheduled."""
    if checkpoint_is_reliable(df):
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
