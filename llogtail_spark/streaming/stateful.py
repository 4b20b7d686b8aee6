"""Custom stateful streaming operators (applyInPandasWithState).

debounce_stream is the Structured Streaming twin of llogtail's event
debounce (sendEvent suppresses repeat events of the same kind inside
the watcher filter interval, log_watcher.go:265-285): per key, emit an
event only if at least `interval_sec` has passed since the LAST
EMITTED event of that key; state (the last-emitted timestamp) persists
across micro-batches in the streaming state store.

Scale shape: state is one float per key, co-partitioned by the group
key (one shuffle); per-group logic runs over Arrow batches. This is
the pattern for any custom stateful operator Spark lacks — the batch
twin (dedup_debounce, a plain groupBy) verifies the semantics at rest.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def debounce_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    interval_sec: float = 1.0,
) -> DataFrame:
    """Keyed debounce over a streaming DataFrame. Emits the surviving
    rows (same schema as the input); suppressed repeats are dropped.
    Rows within one micro-batch are processed in event-time order."""
    out_schema = events.schema

    def fn(key, pdfs, state: GroupState):
        last = state.get[0] if state.exists else None
        batch = pd.concat(list(pdfs))
        # a debounce decision needs an event time: null-ts rows are
        # dropped (NaT.timestamp() would kill the whole query), same
        # as the batch twin's groupBy over a null key contributing
        # nothing to a keyed first-event decision
        batch = batch[batch[ts_col].notna()]
        if batch.empty:
            return
        batch = batch.sort_values(ts_col, kind="stable")
        mask = []
        for t in batch[ts_col]:
            tv = t.timestamp()
            if last is None or tv - last >= interval_sec:
                mask.append(True)
                last = tv
            else:
                mask.append(False)
        state.update((float(last),))
        yield batch.loc[mask]

    return events.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="last_emit double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
