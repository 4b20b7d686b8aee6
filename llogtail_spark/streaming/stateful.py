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


def session_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_sec: float = 1800.0,
    timeout_sec: float | None = None,
) -> DataFrame:
    """Streaming session assembly: per key, group events into maximal
    runs with inter-event gaps <= gap_sec and emit each session AS IT
    CLOSES — the streaming twin of the batch `sessionize` query (same
    gap rule), and the canonical custom stateful operator Spark's
    built-in windows don't express (session length is data-defined,
    not clock-defined). llogtail analog: a watcher "session" is the
    burst of writes between idle gaps; the collector only sees bursts
    (log_watcher.go tail loop).

    A session closes when a LATER event of its key arrives more than
    gap_sec after the session's last event (event-driven close — exact
    and deterministic under per-key in-order arrival), or, if
    `timeout_sec` is set, when the key goes quiet for that long in
    processing time (liveness flush for abandoned keys;
    timing-dependent by nature, so tests pin only the event-driven
    path). Late data (an event older than the open session's end —
    there is no watermark) folds UNCONDITIONALLY into the open
    session: any event with ts <= the open session's end joins it via
    min(start) + count, no matter how far inside the session's span
    it lands (ADVICE r03 — the earlier virtual-chain variant could
    close a far-late event as its own 1-event session nested inside
    the open session's eventual span, producing overlapping sessions
    for one key). The session can therefore absorb an event that
    "should" have split it — conservative by design — and session_end
    never regresses, so later gap decisions stay consistent. The only
    remaining overlap source is an event arriving after its session
    already CLOSED (append mode cannot retract; documented
    no-watermark limitation). Open sessions otherwise stay in state —
    state is 3 numbers per key (start, last, n), co-partitioned by
    key.

    Per micro-batch the work is vectorized: gaps via diff, intra-batch
    session splits via cumsum, one pandas groupby — no per-row Python
    beyond the single state merge.

    Output: key_cols + (session_start, session_end, n_events).
    """
    from pyspark.sql import types as T

    key_fields = [events.schema[c] for c in key_cols]
    out_schema = T.StructType(
        list(key_fields)
        + [
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        def emit(rows):
            # state/arithmetic run in integer MICROseconds (exact in a
            # double up to year ~2255; float seconds would round-trip
            # through ns and fail Arrow's lossless us cast)
            return pd.DataFrame(
                [
                    dict(zip([f.name for f in key_fields], key))
                    | {
                        "session_start": pd.Timestamp(int(s), unit="us"),
                        "session_end": pd.Timestamp(int(e), unit="us"),
                        "n_events": n,
                    }
                    for (s, e, n) in rows
                ]
            )

        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield emit([(s, e, int(n))])
            return

        batch = pd.concat(list(pdfs))
        batch = batch[batch[ts_col].notna()]
        if batch.empty:
            if timeout_sec is not None and state.exists:
                state.setTimeoutDuration(int(timeout_sec * 1000))
            return
        import numpy as np

        ts = (
            batch[ts_col].sort_values(kind="stable").astype("int64") // 1000
        ).to_numpy()
        gap_us = gap_sec * 1e6
        closed = []
        # Late-data rule (docstring): every event with ts <= the open
        # session's end folds straight into the open session (min
        # start + count; end unchanged since they're all <= e0). The
        # remaining FRESH events are a strictly-after-e0 suffix, so
        # the open session's end participates in the gap chain as a
        # plain zero-count prefix element and the close rule is exact.
        vpos = -1
        if state.exists:
            s0, e0, n0 = state.get
            n_late = int(np.searchsorted(ts, e0, side="right"))
            if n_late:
                s0 = min(float(s0), float(ts[0]))  # ts sorted asc
                n0 = int(n0) + n_late
                ts = ts[n_late:]
            if len(ts) == 0:
                state.update((float(s0), float(e0), int(n0)))
                if timeout_sec is not None:
                    state.setTimeoutDuration(int(timeout_sec * 1000))
                return
            if ts[0] - e0 <= gap_us:
                vpos = 0
                ts = np.insert(ts, 0, e0)
            else:
                closed.append((float(s0), float(e0), int(n0)))
        cnt = np.ones(len(ts), dtype=np.int64)
        if vpos >= 0:
            cnt[vpos] = 0
        breaks = (pd.Series(ts).diff() > gap_us).to_numpy()
        # session groups: [start_idx, end_idx) spans over the chain
        starts = np.flatnonzero(np.concatenate([[True], breaks[1:]]))
        ends = np.concatenate([starts[1:], [len(ts)]])
        sessions = [
            (float(ts[a]), float(ts[b - 1]), int(cnt[a:b].sum()))
            for a, b in zip(starts, ends)
        ]
        if vpos >= 0:
            # merge the open session into the first span (it holds
            # the zero-count prefix element; min start folds s0 in)
            vs, ve, vn = sessions[0]
            sessions[0] = (min(float(s0), vs), ve, vn + int(n0))
        closed.extend(sessions[:-1])
        s, e, n = sessions[-1]
        state.update((float(s), float(e), int(n)))
        if timeout_sec is not None:
            state.setTimeoutDuration(int(timeout_sec * 1000))
        if closed:
            yield emit(closed)

    return events.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="start double, last double, n long",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_sec is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def running_totals_stream(
    events: DataFrame,
    key_col: str = "sink",
    n_col: str = "n_tok",
):
    """Live per-key running totals (row count + token sum) via Spark
    4's transformWithStateInPandas — the arbitrary-state API that
    replaces applyInPandasWithState (typed state handles, RocksDB
    state store, update-mode emission). This is llogtail's per-sink
    counters (collector.go:125-174) as a LIVE stream: every
    micro-batch emits each touched key's new cumulative totals.

    State per key is one (rows, toks) ValueState pair; only keys
    present in the micro-batch are touched or emitted. Requires the
    RocksDB state store provider (set in the writeStream conf or
    session; the test pins it) AND the google.protobuf package (the
    transformWithState state-server protocol): this container lacks
    protobuf, so the test is importorskip-gated the same way the
    iceberg round-trip is jar-gated. applyInPandasWithState
    (session_stream/debounce_stream above) remains the
    container-runnable stateful path.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = (
        f"{key_col} string, row_count long, tok_total long"
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "row_count long, tok_total long"
            )

        def handleInputRows(self, key, rows, timerValues):
            add_rows = 0
            add_toks = 0
            for pdf in rows:
                add_rows += len(pdf)
                add_toks += int(pdf[n_col].fillna(0).sum())
            prev = self._totals.get()
            if prev is not None:
                add_rows += int(prev[0])
                add_toks += int(prev[1])
            self._totals.update((add_rows, add_toks))
            yield pd.DataFrame({
                key_col: [key[0]],
                "row_count": [add_rows],
                "tok_total": [add_toks],
            })

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
