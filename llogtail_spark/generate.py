"""Deterministic synthetic fixture generator.

The reference's test fixtures are three log files filled with seeded
1 KB lines (log_watcher_test.go:18-20, :289-301). The tabular analog
here is a `sequences` table (doc_id, tokens, n_tok, source) of
pre-tokenized synthetic log lines, plus a small `lookup_sources`
enrichment table — all seeded, no wall-clock, reproducible anywhere
(tests, bench, executors).

Token vocabulary
----------------
The vocab is a pure function of the id (no data files, no broadcast
needed — any executor can rebuild it):

  ids 0..5        log levels  TRACE DEBUG INFO WARN ERROR FATAL
  ids 6..21       component names (auth, kernel, net, ...)
  ids 22..99      common message words
  ids 1000..1999  "code=<n>" tokens (give the grok stage real
                  digit-extraction work)
  everything else filler words "w<i>"

A generated line decodes to:  "<LEVEL> <component> <msg...>"
which the parse stage greps with a grok pattern.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 50257

LEVELS = ["TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL"]
LEVEL_NUMS = [0, 10, 20, 30, 40, 50]

COMPONENTS = [
    "auth", "kernel", "net", "db", "cache", "api", "sched", "io",
    "mem", "disk", "gpu", "fs", "rpc", "dns", "tls", "ui",
]

COMMON_WORDS = [
    "connection", "failed", "timeout", "retry", "request", "response",
    "user", "session", "packet", "dropped", "started", "stopped",
    "ok", "denied", "refused", "accepted", "host", "port", "bytes",
    "latency", "queue", "flush", "commit", "rollback", "read", "write",
    "open", "close", "seek", "offset", "rotate", "watch", "event",
    "modify", "rename", "remove", "discover", "buffer", "sink", "push",
    "checkpoint", "inode", "glob", "pattern", "line", "frame", "batch",
    "shard", "replica", "leader", "follower", "election", "heartbeat",
    "lease", "expired", "renewed", "snapshot", "compact", "merge",
    "split", "rebalance", "throttle", "backoff", "jitter", "probe",
    "healthy", "degraded", "unreachable", "resolved", "cached", "miss",
    "hit", "evict", "warm", "cold", "stale", "fresh", "sync", "async",
]

CODE_BASE = 1000
CODE_COUNT = 1000

_SOURCES = ["app.log", "error.log", "info.log", "warn.log"]
# skew fixture: one noisy source, like llogtail's one hot log file
_SOURCE_WEIGHTS = [0.70, 0.10, 0.10, 0.10]


def build_vocab() -> np.ndarray:
    """Full id->word table as a numpy unicode array (pure function)."""
    vocab = np.array([f"w{i}" for i in range(VOCAB_SIZE)], dtype=object)
    base = LEVELS + COMPONENTS + COMMON_WORDS
    vocab[: len(base)] = base
    codes = [f"code={i}" for i in range(CODE_COUNT)]
    vocab[CODE_BASE : CODE_BASE + CODE_COUNT] = codes
    return vocab


def _level_probs_for_source() -> dict[str, np.ndarray]:
    return {
        "app.log": np.array([0.05, 0.25, 0.45, 0.15, 0.08, 0.02]),
        "error.log": np.array([0.0, 0.0, 0.05, 0.15, 0.60, 0.20]),
        "info.log": np.array([0.10, 0.30, 0.55, 0.05, 0.0, 0.0]),
        "warn.log": np.array([0.0, 0.05, 0.15, 0.70, 0.08, 0.02]),
    }


def generate_sequences(
    n_rows: int,
    seed: int = 42,
    min_tok: int = 16,
    max_tok: int = 512,
    source_weights: list[float] | None = None,
    dup_fraction: float = 0.0,
) -> pa.Table:
    """Build the sequences table fully vectorized in numpy.

    source_weights overrides the default 70/10/10/10 source mix —
    the adversarial-skew fixture passes ~[0.9, ...] (one noisy log
    file, log_watcher.go:17's debounce regime). dup_fraction > 0
    additionally overwrites that fraction of rows with ONE identical
    token payload (a mass-duplicated message), spread evenly across
    the table so every partition holds copies of the hot row."""
    rng = np.random.default_rng(seed)
    weights = source_weights if source_weights is not None else _SOURCE_WEIGHTS
    src_idx = rng.choice(len(_SOURCES), size=n_rows, p=weights)
    sources = np.array(_SOURCES, dtype=object)[src_idx]

    # per-source running index -> stable doc_id encoding origin + order,
    # the analog of the per-file byte offset (collector.go:74-114)
    counters = np.zeros(n_rows, dtype=np.int64)
    for s in range(len(_SOURCES)):
        mask = src_idx == s
        counters[mask] = np.arange(mask.sum())
    doc_ids = np.array(
        [f"{s}:{c:08d}" for s, c in zip(sources, counters)], dtype=object
    )

    lengths = rng.integers(min_tok, max_tok + 1, size=n_rows)
    total = int(lengths.sum())

    # token 0: level (distribution conditioned on source)
    level_probs = _level_probs_for_source()
    level_tok = np.empty(n_rows, dtype=np.int32)
    for s, name in enumerate(_SOURCES):
        mask = src_idx == s
        level_tok[mask] = rng.choice(6, size=mask.sum(), p=level_probs[name])
    # token 1: component
    comp_tok = rng.integers(6, 6 + len(COMPONENTS), size=n_rows).astype(np.int32)

    # message body: mix of common words, code=NNN tokens, and filler
    body = rng.integers(22, VOCAB_SIZE, size=total, dtype=np.int32)
    is_code = rng.random(total) < 0.08
    body[is_code] = rng.integers(
        CODE_BASE, CODE_BASE + CODE_COUNT, size=int(is_code.sum()), dtype=np.int32
    )
    # keep non-code body out of the code id range so code extraction
    # is well-defined
    in_code_range = (~is_code) & (body >= CODE_BASE) & (body < CODE_BASE + CODE_COUNT)
    body[in_code_range] += CODE_COUNT

    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    body[offsets[:-1]] = level_tok
    body[offsets[:-1] + 1] = comp_tok

    if dup_fraction > 0:
        # every k-th row becomes a copy of row 0's payload (same
        # source, same tokens): k-th spacing puts hot copies in every
        # file/partition — the worst placement for a naive dedup
        k = max(int(round(1.0 / dup_fraction)), 1)
        hot = np.arange(0, n_rows, k)
        src0 = sources[0]
        sources[hot] = src0
        hot_len = int(lengths[0])
        hot_body = body[offsets[0]:offsets[0] + hot_len].copy()
        hot_set = np.zeros(n_rows, dtype=bool)
        hot_set[hot] = True
        lengths[hot] = hot_len
        # vectorized rebuild: target position -> (row, offset-in-row),
        # value from the hot payload or the old body slice
        new_offsets = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(lengths, out=new_offsets[1:])
        total_new = int(new_offsets[-1])
        pos_in_row = np.arange(total_new) - np.repeat(
            new_offsets[:-1], lengths)
        rep_hot = np.repeat(hot_set, lengths)
        src_idx2 = np.minimum(
            np.repeat(offsets[:-1], lengths) + pos_in_row, len(body) - 1)
        body = np.where(
            rep_hot, hot_body[np.minimum(pos_in_row, hot_len - 1)],
            body[src_idx2]).astype(np.int32)
        offsets = new_offsets

    # 64-bit offsets: a 10M-row fixture holds ~2.6B tokens, past
    # int32 ListArray offsets; parquet's LIST encoding is identical
    # either way, so readers (Spark: array<int>) see no difference
    tokens = pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), pa.array(body, type=pa.int32())
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(lengths.astype(np.int32), type=pa.int32()),
            "source": pa.array(sources, type=pa.string()),
        }
    )


def generate_lookup() -> pa.Table:
    """Broadcast enrichment table keyed on source.

    Includes a source that never appears in the data (ghost.log) and
    deliberately OMITS warn.log, so both unmatched-lookup and
    null-enrichment paths are exercised (the reference errors on
    unknown paths, log_watcher.go:288-291; we use left join + default).
    """
    rows = [
        ("app.log", "app", "platform", 0),
        ("error.log", "kernel", "sre", 30),
        ("info.log", "auth", "identity", 10),
        ("ghost.log", "unused", "nobody", 50),
    ]
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows]),
            "facility": pa.array([r[1] for r in rows]),
            "team": pa.array([r[2] for r in rows]),
            "min_level": pa.array([r[3] for r in rows], type=pa.int32()),
        }
    )


def write_fixture(out_dir: str, n_rows: int, seed: int = 42, n_files: int = 8,
                  source_weights: list[float] | None = None,
                  dup_fraction: float = 0.0) -> None:
    """Write sequences as n_files parquet files (the partition/resume
    unit — one file plays the role of one watched log file's byte
    range) plus the lookup table."""
    seq_dir = os.path.join(out_dir, "sequences")
    os.makedirs(seq_dir, exist_ok=True)
    table = generate_sequences(n_rows, seed=seed,
                               source_weights=source_weights,
                               dup_fraction=dup_fraction)
    per = (n_rows + n_files - 1) // n_files
    for i in range(n_files):
        chunk = table.slice(i * per, per)
        if chunk.num_rows == 0:
            continue
        pq.write_table(chunk, os.path.join(seq_dir, f"part-{i:05d}.parquet"))
    pq.write_table(generate_lookup(), os.path.join(out_dir, "lookup_sources.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows", type=int, default=3000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--files", type=int, default=8)
    args = ap.parse_args()
    write_fixture(args.out, args.rows, seed=args.seed, n_files=args.files)
    print(f"wrote {args.rows} rows / {args.files} files to {args.out}")


if __name__ == "__main__":
    main()
