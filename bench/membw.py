"""Host memory-bandwidth probe (STREAM-triad-like) — separates the
engine's scaling from the host's shared memory bus.

Each worker thread runs an independent numpy triad a = b + s*c over
arrays far larger than LLC, so aggregate GB/s at T threads measures
the bus ceiling the Spark executors share at local[T]. The triad
moves 3 arrays per iteration (2 reads + 1 write, 24 bytes/element).
numpy releases the GIL inside the ufunc loop, so threads genuinely
contend for the bus like executor task threads do.

Usage: python bench/membw.py [--threads 1,2,4,8,16,32] [--mb 512]
Prints one JSON line: {"threads": {...aggregate_GBps...},
"per_core": {...}, "scaling_vs_1": {...}}.
"""

from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np


def triad(n_elem: int, seconds: float, out: list, idx: int, gate) -> None:
    # pre-fault every page BEFORE timing (first-touch page faults and
    # allocation otherwise dominate the measurement on this host) and
    # use out= so no temp array allocates inside the loop
    a = np.zeros(n_elem)
    b = np.full(n_elem, 1.5)
    c = np.full(n_elem, 0.5)
    np.add(b, c, out=a)  # warm all three
    gate.wait()  # all threads start contending together
    reps = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        np.add(b, c, out=a)  # STREAM 'add': 2 reads + 1 write
        reps += 1
    dt = time.perf_counter() - t0
    out[idx] = reps * n_elem * 24 / dt / 1e9  # GB/s this thread


def run(threads: int, mb: int, seconds: float) -> float:
    n_elem = mb * 1024 * 1024 // 8
    out = [0.0] * threads
    gate = threading.Barrier(threads)
    ts = [
        threading.Thread(target=triad, args=(n_elem, seconds, out, i, gate))
        for i in range(threads)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return sum(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", default="1,2,4,8,16,32")
    ap.add_argument("--mb", type=int, default=256, help="array MB per thread")
    ap.add_argument("--seconds", type=float, default=3.0)
    args = ap.parse_args()
    levels = [int(x) for x in args.threads.split(",")]
    agg = {}
    for t in levels:
        agg[t] = round(run(t, args.mb, args.seconds), 2)
    base = agg[levels[0]] / levels[0]
    print(json.dumps({
        "triad_aggregate_GBps": agg,
        "per_core_GBps": {t: round(v / t, 2) for t, v in agg.items()},
        "scaling_vs_1thread": {t: round(v / (base * t), 3) for t, v in agg.items()},
    }))


if __name__ == "__main__":
    main()
