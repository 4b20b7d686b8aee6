"""Compare a bench queries map against the r05 baseline (per-query
best-of values), flagging movers beyond a noise band.

Usage: python tools/compare_bench.py [--band 0.15] [NEW.json]
NEW.json defaults to BENCH/queries_latest.json; the baseline is the
parsed r05 map committed in BENCH_r05.json (queries_min).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("new", nargs="?",
                    default=os.path.join(REPO, "BENCH", "queries_latest.json"))
    ap.add_argument("--band", type=float, default=0.15)
    args = ap.parse_args()

    with open(os.path.join(REPO, "BENCH_r05.json")) as f:
        base = json.load(f)["parsed"]["queries_min"]
    with open(args.new) as f:
        new = json.load(f)["queries"]

    rows = []
    for q, t in new.items():
        b = base.get(q)
        if b is None:
            continue
        rows.append((t / b, q, b, t))
    rows.sort()
    faster = [(r, q, b, t) for r, q, b, t in rows if r < 1 - args.band]
    slower = [(r, q, b, t) for r, q, b, t in rows if r > 1 + args.band]
    tot_b = sum(b for _, _, b, _ in rows)
    tot_t = sum(t for _, _, _, t in rows)
    print(f"queries compared: {len(rows)}; total {tot_b:.1f}s -> "
          f"{tot_t:.1f}s (ratio {tot_t / tot_b:.3f})")
    print(f"\nfaster than -{args.band:.0%}: {len(faster)}")
    for r, q, b, t in faster:
        print(f"  {q:32s} {b:7.3f} -> {t:7.3f}  ({r:.2f}x)")
    print(f"\nslower than +{args.band:.0%}: {len(slower)}")
    for r, q, b, t in slower:
        print(f"  {q:32s} {b:7.3f} -> {t:7.3f}  ({r:.2f}x)")


if __name__ == "__main__":
    main()
