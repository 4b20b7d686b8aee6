"""Two-parallelism-level scaling of the CORPUS pipeline (north rule:
efficiency >= 0.8 between N and 4N) — the bench/scaling.py discipline
applied to run_corpus_pipeline: identical input, separate JVMs at
local[N] and local[4N], levels interleaved pair-by-pair so multi-
minute hypervisor drift cancels (see bench/scaling.py's rationale for
N=2 -> 4N=8: per-core throughput on this host is flat to ~8 heavy
cores and memory-bandwidth/steal-limited beyond, so wider pairs would
measure the host, not the engine).

    pair_i = (T_N_i / T_4N_i) / 4;  efficiency = median(pair_i)

Usage: python bench/corpus_scaling.py [--rows 3200000] [--n 2]
                                      [--pairs 3] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = os.path.join(REPO, "bench", "corpus_bench.py")


def run_level(cores: int, rows: int, inp: str) -> float:
    out = subprocess.run(
        [sys.executable, WORKER, "--rows", str(rows), "--cpus", str(cores),
         "--input", inp, "--skip-probes"],
        capture_output=True, text=True, check=True, cwd=REPO)
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return float(json.loads(last)["pipeline_sec"])


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=12_800_000)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="corpus-scaling-")
    inp = os.path.join(tmp, "input")
    try:
        subprocess.run(
            [sys.executable, WORKER, "--rows", str(args.rows),
             "--cpus", "32", "--input", inp, "--gen-only",
             "--skip-probes"],
            capture_output=True, text=True, check=True, cwd=REPO)
        n, n4 = args.n, 4 * args.n
        # one warm pair (JIT/page cache), discarded
        run_level(n4, args.rows, inp)
        pairs = []
        times: list[dict] = []
        for i in range(args.pairs):
            t_n = run_level(n, args.rows, inp)
            t_4n = run_level(n4, args.rows, inp)
            eff = (t_n / t_4n) / 4
            pairs.append(eff)
            times.append({"t_n_sec": round(t_n, 1),
                          "t_4n_sec": round(t_4n, 1),
                          "pair_eff": round(eff, 3)})
            print(f"pair {i}: T_{n}={t_n:.1f}s T_{n4}={t_4n:.1f}s "
                  f"eff={eff:.3f}", file=sys.stderr)
        result = {
            "metric": "corpus_scaling_efficiency",
            "rows": args.rows, "n": n, "n4": n4,
            "pairs": times,
            "efficiency_median": round(statistics.median(pairs), 3),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    line = json.dumps(result)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
