"""Per-query isolation harness (round 6) — guide §1.4/§1.5.

bench.py is FROZEN for measurement, so extra instrumentation lives
here: time any subset of the declared queries with the noop sink
(best-of-N after a warm run, jobs labelled via setJobDescription) and
dump `.explain("formatted")` plans for the judge's plan-claim checks
(plans/r06/<query>_<tag>.txt).

Usage:
  python bench_extra.py --queries triangle_counts,pagerank --reps 2
  python bench_extra.py --queries dup_token_spans --explain before
  python bench_extra.py --all --reps 2 --out /tmp/qtimes.json

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (master local[N] — parameterised, never
     hard-coded).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="",
                    help="comma-separated query names")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=2,
                    help="timed reps (best-of, after 1 warm)")
    ap.add_argument("--explain", default=None, metavar="TAG",
                    help="dump explain('formatted') to "
                         "plans/r06/<query>_<TAG>.txt (no timing)")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from llogtail_spark.session import get_spark

    qs = entry.queries()
    names = list(qs) if args.all else [
        q for q in args.queries.split(",") if q]
    unknown = [q for q in names if q not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("bench-extra", cores=CPUS,
                      shuffle_partitions=max(2 * CPUS, 32))
    sc = spark.sparkContext
    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        if args.explain is not None:
            sc.setJobDescription(f"explain:{name}")
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            pdir = os.path.join(REPO, "plans", "r06")
            os.makedirs(pdir, exist_ok=True)
            path = os.path.join(pdir, f"{name}_{args.explain}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"{name}: plan -> {path}", file=sys.stderr)
            continue
        if not args.no_warm:
            sc.setJobDescription(f"warm:{name}")
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        best = None
        for rep in range(args.reps):
            sc.setJobDescription(f"timed:{name}:{rep}")
            t0 = time.time()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
        print(f"query {name}: {out[name]}s", file=sys.stderr)
        sc.setJobDescription(None)
    if out:
        line = json.dumps({"detail": "bench_extra", "sf_dir": SF_DIR,
                           "cpus": CPUS, "queries": out})
        print(line, flush=True)
        if args.out:
            with open(args.out, "w") as f:
                f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
