"""Child process for the scaling bench: run the full pipeline at a
fixed local[N] parallelism over a pre-generated input, print one JSON
line with per-rep seconds. Fresh JVM per invocation so the two
parallelism levels are truly independent "cluster sizes"."""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--scratch", required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default="x")
    ap.add_argument("--warm-data", default=None,
                    help="small side fixture to warm on (same schema -> "
                         "identical plans/codegen/Arrow paths) so warmup "
                         "cost stays bounded at large --rows; default "
                         "warms on the measured input itself")
    args = ap.parse_args()

    from llogtail_spark.config import PipelineConf
    from llogtail_spark.operators.route import SinkRule
    from llogtail_spark.pipeline import run_pipeline
    from llogtail_spark.session import get_spark

    spark = get_spark(
        f"scaling-{args.cores}", cores=args.cores,
        shuffle_partitions=max(2 * args.cores, 16),
    )

    def make_conf(tag: str, base: str = args.data) -> PipelineConf:
        wd = os.path.join(args.scratch, f"work-{args.cores}-{args.tag}-{tag}")
        return PipelineConf(
            input_path=os.path.join(base, "sequences"),
            lookup_path=os.path.join(base, "lookup_sources.parquet"),
            workdir=wd,
            sinks=[
                SinkRule("errors", "level_num >= 40", os.path.join(wd, "out/errors")),
                SinkRule("warnings", "level_num >= 30 AND level_num < 40",
                         os.path.join(wd, "out/warnings")),
                SinkRule("firehose", "true", os.path.join(wd, "out/firehose")),
            ],
        )

    # thorough warm-up: python workers, JIT, Arrow init need several
    # passes before steady state (measured: first UDF stage pays ~10x).
    # With --warm-data, warmups run on the small side fixture: the
    # plans are identical (same schema, same DAG), so codegen/JIT/
    # Arrow/write-committer paths warm the same, and warmup cost no
    # longer scales with the measured input (the input itself sits on
    # tmpfs, so there is no page cache to pre-fill).
    from llogtail_spark.operators.parse import parse_stage

    warm_base = args.warm_data or args.data
    warm_df = parse_stage(spark.read.parquet(os.path.join(warm_base, "sequences")))
    for _ in range(3):
        warm_df.write.format("noop").mode("overwrite").save()
    for w in ("warmup0", "warmup1"):  # warm the full write/ship/commit path
        conf_w = make_conf(w, base=warm_base)
        run_pipeline(spark, conf_w)
        shutil.rmtree(conf_w.workdir, ignore_errors=True)

    times = []
    for i in range(args.reps):
        conf = make_conf(f"r{i}")
        t0 = time.time()
        run_pipeline(spark, conf)
        times.append(round(time.time() - t0, 3))
        shutil.rmtree(conf.workdir, ignore_errors=True)
        print(f"cores={args.cores} rep{i}: {times[-1]}s", file=sys.stderr, flush=True)

    print(json.dumps({"cores": args.cores, "times": times}), flush=True)


if __name__ == "__main__":
    main()
