"""Adversarial-skew benchmark (VERDICT r04 #3): the llogtail "one
noisy log" regime at bench scale — one source holding ~90% of rows
and one mass-duplicated payload — for BOTH pipelines, against the
uniform fixture on the same host, plus plan evidence that the
skew-absorbing machinery is engaged.

Why the log pipeline should be ~1.0x: its heavy pass is a single
stage with NO shuffle keyed on the hot column (scan -> Arrow parse ->
broadcast enrich -> route-explode -> write partitioned by (sink,
part)); the hot source rides broadcast joins and a file-partitioned
write, so there is no hot reducer BY CONSTRUCTION. The corpus
pipeline absorbs the mass-duplicated text in exact_dedup's
WindowGroupLimit (rank<=1 group-limits run map-side before the
shuffle, so the hot key moves O(partitions) rows, not O(copies)) and
caps LSH buckets via cap_reps.

Usage: python bench/skew_bench.py [--rows N] [--corpus-rows N]
                                  [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SKEW_WEIGHTS = [0.90, 0.04, 0.03, 0.03]
DUP_FRACTION = 0.15
HOT_TEXT = ("hot mass duplicated boilerplate message repeated across the "
            "whole corpus with enough tokens to clear the quality gate "
            "alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec")


def _time_log_pipeline(spark, tmp: str, rows: int, n_files: int,
                       weights, dup_fraction: float, tag: str) -> dict:
    from llogtail_spark import manifest as mfmod
    from llogtail_spark.config import PipelineConf
    from llogtail_spark.generate import write_fixture
    from llogtail_spark.operators.route import SinkRule
    from llogtail_spark.pipeline import run_pipeline

    data = os.path.join(tmp, f"data-{tag}")
    t0 = time.time()
    write_fixture(data, rows, seed=42, n_files=n_files,
                  source_weights=weights, dup_fraction=dup_fraction)
    gen = time.time() - t0

    def conf(run_id):
        wd = os.path.join(tmp, f"wd-{tag}-{run_id}")
        return PipelineConf(
            input_path=os.path.join(data, "sequences"),
            lookup_path=os.path.join(data, "lookup_sources.parquet"),
            workdir=wd,
            sinks=[
                SinkRule("errors", "level_num >= 40",
                         os.path.join(wd, "out/errors")),
                SinkRule("warnings", "level_num >= 30 AND level_num < 40",
                         os.path.join(wd, "out/warnings")),
                SinkRule("firehose", "true", os.path.join(wd, "out/firehose")),
            ],
        )

    run_pipeline(spark, conf("warm"))
    shutil.rmtree(os.path.join(tmp, f"wd-{tag}-warm"), ignore_errors=True)
    times = []
    routed = 0
    for rep in ("t1", "t2"):
        c = conf(rep)
        t0 = time.time()
        run_pipeline(spark, c)
        times.append(time.time() - t0)
        routed = sum(e.row_count for e in mfmod.read_all(c.manifest_dir))
        shutil.rmtree(os.path.join(tmp, f"wd-{tag}-{rep}"),
                      ignore_errors=True)
    shutil.rmtree(data, ignore_errors=True)
    best = min(times)
    return {"gen_sec": round(gen, 1), "pipeline_sec": round(best, 2),
            "reps_sec": [round(t, 2) for t in times],
            "routed_rows": routed,
            "routed_seq_per_sec": round(routed / best, 1)}


def _corpus_input(spark, path: str, rows: int, skewed: bool) -> None:
    from corpus_bench import synth_corpus

    df = synth_corpus(spark, rows)
    if skewed:
        idc = F.col("doc_id")
        text = F.when(F.pmod(idc, F.lit(10)) == 7, F.lit(HOT_TEXT)) \
            .otherwise(F.col("text"))
        langs = F.array(*[F.lit(x) for x in
                          ["en", "zh", "es", "de", "fr"]])
        df = df.select(
            "doc_id",
            text.alias("text"),
            # ~90% of docs land in one language group; the residual
            # 10% must still cycle ALL five target langs (id%10==9
            # implies id%5==4, so reusing the original lang would
            # leave only en+fr alive and zero the mixture quota)
            F.when(F.pmod(idc, F.lit(10)) < 9, F.lit("en"))
            .otherwise(F.element_at(
                langs,
                (F.pmod(F.floor(idc / 10), F.lit(5)) + 1).cast("int")))
            .alias("lang"),
            "source",
            F.length(text).alias("n_chars"),
        )
    n_files = max(64, rows // 100_000)
    df.repartition(n_files).write.mode("overwrite").parquet(path)


def _time_corpus(spark, tmp: str, rows: int, skewed: bool, tag: str) -> dict:
    from llogtail_spark.corpus_pipeline import CorpusConf, run_corpus_pipeline

    inp = os.path.join(tmp, f"cin-{tag}")
    t0 = time.time()
    _corpus_input(spark, inp, rows, skewed)
    gen = time.time() - t0
    conf = CorpusConf(
        input_path=inp,
        workdir=os.path.join(tmp, f"cwd-{tag}"),
        out_path=os.path.join(tmp, f"cout-{tag}"),
        benchmark_mod=997,
        committed_at="skew-bench",
    )
    t0 = time.time()
    res = run_corpus_pipeline(spark, conf)
    sec = time.time() - t0
    shutil.rmtree(inp, ignore_errors=True)
    shutil.rmtree(conf.workdir, ignore_errors=True)
    shutil.rmtree(conf.out_path, ignore_errors=True)
    return {"gen_sec": round(gen, 1), "pipeline_sec": round(sec, 1),
            "docs_per_sec": round(rows / sec, 1), "funnel": res.funnel,
            "stage_timings_sec": res.stage_timings}


def _plan_evidence(spark) -> dict:
    """Executed-plan proof that the skew absorbers are engaged."""
    from corpus_bench import synth_corpus
    from llogtail_spark.operators.dedup import exact_dedup
    from llogtail_spark.operators.enrich import enrich_stage

    docs = synth_corpus(spark, 10_000).withColumn(
        "text", F.when(F.pmod(F.col("doc_id"), F.lit(10)) == 7,
                       F.lit(HOT_TEXT)).otherwise(F.col("text")))
    dedup_plan = exact_dedup(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    lookup = spark.createDataFrame(
        [("web", 1)], "source string, weight int")
    enrich_plan = enrich_stage(
        docs.select(F.col("lang").alias("source"), "doc_id"), lookup,
        defaults={})._jdf.queryExecution().executedPlan().toString()
    return {
        "exact_dedup_window_group_limit":
            "WindowGroupLimit" in dedup_plan,
        "enrich_broadcast_join": "BroadcastHashJoin" in enrich_plan,
        "aqe_enabled":
            spark.conf.get("spark.sql.adaptive.enabled", "false"),
        "aqe_skew_join":
            spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "false"),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_600_000)
    ap.add_argument("--corpus-rows", type=int, default=3_200_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import host_probe

    from llogtail_spark.session import get_spark

    probe_before = host_probe()
    print(f"host probe (pre-JVM): {probe_before}", file=sys.stderr)
    spark = get_spark("skew-bench", cores=args.cpus,
                      shuffle_partitions=max(2 * args.cpus, 32))
    tmp = tempfile.mkdtemp(prefix="skew-bench-")
    try:
        n_files = max(args.cpus * 2, args.rows // 78_125)
        uni = _time_log_pipeline(spark, tmp, args.rows, n_files,
                                 None, 0.0, "uniform")
        print(f"log uniform: {uni}", file=sys.stderr)
        skw = _time_log_pipeline(spark, tmp, args.rows, n_files,
                                 SKEW_WEIGHTS, DUP_FRACTION, "skew")
        print(f"log skew: {skw}", file=sys.stderr)
        cuni = _time_corpus(spark, tmp, args.corpus_rows, False, "uniform")
        print(f"corpus uniform: {cuni}", file=sys.stderr)
        cskw = _time_corpus(spark, tmp, args.corpus_rows, True, "skew")
        print(f"corpus skew: {cskw}", file=sys.stderr)
        evidence = _plan_evidence(spark)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    result = {
        "metric": "skew_over_uniform_time_ratio",
        "rows": args.rows, "corpus_rows": args.corpus_rows,
        "cpus": args.cpus,
        "log_pipeline": {
            "uniform": uni, "skew": skw,
            "ratio": round(skw["pipeline_sec"] / uni["pipeline_sec"], 3),
        },
        "corpus_pipeline": {
            "uniform": cuni, "skew": cskw,
            "ratio": round(cskw["pipeline_sec"] / cuni["pipeline_sec"], 3),
        },
        "plan_evidence": evidence,
        "host": {"before": probe_before, "after": host_probe()},
    }
    line = json.dumps(result)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
