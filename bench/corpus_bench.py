"""Corpus-pipeline benchmark (VERDICT r04 #1 'Done' criterion): run
run_corpus_pipeline end-to-end at >= 12.8M synthetic documents and
record per-stage wall time, end-to-end docs/sec, the funnel, and the
resume-no-op cost.

The fixture is generated INSIDE Spark (pure JVM expressions over
spark.range — no Python in the generator), deterministic by doc_id,
with planted exact dups, near dups, low-quality docs, and
benchmark-contaminated docs at fixed modulus classes, so the funnel
at any scale is predictable and the dedup/decontaminate stages do
real work rather than scanning clean data.

Usage: python bench/corpus_bench.py [--rows N] [--out FILE]
Env:   SPARK_GRAFT_CPUS (local[N], default 32)
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

VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec",
]
LANGS = ["en", "zh", "es", "de", "fr"]


def synth_corpus(spark, n: int):
    """Deterministic document table (doc_id, text, lang, source,
    n_chars), all JVM-side expressions. Planted classes (checked
    after the benchmark-mod split, mirroring tests/test_corpus_
    pipeline.py's fixture at bench scale):
      - doc_id % 13 == 0 -> exact duplicate of doc_id - 1
      - doc_id % 17 == 0 -> near duplicate (trailing word changed)
      - doc_id % 11 == 0 -> too short (5 tokens)
      - doc_id % 19 == 0 -> repetitive (one token 40x)
      - doc_id % 23 == 0 -> PII (email appended)
    Base text: ~30 tokens; every 3rd token is doc-unique so organic
    cross-doc shingle overlap is zero (only planted dups collide)."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    langs = F.array(*[F.lit(x) for x in LANGS])

    def base_text(idc):
        # j in 1..30+id%5 ; token j: unique marker when j%3==2
        return F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(30) + (idc % 5).cast("int")),
                lambda j: F.when(
                    j % 3 == F.lit(2),
                    F.concat(F.lit("w"), idc.cast("string"),
                             F.lit("p"), j.cast("string")),
                ).otherwise(
                    F.element_at(
                        vocab,
                        (F.pmod(idc * 7 + j * j, F.lit(17)) + 1).cast("int"))
                ),
            ),
        )

    idc = F.col("id")
    base = base_text(idc)
    base_prev = base_text(idc - 1)
    near_prev = F.concat(
        F.regexp_replace(base_prev, r"\s\S+$", ""), F.lit(" zulu"))
    # benchmark doc contamination donor: the first 90 chars of doc
    # (id - id % 997)'s text — a deterministic in-range benchmark id
    # clamp below 997 so early contaminated docs still point at a
    # REAL benchmark doc (doc 997 is the first % 997 == 0 id in range)
    bench_id = F.greatest(idc - F.pmod(idc, F.lit(997)), F.lit(997))
    contam = F.concat(F.substring(base_text(bench_id), 1, 90),
                      F.lit(" "), base)
    text = (
        F.when(F.pmod(idc, F.lit(997)) == 0, base)
        .when(idc % 13 == 0, base_prev)
        .when(idc % 17 == 0, near_prev)
        .when(idc % 11 == 0,
              F.concat(F.lit("tiny doc number "), idc.cast("string"),
                       F.lit(" five")))
        .when(idc % 19 == 0,
              F.concat(F.concat_ws(" ", F.array_repeat(F.lit("spam"), 40)),
                       F.lit(" s"), idc.cast("string")))
        .when(idc % 23 == 0,
              F.concat(base, F.lit(" contact someone@example.com")))
        .when(idc % 29 == 0, contam)
        .otherwise(base)
    )
    return spark.range(1, n + 1).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.element_at(langs, (F.pmod(idc, F.lit(5)) + 1).cast("int"))
        .alias("lang"),
        F.lit("web").alias("source"),
        F.length(text).alias("n_chars"),
    )


if __name__ == "__main__":
    from llogtail_spark.session import get_spark
    from llogtail_spark.corpus_pipeline import CorpusConf, run_corpus_pipeline

    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=12_800_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--input", default=None,
                    help="reuse a pre-generated corpus dir (kept on "
                         "exit) — the corpus_scaling.py worker path")
    ap.add_argument("--gen-only", action="store_true",
                    help="generate the fixture into --input and exit")
    ap.add_argument("--skip-probes", action="store_true")
    args = ap.parse_args()

    from bench import host_probe  # subprocess probes (bench.py)

    probe_before = {} if args.skip_probes else host_probe()
    print(f"host probe (pre-JVM): {probe_before}", file=sys.stderr)

    spark = get_spark("corpus-bench", cores=args.cpus,
                      shuffle_partitions=max(2 * args.cpus, 64),
                      extra_conf={
                          # data-sized (not cluster-sized) shuffle
                          # partitions — see corpus_pipeline.py header.
                          # Measured on the 3.2M scaling profile:
                          # parallelism-first coalescing left exactly
                          # `cores` tasks per stage (zero slack, 2->8
                          # cores gave 2.3x); data-sized 8 MB targets
                          # restored 2.7x+ and cut T8 139->100 s.
                          "spark.sql.adaptive.coalescePartitions."
                          "parallelismFirst": "false",
                          "spark.sql.adaptive."
                          "advisoryPartitionSizeInBytes": "8m",
                      })
    tmp = tempfile.mkdtemp(prefix="corpus-bench-")
    result: dict = {"metric": "corpus_docs_per_sec", "rows": args.rows,
                    "cpus": args.cpus}
    try:
        t0 = time.time()
        inp = args.input or os.path.join(tmp, "input")
        if args.input is None or not os.path.isdir(inp) or args.gen_only:
            # production parquet: ~100k docs/file
            n_files = max(args.cpus * 2, args.rows // 100_000)
            synth_corpus(spark, args.rows).repartition(n_files) \
                .write.mode("overwrite").parquet(inp)
        gen_sec = time.time() - t0
        print(f"fixture: {args.rows} docs in {gen_sec:.1f}s", file=sys.stderr)
        if args.gen_only:
            spark.stop()
            sys.exit(0)

        conf = CorpusConf(
            input_path=inp,
            workdir=os.path.join(tmp, "wd"),
            out_path=os.path.join(tmp, "out"),
            benchmark_mod=997,  # eval sets are small: ~0.1% of corpus
            committed_at="bench",
        )
        t0 = time.time()
        res = run_corpus_pipeline(spark, conf)
        pipe_sec = time.time() - t0
        t0 = time.time()
        res2 = run_corpus_pipeline(spark, conf)
        noop_sec = time.time() - t0
        assert res2.stages_run == [] and res2.shards_committed == []
        result.update({
            "generate_sec": round(gen_sec, 1),
            "pipeline_sec": round(pipe_sec, 1),
            "noop_resume_sec": round(noop_sec, 1),
            "docs_per_sec": round(args.rows / pipe_sec, 1),
            "funnel": res.funnel,
            "stage_timings_sec": res.stage_timings,
            "shards": len(res.shards_committed),
        })
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    result["host"] = {"before": probe_before,
                      "after": {} if args.skip_probes else host_probe()}
    line = json.dumps(result)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
