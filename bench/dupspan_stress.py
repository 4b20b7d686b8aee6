"""dup_token_spans scale stress (VERDICT r04 #4): the ExactSubstr
span detector at 5x the round-4 stress size (2M docs / ~60M tokens
vs 400k/12M), with a half-size run for a same-process linearity
check — hunting for the memory cliff a 128 GiB single node can hide.

Fixture (pure JVM expressions, deterministic): 50k-word vocabulary,
~30 tokens/doc, a fixed 12-token span planted at offset 10 in 5% of
docs (the universal-footer hot-fingerprint regime: the hottest
fingerprint occurs in every 20th doc and must flow through the
map-side-combinable count+min-struct agg, never a reducer sort).

Run: python bench/dupspan_stress.py [--n 2000000]
Prints one JSON line; evidence recorded in BENCH/ + BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from llogtail_spark.operators.corpus import dup_token_spans  # noqa: E402

SPAN = " ".join(f"hot{j}" for j in range(12))  # the planted 12-token span
VOCAB_N = 50_000
DOC_TOKS = 30
CARRIER_MOD = 20  # 5% of docs carry the span


def synth(spark, n: int):
    idc = F.col("id")
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(DOC_TOKS)),
            lambda j: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(idc, j), F.lit(VOCAB_N)).cast("string")),
        ),
    )
    carrier = F.pmod(idc, F.lit(CARRIER_MOD)) == 0
    # carriers: first 10 tokens, the hot span, then the tail
    head = F.concat_ws(" ", F.slice(F.split(body, " "), 1, 10))
    tail = F.concat_ws(" ", F.slice(F.split(body, " "), 23, DOC_TOKS))
    text = F.when(carrier,
                  F.concat_ws(" ", head, F.lit(SPAN), tail)).otherwise(body)
    return spark.range(1, n + 1).select(
        idc.alias("doc_id"), text.alias("text"))


def run(spark, n: int) -> dict:
    df = synth(spark, n).repartition(64).persist()
    df.count()
    t0 = time.time()
    out = dup_token_spans(df)
    agg = out.agg(
        F.count(F.lit(1)).alias("docs_flagged"),
        F.sum("dup_tok").alias("dup_tok_total"),
    ).collect()[0]
    wall = time.time() - t0
    df.unpersist()
    carriers = n // CARRIER_MOD
    return {
        "n_docs": n,
        "carriers": carriers,
        "docs_flagged": int(agg["docs_flagged"]),
        "expect_flagged": carriers - 1,  # all but the first occurrence
        "dup_tok_total": int(agg["dup_tok_total"]),
        "wall_sec": round(wall, 2),
    }


if __name__ == "__main__":
    from llogtail_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    spark = get_spark("dupspan-stress", cores=args.cpus,
                      shuffle_partitions=max(2 * args.cpus, 32))
    full = run(spark, args.n)
    half = run(spark, args.n // 2)
    spark.stop()
    res = {
        "full": full, "half": half,
        "linearity_ratio": round(
            full["wall_sec"] / max(half["wall_sec"], 1e-9), 2),
    }
    line = json.dumps(res)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
