"""Corpus-prep stress bench: boilerplate removal, token-budget
selection, and shard shuffle at ~1M documents, with a half-size run
for a same-process linearity check.

The sf fixtures cap at 5k documents, which measures job overhead,
not the operators. This bench builds a deterministic ~50M-token
corpus with web-realistic boilerplate (a Zipf-ish pool of shared
footers, some appearing in thousands of documents — the hot-chunk
case) and reports:

- boilerplate_strip wall time at N and N/2 docs + the ratio
  (near-2.0 == linear; the chunk-frequency agg and membership join
  are both chunk-key hash operations, so nothing is quadratic),
- chunk counts / stripped fraction (the op must actually fire),
- token_budget_select and corpus_shuffle_shards wall times at N.

Run: python bench/corpus_stress.py [--n 1000000]
Prints one JSON line; evidence recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from llogtail_spark.operators.corpus import (
    boilerplate_strip,
    corpus_shuffle_shards,
    doc_chunks,
    token_budget_select,
)
from llogtail_spark.session import get_spark

VOCAB = [f"w{i}" for i in range(5000)]
N_FOOTERS = 200  # shared boilerplate pool, Zipf-ish popularity


def build_fixture(n: int, path: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    vocab = np.array(VOCAB)
    # footers: 8 tokens each (2 chunks at CHUNK_TOKENS=4)
    footers = [
        " ".join(rng.choice(vocab, size=8)) for _ in range(N_FOOTERS)
    ]
    # Zipf popularity: footer k attaches to ~ n/(10*(k+1)) docs
    pop = (n / (10.0 * (np.arange(N_FOOTERS) + 1))).astype(int)
    writer = None
    batch = 50_000
    for start in range(0, n, batch):
        m = min(batch, n - start)
        lens = rng.integers(24, 72, size=m)
        rows_text = []
        for i in range(m):
            body = " ".join(rng.choice(vocab, size=lens[i]))
            # attach footer f with prob pop[f]/n each (approximate by
            # one draw: a doc gets footer f iff hash bucket matches).
            # The periodicity keys on the GLOBAL doc index start+i so
            # attachment spreads over all ids, not per-batch repeats.
            f = int(rng.integers(0, 10 * N_FOOTERS))
            if f < N_FOOTERS and (start + i) % max(1, n // max(pop[f], 1)) == 0:
                body = body + " " + footers[f]
            elif f < 2 * N_FOOTERS:
                # common case: popular footers on many docs
                k = int(rng.zipf(1.5)) % N_FOOTERS
                body = body + " " + footers[k]
            rows_text.append(body)
        t = pa.table({
            "doc_id": pa.array(
                range(start, start + m), type=pa.int64()
            ),
            "text": pa.array(rows_text, type=pa.string()),
        })
        if writer is None:
            writer = pq.ParquetWriter(path, t.schema)
        writer.write_table(t)
    if writer:
        writer.close()


def timed(fn, reps: int = 2) -> float:
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="corpus_stress_")
    out: dict = {"n": args.n, "cpus": args.cpus}
    try:
        spark = get_spark("corpus-stress", cores=args.cpus)
        paths = {}
        for label, n in (("full", args.n), ("half", args.n // 2)):
            p = os.path.join(tmp, f"docs_{label}.parquet")
            t0 = time.time()
            build_fixture(n, p)
            out[f"gen_{label}_sec"] = round(time.time() - t0, 1)
            paths[label] = p

        dfs = {k: spark.read.parquet(p) for k, p in paths.items()}

        def run_strip(df):
            return (
                boilerplate_strip(df)
                .write.mode("overwrite").format("noop").save()
            )

        out["strip_half_sec"] = timed(lambda: run_strip(dfs["half"]))
        out["strip_full_sec"] = timed(lambda: run_strip(dfs["full"]))
        out["strip_scale_ratio"] = round(
            out["strip_full_sec"] / max(out["strip_half_sec"], 1e-9), 2
        )

        # the op must actually fire: chunk count + stripped fraction
        stats = boilerplate_strip(dfs["full"]).agg(
            F.sum("n_chunks").alias("chunks"),
            F.sum("n_kept").alias("kept"),
            F.count("*").alias("docs"),
            F.sum((F.col("n_kept") < F.col("n_chunks")).cast("int"))
            .alias("docs_stripped"),
        ).collect()[0]
        out["chunks_total"] = stats["chunks"]
        out["chunks_stripped"] = stats["chunks"] - stats["kept"]
        out["docs_stripped"] = stats["docs_stripped"]
        out["docs"] = stats["docs"]

        # hottest boilerplate chunk (the skew the agg must absorb)
        hot = (
            doc_chunks(dfs["full"]).groupBy("chunk")
            .agg(F.count_distinct("doc_id").alias("nd"))
            .agg(F.max("nd")).collect()[0][0]
        )
        out["hottest_chunk_docs"] = hot

        out["budget_full_sec"] = timed(
            lambda: token_budget_select(dfs["full"])
            .write.mode("overwrite").format("noop").save()
        )
        out["shuffle_full_sec"] = timed(
            lambda: corpus_shuffle_shards(dfs["full"])
            .write.mode("overwrite").format("noop").save()
        )

        # unigram surprisal: two token explodes (vocab+T / per-doc
        # scoring) + broadcast join + dim-sized terciles; half/full
        # ratio near 2.0 == linear in the corpus
        from llogtail_spark.operators.corpus import (
            corpus_diff,
            unigram_surprisal,
        )

        def with_src(df):  # the stress fixture has no source column
            return df.withColumn(
                "source", F.concat(F.lit("s"), F.col("doc_id") % 5))

        def run_surprisal(df):
            return (
                unigram_surprisal(with_src(df))
                .write.mode("overwrite").format("noop").save()
            )

        out["surprisal_half_sec"] = timed(lambda: run_surprisal(dfs["half"]))
        out["surprisal_full_sec"] = timed(lambda: run_surprisal(dfs["full"]))
        out["surprisal_scale_ratio"] = round(
            out["surprisal_full_sec"] / max(out["surprisal_half_sec"], 1e-9),
            2,
        )

        # snapshot diff at N docs/side: FULL OUTER SMJ on digests —
        # the synthetic version pair mirrors the queries() wrapper
        def run_diff(df):
            df = with_src(df)
            old = df.filter(F.col("doc_id") % 9 != 0)
            new = df.filter(F.col("doc_id") % 7 != 0).withColumn(
                "text",
                F.when(F.col("doc_id") % 5 == 0,
                       F.concat(F.col("text"), F.lit(" [amended]")))
                .otherwise(F.col("text")),
            )
            return (
                corpus_diff(old, new)
                .write.mode("overwrite").format("noop").save()
            )

        out["diff_half_sec"] = timed(lambda: run_diff(dfs["half"]))
        out["diff_full_sec"] = timed(lambda: run_diff(dfs["full"]))
        out["diff_scale_ratio"] = round(
            out["diff_full_sec"] / max(out["diff_half_sec"], 1e-9), 2
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
