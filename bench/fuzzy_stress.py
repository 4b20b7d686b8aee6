"""fuzzy_join stress bench: the edit-distance similarity join at
~200k realistic-entropy strings, with planted near-duplicates and a
half-size run for a same-process linearity check.

The sf fixtures are ADVERSARIAL for q-gram filtering (a ~30-word
synthetic vocabulary yields only ~375 distinct trigrams corpus-wide,
so "rarest-gram" prefixes still collide constantly — the recorded
sf0.1 run verifies 3.8M candidates out of 12.5M possible pairs, a
mere 3.3x pruning). Real corpora (URLs, titles, names) have high
q-gram entropy, which is the regime the operator is built for. This
bench builds deterministic random-alphanumeric strings (the URL/id
shape), plants 1-2-edit neighbors for 10% of them, and reports:

- candidate pairs vs the all-pairs count (the pruning ratio — the
  number that decides whether the join survives 10^12 rows),
- recall: every planted neighbor pair must be found (the prefix
  lemma guarantees it; the bench proves the implementation does),
- wall time at N and N/2 + the ratio (near-2.0 == linear).

Run: python bench/fuzzy_stress.py [--n 200000]
Prints one JSON line; evidence recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from llogtail_spark.operators.dedup import (
    FJ_MAXDIST,
    FJ_Q,
    fuzzy_join,
    normalize_text,
    release_fuzzy_caches,
)
from llogtail_spark.session import get_spark

ALPHA = np.array(list(string.ascii_lowercase + string.digits))


def build(n: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    lens = rng.integers(12, 40, size=n)
    rows, planted = [], []
    did = 0
    for ln in lens:
        s = "".join(rng.choice(ALPHA, size=int(ln)))
        rows.append((did, s))
        base_id = did
        did += 1
        if rng.random() < 0.10:  # plant a <=2-edit neighbor
            t = list(s)
            for _ in range(int(rng.integers(1, FJ_MAXDIST + 1))):
                op = rng.choice(["s", "i", "d"])
                pos = int(rng.integers(0, len(t)))
                if op == "s":
                    t[pos] = str(rng.choice(ALPHA))
                elif op == "i":
                    t.insert(pos, str(rng.choice(ALPHA)))
                elif len(t) > FJ_Q + 1:
                    del t[pos]
            rows.append((did, "".join(t)))
            planted.append((base_id, did))
            did += 1
    return rows, planted


def candidates_only(spark, df, q=FJ_Q):
    """Count candidate pairs the prefix filter admits (pre-verify) —
    replicates fuzzy_join's candidate subtree."""
    from pyspark.sql import Window as W

    p = FJ_MAXDIST * q + 1
    docs = df.select(F.col("doc_id").alias("_id"),
                     normalize_text("text").alias("_s")) \
        .where(F.length("_s") >= q)
    grams = docs.select("_id", F.explode(F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.length("_s") - q + 1),
        lambda i: F.col("_s").substr(i, F.lit(q))))).alias("gram"))
    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    ranked = (grams.join(freq, "gram")
              .withColumn("rn", F.row_number().over(
                  W.partitionBy("_id").orderBy("df", "gram")))
              .where(F.col("rn") <= p).select("_id", "gram"))
    return (ranked.alias("a").join(ranked.alias("b"), "gram")
            .where(F.col("a._id") < F.col("b._id"))
            .select(F.col("a._id").alias("x"), F.col("b._id").alias("y"))
            .distinct().count())


def run(spark, n: int, q: int = FJ_Q) -> dict:
    rows, planted = build(n)
    df = spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(32).cache()
    df.count()
    t0 = time.time()
    out = fuzzy_join(df, q=q).collect()
    wall = time.time() - t0
    release_fuzzy_caches()
    got = {(r["doc_a"], r["doc_b"]) for r in out}
    missed = [p for p in planted if p not in got]
    n_cand = candidates_only(spark, df, q=q)
    total = len(rows)
    all_pairs = total * (total - 1) // 2
    df.unpersist()
    return {
        "n_strings": total,
        "planted": len(planted),
        "found_pairs": len(got),
        "planted_missed": len(missed),
        "candidates": n_cand,
        "all_pairs": all_pairs,
        "pruning_x": round(all_pairs / max(n_cand, 1), 1),
        "wall_sec": round(wall, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--q", type=int, default=None,
                    help="q-gram length override (web-scale corpora "
                         "size q so |alphabet|^q >> gram density)")
    args = ap.parse_args()
    q = args.q if args.q else FJ_Q
    spark = get_spark()
    full = run(spark, args.n, q=q)
    half = run(spark, args.n // 2, q=q)
    out = {
        "q": q,
        "full": full,
        "half": half,
        "linearity_ratio": round(full["wall_sec"] / max(half["wall_sec"],
                                                        1e-9), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
