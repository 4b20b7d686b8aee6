"""Scale-stress bench for the late-round-4 operator families:

- hll_sliding_dau at 5M events / 30 days / 20k users (window
  distinct stays inside the portable hash's documented ~3e4 domain
  ceiling): the exact trailing-7d distinct would re-touch every
  (user, day) pair per window; the sketch path must stay
  register-grid-sized. Reports wall time at N and N/2 (near-2.0
  ratio == linear in the scan) and estimate error vs an exact numpy
  recompute per day.
- doc_perplexity at 200k docs: the LM join carries bigram TYPES per
  doc, so wall time must scale with the corpus scan, not with
  instance counts. Reports wall at N and N/2 and coverage (every
  >=2-token doc scored).
- cm_join_size at 10M x 1M rows over overlapping zipf key domains:
  the sketches are 4x256 regardless of input; reports wall at N and
  N/2 and the Fast-AGMS estimate vs the exact join size (computed
  once in numpy). The plain count-min version of this estimator read
  500x over on this exact input (collision mass N_a*N_b/width); the
  signed version is unbiased and this bench records its actual
  relative error.

Run: python bench/newops_stress.py [--scale 1.0]
Prints one JSON line; evidence recorded in BENCH/ and BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from llogtail_spark.session import get_spark


def _events(spark, n: int, n_users: int, days: int = 30, seed: int = 3):
    rng = np.random.default_rng(seed)
    base = 1_700_000_000
    sec = base + rng.integers(0, days * 86400, size=n)
    # drifting user activity: user pool shifts over time so windows
    # genuinely differ day to day
    day = (sec - base) // 86400
    u = (rng.integers(0, n_users // 2, size=n) + day * (n_users // 60)) % n_users
    import pandas as pd

    pdf = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "sec": sec.astype(np.int64),
        "user_id": u.astype(np.int64),
    })
    return (
        spark.createDataFrame(pdf)
        .select(
            "event_id",
            F.col("sec").cast("timestamp").alias("ts"),
            "user_id",
        ),
        pdf,
    )


def stress_hll_sliding(spark, n: int) -> dict:
    from llogtail_spark.operators.sketches import hll_sliding_dau

    # distinct users per 7d window stays inside the portable-hash
    # domain ceiling (~3e4 — see kmv_distinct's collision caveat;
    # production swaps xxhash64): the stress tests the SCALE SHAPE
    # (5M events through one combinable register shuffle), not the
    # hash family's documented domain limit
    n_users = 20_000
    df, pdf = _events(spark, n, n_users)
    t0 = time.time()
    rows = hll_sliding_dau(df).collect()
    full_s = time.time() - t0
    t0 = time.time()
    # half run via filter, NOT limit(): limit collapses to one
    # partition and destroys the parallelism being measured
    hll_sliding_dau(df.where(F.col("event_id") < n // 2)).collect()
    half_s = time.time() - t0
    # exact trailing-7d distinct per day in numpy
    day = ((pdf["sec"] - 1_700_000_000) // 86400).to_numpy()
    users = pdf["user_id"].to_numpy()
    errs = []
    got = {r["day"] - 1_700_000_000 // 86400: r["est_distinct"] for r in rows}
    for d in sorted(set(day)):
        mask = (day >= d - 6) & (day <= d)
        exact = len(np.unique(users[mask]))
        est = got.get(d)
        if est is not None and exact:
            errs.append(abs(est - exact) / exact)
    return {
        "n_events": n, "n_users": n_users, "days": len(rows),
        "wall_s": round(full_s, 2), "half_s": round(half_s, 2),
        "ratio": round(full_s / max(half_s, 1e-9), 2),
        "mean_rel_err": round(float(np.mean(errs)), 4),
        "max_rel_err": round(float(np.max(errs)), 4),
    }


def stress_doc_perplexity(spark, n_docs: int) -> dict:
    from llogtail_spark.operators.corpus import (
        doc_perplexity, release_kn_caches,
    )

    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i}" for i in range(5000)])
    # zipf-ish doc lengths 20-200 over a 5k vocabulary
    import pandas as pd

    lens = rng.integers(20, 200, size=n_docs)
    toks = vocab[rng.integers(0, len(vocab), size=int(lens.sum()))]
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(toks[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    pdf = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                        "text": texts})
    df = spark.createDataFrame(pdf)
    t0 = time.time()
    cnt = doc_perplexity(df).count()
    full_s = time.time() - t0
    release_kn_caches()
    t0 = time.time()
    doc_perplexity(df.where(F.col("doc_id") < n_docs // 2)).count()
    half_s = time.time() - t0
    release_kn_caches()
    return {
        "n_docs": n_docs, "scored": cnt,
        "coverage": cnt == n_docs,
        "wall_s": round(full_s, 2), "half_s": round(half_s, 2),
        "ratio": round(full_s / max(half_s, 1e-9), 2),
    }


def stress_cm_join(spark, n_a: int) -> dict:
    from llogtail_spark.operators.sketches import cm_join_size

    rng = np.random.default_rng(5)
    n_b = n_a // 10
    import pandas as pd

    ka = rng.zipf(1.3, size=n_a) % 100_000
    kb = rng.integers(0, 120_000, size=n_b)
    dfa = spark.createDataFrame(pd.DataFrame({"k": ka.astype(np.int64)}))
    dfb = spark.createDataFrame(pd.DataFrame({"j": kb.astype(np.int64)}))
    t0 = time.time()
    rows = cm_join_size(dfa, "k", dfb, "j").collect()
    full_s = time.time() - t0
    t0 = time.time()
    cm_join_size(dfa.sample(0.5, seed=1), "k", dfb, "j").collect()
    half_s = time.time() - t0
    ca = np.bincount(ka)
    cb = np.bincount(kb, minlength=len(ca))[: len(ca)]
    true = int((ca.astype(np.int64) * cb.astype(np.int64)).sum())
    est = rows[0]["est"]
    return {
        "n_a": n_a, "n_b": n_b, "true_join": true, "est": int(est),
        "rel_err_pct": round(100 * abs(est - true) / max(true, 1), 1),
        "wall_s": round(full_s, 2), "half_s": round(half_s, 2),
        "ratio": round(full_s / max(half_s, 1e-9), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args()
    spark = get_spark("newops-stress")
    out = {
        "hll_sliding": stress_hll_sliding(spark, int(5_000_000 * args.scale)),
        "doc_perplexity": stress_doc_perplexity(
            spark, int(200_000 * args.scale)),
        "cm_join_size": stress_cm_join(spark, int(10_000_000 * args.scale)),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
