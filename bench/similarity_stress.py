"""Similarity-family stress bench: embedding near-dup LSH at 100k
vectors with planted near-duplicates at a production threshold.

The sf-fixture near-dup query deliberately runs at a weak threshold
(cos >= 0.5) because the synthetic embeddings have no true near-dups;
at that operating point hyperplane LSH cannot prune (per-bit agreement
0.63 vs 0.5 background). This bench evidences the claim that matters
at 10^12 scale: at a PRODUCTION threshold (cos >= 0.9, the mass-dedup
case), the same plan shape — explode band keys, one equi-join, exact
rerank — prunes the pair space by orders of magnitude while keeping
recall ~1 on the planted duplicates.

Parameters are production-tuned (b=24 bits/band, 40 bands, multi-probe
hamming<=1): per planted pair at cos ~0.95 the per-band hit rate is
~0.29, so missing all 40 bands is ~1e-6; a random pair collides with
probability 40*25/2^24 ~ 6e-5, so 100k vectors (5e9 possible pairs)
yield only ~3e5 candidates for exact rerank.

Run: python bench/similarity_stress.py [--n 100000] [--dups 500]
Prints one JSON line with wall times, candidate counts, pruning
ratio, and recall; evidence recorded in BASELINE.md.
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

from llogtail_spark.operators.similarity import (
    embedding_near_dup_pairs_lsh,
    make_band_keys_udf,
)
from llogtail_spark.session import get_spark

DIM = 64
N_BITS = 24
N_BANDS = 40
PROBE = 1
SEED = 7
THRESHOLD = 9000  # cos >= 0.9


def build_fixture(n: int, dups: int, path: str) -> np.ndarray:
    """n base vectors + `dups` noisy copies (cos ~0.95). Returns the
    exact cosines of the planted pairs (numpy, for recall check)."""
    rng = np.random.default_rng(42)
    base = rng.standard_normal((n, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    src = base[:dups]
    noise = rng.standard_normal((dups, DIM))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    copies = src + 0.33 * noise  # cos ~ 1/sqrt(1+0.33^2) ~ 0.95
    copies /= np.linalg.norm(copies, axis=1, keepdims=True)
    planted_cos = np.einsum("ij,ij->i", src, copies)
    all_vecs = np.vstack([base, copies]).astype(np.float32)
    ids = np.arange(len(all_vecs), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array(list(all_vecs), pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, path + "/embeddings.parquet")
    return planted_cos


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dups", type=int, default=500)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="simstress_")
    try:
        planted_cos = build_fixture(args.n, args.dups, tmp)
        planted = {
            (i, args.n + i)
            for i in range(args.dups)
            if planted_cos[i] >= THRESHOLD / 10000
        }
        spark = get_spark("similarity_stress")
        emb = spark.read.parquet(tmp + "/embeddings.parquet")
        emb.cache().count()

        kw = dict(
            threshold_x10000=THRESHOLD,
            dim=DIM,
            n_bits=N_BITS,
            n_bands=N_BANDS,
            probe_hamming=PROBE,
            seed=SEED,
        )

        # candidate count before the exact filter (pruning evidence)
        keys_base = make_band_keys_udf(DIM, N_BITS, N_BANDS, SEED, 0)
        keys_probe = make_band_keys_udf(DIM, N_BITS, N_BANDS, SEED, PROBE)
        base = emb.select(
            F.col("vec_id").alias("id_b"),
            F.explode(keys_base("embedding")).alias("_key"),
        )
        probe = emb.select(
            F.col("vec_id").alias("id_a"),
            F.explode(keys_probe("embedding")).alias("_key"),
        )
        t0 = time.time()
        n_cand = (
            probe.join(base, "_key")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
            .count()
        )
        t_cand = time.time() - t0

        t0 = time.time()
        rows = embedding_near_dup_pairs_lsh(emb, **kw).collect()
        t_full = time.time() - t0

        found = {(r["id_a"], r["id_b"]) for r in rows}
        n_total = args.n + args.dups
        all_pairs = n_total * (n_total - 1) // 2
        hits = len(planted & found)
        out = {
            "n_vectors": n_total,
            "planted_pairs": len(planted),
            "recall_planted": round(hits / max(len(planted), 1), 4),
            "extra_pairs": len(found - planted),
            "candidates": n_cand,
            "all_pairs": all_pairs,
            "pruning_x": round(all_pairs / max(n_cand, 1), 1),
            "candidates_sec": round(t_cand, 2),
            "full_op_sec": round(t_full, 2),
            "params": {"bits": N_BITS, "bands": N_BANDS, "probe": PROBE},
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
