"""Benchmark harness. Prints ONE JSON line:

  {"metric": "routed_sequences_per_sec", "value": N, "unit": "seq/sec",
   "queries": {...per-query seconds...}, "sf": 0.1, ...}

Headline metric (BASELINE.md north rule): end-to-end routed
sequences/sec through the full parse -> enrich -> route -> ship ->
checkpoint pipeline over the deterministic synthetic token table
(rows scaled to sf: 3M * sf), fresh workdir per timed run.

Also times the individual operator queries from __spark_entry__.py
against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), forcing
full execution with the noop sink (no driver collect).

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (local[N]).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
# pipeline input sizing: at sf0.1 this is 1.6M rows — the SAME input
# size as BENCH/BASELINE.md's scaling runs, and large enough that the
# timed pass is >=3x the fixed per-run cost (3 Spark jobs, staging
# renames, manifest I/O). BENCH_r01's 2.7x headline gap vs baseline was
# mostly this fixed cost measured against a 5.3x smaller input.
SEQ_ROWS = max(int(16_000_000 * SF), 10_000)

# operator queries worth timing at bench scale (full set runs in the
# correctness gate; here we time the headline shapes)
BENCH_QUERIES = [
    "pipeline_route_fanout",
    "parse_grok_events",
    "enrich_broadcast_revenue",
    "agg_pricing_summary",
    "cube_counts",
    "topk_per_group",
    "window_first_event",
    "sessionize",
    "events_by_day",
    "json_extract_events",
    "text_token_stats",
    "text_fingerprint",
    "dedup_exact_docs",
    "decontaminate_docs",
    "embedding_topk",
    "minhash_lsh",
    "simhash",
    "ann_lsh",
    "ann_ivf",
    "semantic_dedup",
    "embedding_near_dup",
    "embedding_near_dup_p90",
    "dedup_resolve",
    "dedup_verified",
    "multimodal_stats",
    "ngram_top_bigrams",
    "text_repetition",
    "quality_filter_docs",
    "text_redact_pii",
    "sequence_packing",
    "sample_deterministic",
    "mixture_resample",
    "temperature_mixture",
    "dup_cluster_histogram",
    "stratified_sample_events",
    "boilerplate_strip",
    "token_budget_select",
    "corpus_shuffle_shards",
    "vocab_coverage",
    "bpe_merges",
    "corpus_profile",
    "bm25_topk",
    "source_overlap",
    "span_dedup",
    "length_quantiles",
    "dedup_novelty",
    "oov_rate",
    "cohort_retention",
    "funnel_counts",
    "context_chunks",
    "token_fertility",
    "char_diversity",
    "unigram_surprisal",
    "corpus_diff",
    "kmv_distinct",
    "rate_spikes",
    "interarrival_stats",
    "containment_pairs",
    "countmin_freq",
    "active_users_7d",
    "source_entropy",
    "token_pmi",
    "tfidf_topterms",
    "salted_event_rollup",
    "log_templates",
    "zorder_shards",
    "inverted_index",
    "pagerank",
    "scd2_intervals",
    "markov_transitions",
    "event_type_drift",
    "incremental_mv_merge",
    "k_anonymity",
    "bloom_prune_join",
    "time_weighted_avg",
    "star_join_q3",
    "heavy_hitters",
    "mad_outliers",
    "gram_matrix",
    "range_frame_sum",
    "locf_impute",
    "cdc_chunking",
    "global_ordinals",
    "dedup_keep_best",
    "null_safe_join",
    "user_type_profile",
    "conversion_latency",
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def host_probe() -> dict:
    """~2s single-thread host-health probe, embedded in the output JSON
    so every recorded bench carries evidence of the window it ran in
    (BASELINE.md documents reproducible 5-30% hypervisor-steal spikes
    and sibling-VM memory-bandwidth saturation on this sandbox).

    cpu_probe_sec: fixed pure-Python loop — healthy ~0.6s on this VM;
    >2s means heavy steal (measured 3.3s during a window where the
    same tree's pipeline reps ran 3x slow). membw_1t_gbs: 1-thread
    numpy triad — healthy ~8-15 GB/s; <1 means sibling saturation
    (measured 0.05 during the worst recorded window).
    """
    import numpy as np

    t0 = time.time()
    s = 0
    for i in range(10_000_000):
        s += i
    cpu_sec = time.time() - t0
    n = 12_500_000  # 3 x 100 MB arrays
    a = np.ones(n)
    b = np.ones(n)
    t0 = time.time()
    for _ in range(3):
        (a + 1.5 * b).sum()
    membw = (3 * 4 * n * 8) / (time.time() - t0) / 1e9
    return {"cpu_probe_sec": round(cpu_sec, 2), "membw_1t_gbs": round(membw, 1)}


def bench_pipeline(spark, tmp: str) -> dict:
    from llogtail_spark.config import PipelineConf
    from llogtail_spark.generate import write_fixture
    from llogtail_spark.operators.route import SinkRule
    from llogtail_spark.pipeline import run_pipeline

    data_dir = os.path.join(tmp, "data")
    n_files = max(CPUS * 2, 8)
    t0 = time.time()
    write_fixture(data_dir, SEQ_ROWS, seed=42, n_files=n_files)
    log(f"fixture: {SEQ_ROWS} rows / {n_files} files in {time.time()-t0:.1f}s")

    def make_conf(run_id: str) -> PipelineConf:
        wd = os.path.join(tmp, f"work-{run_id}")
        return PipelineConf(
            input_path=os.path.join(data_dir, "sequences"),
            lookup_path=os.path.join(data_dir, "lookup_sources.parquet"),
            workdir=wd,
            sinks=[
                SinkRule("errors", "level_num >= 40", os.path.join(wd, "out/errors")),
                SinkRule("warnings", "level_num >= 30 AND level_num < 40",
                         os.path.join(wd, "out/warnings")),
                SinkRule("firehose", "true", os.path.join(wd, "out/firehose")),
            ],
        )

    # warm-up (JIT, Arrow init, page cache)
    run_pipeline(spark, make_conf("warmup"))
    shutil.rmtree(os.path.join(tmp, "work-warmup"), ignore_errors=True)

    # best-of-3 timed reps: this host shows 5-30% hypervisor steal
    # spikes (see BASELINE.md) that can span a whole 2-rep window, so
    # the min of 3 is the engine's envelope (timeit convention)
    times = []
    routed = 0
    for rep in ("timed1", "timed2", "timed3"):
        t0 = time.time()
        run_pipeline(spark, make_conf(rep))
        times.append(time.time() - t0)
        routed = sum(
            e.row_count
            for e in __import__(
                "llogtail_spark.manifest", fromlist=["read_all"]
            ).read_all(make_conf(rep).manifest_dir)
        )
        shutil.rmtree(os.path.join(tmp, f"work-{rep}"), ignore_errors=True)
    elapsed = min(times)
    log(
        f"pipeline: {SEQ_ROWS} input rows, {routed} routed rows, "
        f"reps {[round(t, 1) for t in times]}s, best {elapsed:.1f}s"
    )
    return {
        "input_rows": SEQ_ROWS,
        "routed_rows": routed,
        "pipeline_sec": round(elapsed, 3),
        "reps_sec": [round(t, 3) for t in times],
        "input_seq_per_sec": round(SEQ_ROWS / elapsed, 1),
        "routed_seq_per_sec": round(routed / elapsed, 1),
    }


def bench_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entry

    qs = entry.queries()
    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        # time construction + execution together: iterative operators
        # (dedup_resolve) do their work eagerly at construction, so
        # timing only the final write would measure a checkpoint read
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()  # warm
        best = None
        for _ in range(2):  # best-of-2 timed: steal spikes (BASELINE.md)
            t0 = time.time()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
        log(f"query {name}: {out[name]}s")
    return out


def main() -> None:
    from llogtail_spark.session import get_spark

    host_before = host_probe()
    log(f"host probe (pre): {host_before}")
    spark = get_spark("bench", cores=CPUS, shuffle_partitions=max(2 * CPUS, 32))
    tmp = tempfile.mkdtemp(prefix="llogtail-bench-")
    try:
        pipe = bench_pipeline(spark, tmp)
        queries = bench_queries(spark)
        host_after = host_probe()
        log(f"host probe (post): {host_after}")
        result = {
            "metric": "routed_sequences_per_sec",
            "value": pipe["routed_seq_per_sec"],
            "unit": "seq/sec",
            "queries": queries,
            "sf": SF,
            "cpus": CPUS,
            "pipeline": pipe,
            "host": {"before": host_before, "after": host_after},
        }
        print(json.dumps(result), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
