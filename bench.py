"""Benchmark harness.

stdout protocol (round 4 — BENCH_r03.json was unparseable because the
single output line grew past the driver's tail-capture window):
  line 1..k-1: full detail JSON lines (per-query timings, reps) —
               informational, also written to BENCH/queries_latest.json
  LAST line:   ONE COMPACT headline JSON
               {"metric": "routed_sequences_per_sec", "value": N,
                "unit": "seq/sec", "sf": ..., "cpus": ...,
                "pipeline": {...}, "host": {...}}
               — no per-query map, stays well under 1 KB so a
               tail-capture of any reasonable size parses it.

Headline metric (BASELINE.md north rule): end-to-end routed
sequences/sec through the full parse -> enrich -> route -> ship ->
checkpoint pipeline over the deterministic synthetic token table
(rows scaled to sf: 16M * sf), fresh workdir per timed run.

Also times the individual operator queries from __spark_entry__.py
against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), forcing
full execution with the noop sink (no driver collect).

Host-health probes run in a FRESH SUBPROCESS before the JVM launches
and after spark.stop() (round 4 — the r03 in-process probe read
0.4 GB/s membw next to the live multi-GB JVM heap while a standalone
probe read 8.8-9.2 GB/s in the same minutes: it measured allocation
pressure, not host bandwidth; BASELINE.md's degraded-window
adjudication leaned on that biased instrument).

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (local[N]).
Flags: --rows N (override pipeline input rows, e.g. 10000000 for the
scale artifact), --skip-queries (pipeline only), --reps K (default 3).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

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
    # classical-surface remainder — sub-second each; included so the
    # per-query timing map covers the full queries() surface
    "above_mean_events",
    "anti_join_resume",
    "asof_join_last_purchase",
    "dedup_debounce",
    "fuzzy_source_pairs",
    "global_topk_orders",
    "grouping_sets_counts",
    "kmeans_assign",
    "leakage_safe_split",
    "length_buckets",
    "median_value_by_type",
    "mixture_by_lang",
    "ntile_quartiles",
    "parse_grok_documents",
    "pipeline_route_overlap",
    "pivot_event_counts",
    "range_join_purchase_window",
    "rollup_counts",
    "schema_evolution_union",
    "semi_join_active",
    "set_ops_nations",
    "skew_join_salted",
    "text_lang_id",
    "text_normalize",
    "text_quality",
    "window_moving_avg",
    "window_tumbling_counts",
    "pareto_front_orders",
    "triangle_counts",
    "priority_sample_docs",
    "seq_packing_docs",
    "hll_distinct_tokens",
    "dup_token_spans",
    "fuzzy_join_heads",
    "priority_sample_per_source",
    "bfs_levels_parts",
    "dsir_weights_en",
    "hilbert_shards",
    "quality_classifier",
    "kmv_set_ops",
    "journey_paths",
    "weighted_median",
    "benford_digits",
    "kn_bigram_lm",
    "rrf_fuse",
    "hll_sliding_dau",
    "cm_join_size",
    "trend_slope",
    "doc_perplexity",
    "categorical_mi",
    "unpivot_event_matrix",
    "copurchase_lift",
    "fk_audit",
    "hist_quantiles",
    "rank_normalize",
    "event_trigrams",
    "ohlc_bars",
    "decayed_scores",
    "media_frame_digest",
    "source_kl_matrix",
    "table_profile",
    # round 5: the composed corpus pipeline — the lazy packed-output
    # chain (portable-hash near-dedup, the oracle-paired flagship) and
    # its eager per-stage funnel twin
    "corpus_pack_pipeline",
    "corpus_pipeline_funnel",
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# Probe source executed in a FRESH python subprocess: no JVM heap in
# the address space, no allocator contention with Spark. Mirrors
# bench/membw.py's methodology (pre-faulted pages, out= so nothing
# allocates inside the timed loop). Healthy on this VM: cpu ~0.3-0.6s,
# membw ~8-15 GB/s 1-thread; cpu >2s or membw <2 means a degraded
# hypervisor window (steal / sibling bus saturation).
_PROBE_SRC = r"""
import json, time
import numpy as np
t0 = time.perf_counter()
s = 0
for i in range(10_000_000):
    s += i
cpu_sec = time.perf_counter() - t0
n = 64 * 1024 * 1024 // 8  # 64 MB per array, 3 arrays — far over LLC
a = np.zeros(n); b = np.full(n, 1.5); c = np.full(n, 0.5)
np.add(b, c, out=a)  # pre-fault all pages before timing
reps = 0
t0 = time.perf_counter()
while time.perf_counter() - t0 < 1.5:
    np.add(b, c, out=a)  # STREAM add: 2 reads + 1 write
    reps += 1
membw = reps * n * 24 / (time.perf_counter() - t0) / 1e9
print(json.dumps({"cpu_probe_sec": round(cpu_sec, 2),
                  "membw_1t_gbs": round(membw, 1)}))
"""


def host_probe() -> dict:
    """Run the host-health probe in a fresh subprocess (see module
    docstring for why in-process probing is biased ~20x low) and
    return its {"cpu_probe_sec", "membw_1t_gbs"} dict."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True, text=True, timeout=120, check=True,
        ).stdout.strip().splitlines()[-1]
        return json.loads(out)
    except Exception as e:  # probe must never kill the bench
        return {"error": str(e)[:200]}


def bench_pipeline(spark, tmp: str, rows: int, reps: int) -> dict:
    from llogtail_spark.config import PipelineConf
    from llogtail_spark.generate import write_fixture
    from llogtail_spark.operators.route import SinkRule
    from llogtail_spark.pipeline import run_pipeline

    data_dir = os.path.join(tmp, "data")
    # file count scales with rows past the default (~25k rows/file at
    # the 1.6M default, 128 files at 10M — production parquet files
    # are roughly constant-sized, so a bigger corpus means more files,
    # not bigger ones; this also keeps per-file row groups small
    # enough that the exploded 3-sink staged write doesn't pile row
    # group buffers past the fixed 8g heap at 6x data)
    n_files = max(CPUS * 2, 8, rows // 78_125)
    t0 = time.time()
    write_fixture(data_dir, rows, seed=42, n_files=n_files)
    log(f"fixture: {rows} rows / {n_files} files in {time.time()-t0:.1f}s")

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

    # best-of-N timed reps: this host shows 5-30% hypervisor steal
    # spikes (see BASELINE.md) that can span a whole 2-rep window, so
    # the min of N is the engine's envelope (timeit convention)
    times = []
    routed = 0
    for rep in range(reps):
        rid = f"timed{rep + 1}"
        t0 = time.time()
        run_pipeline(spark, make_conf(rid))
        times.append(time.time() - t0)
        routed = sum(
            e.row_count
            for e in __import__(
                "llogtail_spark.manifest", fromlist=["read_all"]
            ).read_all(make_conf(rid).manifest_dir)
        )
        shutil.rmtree(os.path.join(tmp, f"work-{rid}"), ignore_errors=True)
    elapsed = min(times)
    log(
        f"pipeline: {rows} input rows, {routed} routed rows, "
        f"reps {[round(t, 1) for t in times]}s, best {elapsed:.1f}s"
    )
    return {
        "input_rows": rows,
        "routed_rows": routed,
        "pipeline_sec": round(elapsed, 3),
        "reps_sec": [round(t, 3) for t in times],
        "input_seq_per_sec": round(rows / elapsed, 1),
        "routed_seq_per_sec": round(routed / elapsed, 1),
    }


# re-run a query's timing when it exceeds the prior round's committed
# value by this factor AND this absolute floor: best-of-2 does not
# absorb multi-minute degraded-host windows (VERDICT r04 recorded four
# 3-4x phantom regressions, all clean on fresh re-measurement), so
# outliers vs the prior map get one fresh best-of-2 pass at the END of
# the query loop — far from whatever window inflated them.
RERUN_FACTOR = 2.0
RERUN_FLOOR_SEC = 0.4
PROBE_EVERY = 30  # mid-loop host probes (subprocess): timing context


def _time_query(spark, fn) -> float:
    # time construction + execution together: iterative operators
    # (dedup_resolve) do their work eagerly at construction, so
    # timing only the final write would measure a checkpoint read
    best = None
    for _ in range(2):  # best-of-2 timed: steal spikes (BASELINE.md)
        t0 = time.time()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best


def bench_queries(spark) -> dict:
    import __spark_entry__ as entry

    prior: dict[str, float] = {}
    prior_file = os.path.join(REPO, "BENCH", "queries_latest.json")
    try:
        with open(prior_file) as f:
            prior = json.load(f).get("queries", {}) or {}
    except Exception:
        pass

    qs = entry.queries()
    out: dict[str, float] = {}
    probes: list[dict] = []
    probe_idx: dict[str, int] = {}  # query -> nearest preceding probe
    for i, name in enumerate(BENCH_QUERIES):
        if i % PROBE_EVERY == 0:
            p = host_probe()
            probes.append({"before_query": name, "probe": p})
            log(f"mid-loop host probe (subprocess): {p}")
        probe_idx[name] = len(probes) - 1
        fn = qs[name]
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()  # warm
        out[name] = round(_time_query(spark, fn), 3)
        log(f"query {name}: {out[name]}s")

    # outlier pass: anything >RERUN_FACTOR x its prior-round committed
    # timing gets ONE fresh best-of-2 re-measurement now; the map
    # records both readings so a surviving regression is reproducible
    # by construction and a vanished one is labeled degraded-window
    reruns: dict[str, dict] = {}
    for name, t in sorted(out.items()):
        b = prior.get(name)
        if b and t > RERUN_FACTOR * b and t - b > RERUN_FLOOR_SEC:
            t2 = round(_time_query(spark, qs[name]), 3)
            reruns[name] = {
                "first_sec": t, "rerun_sec": t2, "prior_sec": b,
                "verdict": ("degraded_window"
                            if t2 <= RERUN_FACTOR * b else "regression"),
            }
            out[name] = min(t, t2)
            log(f"rerun {name}: {t}s -> {t2}s (prior {b}s, "
                f"{reruns[name]['verdict']})")
    return {"queries": out, "probes": probes, "probe_idx": probe_idx,
            "reruns": reruns}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=SEQ_ROWS,
                    help="pipeline input rows (default scales with sf)")
    ap.add_argument("--reps", type=int, default=3,
                    help="timed pipeline reps (best-of)")
    ap.add_argument("--skip-queries", action="store_true",
                    help="pipeline headline only, skip per-query timing")
    args = ap.parse_args()

    from llogtail_spark.session import get_spark

    # pre-JVM probe: fresh subprocess, nothing else running yet
    host_before = host_probe()
    log(f"host probe (pre-JVM, subprocess): {host_before}")
    spark = get_spark("bench", cores=CPUS, shuffle_partitions=max(2 * CPUS, 32))
    tmp = tempfile.mkdtemp(prefix="llogtail-bench-")
    try:
        pipe = bench_pipeline(spark, tmp, args.rows, args.reps)
        queries = None if args.skip_queries else bench_queries(spark)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # post probe runs AFTER teardown so the JVM heap is gone
    spark.stop()
    host_after = host_probe()
    log(f"host probe (post-teardown, subprocess): {host_after}")

    headline = {
        "metric": "routed_sequences_per_sec",
        "value": pipe["routed_seq_per_sec"],
        "unit": "seq/sec",
        "sf": SF,
        "cpus": CPUS,
        "pipeline": pipe,
        "host": {"before": host_before, "after": host_after},
    }
    if queries is not None:
        # detail line FIRST (may be long), compact headline LAST so a
        # bounded tail-capture always parses the final line
        detail = {"detail": "per_query_sec", "sf": SF, "cpus": CPUS,
                  "queries": queries["queries"],
                  "probes": queries["probes"],
                  "probe_idx": queries["probe_idx"],
                  "reruns": queries["reruns"]}
        print(json.dumps(detail), flush=True)
        qfile = os.path.join(REPO, "BENCH", "queries_latest.json")
        os.makedirs(os.path.dirname(qfile), exist_ok=True)
        with open(qfile, "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
        headline["queries_file"] = "BENCH/queries_latest.json"
        headline["queries_timed"] = len(queries["queries"])
        headline["query_reruns"] = len(queries["reruns"])
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
