"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (computes every
column, writes nothing) so Catalyst cannot prune the work away.

Robustness: each query runs ``$SPARK_GRAFT_BENCH_REPS`` times
(default 5) and the reported per-query number is the MEDIAN; the raw
timings (``runs``) and the (max-min)/median ``spread`` are written to
``BENCH_DETAIL.json`` next to this script so a noisy machine is
visible in the record instead of masquerading as a regression
(single-run numbers produced phantom 40% "regressions" in round 2;
3-rep medians still let one 15 s outlier skew x35 in round 3's log).

The stdout line stays COMPACT on purpose: the driver captures only a
bounded tail of output and parses the last line as JSON — round 4's
line (43 queries x 5 raw reps + spread inline) overflowed that buffer
and recorded ``parsed: null``.  Per-rep detail goes in the sidecar;
the final line carries medians only.

Scaling trend: a second section runs the five headline ITERATIVE
queries at a synthetic sf1 (10× sf0.1, dense doc_id replication —
tools/make_scaled_sf.py, auto-generated on first use) and reports
them under ``sf1_queries``.  The corpus link graph derives entirely
from doc_id arithmetic, so this is a true 10× graph, not padded rows;
comparing ``sf1_queries`` to ``queries`` shows the sublinear growth
the partitioning strategy is designed for.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pagerank_using_mapreduce_spark.plans.registry import QUERIES  # noqa: E402
from pagerank_using_mapreduce_spark.session import get_spark  # noqa: E402

# Headline set: the flagship iterative query, the reference's second
# pipeline, and the heaviest extension ops (extended as they land).
BENCH_QUERIES = [
    "i1_pagerank10",
    "o1_ranking",
    "a6_inverted_index",
    "a6_inverted_index_wiki",
    "tfidf",
    "x4_near_dups",
    "x13_simhash",
    "x5_cosine_topk",
    "x12_asof_join",
    "x16_salted_agg",
    "q1_pricing_summary",
    "q18_large_orders",
    "c1_curation_pipeline",
    "i2_personalized_pagerank",
    "e2_hourly_rollup",
    "e1_sessions",
    "z1_stream_rollup",
    # components headline is cc_star (the O(log n) scale path; 2.5-3x
    # faster than hash-min at sf0.1 and diameter-safe — SCALING.md).
    # Fixed-k hash-min stays registered as cc_components, the oracle
    # twin, just not bench-tracked.
    "cc_star",
    "g5_bfs_depths",
    "x35_hll_registers",
    "x33_dedup_clusters",
    "x43_join_size_estimate",
    "x45_sequence_packing",
    "g7_label_prop",
    "q21_waiting_supplier",
    "x48_chunk_windows",
    "x49_curriculum_order",
    "x51_bpe_merges",
    "x54_ngram_contamination",
    "x56_incremental_dedup",
    "g8_sssp_dists",
    "x55_semantic_clusters",
    "x60_paragraph_dedup",
    "x62_bpe_encode",
    "x63_containment",
    "g9_weighted_pagerank",
    "e9_attribution",
    "x68_dataset_profile",
    "g10_bfs_frontier",
    "x69_pixel_decode",
    "x71_wav_decode",
    "e10_debounce",
    "x76_kmv_distinct",
    "x77_epoch_shuffle",
    "w7_concurrency",
    "rj2_interval_overlap",
    # the heavy tail (VERDICT r05 #3): the registry's most expensive
    # queries, tracked so their cost can't drift unnoticed
    "g12_landmark_closeness",
    "x88_dedup_savings",
    "x83_filter_calibration",
    "c4_training_manifest",
    "x90_batched_bpe",
    "x91_index_compaction",
    "g13_truss_edges",
    "x94_rare_token_docs",
    # round-6b additions: the z-keyed pair join and the vocab²-scale
    # shuffle-join scorer are the two new shapes worth watching
    "g14_adamic_adar",
    "x103_bigram_perplexity",
]

# The iterative/heavy queries whose scaling behavior matters most;
# run again at the synthetic sf1 (documents-derived only — these five
# read no other table).
SF1_QUERIES = [
    "i1_pagerank10",
    "cc_star",
    "o1_ranking",
    "g5_bfs_depths",
    "x33_dedup_clusters",
    "g8_sssp_dists",
    "x51_bpe_merges",  # corpus 10x, vocab constant: the corpus->vocab
    #                    compression should make this near-flat
    "g9_weighted_pagerank",
    "x60_paragraph_dedup",
    "x76_kmv_distinct",   # vocab-bound: distinct domain constant at 10x corpus
    "x79_shard_manifest",
    "c4_training_manifest",
    "g12_landmark_closeness",  # the registry's most expensive query
    "g14_adamic_adar",  # z-keyed pair join: the cap must keep it sublinear
]


def _env_fingerprint() -> dict:
    """CPU model / core count / load / turbo state: the r05 A/B showed
    host drift masquerading as a 50% regression — record enough to
    tell environments apart across rounds."""
    fp: dict = {"cpus": os.cpu_count()}
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if ln.startswith("model name"):
                    fp["cpu"] = ln.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    try:
        fp["load1"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    for path, key in [
        ("/sys/devices/system/cpu/intel_pstate/no_turbo", "no_turbo"),
        (
            "/sys/devices/system/cpu/cpu0/cpufreq/scaling_governor",
            "governor",
        ),
    ]:
        try:
            with open(path) as f:
                fp[key] = f.read().strip()
        except OSError:
            pass
    return fp


def _bpe_batched_evidence(spark, sf_dir: str) -> dict:
    """VERDICT r05 #2 'done' row: train toward 256 merges with batch 32
    and record how many driver round-trips it actually took — the job
    count must be ~n/batch, not n."""
    from pagerank_using_mapreduce_spark.operators.bpe import bpe_merges_batched
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    target, batch = 256, 32
    rounds_cap = (target + batch - 1) // batch * 2  # slack for partial batches
    t0 = time.time()
    rows = bpe_merges_batched(
        load_table(spark, sf_dir, "documents"), rounds=rounds_cap, batch=batch
    ).collect()
    rounds_run = len({r["round"] for r in rows})
    return {
        "target_merges": target,
        "batch": batch,
        "merges_landed": len(rows),
        "driver_roundtrips": rounds_run,
        "sec": round(time.time() - t0, 3),
    }


def _run(spark, name: str, sf_dir: str, reps: int) -> list[float]:
    samples = []
    for _ in range(reps):
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    return samples


def _sf1_dir() -> str | None:
    """Locate (or build) the synthetic sf1; None if building fails."""
    repo = os.path.dirname(os.path.abspath(__file__))
    d = os.environ.get(
        "SPARK_GRAFT_SF1_DIR", os.path.join(repo, ".benchdata", "sf1")
    )
    if os.path.exists(os.path.join(d, "documents.parquet")):
        return d
    try:
        from tools.make_scaled_sf import make_scaled

        make_scaled("/root/testdata/sf0.1", d, 10)
        return d
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    sf1_reps = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_SF1_REPS", "2")))
    spark = get_spark(app_name="bench")
    # one trivial action so JVM/executor init is not billed to query #1
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    spread: dict[str, float] = {}
    only = {
        n for n in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if n
    }
    for name in BENCH_QUERIES:
        if name not in QUERIES or (only and name not in only):
            continue
        samples = _run(spark, name, sf_dir, reps)
        runs[name] = samples
        # rep 0 pays one-time costs (scan caching, codegen) — keep it
        # in `runs` for auditability but exclude it from the stats
        warm = samples[1:] if len(samples) >= 3 else samples
        med = statistics.median(warm)
        timings[name] = round(med, 3)
        # spread over the warm samples minus the single worst one: a
        # lone GC/compaction pause on a 0.3 s query would otherwise
        # read as a 50% "variance"; the raw runs stay published
        trimmed = sorted(warm)[:-1] if len(warm) >= 3 else warm
        spread[name] = (
            round((max(trimmed) - min(trimmed)) / med, 3) if med else 0.0
        )
    total = round(sum(timings.values()), 3)

    sf1_timings: dict[str, float] = {}
    sf1_dir = _sf1_dir() if sf1_reps else None
    if sf1_dir:
        for name in SF1_QUERIES:
            if name not in QUERIES:
                continue
            samples = _run(spark, name, sf1_dir, sf1_reps)
            sf1_timings[name] = round(min(samples), 3)

    env = _env_fingerprint()
    try:
        bpe256 = _bpe_batched_evidence(spark, sf_dir) if not only else {}
    except Exception as e:  # evidence row must never sink the bench
        bpe256 = {"error": str(e)[:200]}

    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "reps": reps,
                "runs": runs,
                "spread": spread,
                "env": env,
                "bpe_batched_256": bpe256,
                "sf1_queries": sf1_timings,
                "sf1_note": (
                    "synthetic 10x sf0.1 documents (dense doc_id replication,"
                    " tools/make_scaled_sf.py); min of"
                    f" {sf1_reps} rep(s)"
                ),
            },
            f,
            indent=1,
        )
    print(f"per-rep runs/spread + sf1 detail -> {detail_path}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "reps": reps,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "sf1_queries": sf1_timings,
                "env": env,
                "bpe_batched_256": bpe256,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
