"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (computes every
column, writes nothing) so Catalyst cannot prune the work away.

Each query runs ``$SPARK_GRAFT_BENCH_REPS`` times (default 3) and the
reported per-query number is the MEDIAN — single-run numbers produced
phantom 40% "regressions" in round 2 (VERDICT r02: cc_components/x4/
x13) that were pure measurement noise.  ``value`` is the sum of the
medians; ``runs`` carries the raw per-rep timings for auditability.
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
    "cc_components",
    "cc_star",
    "g5_bfs_depths",
    "x35_hll_registers",
    "x33_dedup_clusters",
    "x43_join_size_estimate",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spark = get_spark(app_name="bench")
    # one trivial action so JVM/executor init is not billed to query #1
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        if name not in QUERIES:
            continue
        samples = []
        for _ in range(reps):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        runs[name] = samples
        timings[name] = round(statistics.median(samples), 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "reps": reps,
                "runs": runs,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
