"""Time a registered driver query with a warm/cold split and show its
physical plan summary.

Usage: python tools/profile_query.py <name> [sf_dir] [runs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pagerank_using_mapreduce_spark.plans.registry import QUERIES  # noqa: E402
from pagerank_using_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    if name not in QUERIES:
        print(f"unknown query {name!r}; known: {', '.join(QUERIES)}")
        return 2
    spark = get_spark(app_name=f"profile-{name}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    times = []
    for i in range(runs):
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
        print(f"run {i}: {times[-1]:.2f}s")
    print(f"min {min(times):.2f}s  median {sorted(times)[len(times) // 2]:.2f}s")
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    wide = [
        line.strip()
        for line in plan.splitlines()
        if any(k in line for k in ("Exchange", "Join", "Window", "Expand", "Sort "))
        and "Reused" not in line
    ]
    print("wide/notable ops:")
    for w in wide[:20]:
        print("  " + w[:140])
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
