"""Dump `.explain("formatted")` for registered queries to files.

Usage: python tools/dump_plans.py <outdir> [--suffix=_before] [name ...]

With no names, dumps every bench-tracked query (bench.BENCH_QUERIES).
Planning only — no job is executed, so this is safe to run while other
Spark work is in flight.  Each file also gets a short shape summary
header (Exchange count, join strategies, Python-eval nodes) so plan
diffs are greppable.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

from pagerank_using_mapreduce_spark.plans.registry import QUERIES  # noqa: E402
from pagerank_using_mapreduce_spark.session import get_spark  # noqa: E402


def plan_text(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def shape_summary(plan: str) -> str:
    """Greppable one-glance shape: counts of the operators that matter."""
    counts: dict[str, int] = {}
    # formatted mode puts each operator's detail header on its own
    # "(N) OpName" line — count exchanges/sorts there (they never
    # carry their arguments inline in the tree section)
    for pat, label in [
        (r"^\(\d+\) Exchange\b", "Exchange"),
        (r"^\(\d+\) Sort\b", "Sort"),
        (r"^\(\d+\) ReusedExchange\b", "ReusedExchange"),
        (r"^\(\d+\) TakeOrderedAndProject\b", "TakeOrdered"),
    ]:
        n = len(re.findall(pat, plan, flags=re.M))
        if n:
            counts[label] = n
    for pat, label in [
        (r"\bExchange hashpartitioning", "Exchange(hash)"),
        (r"\bExchange rangepartitioning", "Exchange(range)"),
        (r"\bExchange RoundRobinPartitioning", "Exchange(roundrobin)"),
        (r"\bExchange SinglePartition", "Exchange(single)"),
        (r"\bBroadcastExchange", "BroadcastExchange"),
        (r"\bSortMergeJoin", "SortMergeJoin"),
        (r"\bBroadcastHashJoin", "BroadcastHashJoin"),
        (r"\bShuffledHashJoin", "ShuffledHashJoin"),
        (r"\bBroadcastNestedLoopJoin", "BroadcastNestedLoopJoin"),
        (r"\bCartesianProduct", "CartesianProduct"),
        (r"\bWindow\b", "Window"),
        (r"\bBatchEvalPython", "BatchEvalPython"),
        (r"\bArrowEvalPython", "ArrowEvalPython"),
        (r"\bMapInPandas", "MapInPandas"),
        (r"\bFlatMapGroupsInPandas", "FlatMapGroupsInPandas"),
        (r"\bPythonMapInArrow", "MapInArrow"),
        (r"\bHashAggregate", "HashAggregate"),
        (r"\bObjectHashAggregate", "ObjectHashAggregate"),
        (r"\bSortAggregate", "SortAggregate"),
        (r"\bGenerate\b", "Generate(explode)"),
    ]:
        n = len(re.findall(pat, plan))
        if n:
            counts[label] = n
    return ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))


def main() -> int:
    outdir = sys.argv[1]
    suffix = "_before"
    names: list[str] = []
    for a in sys.argv[2:]:
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
        else:
            names.append(a)
    if not names:
        from bench import BENCH_QUERIES

        names = [n for n in BENCH_QUERIES if n in QUERIES]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    failed = []
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = plan_text(spark, df)
        except Exception as e:  # noqa: BLE001 — record, keep going
            failed.append(name)
            plan = f"PLAN FAILED: {e}"
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- query: {name}\n-- sf_dir: {sf_dir}\n")
            f.write(f"-- shape: {shape_summary(plan)}\n\n")
            f.write(plan)
        print(f"{name}: {shape_summary(plan)}")
    spark.stop()
    if failed:
        print(f"FAILED: {failed}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
