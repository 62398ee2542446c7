"""Run registered queries against a synthetic decade dir and print one
JSON line — the tool behind the BENCH_LOCAL_r{N} sf1/sf10 sections, so
the decade evidence is re-runnable instead of an ad-hoc session.

Usage:
    python tools/decade_bench.py <sf_dir> [reps] [q1,q2,...]

Defaults: reps 2, queries = bench.SF1_QUERIES.  Output carries the raw
per-rep timings (rep 0 pays scan caching / codegen — report rep 1+ as
the warm number, like BENCH_LOCAL's sf10 tables) plus the env
fingerprint.  `vg` as the query list selects bench.SF1_VG_QUERIES.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF1_QUERIES, SF1_VG_QUERIES, _env_fingerprint  # noqa: E402
from pagerank_using_mapreduce_spark.plans.registry import QUERIES  # noqa: E402
from pagerank_using_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    if len(sys.argv) > 3:
        names = (
            list(SF1_VG_QUERIES)
            if sys.argv[3] == "vg"
            else [n for n in sys.argv[3].split(",") if n]
        )
    else:
        names = list(SF1_QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    spark = get_spark(app_name="decade-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in names:
        samples = []
        try:
            for _ in range(reps):
                t0 = time.time()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(round(time.time() - t0, 2))
        except Exception as e:  # noqa: BLE001 — one OOM query must not
            # sink the whole section's record (r10: x58@sf1_vg OOMed
            # the shared bench session and took 100+ good rows with it)
            errors[name] = str(e).split("\n")[0][:300]
            print(f"  {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        runs[name] = samples
        print(f"  {name}: {samples}", file=sys.stderr)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "reps": reps,
                "runs": runs,
                "warm": {
                    n: (s[1] if len(s) > 1 else s[0]) for n, s in runs.items()
                },
                "errors": errors,
                "env": _env_fingerprint(),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
