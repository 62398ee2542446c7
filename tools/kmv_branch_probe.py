"""Which branch does the two-phase KMV take on a given corpus?

VERDICT r09 #1's done-criterion for the vocab-growth decade: at
sf10_vg every source must take the PROVEN branch (zero fallback) —
i.e. every group keeps >= k distinct survivors under the 1/16
hash-space prefilter, so the fallback scan never runs and the distinct
exchange is genuinely vocab/16-sized.  This probe replays the exact
decision relation from ``kmv_sketch(two_phase=True)``
(operators/sketches.py: the ``masked -> unproven.isEmpty()`` gate)
and prints one JSON line with per-group survivor counts, the
min/max, and the branch verdict.

Usage: python tools/kmv_branch_probe.py <sf_dir>
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pagerank_using_mapreduce_spark.functions.textops import (  # noqa: E402
    strip_non_alpha,
    tokens,
)
from pagerank_using_mapreduce_spark.operators.sketches import (  # noqa: E402
    KMV_K,
    _KMV_PREFILTER,
)
from pagerank_using_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    spark = get_spark(app_name="kmv-branch-probe")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    words = docs.select(
        "source",
        F.explode(tokens(strip_non_alpha(F.col("text")))).alias("word"),
    ).where(F.col("word") != "")
    h = F.md5(F.concat_ws("|", F.lit("kmv"), F.col("word").cast("string")))
    # the exact masked relation kmv_sketch builds: distinct (grp, h)
    # below the prefilter bound; survivor count per group decides.
    surv = (
        words.select(
            F.col("source").alias("grp"),
            F.when(h < F.lit(_KMV_PREFILTER), h).alias("h"),
        )
        .distinct()
        .groupBy("grp")
        .agg(F.count("h").alias("survivors"))
        .collect()
    )
    counts = {r["grp"]: r["survivors"] for r in surv}
    n_unproven = sum(1 for c in counts.values() if c < KMV_K)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "k": KMV_K,
                "prefilter": _KMV_PREFILTER,
                "groups": len(counts),
                "min_survivors": min(counts.values()),
                "max_survivors": max(counts.values()),
                "n_unproven": n_unproven,
                "branch": "PROVEN" if n_unproven == 0 else "FALLBACK",
                "per_group": counts,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
