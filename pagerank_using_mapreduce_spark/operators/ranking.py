"""Scalable global position assignment (total-order row numbering).

The naive ``row_number().over(Window.orderBy(...))`` has no PARTITION BY,
so Spark moves EVERY row to a single partition — the same bottleneck as
the reference's single-reducer sort (PageRankAlgorithm.java:117-129,
default 1-reducer total order), just relocated.  Fine for a 500-row
oracle check, fatal at 100 TB.

This operator keeps the whole pipeline parallel:

1. ``repartitionByRange`` on the order keys — Spark samples the keys and
   builds contiguous, ordered ranges (the same machinery ``orderBy``
   uses), so partition *i* holds exactly the rows that globally precede
   partition *i+1*;
2. one tiny job counts rows per range partition (count per pid — at most
   ``num_partitions`` longs to the driver);
3. a window partitioned BY PARTITION provides the local row number, and
   a broadcast join adds the cumulative offset of all earlier partitions.

Every stage is JVM-side, whole-stage-codegen'd, and no partition ever
holds more than ~1/P of the data.  Cost: one range shuffle + one hash
shuffle on pid + a broadcast of P offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_position(
    df: DataFrame,
    order_cols: list,
    pos_col: str = "pos",
    num_partitions: int | None = None,
    materialize: bool = True,
    ordered: bool = True,
) -> DataFrame:
    """Return ``df`` with a 1-based global position column under the
    total order ``order_cols`` (pass Column objects, e.g.
    ``[F.desc("rank"), F.asc("title")]``).

    The input is persisted internally so the range-partitioner's sampled
    boundaries (nondeterministic across re-evaluations) are identical in
    the count job and the output job.  The positioned result is then
    eagerly materialized (``localCheckpoint``) and the internal cache
    released before returning, so long-lived sessions running many
    positioned queries do not accumulate cached range partitions — the
    checkpoint blocks are freed with the returned frame itself when it
    is dropped.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # Tiny driver-side pass: one (pid, count) row per range partition.
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in range(num_partitions):
        offsets.append((pid, acc))
        acc += counts.get(pid, 0)
    offsets_df = spark.createDataFrame(offsets, ["_pid", "_offset"])

    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = ranged.join(F.broadcast(offsets_df), "_pid").select(
        (F.row_number().over(w) + F.col("_offset")).cast("long").alias(pos_col),
        *df.columns,
    )
    if ordered:
        # presentation order for ranking-style consumers; callers that
        # only need the pos COLUMN (quantile binning) skip this final
        # range sort — it is one whole extra exchange+sort of the
        # result (guide §2.4: an orderBy used only to make output
        # pretty is an accidental shuffle)
        out = out.orderBy(pos_col)
    if not materialize:
        # lazy form for plan inspection / further composition; the
        # ranged cache stays pinned under the un-evaluated result —
        # callers own the lifecycle
        return out
    # eager: pin the result so the ranged cache can be dropped now
    out = out.localCheckpoint(eager=True)
    ranged.unpersist()
    return out
