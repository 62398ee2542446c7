"""Skew and co-location utilities for the 100 TB path.

The engine's default posture is AQE (enabled in ``session.get_spark``:
runtime partition coalescing + automatic skew-join splitting).  These
helpers cover the two cases AQE can't fix by itself:

- **aggregation skew**: one hot key funnels into one reducer task.
  :func:`salted_agg` does groupBy(key, salt) → groupBy(key), spreading
  the hot key over ``n_salts`` tasks; works for any algebraic
  (re-aggregatable) aggregate.
- **join co-location**: two big fact tables repeatedly joined on the
  same key pay a full shuffle each time.  :func:`write_bucketed` +
  :func:`read_bucketed` persist both sides bucketed on the join key so
  Catalyst plans the join with ZERO exchanges (verified in
  tests/test_scale.py by asserting the absence of
  ``Exchange hashpartitioning`` in the joined plan).

The reference has no counterpart for either (single HashPartitioner,
no persistence format at all) — this is pure scale surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column name → ``"fn(col)"`` where fn is one of
    sum / count / min / max (the algebraic aggregates that re-combine
    losslessly: partial sums re-sum, counts re-sum, min/max re-min/max).

    Stage 1 groups by (keys + a salt hashed from the FULL ROW VALUES)
    so a hot key occupies up to ``n_salts`` reducer tasks; stage 2
    recombines the partials per key.  Cost: one extra (tiny) shuffle
    over the stage-1 output — rows ≤ distinct_keys × n_salts,
    independent of input size.

    The salt is a pure function of row values (not
    ``monotonically_increasing_id``/``rand``, whose outputs depend on
    partition layout), so a retried or recomputed task re-derives the
    identical salt — required for exactly-once semantics under task
    retry.  Identical duplicate rows share a salt; that only narrows
    the spread when the hot key is dominated by byte-identical rows.
    """
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    stage1_exprs, stage2_exprs = [], []
    for out, spec in aggs.items():
        fn, _, col = spec.partition("(")
        fn = fn.strip().lower()
        col = col.rstrip(")").strip()
        if fn not in recombine:
            raise ValueError(f"non-algebraic aggregate {fn!r}; use sum/count/min/max")
        first = F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)
        stage1_exprs.append(first.alias(f"_p_{out}"))
        stage2_exprs.append(recombine[fn](f"_p_{out}").alias(out))
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    return (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*stage1_exprs)
        .groupBy(*key_cols)
        .agg(*stage2_exprs)
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: salt the skewed side, replicate the other
    side ``n_salts``× (explode over the salt domain), join on
    (key, salt).  The hot key's rows spread across ``n_salts`` tasks
    instead of one.  Use when the small side is too big to broadcast
    but replication ×n_salts is still cheap; otherwise just broadcast.
    The salt hashes the row's values (retry-deterministic, see
    :func:`salted_agg`).
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = skewed.withColumn("_salt", salt)
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = left.join(right, [on, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
) -> None:
    """Persist bucketed+sorted on the join key; subsequent equi joins
    between tables bucketed the same way need no exchange and no sort.

    Idempotent across sessions: with the default in-memory catalog the
    table registration dies with the session but its warehouse files
    survive, and ``saveAsTable`` refuses a fresh table over a stale
    location — so drop both first (local-filesystem warehouses only;
    on a cluster with a persistent metastore the DROP alone suffices).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:") or "://" not in wh:
        import shutil

        local = wh.removeprefix("file:")
        shutil.rmtree(f"{local}/{table.lower()}", ignore_errors=True)
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
