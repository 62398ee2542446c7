"""Sequence packing: concatenate-then-chunk documents into fixed
token-budget training sequences — the standard LLM-pretraining packing
step (corpus is laid out in a deterministic order, token counts are
prefix-summed, and every document belongs to the chunk its FIRST token
lands in).

Scale shape: a naive global running sum is a single-partition window —
the classic scale killer.  Here the prefix sum is distributed with the
same trick as ``ranking.with_global_position``: range-partition by the
deterministic order key, window-cumsum WITHIN each partition, and add
broadcast per-partition token-total offsets (one O(P) driver pass).
Every stage is whole-stage-codegen JVM work; the only driver traffic
is P longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textops import tokens

PACK_BUDGET = 4096  # tokens per packed training sequence


def pack_sequences(
    documents: DataFrame,
    budget: int = PACK_BUDGET,
    num_partitions: int | None = None,
) -> DataFrame:
    """(seq_id, n_docs, n_tokens): documents packed into consecutive
    ``budget``-token sequences.

    Layout order is ``(md5(doc_id), doc_id)`` — deterministic,
    shuffle-stable, and decorrelated from ingest order (the same
    rationale as the md5 hash-split samplers).  ``seq_id`` is
    ``floor(tokens_before_this_doc / budget)``: a document straddling a
    boundary counts toward the sequence where it starts, exactly the
    concatenate-and-cut semantics of pretraining data loaders.
    """
    spark = documents.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    toks = documents.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    )
    ranged = (
        toks.repartitionByRange(num_partitions, F.asc("k"), F.asc("doc_id"))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # O(P) driver pass: token total per range partition -> running offsets
    totals = {
        r["_pid"]: r["tot"]
        for r in ranged.groupBy("_pid")
        .agg(F.sum("n_tok").alias("tot"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in range(num_partitions):
        offsets.append((pid, acc))
        acc += int(totals.get(pid, 0) or 0)
    offsets_df = spark.createDataFrame(offsets, "_pid int, _offset long")

    w = Window.partitionBy("_pid").orderBy("k", "doc_id")
    cum_before = (
        F.sum("n_tok").over(w) - F.col("n_tok") + F.col("_offset")
    )
    return (
        ranged.join(F.broadcast(offsets_df), "_pid")
        .select(
            F.floor(cum_before / budget).cast("long").alias("seq_id"),
            "n_tok",
        )
        .groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


def pack_sequences_sql(budget: int = PACK_BUDGET) -> str:
    """DuckDB twin: single-node window cumsum over the identical
    (md5, doc_id) order — same seq assignment, any scale DuckDB can
    hold."""
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(trim(text)), ' +'),
                              x -> x != '')) AS BIGINT) AS n_tok,
         md5(CAST(doc_id AS VARCHAR)) AS k
  FROM documents),
c AS (
  SELECT n_tok,
         SUM(n_tok) OVER (ORDER BY k, doc_id ROWS UNBOUNDED PRECEDING)
           - n_tok AS cum_before
  FROM t)
SELECT CAST(cum_before // {budget} AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM c GROUP BY 1"""
