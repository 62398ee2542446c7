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


def pack_sequences_sql(
    budget: int = PACK_BUDGET,
    docs_sql: str = "SELECT doc_id, text FROM documents"
) -> str:
    """DuckDB twin: single-node window cumsum over the identical
    (md5, doc_id) order — same seq assignment, any scale DuckDB can
    hold.  ``docs_sql`` substitutes a curated (doc_id, text) relation
    for the raw table (the c4 composition)."""
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(trim(text)), ' +'),
                              x -> x != '')) AS BIGINT) AS n_tok,
         md5(CAST(doc_id AS VARCHAR)) AS k
  FROM ({docs_sql})),
c AS (
  SELECT n_tok,
         SUM(n_tok) OVER (ORDER BY k, doc_id ROWS UNBOUNDED PRECEDING)
           - n_tok AS cum_before
  FROM t)
SELECT CAST(cum_before // {budget} AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM c GROUP BY 1"""


# --------------------------------------------------------------------------
# Sliding-context chunking: the OTHER standard training-prep layout.
# pack_sequences concatenates ACROSS documents; chunk_windows slides
# WITHIN each document — overlapping max_len-token windows advancing
# by `stride` tokens (stride < max_len gives the context-overlap used
# for long-document fine-tuning sets).
# --------------------------------------------------------------------------

CHUNK_LEN = 128
CHUNK_STRIDE = 96  # 32-token overlap between consecutive chunks


def chunk_windows(
    documents: DataFrame,
    max_len: int = CHUNK_LEN,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """(doc_id, chunk_id, chunk_len, first_tok, last_tok): overlapping
    token windows per document.  Chunk c covers tokens
    [c*stride, c*stride + max_len); the last chunk starts at the last
    stride boundary that still holds an uncovered token, so every token
    belongs to >= 1 chunk and no chunk is empty.  Empty documents
    produce no chunks.

    Pure column expressions: tokenize once, compute the chunk count
    with integer arithmetic, explode a `sequence` — the fan-out is
    (n_tok/stride)x but each output row carries only ids and two
    boundary tokens, never the text.  Per-document work, so it
    partitions embarrassingly at any corpus size.
    """
    if stride <= 0 or max_len <= 0 or stride > max_len:
        raise ValueError("need 0 < stride <= max_len")
    toks = documents.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), " +").alias("tk")
    ).select("doc_id", F.filter("tk", lambda t: t != "").alias("tk"))
    n = F.size("tk")
    # ceil((n - max_len) / stride) extra chunks past the first, clamped
    # at 0 — integer-only so the SQL twin cannot diverge
    extra = F.greatest(
        F.lit(0), F.expr(f"(size(tk) - {max_len} + {stride} - 1) div {stride}")
    )
    start = F.col("chunk_id") * stride
    chunk_len = F.least(F.lit(max_len), n - start)
    return (
        toks.where(n > 0)
        .select(
            "doc_id",
            "tk",
            F.explode(F.sequence(F.lit(0), extra)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            chunk_len.cast("long").alias("chunk_len"),
            F.element_at("tk", (start + 1).cast("int")).alias("first_tok"),
            F.element_at("tk", (start + chunk_len).cast("int")).alias("last_tok"),
        )
    )


def chunk_windows_sql(max_len: int = CHUNK_LEN, stride: int = CHUNK_STRIDE) -> str:
    """DuckDB twin over the identical tokenizer and integer chunk
    arithmetic (1-based list indexing in both engines)."""
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), ' +'),
                     x -> x != '') AS tk
  FROM documents),
n AS (SELECT doc_id, tk, len(tk) AS n_tok FROM t WHERE len(tk) > 0),
c AS (
  SELECT doc_id, tk, n_tok,
         UNNEST(range(1 + GREATEST(0, (n_tok - {max_len} + {stride} - 1) // {stride})))
           AS chunk_id
  FROM n)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(LEAST({max_len}, n_tok - chunk_id * {stride}) AS BIGINT) AS chunk_len,
       tk[CAST(chunk_id * {stride} + 1 AS INT)] AS first_tok,
       tk[CAST(chunk_id * {stride}
               + LEAST({max_len}, n_tok - chunk_id * {stride}) AS INT)] AS last_tok
FROM c"""


# --------------------------------------------------------------------------
# Output-shard manifest: token-balanced shard planning
# --------------------------------------------------------------------------

MANIFEST_SHARDS = 8


def serpentine_shards(
    df: DataFrame, id_col: str, size_col: str, n_shards: int
) -> DataFrame:
    """(shard, n_items, total_size): the serpentine size-balancing
    core — sort items by size descending (id tiebreak), deal rank r to
    shard r%S on even passes and S-1-(r%S) on odd passes.  Each pass
    pairs with its reverse, so shard totals stay within ~one max-item.
    The global rank rides the distributed parallel-position machinery
    (range partitions + O(P) broadcast offsets)."""
    from .ranking import with_global_position

    pos = with_global_position(
        df.select(id_col, size_col),
        [F.desc(size_col), F.asc(id_col)],
        "pos",
        None,
        # the rank feeds a shard groupBy immediately below — the
        # presentation sort would be one extra whole-relation
        # exchange+sort thrown away by the aggregate
        ordered=False,
    )
    r = F.col("pos") - 1
    within = r % n_shards
    shard = F.when(
        (F.floor(r / n_shards) % 2) == 0, within
    ).otherwise(n_shards - 1 - within)
    return (
        pos.select(shard.cast("long").alias("shard"), size_col)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(size_col).alias("total_size"),
        )
    )


def serpentine_shards_sql(
    rel_sql: str, id_expr: str, size_expr: str, n_shards: int
) -> str:
    """DuckDB twin of :func:`serpentine_shards` over ``rel_sql``."""
    return f"""
SELECT CAST(CASE WHEN (r // {n_shards}) % 2 = 0 THEN r % {n_shards}
                 ELSE {n_shards} - 1 - (r % {n_shards}) END AS BIGINT)
         AS shard,
       COUNT(*) AS n_items,
       CAST(SUM(sz) AS BIGINT) AS total_size
FROM (
  SELECT {size_expr} AS sz,
         ROW_NUMBER() OVER (ORDER BY {size_expr} DESC, {id_expr} ASC) - 1 AS r
  FROM ({rel_sql})
) GROUP BY 1"""


def shard_manifest(
    documents: DataFrame, n_shards: int = MANIFEST_SHARDS
) -> DataFrame:
    """(shard, n_docs, total_tokens): documents assigned to output
    shards balanced by TOKEN totals, not row counts — the writer
    manifest that keeps training-shard files near-equal when document
    lengths are heavy-tailed (hash assignment balances counts; one
    book-length doc then skews its file).

    Serpentine (boustrophedon) assignment on the by-length rank: sort
    docs by tokens descending, deal rank r to shard r%S on even passes
    and S-1-(r%S) on odd passes — each pass pairs with its reverse so
    shard totals stay within ~one max-document of each other;
    deterministic with the (n_tok desc, doc_id) tiebreak.  The global
    rank rides the distributed parallel-position machinery (range
    partitions + O(P) broadcast offsets), never a single-partition
    window."""
    toks = documents.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tok")
    )
    return serpentine_shards(toks, "doc_id", "n_tok", n_shards).select(
        "shard",
        F.col("n_items").alias("n_docs"),
        F.col("total_size").alias("total_tokens"),
    )


def shard_manifest_sql(n_shards: int = MANIFEST_SHARDS) -> str:
    """DuckDB twin of :func:`shard_manifest`."""
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(trim(text)), ' +'),
                              x -> x != '')) AS BIGINT) AS n_tok
  FROM documents),
p AS (
  SELECT n_tok,
         ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id ASC) - 1 AS r
  FROM t)
SELECT CAST(CASE WHEN (r // {n_shards}) % 2 = 0 THEN r % {n_shards}
                 ELSE {n_shards} - 1 - (r % {n_shards}) END AS BIGINT)
         AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM p GROUP BY 1"""
