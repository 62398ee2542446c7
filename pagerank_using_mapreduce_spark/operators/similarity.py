"""Similarity search over an embedding column (``array<float>``).

Baseline: brute-force cosine top-k — a broadcast of the (small) query
set against the full collection; the collection side never shuffles,
so at 100 TB this scans embarrassingly parallel and the only wide op
is the final per-query top-k (TakeOrdered-style).

Scale path: IVF-style pruning using the ``label`` column as a coarse
quantizer (centroid per label, probe the nearest ``nprobe`` cells) —
cuts the scanned fraction to nprobe/ncells.  A production system would
learn centroids with k-means; the operator shape (centroid broadcast,
cell pruning, in-cell rescoring) is identical.

All arithmetic stays in built-in column expressions (``zip_with`` +
``aggregate``), element order left-to-right, doubles throughout — the
DuckDB oracle mirrors it with list_dot_product over DOUBLE[].
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOP_K = 10
N_QUERIES = 5  # queries = vec_id < N_QUERIES (deterministic subset)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = TOP_K,
) -> DataFrame:
    """(query_id, rank, vec_id, cosine_e6): top-k neighbors per query,
    self-match excluded.  The query side is broadcast; ranking uses the
    quantized score (+ vec_id tiebreak) so cross-engine float noise
    cannot reorder ties."""
    if queries is None:
        queries = embeddings.where(F.col("vec_id") < N_QUERIES)
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        embeddings.alias("e")
        .join(F.broadcast(q), F.col("e.vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("e.vec_id").alias("vec_id"),
            F.floor(
                cosine(F.col("q_emb"), F.col("e.embedding")) * 1e6 + F.lit(0.5000001)
            )
            .cast("long")
            .alias("cosine_e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_e6"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine_e6")
    )


COSINE_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         CAST(FLOOR(
           list_dot_product(q.q_emb, e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.q_emb, q.q_emb))
              * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])))
           * 1e6 + 0.5000001) AS BIGINT) AS cosine_e6
  FROM embeddings e, q
  WHERE e.vec_id != q.query_id
)
SELECT query_id, rank, vec_id, cosine_e6 FROM (
  SELECT query_id, vec_id, cosine_e6,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine_e6 DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# IVF-style pruned search (label column as coarse quantizer)
# ---------------------------------------------------------------------------

N_PROBE = 2


def ivf_topk(
    embeddings: DataFrame,
    k: int = TOP_K,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """Approximate top-k probing only the ``nprobe`` nearest label cells.

    Centroid components are quantized to e6 micro-units before use so
    the float mean (summation-order-dependent) cannot leak engine noise
    into cell assignment.
    """
    dim_cols = F.posexplode(F.col("embedding"))
    comp = embeddings.select("vec_id", "label", dim_cols.alias("dim", "val"))
    centroids = (
        comp.groupBy("label", "dim")
        .agg(
            (
                F.floor(
                    (F.sum(F.col("val").cast("double")) / F.count("*")) * 1e6
                    + F.lit(0.5000001)
                )
                / 1e6
            ).alias("cval")
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cval"))).alias("pairs"))
        .select(
            "label",
            F.transform(F.col("pairs"), lambda p: p.getField("cval")).alias("centroid"),
        )
    )
    queries = embeddings.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    qc = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "q_emb",
            "label",
            F.floor(
                cosine(F.col("q_emb"), F.col("centroid")) * 1e6 + F.lit(0.5000001)
            )
            .cast("long")
            .alias("cell_score"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cell_score"), F.asc("label"))
    probe = (
        qc.withColumn("cell_rank", F.row_number().over(wq))
        .where(F.col("cell_rank") <= nprobe)
        .select("query_id", "q_emb", "label")
    )
    scored = (
        embeddings.alias("e")
        .join(
            F.broadcast(probe.alias("p")),
            (F.col("e.label") == F.col("p.label"))
            & (F.col("e.vec_id") != F.col("p.query_id")),
        )
        .select(
            F.col("p.query_id").alias("query_id"),
            F.col("e.vec_id").alias("vec_id"),
            F.floor(
                cosine(F.col("p.q_emb"), F.col("e.embedding")) * 1e6 + F.lit(0.5000001)
            )
            .cast("long")
            .alias("cosine_e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_e6"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine_e6")
    )


IVF_TOPK_SQL = f"""
WITH comp AS (
  -- posexplode twin: indexed-lambda + struct unnest (generate_series
  -- cannot laterally reference the embedding column in DuckDB)
  SELECT vec_id, label, u.dim AS dim, u.val AS val FROM (
    SELECT vec_id, label,
           unnest(list_transform(embedding,
             (x, i) -> {{'dim': i - 1, 'val': x::DOUBLE}})) AS u
    FROM embeddings
  )
),
centroids AS (
  SELECT label,
         list(FLOOR(cval * 1e6 + 0.5000001) / 1e6 ORDER BY dim) AS centroid
  FROM (
    SELECT label, dim, SUM(val) / COUNT(*) AS cval
    FROM comp GROUP BY label, dim
  ) GROUP BY label
),
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
qc AS (
  SELECT q.query_id, q.q_emb, c.label,
         CAST(FLOOR(
           list_dot_product(q.q_emb, c.centroid)
           / (sqrt(list_dot_product(q.q_emb, q.q_emb))
              * sqrt(list_dot_product(c.centroid, c.centroid)))
           * 1e6 + 0.5000001) AS BIGINT) AS cell_score
  FROM q, centroids c
),
probe AS (
  SELECT query_id, q_emb, label FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cell_score DESC, label ASC) AS cell_rank
    FROM qc
  ) WHERE cell_rank <= {N_PROBE}
),
scored AS (
  SELECT p.query_id, e.vec_id,
         CAST(FLOOR(
           list_dot_product(p.q_emb, e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(p.q_emb, p.q_emb))
              * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])))
           * 1e6 + 0.5000001) AS BIGINT) AS cosine_e6
  FROM embeddings e JOIN probe p
    ON e.label = p.label AND e.vec_id != p.query_id
)
SELECT query_id, rank, vec_id, cosine_e6 FROM (
  SELECT query_id, vec_id, cosine_e6,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine_e6 DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""
