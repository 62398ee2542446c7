"""Similarity search over an embedding column (``array<float>``).

Baseline: brute-force cosine top-k — a broadcast of the (small) query
set against the full collection; the collection side never shuffles,
so at 100 TB this scans embarrassingly parallel and the only wide op
is the final per-query top-k (TakeOrdered-style).

Scale path: IVF-style pruning — cuts the scanned fraction to
nprobe/ncells.  Two quantizers: the ``label`` column as the simplest
oracle-checked variant (:func:`ivf_topk`; fixed cardinality, cells grow
O(n)), and learned deterministic k-means (:func:`ivf_kmeans_topk`;
k_cells ∝ √n — the production shape).  Centroid broadcast, cell
pruning, and in-cell rescoring are identical between the two.

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


# ---------------------------------------------------------------------------
# IVF with a LEARNED coarse quantizer (deterministic seeded k-means)
# ---------------------------------------------------------------------------

KM_CELLS = 8
KM_ITERS = 2
KM_NPROBE = 2


def _as_double(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )


def _quantized_mean_centroids(assigned: DataFrame) -> DataFrame:
    """assigned(cell, emb) → (cell, centroid): per-dimension means,
    each quantized to the e6 grid so the (summation-order-dependent)
    float mean cannot leak engine noise into the next assignment round.
    Empty cells simply drop out (a centroid only exists for a cell with
    members), so no null/zero-vector centroid can arise."""
    pe = F.posexplode(F.col("emb"))
    comp = assigned.select("cell", pe.alias("dim", "val"))
    return (
        comp.groupBy("cell", "dim")
        .agg(
            (
                F.floor(
                    (F.sum(F.col("val")) / F.count("*")) * 1e6 + F.lit(0.5000001)
                )
                / 1e6
            ).alias("cval")
        )
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cval"))).alias("pairs"))
        .select(
            "cell",
            F.transform(F.col("pairs"), lambda p: p.getField("cval")).alias("centroid"),
        )
    )


def _assign_cells(base: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cell): nearest centroid by e6-quantized cosine, smallest
    cell id as the deterministic tiebreak.  One broadcast of the (tiny)
    centroid table against the collection scan, then a map-side-partial
    ``max_by`` aggregate — the collection itself never shuffles more
    than its (vec_id, cell) projection."""
    scored = base.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "cell",
        F.floor(
            cosine(F.col("emb"), F.col("centroid")) * 1e6 + F.lit(0.5000001)
        )
        .cast("long")
        .alias("cell_score"),
    )
    return scored.groupBy("vec_id").agg(
        F.expr("max_by(cell, struct(cell_score, -cell))").alias("cell")
    )


def kmeans_centroids(
    base: DataFrame, k_cells: int = KM_CELLS, iters: int = KM_ITERS
) -> DataFrame:
    """(cell, centroid): deterministic seeded Lloyd k-means.

    Seeding: the ``k_cells`` vectors that sort first by
    ``(md5(vec_id), vec_id)`` — a pseudo-random but engine-portable and
    retry-stable choice (the same md5 determinism trick as the minhash
    family).  Each Lloyd round is assign (broadcast + max_by) → new
    quantized per-dim means; quantization makes every round's output
    bit-identical across engines, so the DuckDB twin replays the exact
    same trajectory.

    Scale notes: centroids are O(k_cells × dim) — always broadcast.
    The global seed ordering is the only non-sampled step; production
    seeds from a bounded sample (seed quality only affects recall, not
    correctness).  Lloyd cost per round is one collection scan + a
    (cell, dim)-keyed partial aggregate, rows ≤ k_cells × dim per
    partition after map-side combine.
    """
    seeds = (
        base.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(k_cells)
        .coalesce(1)
        .select(
            "vec_id",
            "emb",
            F.row_number()
            .over(
                Window.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
            )
            .alias("rn"),
        )
        .select((F.col("rn") - 1).cast("int").alias("cell"), F.col("emb").alias("centroid"))
    )
    cent = seeds
    for _ in range(iters):
        assigned = (
            _assign_cells(base, cent).join(base, "vec_id").select("cell", "emb")
        )
        cent = _quantized_mean_centroids(assigned)
    return cent


def ivf_kmeans_topk(
    embeddings: DataFrame,
    k: int = TOP_K,
    k_cells: int = KM_CELLS,
    iters: int = KM_ITERS,
    nprobe: int = KM_NPROBE,
) -> DataFrame:
    """Approximate top-k with a LEARNED coarse quantizer: k-means cells
    replace :func:`ivf_topk`'s fixed-cardinality ``label`` cells — the
    production IVF shape, closing the r02 caveat that label cells grow
    O(n).

    Sizing rule: ``k_cells`` should scale ∝ √n (the classic IVF
    balance: probe cost ≈ nprobe·n/ncells rows + ncells centroid
    scores, minimized at ncells ≈ √(nprobe·n)); 8 cells suit the ~10³
    test collection, 10⁹ vectors want ~10⁴–10⁵ cells.  Recall is
    tunable by ``nprobe`` at fixed cost ∝ nprobe/ncells of the
    collection.
    """
    base = _as_double(embeddings)
    cent = kmeans_centroids(base, k_cells, iters)
    cells = _assign_cells(base, cent)
    queries = base.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    qc = queries.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "q_emb",
        "cell",
        F.floor(
            cosine(F.col("q_emb"), F.col("centroid")) * 1e6 + F.lit(0.5000001)
        )
        .cast("long")
        .alias("cell_score"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cell_score"), F.asc("cell"))
    probe = (
        qc.withColumn("cell_rank", F.row_number().over(wq))
        .where(F.col("cell_rank") <= nprobe)
        .select("query_id", "q_emb", "cell")
    )
    scored = (
        base.join(cells, "vec_id")
        .alias("bc")
        .join(
            F.broadcast(probe.alias("p")),
            (F.col("bc.cell") == F.col("p.cell"))
            & (F.col("bc.vec_id") != F.col("p.query_id")),
        )
        .select(
            F.col("p.query_id").alias("query_id"),
            F.col("bc.vec_id").alias("vec_id"),
            F.floor(
                cosine(F.col("p.q_emb"), F.col("bc.emb")) * 1e6 + F.lit(0.5000001)
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


def _km_cosine_sql(a: str, b: str) -> str:
    return (
        f"CAST(FLOOR(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))) "
        f"* 1e6 + 0.5000001) AS BIGINT)"
    )


def _ivf_kmeans_sql(
    k: int = TOP_K,
    k_cells: int = KM_CELLS,
    iters: int = KM_ITERS,
    nprobe: int = KM_NPROBE,
) -> str:
    """DuckDB twin of :func:`ivf_kmeans_topk`: the Lloyd rounds are
    unrolled as chained CTEs (same pattern as the PageRank oracle), so
    the oracle replays the identical quantized k-means trajectory."""
    ctes = [
        "base AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)",
        f"""cent0 AS MATERIALIZED (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS INTEGER) AS cell,
         emb AS centroid
  FROM (SELECT vec_id, emb FROM base ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {k_cells})
)""",
    ]
    for t in range(1, iters + 1):
        ctes.append(f"""a{t} AS (
  SELECT vec_id, cell FROM (
    SELECT b.vec_id, c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY {_km_cosine_sql("b.emb", "c.centroid")} DESC, c.cell ASC) AS rn
    FROM base b, cent{t - 1} c
  ) WHERE rn = 1
)""")
        ctes.append(f"""cent{t} AS MATERIALIZED (
  SELECT cell, list(FLOOR(cval * 1e6 + 0.5000001) / 1e6 ORDER BY dim) AS centroid
  FROM (
    SELECT cell, u.dim AS dim, SUM(u.val) / COUNT(*) AS cval FROM (
      SELECT a.cell, unnest(list_transform(b.emb, (x, i) -> {{'dim': i - 1, 'val': x}})) AS u
      FROM a{t} a JOIN base b USING (vec_id)
    ) GROUP BY cell, u.dim
  ) GROUP BY cell
)""")
    final = f"cent{iters}"
    ctes.append(f"""cells AS (
  SELECT vec_id, cell FROM (
    SELECT b.vec_id, c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY {_km_cosine_sql("b.emb", "c.centroid")} DESC, c.cell ASC) AS rn
    FROM base b, {final} c
  ) WHERE rn = 1
)""")
    ctes.append(f"""q AS (
  SELECT vec_id AS query_id, emb AS q_emb FROM base WHERE vec_id < {N_QUERIES}
)""")
    ctes.append(f"""probe AS (
  SELECT query_id, q_emb, cell FROM (
    SELECT q.query_id, q.q_emb, c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY {_km_cosine_sql("q.q_emb", "c.centroid")} DESC, c.cell ASC) AS cell_rank
    FROM q, {final} c
  ) WHERE cell_rank <= {nprobe}
)""")
    ctes.append(f"""scored AS (
  SELECT p.query_id, b.vec_id,
         {_km_cosine_sql("p.q_emb", "b.emb")} AS cosine_e6
  FROM base b JOIN cells ON cells.vec_id = b.vec_id
  JOIN probe p ON p.cell = cells.cell AND b.vec_id != p.query_id
)""")
    joined_ctes = ",\n".join(ctes)
    return f"""WITH {joined_ctes}
SELECT query_id, rank, vec_id, cosine_e6 FROM (
  SELECT query_id, vec_id, cosine_e6,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine_e6 DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}"""


IVF_KMEANS_SQL = _ivf_kmeans_sql()


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (label-blocked)
# ---------------------------------------------------------------------------

NEAR_DUP_COSINE_E6 = 950_000  # cosine >= 0.95
EMB_DUP_OFFSET = 1_000_000
EMB_PERTURB = 0.25  # on 64-dim unit vectors → cosine ≈ 0.968 vs original


def augment_embeddings(embeddings: DataFrame) -> DataFrame:
    """embeddings + a perturbed copy of every 20th vector (first
    component +0.25, same label).  The shipped synthetic table has no
    near-identical pairs (max same-label cosine ≈ 0.47), so — like
    ``dedup.augment_docs`` — both engines derive the same augmented set
    to make the near-dup output non-trivial and hash-checkable.
    Everything is cast to double BEFORE perturbing so Spark and DuckDB
    see bit-identical inputs."""
    base = embeddings.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    near = base.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + EMB_DUP_OFFSET).alias("vec_id"),
        "label",
        F.transform(
            F.col("emb"),
            lambda x, i: x + F.when(i == 0, F.lit(EMB_PERTURB)).otherwise(F.lit(0.0)),
        ).alias("emb"),
    )
    return base.unionAll(near)


AUGMENT_EMB_SQL = f"""
  SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
  UNION ALL
  SELECT vec_id + {EMB_DUP_OFFSET} AS vec_id, label,
         list_transform(embedding::DOUBLE[],
           (x, i) -> x + CASE WHEN i = 1 THEN {EMB_PERTURB} ELSE 0 END) AS emb
  FROM embeddings WHERE vec_id % 20 = 0
"""


MAX_CELL_ROWS = 4096  # hard cap on rows per blocking cell
SRP_REFINE_PLANES = 16  # sign bits available for refining oversized cells


def embedding_near_dups(
    embeddings: DataFrame,
    threshold_e6: int = NEAR_DUP_COSINE_E6,
    max_cell_rows: int = MAX_CELL_ROWS,
) -> DataFrame:
    """(vec_a, vec_b, cosine_e6): pairs above the cosine threshold,
    blocked by the ``label`` coarse cell (same quantizer as
    :func:`ivf_topk`) so the self-join shuffles on the cell key and only
    same-cell pairs are ever scored — no O(n²) cross join forms.

    Cell-size invariant (the thing that keeps this sub-quadratic at
    100 TB): a label cell holding ``cnt`` rows is refined by
    ``ceil(log2(cnt / max_cell_rows))`` SRP sign bits, so every blocking
    cell has EXPECTED size <= ``max_cell_rows`` and per-cell pair work
    is O(max_cell_rows²) regardless of total data volume.  The
    refinement key is the deterministic md5-derived SRP bucket
    (:func:`srp_buckets`), identical across engines and across runs.
    Refinement depth is clamped at ``SRP_REFINE_PLANES`` bits, so the
    invariant holds up to ``max_cell_rows * 2**SRP_REFINE_PLANES``
    rows per label (cap 4096 × 2¹⁶ ≈ 2.7e8); past that, raise
    ``SRP_REFINE_PLANES`` (each extra plane doubles the bound).

    Common-case fast path: one tiny aggregate action first reads the
    max cell size; when NO cell exceeds the cap (the expected state
    with a well-sized quantizer, and what the shipped testdata
    satisfies), the SRP bucket computation and its groupBy/join are
    skipped entirely — the plan is plain label blocking, bit-identical
    to what the DuckDB oracle states.  Tests assert that equivalence
    and exercise the refined path with a tiny cap.

    Scoring runs in an Arrow-batched ``applyInPandas`` over the
    blocking cells — the one deliberate Python hot path in the repo,
    and the r10 sf10 decade is why: the previous JVM self-join scored
    281M candidate pairs with an INTERPRETED zip_with+aggregate dot
    (higher-order functions don't codegen) at ~284 s; per-cell numpy
    scoring is 22 s (12.7×), ships each cell's vectors ONCE instead of
    duplicating both arrays onto every pair row, and produces
    BIT-IDENTICAL values: the dot accumulates dim-sequentially
    (``acc += G[:,i] * G[q,i]`` — per pair the summation order is the
    exact left fold ``((0 + a0·b0) + a1·b1) + …``), which is the same
    IEEE operation sequence as the SQL ``aggregate`` fold and the
    DuckDB twin; products round before adding (separate numpy ufuncs,
    never FMA-fused), float32→float64 widening is exact, and the final
    floor(dot/(na·nb)·1e6 + 0.5000001) is the identical op chain.
    Equality is pinned by tests on the fast path, the refined path,
    and at a low threshold where quantization boundaries are dense.
    Per-task memory is O(block × cell) — rows are scored in 1024-row
    blocks against the cell, so a clamped-rbits mega-cell degrades in
    time, not task state.

    Trade-off (documented, standard for blocked dedup): a near-dup pair
    split across cells — by label or, in an oversized cell, by an SRP
    bit — is missed; mitigate with multi-probe assignment, not by
    widening the join.
    """
    # NULL-label rows must emit NO pairs: the pre-Arrow form was an
    # a.label == b.label equi-join (never NULL-matching, like the SQL
    # twin's JOIN), but groupBy would collect all NULL labels into one
    # scoring cell — filter them out to keep the blocking contract.
    e = augment_embeddings(embeddings).where(F.col("label").isNotNull())
    # Per-label cell sizes: one tiny aggregate, also used to decide the
    # fast path (max over it is one scalar action on ncells rows).
    counts = e.groupBy("label").agg(F.count("*").alias("cnt"))
    max_cell = counts.agg(F.max("cnt")).first()[0] or 0
    if max_cell <= max_cell_rows:
        # fast path: no oversized cell → no SRP refinement work at all
        e = e.select("vec_id", "label", "emb", F.lit(0).alias("subcell"))
    else:
        rbits = counts.select(
            "label",
            F.when(F.col("cnt") <= max_cell_rows, F.lit(0))
            .otherwise(
                F.least(
                    F.ceil(F.log2(F.col("cnt") / F.lit(max_cell_rows))),
                    F.lit(SRP_REFINE_PLANES),
                )
            )
            .cast("int")
            .alias("rbits"),
        )
        buckets = srp_buckets(
            e.select("vec_id", F.col("emb").alias("embedding")), SRP_REFINE_PLANES
        )
        e = (
            e.join(F.broadcast(rbits), "label")
            .join(buckets, "vec_id")
            .select(
                "vec_id",
                "label",
                "emb",
                # low `rbits` SRP bits of the bucket; 0 when no refinement
                # (python-side shiftleft needs a literal count; SQL's takes
                # a column — same workaround as srp_buckets)
                F.expr("pmod(bucket, shiftleft(1L, rbits))")
                .cast("long")
                .alias("subcell"),
            )
        )
    thr = int(threshold_e6)

    def _score_cell(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        G = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
        m, d = G.shape
        # norm via the same dim-sequential fold as the dot (sqrt of the
        # identical accumulation the SQL _norm states)
        nsq = np.zeros(m)
        for i in range(d):
            nsq += G[:, i] * G[:, i]
        nrm = np.sqrt(nsq)
        out_a, out_b, out_c = [], [], []
        block = 1024
        for s in range(0, m, block):
            blk = slice(s, min(s + block, m))
            acc = np.zeros((blk.stop - blk.start, m))
            for i in range(d):
                acc += np.outer(G[blk, i], G[:, i])
            cos = np.floor(acc / np.outer(nrm[blk], nrm) * 1e6 + 0.5000001)
            ii, jj = np.nonzero(cos >= thr)
            keep = ids[blk][ii] < ids[jj]
            out_a.append(ids[blk][ii][keep])
            out_b.append(ids[jj][keep])
            out_c.append(cos[ii, jj][keep])
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a).astype(np.int64),
                "vec_b": np.concatenate(out_b).astype(np.int64),
                "cosine_e6": np.concatenate(out_c).astype(np.int64),
            }
        )

    return e.groupBy("label", "subcell").applyInPandas(
        _score_cell, "vec_a long, vec_b long, cosine_e6 long"
    )


EMBEDDING_NEAR_DUP_SQL = f"""
WITH aug AS ({AUGMENT_EMB_SQL}),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(FLOOR(
           list_dot_product(a.emb, b.emb)
           / (sqrt(list_dot_product(a.emb, a.emb))
              * sqrt(list_dot_product(b.emb, b.emb)))
           * 1e6 + 0.5000001) AS BIGINT) AS cosine_e6
  FROM aug a JOIN aug b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine_e6 FROM pairs
WHERE cosine_e6 >= {NEAR_DUP_COSINE_E6}
"""


# ---------------------------------------------------------------------------
# Random-hyperplane (SRP) LSH: sign-bit buckets over embeddings
# ---------------------------------------------------------------------------

N_PLANES = 8
EMB_DIM = 64


def _plane_weight(p: Column, j: Column) -> Column:
    """Deterministic pseudo-random weight in [-1, 1] for plane p, dim j:
    a 60-bit md5 integer of "p|j" mapped through mod 2001 — bit-identical
    in Spark and DuckDB, so buckets match across engines (the same
    portability trick as the dedup minhash family)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", p.cast("string"), j.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return (F.pmod(h, F.lit(2001)) - 1000) / 1000.0


def srp_buckets(embeddings: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, bucket): bucket = the n_planes sign bits of the dot
    products with the fixed hyperplanes.  One broadcast of n_planes
    small arrays against the collection scan — no shuffle until the
    bucket groupBy, and that key is near-uniform by construction."""
    spark = embeddings.sparkSession
    planes = (
        spark.range(n_planes)
        .select(
            F.col("id").cast("int").alias("p"),
            F.transform(
                F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
                lambda j: _plane_weight(F.col("id"), j),
            ).alias("w"),
        )
    )
    scored = embeddings.crossJoin(F.broadcast(planes)).select(
        "vec_id",
        "p",
        (_dot(F.col("embedding"), F.col("w")) > 0).cast("long").alias("bit"),
    )
    # python-side shiftleft needs a literal bit count; SQL's accepts a
    # column expression
    return scored.groupBy("vec_id").agg(
        F.sum(F.expr("shiftleft(bit, p)")).cast("long").alias("bucket")
    )


def srp_lsh_near_dups(
    embeddings: DataFrame,
    threshold_e6: int = NEAR_DUP_COSINE_E6,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """(vec_a, vec_b, cosine_e6): near-dup pairs found via SRP-LSH
    blocking — candidates share ALL sign bits (same bucket), then exact
    cosine rescoring on candidates only.  Complements the label-blocked
    :func:`embedding_near_dups`: no quantizer needed, recall tunable by
    n_planes (fewer planes → bigger buckets → higher recall, more
    rescoring).

    Scale invariant: expected bucket size is n / 2^n_planes, so
    ``n_planes`` must grow ~log2(n / target_bucket_rows) with the
    collection — 8 planes suits ~10⁵ rows at ~400/bucket; at 10¹⁰ rows
    use ~25 planes (and multi-probe / repeated bands to recover the
    recall each extra plane costs).  Runs on the same augmented set so
    planted near-dups
    exist; deterministic in both engines, so the oracle finds the exact
    same pairs (including the same LSH misses)."""
    aug = augment_embeddings(embeddings)
    b = srp_buckets(aug.select("vec_id", F.col("emb").alias("embedding")), n_planes)
    withb = aug.join(b, "vec_id")
    pairs = (
        withb.alias("a")
        .join(
            withb.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.floor(
                cosine(F.col("a.emb"), F.col("b.emb")) * 1e6 + F.lit(0.5000001)
            )
            .cast("long")
            .alias("cosine_e6"),
        )
    )
    return pairs.where(F.col("cosine_e6") >= threshold_e6)


def srp_lsh_near_dups_multiprobe(
    embeddings: DataFrame,
    threshold_e6: int = NEAR_DUP_COSINE_E6,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """(vec_a, vec_b, cosine_e6): SRP-LSH near-dups with 1-bit
    multi-probe — the recall-recovery path the single-bucket variant's
    docstring defers to.  Each vector probes its own bucket plus the
    ``n_planes`` buckets at Hamming distance 1 (one sign bit flipped),
    so candidate pairs are those whose sign-bit signatures differ in AT
    MOST one plane; a vector whose projection sits just on the wrong
    side of one hyperplane no longer loses its pair.

    Scale shape: the probe expansion replicates only the tiny
    (vec_id, bucket) relation ×(n_planes+1) — never the embeddings —
    and the join stays a bucket-keyed equi join.  Expected extra
    rescoring cost ≈ (n_planes+1)× the single-probe candidate volume,
    the standard multi-probe trade: more planes (smaller buckets) plus
    probes recovers the recall each extra plane costs, at a controlled
    constant factor instead of exponentially larger buckets.

    Pair dedup: a Hamming-1 pair is found from both sides (a probes
    into b's bucket and vice versa), so candidates are de-duplicated
    on (vec_a, vec_b) before the exact rescoring."""
    aug = augment_embeddings(embeddings)
    b = srp_buckets(aug.select("vec_id", F.col("emb").alias("embedding")), n_planes)
    # probe set: own bucket (p = -1) + each 1-bit flip
    spark = embeddings.sparkSession
    planes = spark.range(-1, n_planes).select(F.col("id").cast("int").alias("p"))
    probes = b.crossJoin(F.broadcast(planes)).select(
        "vec_id",
        F.when(F.col("p") < 0, F.col("bucket"))
        .otherwise(F.expr("bucket ^ shiftleft(1L, p)"))
        .cast("long")
        .alias("probe_bucket"),
    )
    cands = (
        probes.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.probe_bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )
    withe = aug.select("vec_id", "emb")
    pairs = (
        cands.join(
            withe.select(
                F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a")
            ),
            "vec_a",
        )
        .join(
            withe.select(
                F.col("vec_id").alias("vec_b"), F.col("emb").alias("emb_b")
            ),
            "vec_b",
        )
        .select(
            "vec_a",
            "vec_b",
            F.floor(
                cosine(F.col("emb_a"), F.col("emb_b")) * 1e6 + F.lit(0.5000001)
            )
            .cast("long")
            .alias("cosine_e6"),
        )
    )
    return pairs.where(F.col("cosine_e6") >= threshold_e6)


def _srp_weight_sql(p_expr: str, j_expr: str) -> str:
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substring(md5({p_expr} || '|' || {j_expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (14 - i)}"
        for i in range(15)
    )
    return f"((({digits}) % 2001) - 1000) / 1000.0"


SRP_LSH_SQL = f"""
WITH aug AS MATERIALIZED ({AUGMENT_EMB_SQL}),
planes AS MATERIALIZED (
  SELECT p, list(w ORDER BY j) AS w FROM (
    SELECT p.range AS p, j.range AS j,
           {_srp_weight_sql("p.range::VARCHAR", "j.range::VARCHAR")} AS w
    FROM range({N_PLANES}) p, range({EMB_DIM}) j
  ) GROUP BY p
),
buckets AS MATERIALIZED (
  SELECT vec_id,
         CAST(SUM(CASE WHEN list_dot_product(a.emb, pl.w) > 0
                  THEN 1 << pl.p ELSE 0 END) AS BIGINT) AS bucket
  FROM aug a, planes pl GROUP BY vec_id
),
withb AS (SELECT a.vec_id, a.emb, b.bucket FROM aug a JOIN buckets b USING (vec_id))
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(FLOOR(
         list_dot_product(a.emb, b.emb)
         / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb)))
         * 1e6 + 0.5000001) AS BIGINT) AS cosine_e6
FROM withb a JOIN withb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE CAST(FLOOR(
        list_dot_product(a.emb, b.emb)
        / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb)))
        * 1e6 + 0.5000001) AS BIGINT) >= {NEAR_DUP_COSINE_E6}
"""


SRP_MULTIPROBE_SQL = f"""
WITH aug AS MATERIALIZED ({AUGMENT_EMB_SQL}),
planes AS MATERIALIZED (
  SELECT p, list(w ORDER BY j) AS w FROM (
    SELECT p.range AS p, j.range AS j,
           {_srp_weight_sql("p.range::VARCHAR", "j.range::VARCHAR")} AS w
    FROM range({N_PLANES}) p, range({EMB_DIM}) j
  ) GROUP BY p
),
buckets AS MATERIALIZED (
  SELECT vec_id,
         CAST(SUM(CASE WHEN list_dot_product(a.emb, pl.w) > 0
                  THEN 1 << pl.p ELSE 0 END) AS BIGINT) AS bucket
  FROM aug a, planes pl GROUP BY vec_id
),
probes AS (
  SELECT vec_id,
         CASE WHEN t.p < 0 THEN bucket
              ELSE xor(bucket, CAST(1 AS BIGINT) << t.p) END AS probe_bucket
  FROM buckets, range(-1, {N_PLANES}) t(p)
),
cands AS MATERIALIZED (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM probes a JOIN buckets b
    ON a.probe_bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine_e6 FROM (
  SELECT c.vec_a, c.vec_b,
         CAST(FLOOR(
           list_dot_product(ea.emb, eb.emb)
           / (sqrt(list_dot_product(ea.emb, ea.emb))
              * sqrt(list_dot_product(eb.emb, eb.emb)))
           * 1e6 + 0.5000001) AS BIGINT) AS cosine_e6
  FROM cands c
  JOIN aug ea ON ea.vec_id = c.vec_a
  JOIN aug eb ON eb.vec_id = c.vec_b
) WHERE cosine_e6 >= {NEAR_DUP_COSINE_E6}
"""


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


# --------------------------------------------------------------------------
# Int8 embedding quantization (x100): per-dimension symmetric scaling
# to [-127, 127] — the storage/serving compression step (4x smaller
# vectors, SIMD-friendly int dot products) every large ANN deployment
# runs before sharding its index.  Scale shape: the per-dim max-abs
# scales are ONE bounded aggregate (dim rows), rebuilt as a 1-row
# array relation and broadcast back onto the scan — the collection
# never shuffles; quantization is a zip_with projection.  Output is
# INTEGER-ONLY (codes + L1 norm), so the oracle gate has no float
# boundary at all: round-half-up = floor(x + 0.5) on both engines,
# over bit-identical double arithmetic from the same float inputs.
# --------------------------------------------------------------------------


def quantize_embeddings(emb: DataFrame) -> DataFrame:
    """(vec_id, n_dims, q_l1, q_codes): per-dim symmetric int8 codes,
    comma-joined, plus the quantized L1 norm."""
    per_dim = (
        emb.select(F.posexplode("embedding").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.max(F.abs(F.col("val").cast("double"))).alias("s"))
    )
    scales = per_dim.agg(
        F.array_sort(F.collect_list(F.struct("pos", "s"))).alias("ps")
    ).select(F.transform("ps", lambda x: x["s"]).alias("scales"))
    q = F.zip_with(
        "embedding",
        "scales",
        lambda v, s: F.when(
            s > 0,
            F.floor(v.cast("double") / s * 127 + F.lit(0.5)).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return emb.crossJoin(F.broadcast(scales)).select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dims"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
        ).alias("q_l1"),
        F.array_join(q.cast("array<string>"), ",").alias("q_codes"),
    )


QUANTIZE_SQL = """
WITH per_dim AS (
  SELECT pos, MAX(ABS(v)) AS s FROM (
    SELECT unnest(range(1, len(embedding) + 1)) AS pos,
           unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
    FROM embeddings)
  GROUP BY pos
),
scales AS (SELECT list(s ORDER BY pos) AS sc FROM per_dim),
qz AS (
  SELECT vec_id, len(embedding) AS n_dims,
         list_transform(range(1, len(embedding) + 1),
           i -> CASE WHEN sc[i] > 0
                THEN CAST(FLOOR(CAST(embedding[i] AS DOUBLE) / sc[i] * 127
                                + 0.5) AS BIGINT)
                ELSE 0 END) AS q
  FROM embeddings CROSS JOIN scales
)
SELECT vec_id,
       CAST(n_dims AS BIGINT) AS n_dims,
       CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1,
       list_aggregate(list_transform(q, x -> CAST(x AS VARCHAR)),
                      'string_agg', ',') AS q_codes
FROM qz"""


# ---------------------------------------------------------------------------
# Label-noise audit (x106): confident-learning-style QA for the
# embedding table's labels — for a deterministic audit sample, find
# each vector's k nearest neighbors (cosine) and compare its own
# label to the neighborhood majority; a disagreeing majority flags a
# likely mislabel.  Scale shape: the audit sample is a FIXED ROW
# BUDGET — the ``budget`` rows with the smallest md5(seed|vec_id)
# (the bottom-k-hash election, sampling.bottom_k_sample), NOT a
# fraction of the table — so the broadcast query side is O(budget) at
# ANY collection size and the brute-force score product is
# N * budget, never N²/c (VERDICT r06 #2: the old vec_id % 23 sample
# grew linearly with the table and would break the broadcast at
# 100×).  Queries broadcast to the collection scan exactly like x5
# (the collection never shuffles for scoring); the top-k relation is
# budget*k rows and broadcasts onto the label lookup; the majority is
# g7's argmax-as-MIN-over-struct(-count, label) — an aggregate, never
# a per-query sort.
# ---------------------------------------------------------------------------

LABEL_AUDIT_BUDGET = 32  # fixed audit budget (rows), any collection size
LABEL_AUDIT_SEED = "label-audit-0"
LABEL_NB_K = 10


def label_noise_audit(
    embeddings: DataFrame,
    k: int = LABEL_NB_K,
    budget: int = LABEL_AUDIT_BUDGET,
    seed: str = LABEL_AUDIT_SEED,
) -> DataFrame:
    """(vec_id, own_label, maj_label, n_agree, flagged) for each
    audited vector; majority ties break toward the smaller label."""
    from .sampling import bottom_k_sample

    audited = bottom_k_sample(embeddings, "vec_id", budget, seed)
    topk = cosine_topk(embeddings, queries=audited, k=k)
    nb = embeddings.select("vec_id", "label").join(
        F.broadcast(topk.select("query_id", "vec_id")), "vec_id"
    )
    counts = nb.groupBy("query_id", "label").agg(F.count("*").alias("cnt"))
    maj = (
        counts.groupBy("query_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("neg"), F.col("label").alias("l")
                )
            ).alias("m")
        )
        .select("query_id", F.col("m.l").alias("maj_label"))
    )
    own = audited.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("own_label")
    )
    agree = counts.join(
        own, (counts.query_id == own.query_id) & (counts.label == own.own_label)
    ).select(counts.query_id.alias("qid"), F.col("cnt").alias("n_agree"))
    return (
        own.join(maj, "query_id")
        .join(agree, F.col("query_id") == F.col("qid"), "left")
        .select(
            F.col("query_id").alias("vec_id"),
            "own_label",
            "maj_label",
            F.coalesce("n_agree", F.lit(0)).cast("long").alias("n_agree"),
            (F.col("own_label") != F.col("maj_label"))
            .cast("long")
            .alias("flagged"),
        )
    )


def label_noise_sql(
    k: int = LABEL_NB_K,
    budget: int = LABEL_AUDIT_BUDGET,
    seed: str = LABEL_AUDIT_SEED,
) -> str:
    """DuckDB twin: identical bottom-k-hash audit election,
    quantized-cosine top-k and (cnt DESC, label ASC) majority."""
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb, label AS own_label
  FROM embeddings
  ORDER BY md5('{seed}' || '|' || CAST(vec_id AS VARCHAR))
  LIMIT {budget}
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
),
topk AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY cosine_e6 DESC, vec_id ASC) AS rank
    FROM scored)
  WHERE rank <= {k}
),
counts AS (
  SELECT t.query_id, e.label, COUNT(*) AS cnt
  FROM topk t JOIN embeddings e USING (vec_id)
  GROUP BY 1, 2
),
maj AS (
  SELECT query_id, label AS maj_label FROM (
    SELECT query_id, label,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY cnt DESC, label ASC) AS rn
    FROM counts)
  WHERE rn = 1
)
SELECT q.query_id AS vec_id, q.own_label, m.maj_label,
       CAST(COALESCE(a.cnt, 0) AS BIGINT) AS n_agree,
       CAST(q.own_label != m.maj_label AS BIGINT) AS flagged
FROM q
JOIN maj m USING (query_id)
LEFT JOIN counts a ON a.query_id = q.query_id AND a.label = q.own_label"""


# ---------------------------------------------------------------------------
# Label-agreement kappa (x111) — Cohen's kappa between the GOLD label
# column and the label PREDICTED by nearest-centroid assignment (the
# x6 coarse quantizer used as a 1-NN classifier).  The chance-corrected
# agreement score a labeling pipeline reports before trusting weak /
# model-generated labels: po = observed agreement, pe = agreement
# expected from the marginals alone, kappa = (po − pe) / (1 − pe).
#
# EXACT-INTEGER core: kappa = (n·diag − Σ_l row_l·col_l)
#                             / (n² − Σ_l row_l·col_l)
# — every term is an integer from the confusion matrix, so both
# engines quantize one identical double division at the end.  Scale
# shape: centroids are an L×dim aggregate broadcast back to the scan
# (the collection never shuffles for assignment); the argmax is MIN
# over struct(−score, label) — an aggregate, never a per-row sort; the
# confusion matrix is ≤ L² rows.  Centroid components are e6-quantized
# before scoring (the x6 rule) so float mean noise cannot flip an
# assignment across engines.
# ---------------------------------------------------------------------------


def label_agreement_kappa(embeddings: DataFrame) -> DataFrame:
    """One row: (n, n_agree, po_e6, pe_e6, kappa_e6).

    Assumes the label set is classifier-sized (10s-1000s of classes):
    the L×dim centroid table must broadcast.  For open-vocabulary
    label spaces, swap the coarse quantizer for the learned-k-means
    cells (ivf_kmeans_topk) whose k_cells ∝ √n stays broadcastable."""
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
            F.col("label").alias("c_label"),
            F.transform(F.col("pairs"), lambda p: p.getField("cval")).alias(
                "centroid"
            ),
        )
    )
    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        F.col("label").alias("gold"),
        "c_label",
        F.floor(
            cosine(F.col("embedding"), F.col("centroid")) * 1e6
            + F.lit(0.5000001)
        )
        .cast("long")
        .alias("score_e6"),
    )
    pred = scored.groupBy("vec_id", "gold").agg(
        F.min(
            F.struct(
                (-F.col("score_e6")).alias("ns"),
                F.col("c_label").alias("l"),
            )
        )["l"].alias("pred")
    )
    conf = pred.groupBy("gold", "pred").agg(F.count("*").alias("c"))
    # n, diag, and Σ row_l·col_l from the ≤L² confusion relation
    rows = conf.groupBy("gold").agg(F.sum("c").alias("row_n"))
    cols = conf.groupBy("pred").agg(F.sum("c").alias("col_n"))
    rc = (
        rows.join(cols, rows.gold == cols.pred, "full")
        .select(
            (
                F.coalesce("row_n", F.lit(0)) * F.coalesce("col_n", F.lit(0))
            ).alias("rxc")
        )
        .agg(F.sum("rxc").alias("sum_rc"))
    )
    tot = conf.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("gold") == F.col("pred"), F.col("c")).otherwise(0)).alias(
            "diag"
        ),
    )
    return tot.crossJoin(rc).select(
        F.col("n").cast("long").alias("n"),
        F.col("diag").cast("long").alias("n_agree"),
        F.floor(
            F.col("diag").cast("double") / F.col("n") * 1e6 + F.lit(0.5000001)
        )
        .cast("long")
        .alias("po_e6"),
        F.floor(
            F.col("sum_rc").cast("double") / (F.col("n") * F.col("n")) * 1e6
            + F.lit(0.5000001)
        )
        .cast("long")
        .alias("pe_e6"),
        # kappa is UNDEFINED when pe = 1 (one label everywhere:
        # n² == Σ row·col) — emit NULL, never a NaN-cast 0 (the g16
        # zero-variance guard; DuckDB's 0/0 is NULL, Spark's would
        # CAST(NaN AS LONG) = 0 and silently hash-mismatch)
        F.when(
            F.col("n") * F.col("n") != F.col("sum_rc"),
            F.floor(
                (F.col("n") * F.col("diag") - F.col("sum_rc")).cast("double")
                / (F.col("n") * F.col("n") - F.col("sum_rc"))
                * 1e6
                + F.lit(0.5000001)
            ).cast("long"),
        ).alias("kappa_e6"),
    )


LABEL_KAPPA_SQL = """
WITH comp AS (
  SELECT vec_id, label, u.dim AS dim, u.val AS val FROM (
    SELECT vec_id, label,
           unnest(list_transform(embedding,
             (x, i) -> {'dim': i - 1, 'val': x::DOUBLE})) AS u
    FROM embeddings
  )
),
centroids AS (
  SELECT label AS c_label,
         list(FLOOR(cval * 1e6 + 0.5000001) / 1e6 ORDER BY dim) AS centroid
  FROM (
    SELECT label, dim, SUM(val) / COUNT(*) AS cval
    FROM comp GROUP BY label, dim
  ) GROUP BY label
),
scored AS (
  SELECT e.vec_id, e.label AS gold, c.c_label,
         CAST(FLOOR(
           list_dot_product(e.embedding::DOUBLE[], c.centroid)
           / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
              * sqrt(list_dot_product(c.centroid, c.centroid)))
           * 1e6 + 0.5000001) AS BIGINT) AS score_e6
  FROM embeddings e, centroids c
),
pred AS (
  SELECT vec_id, gold, c_label AS pred FROM (
    SELECT vec_id, gold, c_label,
           ROW_NUMBER() OVER (
             PARTITION BY vec_id ORDER BY score_e6 DESC, c_label ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
conf AS (
  SELECT gold, pred, COUNT(*) AS c FROM pred GROUP BY gold, pred
),
rc AS (
  SELECT SUM(COALESCE(r.row_n, 0) * COALESCE(k.col_n, 0)) AS sum_rc
  FROM (SELECT gold, SUM(c) AS row_n FROM conf GROUP BY gold) r
  FULL JOIN (SELECT pred, SUM(c) AS col_n FROM conf GROUP BY pred) k
    ON r.gold = k.pred
),
tot AS (
  SELECT SUM(c) AS n,
         SUM(CASE WHEN gold = pred THEN c ELSE 0 END) AS diag
  FROM conf
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(diag AS BIGINT) AS n_agree,
       CAST(FLOOR(CAST(diag AS DOUBLE) / n * 1e6 + 0.5000001) AS BIGINT)
         AS po_e6,
       CAST(FLOOR(CAST(sum_rc AS DOUBLE) / (n * n) * 1e6 + 0.5000001)
            AS BIGINT) AS pe_e6,
       CASE WHEN n * n = sum_rc THEN NULL
            ELSE CAST(FLOOR(CAST(n * diag - sum_rc AS DOUBLE)
                            / (n * n - sum_rc) * 1e6 + 0.5000001) AS BIGINT)
       END AS kappa_e6
FROM tot, rc
"""


# ---------------------------------------------------------------------------
# Product quantization (x117) — the codebook path real billion-vector
# ANN runs on (IVF-PQ): split the 64-dim embedding into M=2 subspaces,
# learn a K=4 codebook per subspace with the SAME deterministic seeded
# Lloyd machinery as ivf_kmeans, encode every vector as M small codes,
# and answer queries by Asymmetric Distance Computation — per query,
# one M×K table of subspace scores, each candidate's approximate score
# a TABLE LOOKUP SUM instead of a 64-dim dot product.
#
# Inner-product flavor (MIPS): subspace similarity is the plain dot
# product — Σ_m dot(q_m, c_{code_m}) is exactly the ADC approximation
# of dot(q, x) — which also avoids cosine's zero-norm edge on
# sub-slices.  Determinism: sub-centroids are e6-quantized per Lloyd
# round (the x6 rule) and all scores are e6 integers, so the DuckDB
# twin replays the identical trajectory.
#
# Scale shape: codebooks are M×K×(dim/M) doubles — always broadcast;
# the code table is the COMPRESSED collection (M small ints per
# vector — 2×2 bits here, 8×8 bits in production: a 256-byte vector
# becomes 8 bytes); scoring is codes_wide × broadcast(query tables)
# with the lookup sum as a column expression — the collection never
# shuffles, and the only wide op is the final per-query top-k window.
# At 10⁹ vectors this is the difference between scanning 256 GB of
# floats and 8 GB of codes per query batch.
# ---------------------------------------------------------------------------

PQ_M = 2        # subspaces
PQ_K = 4        # codewords per subspace
PQ_ITERS = 2    # Lloyd rounds per subspace


def _dot_e6(a: Column, b: Column) -> Column:
    return F.floor(_dot(a, b) * 1e6 + F.lit(0.5000001)).cast("long")


def _pq_assign(sub: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cell): nearest sub-centroid by e6-quantized DOT,
    smallest cell as tiebreak (max_by over struct, an aggregate)."""
    scored = sub.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cell",
        _dot_e6(F.col("emb"), F.col("centroid")).alias("s"),
    )
    return scored.groupBy("vec_id").agg(
        F.expr("max_by(cell, struct(s, -cell))").alias("cell")
    )


def _pq_codebook(sub: DataFrame, k: int, iters: int) -> DataFrame:
    """(cell, centroid) for ONE subspace: seeded deterministic Lloyd
    (seeds = first k by (md5(vec_id), vec_id), the kmeans_centroids
    rule), dot-product assignment, e6-quantized means."""
    seeds = (
        sub.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(k)
        .coalesce(1)
        .select(
            "emb",
            F.row_number()
            .over(
                Window.orderBy(
                    F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
                )
            )
            .alias("rn"),
        )
        .select((F.col("rn") - 1).cast("int").alias("cell"), F.col("emb").alias("centroid"))
    )
    cent = seeds
    for _ in range(iters):
        assigned = (
            _pq_assign(sub, cent).join(sub, "vec_id").select("cell", "emb")
        )
        cent = _quantized_mean_centroids(assigned)
    return cent


def _pq_code_expr(sub: Column, book: list[list[float]]) -> Column:
    """Inline argmax-by-(dot, -cell) over the LITERAL codebook: one
    pure column expression, no join, no aggregate — the production
    serving shape (codebooks are driver-known constants after
    training)."""
    dots = [
        _dot_e6(sub, F.array(*[F.lit(float(v)) for v in cvec]))
        for cvec in book
    ]
    best = F.lit(0)
    best_s = dots[0]
    for j in range(1, len(dots)):
        cond = dots[j] > best_s
        best = F.when(cond, F.lit(j)).otherwise(best)
        best_s = F.when(cond, dots[j]).otherwise(best_s)
    return best


def pq_topk(
    embeddings: DataFrame,
    k: int = TOP_K,
    m_sub: int = PQ_M,
    k_codes: int = PQ_K,
    iters: int = PQ_ITERS,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """(query_id, rank, vec_id, adc_e6): ADC top-k per query
    (vec_id < N_QUERIES), self-match excluded.

    Serving is SHUFFLE-FREE up to the final top-k window: after Lloyd
    training, each M×K×(dim/M) codebook crosses to the driver once
    (the S4 scalar channel — e6-quantized, so engine-portable) and
    folds back as literals; per-vector codes, per-query tables and the
    ADC lookup sum are then ONE projection over the collection scan
    crossed with the broadcast Q-row query tables.

    ``books`` serves with a FROZEN pre-trained codebook (the real
    production flow: train once, serve many query batches); None
    trains in-line."""
    base = _as_double(embeddings)
    # sub-dimension from one first-row peek (a single tiny action)
    d_total = (
        embeddings.select(F.size("embedding").alias("d")).limit(1).collect()[0]["d"]
    )
    d_sub = d_total // m_sub

    if books is None:
        # train per-subspace codebooks, then pin them driver-side
        books = []
        for m in range(m_sub):
            sub = base.select(
                "vec_id", F.slice("emb", m * d_sub + 1, d_sub).alias("emb")
            )
            cent = _pq_codebook(sub, k_codes, iters)
            rows = sorted(cent.collect(), key=lambda r: r["cell"])
            books.append([list(r["centroid"]) for r in rows])

    # per-vector codes: inline argmax per subspace (pure projection)
    coded = base.select(
        "vec_id",
        *[
            _pq_code_expr(
                F.slice("emb", m * d_sub + 1, d_sub), books[m]
            ).alias(f"c{m}")
            for m in range(m_sub)
        ],
    )
    # per-query subspace tables: K dot scores per subspace, Q rows
    qtables = base.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        *[
            F.array(
                *[
                    _dot_e6(
                        F.slice("emb", m * d_sub + 1, d_sub),
                        F.array(*[F.lit(float(v)) for v in cvec]),
                    )
                    for cvec in books[m]
                ]
            ).alias(f"t{m}")
            for m in range(m_sub)
        ],
    )
    adc = sum(
        F.element_at(F.col(f"t{m}"), F.col(f"c{m}") + 1)
        for m in range(m_sub)
    )
    scored = (
        coded.crossJoin(F.broadcast(qtables))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", adc.cast("long").alias("adc_e6")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_e6"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "adc_e6")
    )


def _pq_dot_sql(a: str, b: str) -> str:
    return (
        f"CAST(FLOOR(list_dot_product({a}, {b}) * 1e6 + 0.5000001) AS BIGINT)"
    )


def pq_topk_sql(
    k: int = TOP_K,
    m_sub: int = PQ_M,
    k_codes: int = PQ_K,
    iters: int = PQ_ITERS,
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`pq_topk`: per-subspace Lloyd rounds
    unrolled as chained CTEs (the _ivf_kmeans_sql pattern), identical
    seeding, dot-assignment, e6 quantization, and ADC lookup sum."""
    d_sub = dim // m_sub
    ctes = [
        "base AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)",
        f"q AS (SELECT vec_id AS query_id, emb AS q_emb FROM base WHERE vec_id < {N_QUERIES})",
    ]
    code_selects, tab_selects = [], []
    for m in range(m_sub):
        lo, hi = m * d_sub + 1, (m + 1) * d_sub
        sub = f"sub{m}"
        ctes.append(
            f"{sub} AS MATERIALIZED (SELECT vec_id, emb[{lo}:{hi}] AS emb FROM base)"
        )
        ctes.append(f"""c{m}_0 AS MATERIALIZED (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS INTEGER) AS cell,
         emb AS centroid
  FROM (SELECT vec_id, emb FROM {sub} ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {k_codes})
)""")
        for t in range(1, iters + 1):
            ctes.append(f"""a{m}_{t} AS (
  SELECT vec_id, cell FROM (
    SELECT s.vec_id, c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id
             ORDER BY {_pq_dot_sql("s.emb", "c.centroid")} DESC, c.cell ASC) AS rn
    FROM {sub} s, c{m}_{t - 1} c
  ) WHERE rn = 1
)""")
            ctes.append(f"""c{m}_{t} AS MATERIALIZED (
  SELECT cell, list(FLOOR(cval * 1e6 + 0.5000001) / 1e6 ORDER BY dim) AS centroid
  FROM (
    SELECT cell, u.dim AS dim, SUM(u.val) / COUNT(*) AS cval FROM (
      SELECT a.cell, unnest(list_transform(s.emb, (x, i) -> {{'dim': i - 1, 'val': x}})) AS u
      FROM a{m}_{t} a JOIN {sub} s USING (vec_id)
    ) GROUP BY cell, u.dim
  ) GROUP BY cell
)""")
        final = f"c{m}_{iters}"
        ctes.append(f"""code{m} AS (
  SELECT vec_id, cell AS code FROM (
    SELECT s.vec_id, c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id
             ORDER BY {_pq_dot_sql("s.emb", "c.centroid")} DESC, c.cell ASC) AS rn
    FROM {sub} s, {final} c
  ) WHERE rn = 1
)""")
        code_selects.append(
            f"SELECT vec_id, {m} AS m, code FROM code{m}"
        )
        tab_selects.append(
            f"""SELECT q.query_id, {m} AS m, c.cell,
       {_pq_dot_sql(f"q.q_emb[{lo}:{hi}]", "c.centroid")} AS s
FROM q, {final} c"""
        )
    ctes.append("codes AS (" + " UNION ALL ".join(code_selects) + ")")
    ctes.append("tabs AS (" + " UNION ALL ".join(tab_selects) + ")")
    ctes.append("""scored AS (
  SELECT t.query_id, c.vec_id, SUM(t.s) AS adc_e6
  FROM codes c JOIN tabs t ON t.m = c.m AND t.cell = c.code
  WHERE c.vec_id != t.query_id
  GROUP BY t.query_id, c.vec_id
)""")
    joined = ",\n".join(ctes)
    return f"""WITH {joined}
SELECT query_id, rank, vec_id, CAST(adc_e6 AS BIGINT) AS adc_e6 FROM (
  SELECT query_id, vec_id, adc_e6,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY adc_e6 DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}"""


# ---------------------------------------------------------------------------
# Embedding-level decontamination (x137): flag training vectors whose
# nearest EVAL-SET neighbor exceeds a cosine threshold — the semantic
# complement of the token-level contamination audits (x54/x113/x118
# catch verbatim and near-verbatim text overlap; an embedding screen
# catches PARAPHRASED benchmark leakage that shares no n-grams).
# The eval slice here is the augmented perturbed copies
# (vec_id >= EMB_DUP_OFFSET): a stand-in for "the benchmark contains
# paraphrases of training documents" — their sources (vec_id % 20 == 0)
# are exactly the contaminated rows.
#
# Scale shape (100 TB): the eval set is BENCHMARK-sized — a fixed
# budget independent of corpus volume (the SYNTHETIC slice below is 5%
# of the table only so planted pairs exist at every sf; see
# contamination_eval_rows) — so it is collected once to the
# driver (the bounded-scalar discipline of the k-means centroids) and
# shipped to every task as a constant; the training side pays ONE scan
# with zero shuffles (mapInPandas — no grouping key at all), and each
# Arrow batch scores against the eval matrix with the same
# dim-sequential numpy fold as x15, so values are bit-identical to the
# DuckDB twin's list_dot_product.  Past ~10^6 eval rows, shard the
# eval matrix and take a per-shard argmax union — same plan, bounded
# task memory.
# ---------------------------------------------------------------------------

CONTAM_COSINE_E6 = 950_000


def contamination_eval_rows(embeddings: DataFrame) -> list:
    """The eval slice (the augmented perturbed copies), collected and
    vec_id-sorted.  In PRODUCTION the eval set is a fixed benchmark —
    size independent of the corpus — which is what makes the collect a
    bounded driver scalar; the SYNTHETIC slice here is 5% of the table
    (it must scale with the testdata so the planted pairs exist at
    every sf), so the decade rows overstate the production slope
    (DECADE_r11_ext_newops.json documents this).  Collected ONCE and
    reused across micro-batches by the z23 streaming twin."""
    return sorted(
        augment_embeddings(embeddings)
        .where(F.col("vec_id") >= EMB_DUP_OFFSET)
        .select("vec_id", "emb")
        .collect(),
        key=lambda r: r["vec_id"],
    )


def score_against_eval(
    train: DataFrame,
    eval_rows: list,
    threshold_e6: int = CONTAM_COSINE_E6,
) -> DataFrame:
    """Score a (vec_id, emb double[]) relation against a collected
    eval slice — the mapInPandas argmax-cosine scorer shared by x137
    and its streaming twin z23.  Zero-norm vectors are rejected LOUDLY
    on both sides (cosine is undefined; silently they would produce a
    NaN that floors to INT64_MIN in numpy while the DuckDB twin does
    something else — a cross-engine divergence far harder to diagnose
    than this ValueError)."""
    import numpy as np

    eval_ids = np.array([r["vec_id"] for r in eval_rows], dtype=np.int64)
    E = np.array([r["emb"] for r in eval_rows], dtype=np.float64)
    ke, d = E.shape
    ensq = np.zeros(ke)
    for i in range(d):
        ensq += E[:, i] * E[:, i]
    if not ensq.all():
        raise ValueError("zero-norm eval vector: cosine undefined")
    enrm = np.sqrt(ensq)
    thr = int(threshold_e6)

    def _score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            G = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
            m = G.shape[0]
            nsq = np.zeros(m)
            for i in range(d):
                nsq += G[:, i] * G[:, i]
            if not nsq.all():
                bad = ids[nsq == 0.0][:3].tolist()
                raise ValueError(
                    f"zero-norm training vector(s) {bad}: cosine undefined"
                )
            nrm = np.sqrt(nsq)
            # bound the scoring tile at ~4M doubles (32 MB) per array:
            # at a 25k-row eval slice a fixed 1024-row block would
            # allocate ~200 MB per intermediate per worker
            block = min(1024, max(16, 4_000_000 // ke))
            for s in range(0, m, block):
                blk = slice(s, min(s + block, m))
                acc = np.zeros((blk.stop - blk.start, ke))
                for i in range(d):
                    acc += np.outer(G[blk, i], E[:, i])
                cos = np.floor(
                    acc / np.outer(nrm[blk], enrm) * 1e6 + 0.5000001
                ).astype(np.int64)
                best = cos.argmax(axis=1)  # first max = min eval id
                bc = cos[np.arange(cos.shape[0]), best]
                yield pd.DataFrame(
                    {
                        "vec_id": ids[blk],
                        "best_eval_id": eval_ids[best],
                        "best_cos_e6": bc,
                        "contaminated": (bc >= thr).astype(np.int64),
                    }
                )

    return train.mapInPandas(
        _score,
        "vec_id long, best_eval_id long, best_cos_e6 long, contaminated long",
    )


def embedding_contamination(
    embeddings: DataFrame, threshold_e6: int = CONTAM_COSINE_E6
) -> DataFrame:
    """(vec_id, best_eval_id, best_cos_e6, contaminated): for every
    training vector (the non-augmented rows), its argmax-cosine eval
    vector (ties → min eval id), the e6-quantized cosine, and the
    threshold flag.  One output row per training vector, so the
    relation composes with joins (filter on ``contaminated`` to get
    the quarantine list)."""
    train = (
        augment_embeddings(embeddings)
        .where(F.col("vec_id") < EMB_DUP_OFFSET)
        .select("vec_id", "emb")
    )
    return score_against_eval(
        train, contamination_eval_rows(embeddings), threshold_e6
    )


EMBEDDING_CONTAMINATION_SQL = f"""
WITH aug AS ({AUGMENT_EMB_SQL}),
ev AS (SELECT vec_id, emb FROM aug WHERE vec_id >= {EMB_DUP_OFFSET}),
train AS (SELECT vec_id, emb FROM aug WHERE vec_id < {EMB_DUP_OFFSET}),
scored AS (
  SELECT t.vec_id, e.vec_id AS best_eval_id,
         CAST(FLOOR(
           list_dot_product(t.emb, e.emb)
           / (sqrt(list_dot_product(t.emb, t.emb))
              * sqrt(list_dot_product(e.emb, e.emb)))
           * 1e6 + 0.5000001) AS BIGINT) AS best_cos_e6
  FROM train t CROSS JOIN ev e
)
SELECT vec_id, best_eval_id, best_cos_e6,
       CAST(CASE WHEN best_cos_e6 >= {CONTAM_COSINE_E6} THEN 1 ELSE 0 END
            AS BIGINT) AS contaminated
FROM scored
QUALIFY row_number() OVER (
  PARTITION BY vec_id ORDER BY best_cos_e6 DESC, best_eval_id) = 1"""
