"""Top principal component of the embedding collection via power
iteration — the dimensionality-analysis op an embedding pipeline runs
before choosing an index or a projection (effective dimensionality,
anisotropy checks).

Scale shape: the only data-sized work is the COVARIANCE aggregate —
(vec_id, i, xi) self-joined on vec_id and reduced to d² entries with
map-side partial sums, so each partition contributes at most d² rows to
the shuffle no matter how many vectors it holds.  The power iteration
itself runs on the d²-row cov relation (d = 64 here): per round one
join + one d-group aggregate, with the max-abs normalization scalar
fetched to the driver (the S5 channel, same as HITS' L1 norms —
folding it back lazily would double the plan every round).

Determinism: all arithmetic is double (the float32 embeddings are
widened first, matching the oracle's ``embedding::DOUBLE[]``); the
max-abs norm divides by one exact scalar; the final sign is fixed by
requiring the loading at the max-|loading| index (min index on ties)
to be positive.  Cross-engine float-sum ordering noise stays ~1 ulp
per reduction and is absorbed by the e6 quantization nudge, exactly as
in the unrolled PageRank oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

POWER_ITERATIONS = 10


def covariance_matrix(emb: DataFrame) -> DataFrame:
    """(i, j, c): the d×d covariance of the (centered) embedding
    collection, c_ij = Σ (x_i-μ_i)(x_j-μ_j) / n."""
    n = emb.count()
    x = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "xi")
    )
    mu = x.groupBy("i").agg(F.avg("xi").alias("mu"))
    xc = x.join(F.broadcast(mu), "i").select(
        "vec_id", "i", (F.col("xi") - F.col("mu")).alias("xi")
    )
    return (
        xc.alias("a")
        .join(xc.alias("b"), "vec_id")
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg((F.sum(F.col("a.xi") * F.col("b.xi")) / F.lit(float(n))).alias("c"))
    )


def top_principal_component(
    emb: DataFrame, iterations: int = POWER_ITERATIONS
) -> DataFrame:
    """(i, loading_e6): the dominant eigenvector of the embedding
    covariance after ``iterations`` max-abs-normalized power steps,
    scaled to max |loading| = 1 and sign-fixed.

    The power iteration runs DRIVER-SIDE on the collected cov relation
    (d² = 4096 rows — a bounded driver scalar like the k-means
    centroids; it is corpus-size-INDEPENDENT by construction).  The
    r11 profile showed the previous in-plan loop spent its whole
    budget on ~20 driver round-trips over tiny one-partition jobs
    (x39 was 7.1 s at sf0.1 with the covariance aggregate costing
    under 2 s); the matvec accumulates in ascending-j order — a
    deterministic reduction inside the same ~1-ulp envelope the e6
    nudge already absorbs across engines."""
    spark = emb.sparkSession
    d = emb.select(F.size("embedding")).first()[0]
    # the only data-sized work: one distributed covariance aggregate
    rows = covariance_matrix(emb).collect()
    cov = {}
    for r in rows:
        cov[(r["i"], r["j"])] = r["c"]
    v = [1.0 / float(d) ** 0.5] * d
    for _ in range(iterations):
        w = []
        for i in range(d):
            acc = 0.0
            for j in range(d):
                c = cov.get((i, j))
                if c is not None:
                    acc += c * v[j]
            w.append(acc)
        mx = max(abs(x) for x in w)
        if not mx or mx <= 0.0:
            v = w  # degenerate (zero matrix): stop normalizing
            continue
        v = [x / mx for x in w]
    # sign fix: the max-|val| component (min i on ties) must be positive
    top_i = max(range(d), key=lambda i: (abs(v[i]), -i))
    sign = 1.0 if v[top_i] >= 0 else -1.0
    import math

    return spark.createDataFrame(
        [(i, int(math.floor(v[i] * sign * 1e6 + 0.5000001))) for i in range(d)],
        "i long, loading_e6 long",
    )


def top_pc_sql(iterations: int = POWER_ITERATIONS) -> str:
    """DuckDB twin: same centering, covariance, unrolled max-abs power
    steps, and sign fix.  Levels are MATERIALIZED (each is referenced
    by the next step AND by its own norm scalar)."""
    ctes = [
        """x AS MATERIALIZED (
  SELECT vec_id, u.i AS i, u.xi AS xi FROM (
    SELECT vec_id,
           unnest(list_transform(embedding::DOUBLE[],
                                 (e, k) -> {'i': k - 1, 'xi': e})) AS u
    FROM embeddings
  )
)""",
        "mu AS (SELECT i, AVG(xi) AS mu FROM x GROUP BY i)",
        """xc AS MATERIALIZED (
  SELECT x.vec_id, x.i, x.xi - mu.mu AS xi FROM x JOIN mu USING (i)
)""",
        """cov AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j,
         SUM(a.xi * b.xi) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM embeddings) AS c
  FROM xc a JOIN xc b USING (vec_id)
  GROUP BY a.i, b.i
)""",
        """v0 AS (
  SELECT i, 1.0 / sqrt((SELECT CAST(MAX(i) + 1 AS DOUBLE) FROM mu)) AS val
  FROM mu
)""",
    ]
    for k in range(1, iterations + 1):
        ctes.append(f"""w{k} AS MATERIALIZED (
  SELECT c.i AS i, SUM(c.c * v.val) AS val
  FROM cov c JOIN v{k - 1} v ON v.i = c.j
  GROUP BY c.i
)""")
        ctes.append(f"""v{k} AS MATERIALIZED (
  SELECT i, CASE WHEN (SELECT MAX(ABS(val)) FROM w{k}) > 0
                 THEN val / (SELECT MAX(ABS(val)) FROM w{k})
                 ELSE val END AS val
  FROM w{k}
)""")
    body = ",\n".join(ctes)
    return f"""WITH {body},
sign_ AS (
  SELECT CASE WHEN val >= 0 THEN 1.0 ELSE -1.0 END AS s
  FROM v{iterations} ORDER BY ABS(val) DESC, i ASC LIMIT 1
)
SELECT i, CAST(FLOOR(val * (SELECT s FROM sign_) * 1e6 + 0.5000001) AS BIGINT) AS loading_e6
FROM v{iterations}"""


def project_onto_top_pc(
    emb: DataFrame, iterations: int = POWER_ITERATIONS
) -> DataFrame:
    """(vec_id, coord_e6): every embedding's coordinate along the top
    principal component (centered dot product with the sign-fixed,
    max-abs-scaled loading vector) — the 1-D reduction a pipeline
    materializes for coarse ordering/binning of an embedding corpus.

    The loading vector is d rows and broadcast; the projection is one
    scan of the exploded embeddings + a d-group... no: a per-vec_id
    aggregate with map-side partials.  Output is n rows (one per
    vector), so this is the data-sized companion to the fixed-size
    :func:`top_principal_component`."""
    pc = top_principal_component(emb, iterations)
    # un-quantized loadings would need a second code path; the e6 grid
    # is part of the OPERATOR's contract (both engines project onto the
    # same quantized vector, so coords stay hash-comparable).
    loadings = pc.select("i", (F.col("loading_e6") / F.lit(1e6)).alias("w"))
    x = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "xi"),
    )
    mu = x.groupBy("i").agg(F.avg("xi").alias("mu"))
    xc = x.join(F.broadcast(mu), "i").select(
        "vec_id", "i", (F.col("xi") - F.col("mu")).alias("xi")
    )
    return (
        xc.join(F.broadcast(loadings), "i")
        .groupBy("vec_id")
        .agg(
            F.floor(
                F.sum(F.col("xi") * F.col("w")) * 1e6 + F.lit(0.5000001)
            )
            .cast("long")
            .alias("coord_e6")
        )
    )


def pc_projection_sql(iterations: int = POWER_ITERATIONS) -> str:
    """DuckDB twin of :func:`project_onto_top_pc` — reuses the x39
    CTE chain, quantizes the loadings to the same e6 grid, projects."""
    base = top_pc_sql(iterations)
    # top_pc_sql returns "WITH <ctes>, sign_ AS (...) SELECT ...": keep
    # the CTE chain, replace the final SELECT with the projection.
    head, _final = base.rsplit("SELECT i,", 1)
    return f"""{head.rstrip()},
pc AS (
  SELECT i, CAST(FLOOR(val * (SELECT s FROM sign_) * 1e6 + 0.5000001) AS BIGINT) / 1e6 AS w
  FROM v{iterations}
)
SELECT xc.vec_id,
       CAST(FLOOR(SUM(xc.xi * pc.w) * 1e6 + 0.5000001) AS BIGINT) AS coord_e6
FROM xc JOIN pc USING (i)
GROUP BY xc.vec_id"""
