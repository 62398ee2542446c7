"""Deduplication operators for large-scale training-data pipelines.

- exact dedup: hash-groupBy on content digest (one shuffle, map-side
  partial agg; at 100 TB the digest groupBy is the only wide op and
  skew is impossible because md5 keys are uniform);
- MinHash + LSH near-dup: shingle → K minhashes → band buckets →
  bucket self-join for candidates → exact-Jaccard verification.
  The band self-join only pairs rows inside a bucket, so the shuffle
  is on the band key (uniform md5) — never an O(n²) cross join.

Portability: the hash family is ``md5(seed || '|' || shingle)``
(lexicographic min over hex strings), chosen because Spark and DuckDB
produce identical md5 hex — the DuckDB oracles recompute signatures
independently.  A production deployment would swap in xxhash64 for
speed; the operator structure is identical.

The shipped synthetic ``documents`` table has no duplicates, so the
dedup queries run on a deterministic augmentation (``augment_docs``):
near-dup copies (tail-mutated text) for doc_id % 10 == 0 and exact
copies for doc_id % 25 == 0 — both engines derive the same augmented
table, making the expected output non-trivial and hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textops import strip_non_alpha, tokens

NEAR_DUP_OFFSET = 1_000_000
EXACT_DUP_OFFSET = 2_000_000
NEAR_DUP_TAIL = " extra tail words appended here"

N_HASHES = 12
N_BANDS = 4  # rows per band = N_HASHES // N_BANDS = 3
JACCARD_THRESHOLD = 0.5


def augment_docs(documents: DataFrame) -> DataFrame:
    """documents + deterministic near-dup and exact-dup copies."""
    base = documents.select("doc_id", "text")
    near = (
        base.where(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + NEAR_DUP_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(NEAR_DUP_TAIL)).alias("text"),
        )
    )
    exact = base.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + EXACT_DUP_OFFSET).alias("doc_id"), "text"
    )
    return base.unionAll(near).unionAll(exact)


AUGMENT_SQL = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {NEAR_DUP_OFFSET} AS doc_id, text || '{NEAR_DUP_TAIL}' AS text
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + {EXACT_DUP_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id % 25 = 0
"""


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame) -> DataFrame:
    """(doc_id, text_hash, is_canonical): canonical = min doc_id of its
    content group.  ``dropDuplicates`` semantics, but keeps the full
    mapping so downstream can rewrite references."""
    hashed = docs.select("doc_id", F.md5(F.col("text")).alias("text_hash"))
    canon = hashed.groupBy("text_hash").agg(F.min("doc_id").alias("canonical_id"))
    return hashed.join(canon, "text_hash").select(
        "doc_id",
        "text_hash",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# Shingles and MinHash signatures
# ---------------------------------------------------------------------------


def shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle): word k-grams over normalized tokens.
    Docs with fewer than k tokens produce no shingles (and therefore
    opt out of near-dup detection — consistent in the oracle)."""
    toked = docs.select("doc_id", tokens(strip_non_alpha("text")).alias("toks"))
    sh = F.when(
        F.size("toks") >= k,
        F.expr(
            f"transform(sequence(0, size(toks) - {k}), "
            f"i -> concat_ws(' ', {', '.join(f'toks[i + {j}]' for j in range(k))}))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toked.select("doc_id", F.explode(sh).alias("shingle")).distinct()


def shingles_sql(docs_sql: str, k: int = 3) -> str:
    grams = " || ' ' || ".join(f"toks[i + {j}]" for j in range(1, k + 1))
    return f"""
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(toks) >= {k}
             THEN list_transform(range(0, len(toks) - {k - 1}), i -> {grams})
             ELSE [] END) AS shingle
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(
               lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
               t -> t != '') AS toks
      FROM ({docs_sql})
    )
  )
"""


def minhash_signatures(sh: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, sig_0..sig_{n-1}): one aggregation pass computes all K
    minhashes (each a lexicographic min over md5(seed|shingle))."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"sig_{j}")
        for j in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures_sql(shingles_query: str, n_hashes: int = N_HASHES) -> str:
    aggs = ", ".join(
        f"MIN(md5('{j}|' || shingle)) AS sig_{j}" for j in range(n_hashes)
    )
    return f"SELECT doc_id, {aggs} FROM ({shingles_query}) GROUP BY doc_id"


# ---------------------------------------------------------------------------
# LSH banding + candidate pairs + exact-Jaccard verification
# ---------------------------------------------------------------------------


def lsh_candidates(
    sigs: DataFrame, n_bands: int = N_BANDS, n_hashes: int = N_HASHES
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs sharing at least one band bucket."""
    rows = n_hashes // n_bands
    bands = []
    for b in range(n_bands):
        key = F.md5(
            F.concat_ws("|", *[F.col(f"sig_{b * rows + r}") for r in range(rows)])
        )
        bands.append(
            sigs.select(
                "doc_id", F.lit(b).alias("band"), key.alias("bucket")
            )
        )
    allb = bands[0]
    for b in bands[1:]:
        allb = allb.unionAll(b)
    a = allb.alias("a")
    b_ = allb.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def lsh_candidates_sql(
    sigs_query: str, n_bands: int = N_BANDS, n_hashes: int = N_HASHES
) -> str:
    rows = n_hashes // n_bands
    selects = []
    for b in range(n_bands):
        cols = " || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows))
        selects.append(f"SELECT doc_id, {b} AS band, md5({cols}) AS bucket FROM sigs")
    union = " UNION ALL ".join(selects)
    return f"""
WITH sigs AS ({sigs_query}),
bands AS ({union})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


def verified_near_dups(
    sh: DataFrame,
    candidates: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs only
    (the expensive set intersection touches candidates, not all pairs).
    Output: (doc_a, doc_b, jaccard_e6) with jaccard >= threshold."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    s1 = sh.alias("s1")
    s2 = sh.alias("s2")
    inter = (
        candidates.alias("c")
        .join(s1, F.col("s1.doc_id") == F.col("c.doc_a"))
        .join(
            s2,
            (F.col("s2.doc_id") == F.col("c.doc_b"))
            & (F.col("s2.shingle") == F.col("s1.shingle")),
        )
        .groupBy("c.doc_a", "c.doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.alias("na")
    nb = sizes.alias("nb")
    jac = (
        inter.join(na, F.col("na.doc_id") == F.col("doc_a"))
        .join(nb, F.col("nb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter")
                / (F.col("na.n_sh") + F.col("nb.n_sh") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )
    return jac.where(F.col("jaccard") >= threshold).select(
        "doc_a",
        "doc_b",
        F.floor(F.col("jaccard") * 1e6 + F.lit(0.5000001)).cast("long").alias("jaccard_e6"),
    )


def near_dup_pipeline(docs: DataFrame) -> DataFrame:
    """augment → shingle → minhash → LSH → verify, end to end."""
    sh = shingles(docs)
    sigs = minhash_signatures(sh)
    cands = lsh_candidates(sigs)
    return verified_near_dups(sh, cands)


def exact_dedup_sql(docs_sql: str) -> str:
    return f"""
WITH docs AS ({docs_sql}),
hashed AS (SELECT doc_id, md5(text) AS text_hash FROM docs),
canon AS (SELECT text_hash, MIN(doc_id) AS canonical_id FROM hashed GROUP BY text_hash)
SELECT h.doc_id, h.text_hash, c.canonical_id,
       h.doc_id = c.canonical_id AS is_canonical
FROM hashed h JOIN canon c USING (text_hash)"""


def near_dup_sql(docs_sql: str, threshold: float = JACCARD_THRESHOLD) -> str:
    sh_q = shingles_sql(docs_sql)
    cand_q = lsh_candidates_sql(minhash_signatures_sql(sh_q))
    return f"""
WITH sh AS ({sh_q}),
cand AS ({cand_q}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.doc_a
  JOIN sh s2 ON s2.doc_id = c.doc_b AND s2.shingle = s1.shingle
  GROUP BY c.doc_a, c.doc_b
),
jac AS (
  SELECT i.doc_a, i.doc_b,
         CAST(i.n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - i.n_inter) AS jaccard
  FROM inter i
  JOIN sizes na ON na.doc_id = i.doc_a
  JOIN sizes nb ON nb.doc_id = i.doc_b
)
SELECT doc_a, doc_b,
       CAST(FLOOR(jaccard * 1e6 + 0.5000001) AS BIGINT) AS jaccard_e6
FROM jac WHERE jaccard >= {threshold}"""
