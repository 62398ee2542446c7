"""Deterministic sketches (HyperLogLog cardinality, count-min
frequency) as pure DataFrame compositions.

The reference has no sketching (its only global scalar is the exact
page count, PageRankAlgorithm.java:60-77); at 100 TB the exact
COUNT(DISTINCT) it would imply is a full shuffle of every distinct key,
while an HLL register table is a fixed 2^p-row aggregate with map-side
partial merge (max per register) — the standard cardinality path for
corpus statistics.

Unlike the engine-native implementations (Spark's
``approx_count_distinct`` HLL++, DuckDB's ``approx_distinct``), the
hash here is md5 — slower, but bit-identical in any engine — so the
REGISTER TABLE itself is cross-engine hash-checkable: the oracle gate
verifies the sketch content exactly, and only the final float estimate
(whose ln/harmonic sum is ulp-sensitive) stays out of the hash check
(tests/test_sketches.py bounds it against the exact count instead:
within 5 standard errors, sigma = 1.04/sqrt(2^p)).

Register derivation from the 32-hex md5: the first ``p/4`` hex chars
index the register; the next 13 chars (52 bits) feed the rank
rho = (# leading zero bits) + 1, computed on the HEX string — 4 bits
per leading '0' char plus a per-digit leading-zero lookup — so no
engine-specific bit intrinsics are involved.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HLL_P = 8  # 2^8 = 256 registers; standard error 1.04/16 = 6.5%
_TAIL_HEX = 13  # 52 bits of rank material


def _digit_lz(c: Column) -> Column:
    """Leading zero bits of one nonzero hex digit (as 4-bit field)."""
    return (
        F.when(c == "1", F.lit(3))
        .when(c.isin("2", "3"), F.lit(2))
        .when(c.isin("4", "5", "6", "7"), F.lit(1))
        .otherwise(F.lit(0))
    )


def hll_registers(
    df: DataFrame, key: str, p: int = HLL_P, by: list[str] | None = None
) -> DataFrame:
    """(register, max_rho) — or (*by, register, max_rho) with ``by``:
    the HLL register table for the values of ``key``, optionally one
    sketch per group (per-domain/per-language cardinalities, the
    realistic pipeline shape).  One narrow projection + one aggregate
    with map-side partial max — at most |groups|·2^p rows shuffle per
    upstream partition regardless of data volume.
    """
    if p % 4 != 0:
        raise ValueError("p must be a multiple of 4 (hex-digit indexing)")
    nidx = p // 4
    h = F.md5(F.col(key).cast("string"))
    idx = F.conv(F.substring(h, 1, nidx), 16, 10).cast("long")
    tail = F.substring(h, nidx + 1, _TAIL_HEX)
    zeros = F.length(F.regexp_extract(tail, "^0*", 0))
    first = F.substring(tail, zeros + 1, 1)  # '' when tail is all zeros
    rho = F.when(zeros == _TAIL_HEX, F.lit(4 * _TAIL_HEX + 1)).otherwise(
        F.lit(4) * zeros + _digit_lz(first) + 1
    )
    by = by or []
    return (
        df.select(
            *by, idx.alias("register"), rho.cast("long").alias("rho")
        )
        .groupBy(*by, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_registers_sql(
    table: str, key_expr: str, p: int = HLL_P, by: list[str] | None = None
) -> str:
    """DuckDB twin of :func:`hll_registers` (identical md5-derived
    registers; hex→int via strpos since DuckDB has no conv())."""
    nidx = p // 4
    digits = "0123456789abcdef"
    idx_terms = " + ".join(
        f"(strpos('{digits}', substr(h, {i + 1}, 1)) - 1) * {16 ** (nidx - 1 - i)}"
        for i in range(nidx)
    )
    by = by or []
    bycols = "".join(f"{c}, " for c in by)
    return f"""
WITH hashed AS (SELECT {bycols}md5(CAST({key_expr} AS VARCHAR)) AS h FROM {table}),
parts AS (
  SELECT {bycols}CAST({idx_terms} AS BIGINT) AS register,
         substr(h, {nidx + 1}, {_TAIL_HEX}) AS tail
  FROM hashed
),
rho AS (
  SELECT {bycols}register,
         CASE WHEN length(regexp_extract(tail, '^0*', 0)) = {_TAIL_HEX}
              THEN {4 * _TAIL_HEX + 1}
              ELSE 4 * length(regexp_extract(tail, '^0*', 0))
                   + CASE substr(tail, length(regexp_extract(tail, '^0*', 0)) + 1, 1)
                       WHEN '1' THEN 3
                       WHEN '2' THEN 2 WHEN '3' THEN 2
                       WHEN '4' THEN 1 WHEN '5' THEN 1
                       WHEN '6' THEN 1 WHEN '7' THEN 1
                       ELSE 0 END
                   + 1 END AS rho
  FROM parts
)
SELECT {bycols}register, CAST(MAX(rho) AS BIGINT) AS max_rho
FROM rho GROUP BY {bycols}register"""


def hll_estimate(registers: list[tuple[int, int]], p: int = HLL_P) -> float:
    """Flajolet et al. HLL estimate from a (register, max_rho) list.
    Driver-side: the register table is tiny (2^p rows) by design.
    Registers never observed count as rho=0.  Includes the small-range
    linear-counting correction; the large-range correction is omitted
    (32+ bit hashes at 52 rank bits saturate far beyond any real
    cardinality here)."""
    m = 1 << p
    got = dict(registers)
    harmonic = sum(2.0 ** -got.get(j, 0) for j in range(m))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / harmonic
    zeros = m - len([v for v in got.values() if v > 0])
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


# ---------------------------------------------------------------------------
# Count-min sketch: fixed (depth × width) frequency table, same
# deterministic-md5 design as the HLL above — the COUNTS table is
# integer-exact and cross-engine hash-checkable; the point estimate
# (min over rows) is bounded in tests.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256  # error ~ e/width of total mass per probe, delta ~ e^-depth


def _cms_col(key: Column, i: int, width: int) -> Column:
    h = F.md5(F.concat_ws("|", F.lit(f"cms{i}"), key.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % width


def cms_counts(
    df: DataFrame, key: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """(row, col, cnt): the count-min table for the values of ``key``.
    One projection exploding each input row into ``depth`` (row, col)
    cells + one bounded aggregate (≤ depth×width groups, map-side
    partial sum) — fixed-size output regardless of input volume, the
    heavy-hitter / frequency-estimate path where an exact per-key
    count would shuffle every distinct key."""
    cells = [
        F.struct(
            F.lit(i).cast("long").alias("row"),
            _cms_col(F.col(key), i, width).alias("col"),
        )
        for i in range(depth)
    ]
    return (
        df.select(F.explode(F.array(*cells)).alias("rc"))
        .select(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .groupBy("row", "col")
        .agg(F.count("*").alias("cnt"))
    )


def _hex4_to_int_sql(expr: str) -> str:
    digits = "0123456789abcdef"
    return " + ".join(
        f"(strpos('{digits}', substr({expr}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )


def cms_counts_sql(
    table: str, key_expr: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> str:
    """DuckDB twin of :func:`cms_counts`."""
    selects = []
    for i in range(depth):
        h = f"md5('cms{i}' || '|' || CAST({key_expr} AS VARCHAR))"
        selects.append(
            f"SELECT {i} AS row, ({_hex4_to_int_sql(f'substr({h}, 1, 4)')}) % {width} AS col FROM {table}"
        )
    body = "\n  UNION ALL ".join(selects)
    return f"""
WITH cells AS (
  {body}
)
SELECT CAST(row AS BIGINT) AS row, CAST(col AS BIGINT) AS col,
       COUNT(*) AS cnt
FROM cells GROUP BY row, col"""


def cms_estimate(
    counts: list[tuple[int, int, int]],
    value,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> int:
    """Point frequency estimate: min over rows of the value's cell.
    Always >= the true count; overshoot bounded by ~e/width of the
    total mass with probability 1 - e^-depth."""
    import hashlib

    table = {(r, c): n for r, c, n in counts}
    est = None
    for i in range(depth):
        h = hashlib.md5(f"cms{i}|{value}".encode()).hexdigest()
        col = int(h[:4], 16) % width
        cell = table.get((i, col), 0)
        est = cell if est is None else min(est, cell)
    return est or 0


# ---------------------------------------------------------------------------
# Bloom filter as a position set: the join-pruning sketch.  At 100 TB
# the pattern is: build the filter from the SMALL (filtered) side's
# keys, broadcast it, and drop probe-side rows before the shuffle —
# Spark's own runtime row-group/bloom pushdown, made explicit and
# engine-checkable (md5 positions, so the pass/fail decision per key is
# bit-identical cross-engine; false positives are DETERMINISTIC here,
# not a statistical afterthought, and the query below counts them
# exactly against the true semi join).
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 16  # one hex4 per hash: positions are md5 16-bit slices
BLOOM_HASHES = 4


def _bloom_pos(key: Column, i: int) -> Column:
    h = F.md5(F.concat_ws("|", F.lit(f"bf{i}"), key.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long")


def bloom_positions(df: DataFrame, key: str, k: int = BLOOM_HASHES) -> DataFrame:
    """(pos,): the DISTINCT set of bit positions the build side lights
    up — the filter itself, as a relation (≤ BLOOM_BITS rows no matter
    the build cardinality).  On a cluster this is what you'd collect/
    broadcast; as a relation it stays checkable and composable."""
    cells = [_bloom_pos(F.col(key), i).alias("pos") for i in range(k)]
    return (
        df.select(F.explode(F.array(*cells)).alias("pos"))
        .distinct()
    )


def bloom_probe(
    probe: DataFrame, key: str, positions: DataFrame, k: int = BLOOM_HASHES
) -> DataFrame:
    """(key, bloom_pass): per DISTINCT probe key, whether all k of its
    positions are set.  The positions relation is broadcast (it is ≤
    BLOOM_BITS rows by construction); probing is an explode + broadcast
    semi-ish join + count==k — no shuffle of the probe side at all
    beyond its own key dedup."""
    keys = probe.select(F.col(key).alias("key")).distinct()
    cells = [
        F.struct(F.lit(i).alias("i"), _bloom_pos(F.col("key"), i).alias("pos"))
        for i in range(k)
    ]
    exploded = keys.select("key", F.explode(F.array(*cells)).alias("c")).select(
        "key", F.col("c.pos").alias("pos")
    )
    hits = (
        exploded.join(F.broadcast(positions), "pos")
        .groupBy("key")
        .agg(F.count("*").alias("n_hits"))
    )
    return keys.join(hits, "key", "left").select(
        "key", (F.coalesce(F.col("n_hits"), F.lit(0)) == k).alias("bloom_pass")
    )


def bloom_join_audit(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """One row (n_keys, n_pass, n_true, n_false_pos): audit of bloom
    pre-join pruning — how many distinct probe keys the filter passes
    vs true membership.  n_true_pass == n_true ALWAYS (a bloom filter
    has no false negatives — asserted in tests); n_false_pos is the
    exact price of the pruning at this bits/keys ratio."""
    positions = bloom_positions(build, build_key, k)
    flags = bloom_probe(probe, probe_key, positions, k)
    truth = build.select(F.col(build_key).alias("key")).distinct().withColumn(
        "is_true", F.lit(True)
    )
    joined = flags.join(truth, "key", "left").select(
        "bloom_pass", F.coalesce(F.col("is_true"), F.lit(False)).alias("is_true")
    )
    return joined.agg(
        F.count("*").alias("n_keys"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias("n_pass"),
        F.sum(F.when(F.col("is_true"), 1).otherwise(0)).alias("n_true"),
        F.sum(
            F.when(F.col("bloom_pass") & ~F.col("is_true"), 1).otherwise(0)
        ).alias("n_false_pos"),
    )


def _bloom_pos_sql(key_expr: str, i: int) -> str:
    h = f"md5('bf{i}' || '|' || CAST({key_expr} AS VARCHAR))"
    return f"({_hex4_to_int_sql(f'substr({h}, 1, 4)')})"


def bloom_join_audit_sql(
    probe_table: str,
    probe_key: str,
    build_table: str,
    build_key: str,
    build_where: str = "TRUE",
    k: int = BLOOM_HASHES,
) -> str:
    """DuckDB twin of :func:`bloom_join_audit`."""
    build_cells = "\n    UNION ALL ".join(
        f"SELECT {_bloom_pos_sql(build_key, i)} AS pos FROM {build_table} WHERE {build_where}"
        for i in range(k)
    )
    probe_cells = "\n    UNION ALL ".join(
        f"SELECT key, {_bloom_pos_sql('key', i)} AS pos FROM keys"
        for i in range(k)
    )
    return f"""
WITH positions AS MATERIALIZED (SELECT DISTINCT pos FROM (
    {build_cells}
)),
keys AS MATERIALIZED (SELECT DISTINCT {probe_key} AS key FROM {probe_table}),
cells AS (
    {probe_cells}
),
hits AS (
  SELECT key, COUNT(*) AS n_hits
  FROM cells JOIN positions USING (pos) GROUP BY key
),
flags AS (
  SELECT k.key, COALESCE(h.n_hits, 0) = {k} AS bloom_pass
  FROM keys k LEFT JOIN hits h USING (key)
),
truth AS (SELECT DISTINCT {build_key} AS key FROM {build_table} WHERE {build_where})
SELECT COUNT(*) AS n_keys,
       CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN t.key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN bloom_pass AND t.key IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
FROM flags f LEFT JOIN truth t USING (key)"""


CMS_JOIN_WIDTH = 1 << 16  # join estimation needs width >> the point-
# query case: the estimator's additive error is ||a||_1 * ||b||_1 / width,
# so 2^16 keeps the collision term below ~5% of real join sizes here
# (hex4 positions ARE 16 bits, so the mod is an identity)


def cms_join_size_estimate(
    a: DataFrame,
    a_key: str,
    b: DataFrame,
    b_key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_JOIN_WIDTH,
) -> DataFrame:
    """One row (est_rows, exact_rows): equi-join cardinality estimated
    from the two sides' count-min tables — est = min over sketch rows
    of Σ_col cntA·cntB, the classic inner-product estimator (always an
    OVER-estimate; collisions only add).  This is what a cost-based
    planner does with sketches instead of scanning: the estimate costs
    two fixed-size tables and a depth×width join, the truth costs the
    join itself (computed here too, to audit the error exactly —
    integer arithmetic end to end, so the audit is hash-checkable).
    """
    ca = cms_counts(a, a_key, depth, width)
    cb = cms_counts(b, b_key, depth, width)
    per_row = (
        ca.alias("a")
        .join(cb.alias("b"), ["row", "col"])
        .groupBy("row")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("dot"))
    )
    est = per_row.agg(F.min("dot").alias("est_rows"))
    exact = (
        a.select(F.col(a_key).alias("k"))
        .join(b.select(F.col(b_key).alias("k")), "k")
        .agg(F.count("*").alias("exact_rows"))
    )
    return est.crossJoin(exact)


def cms_join_size_estimate_sql(
    a_table: str,
    a_key: str,
    b_table: str,
    b_key: str,
    b_where: str = "TRUE",
    depth: int = CMS_DEPTH,
    width: int = CMS_JOIN_WIDTH,
) -> str:
    """DuckDB twin of :func:`cms_join_size_estimate`."""
    ca = cms_counts_sql(a_table, a_key, depth, width)
    cb = cms_counts_sql(f"(SELECT * FROM {b_table} WHERE {b_where})", b_key, depth, width)
    return f"""
WITH ca AS MATERIALIZED ({ca}),
cb AS MATERIALIZED ({cb}),
dots AS (
  SELECT a.row, SUM(a.cnt * b.cnt) AS dot
  FROM ca a JOIN cb b USING (row, col)
  GROUP BY a.row
),
est AS (SELECT CAST(MIN(dot) AS BIGINT) AS est_rows FROM dots),
exact AS (
  SELECT COUNT(*) AS exact_rows
  FROM {a_table} a JOIN (SELECT * FROM {b_table} WHERE {b_where}) b
    ON a.{a_key} = b.{b_key}
)
SELECT est.est_rows, exact.exact_rows FROM est, exact"""


def cms_heavy_hitters(
    df: DataFrame,
    key: str,
    top_n: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key, est_count) top-``top_n`` by CMS-estimated frequency — the
    point-query read path of the sketch (the write path is
    :func:`cms_counts`).  Candidates are the distinct keys (already a
    bounded relation after dedup); each probes its depth cells against
    the fixed-size counts table and takes the min.  Estimates never
    underestimate, so the true top-n is always CONTAINED in the
    CMS top-n of the same cutoff modulo collision ties — the standard
    sketch-based heavy-hitter pattern.  Deterministic output: ties
    break on the key."""
    counts = cms_counts(df, key, depth, width)
    keys = df.select(F.col(key).alias("key")).distinct()
    cells = [
        F.struct(
            F.lit(i).cast("long").alias("row"),
            _cms_col(F.col("key"), i, width).alias("col"),
        )
        for i in range(depth)
    ]
    probes = keys.select("key", F.explode(F.array(*cells)).alias("rc")).select(
        "key", F.col("rc.row").alias("row"), F.col("rc.col").alias("col")
    )
    est = (
        probes.join(F.broadcast(counts), ["row", "col"])
        .groupBy("key")
        .agg(F.min("cnt").alias("est_count"))
    )
    return est.orderBy(F.desc("est_count"), F.asc("key")).limit(top_n)


def cms_heavy_hitters_sql(
    table: str,
    key_expr: str,
    top_n: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB twin of :func:`cms_heavy_hitters`."""
    counts = cms_counts_sql(table, key_expr, depth, width)
    probe_selects = []
    for i in range(depth):
        h = f"md5('cms{i}' || '|' || CAST(key AS VARCHAR))"
        probe_selects.append(
            f"SELECT key, {i} AS row, ({_hex4_to_int_sql(f'substr({h}, 1, 4)')}) % {width} AS col FROM keys"
        )
    probes = "\n  UNION ALL ".join(probe_selects)
    return f"""
WITH counts AS MATERIALIZED ({counts}),
keys AS MATERIALIZED (SELECT DISTINCT {key_expr} AS key FROM {table}),
probes AS (
  {probes}
),
est AS (
  SELECT p.key, CAST(MIN(c.cnt) AS BIGINT) AS est_count
  FROM probes p JOIN counts c USING (row, col)
  GROUP BY p.key
)
SELECT key, est_count FROM est
ORDER BY est_count DESC, key ASC LIMIT {top_n}"""


# --------------------------------------------------------------------------
# Fixed-bin histogram sketch: the mergeable distribution summary.
# HLL answers "how many distinct", CMS answers "how often", this
# answers "how distributed" — per-bin counts are plain integer adds,
# so shards merge by summing and a streaming twin would be additive
# state.  Bin edges are fixed up front (lo/hi/nbins), giving bounded
# O(nbins) state regardless of input size: the 100 TB path for
# distribution monitoring, where exact percentiles (s2) need a full
# sort and approx_percentile still tracks thousands of centroids.
# --------------------------------------------------------------------------

HIST_LO, HIST_HI, HIST_NBINS = 0.0, 500.0, 50


def histogram_bins(
    df: DataFrame,
    col: str,
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    nbins: int = HIST_NBINS,
    by: list[str] | None = None,
) -> DataFrame:
    """(bin, cnt) — or (*by, bin, cnt) with ``by``: the raw mergeable
    per-bin counts, optionally one histogram per group (per-source /
    per-type distribution monitoring).  One bounded aggregate — at
    most |groups|*nbins rows shuffle per upstream partition — usable
    as-is in a streaming complete-mode sink (counts are additive
    state; the cum window below is batch-only)."""
    width = (hi - lo) / nbins
    b = F.least(
        F.lit(nbins - 1),
        F.greatest(F.lit(0), F.floor((F.col(col) - lo) / width)),
    ).cast("long")
    by = by or []
    return (
        df.select(*by, b.alias("bin"))
        .groupBy(*by, "bin")
        .agg(F.count("*").alias("cnt"))
    )


def histogram_bins_sql(
    col: str = "value",
    table: str = "events",
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    nbins: int = HIST_NBINS,
    by: list[str] | None = None,
) -> str:
    width = (hi - lo) / nbins
    by_cols = ", ".join(by) + ", " if by else ""
    return f"""
SELECT {by_cols}CAST(LEAST({nbins - 1},
                  GREATEST(0, FLOOR(({col} - {lo}) / {width}))) AS BIGINT) AS bin,
       COUNT(*) AS cnt
FROM {table}
GROUP BY {by_cols}bin"""


def value_histogram(
    df: DataFrame,
    col: str,
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    nbins: int = HIST_NBINS,
) -> DataFrame:
    """(bin, lo_edge_e2, hi_edge_e2, cnt, cum_cnt): counts per fixed
    bin, under/overflow clamped into the edge bins.  The cumulative
    column (for quantile reads: smallest bin with cum >= q*total) is a
    window over AT MOST ``nbins`` rows — bounded state, not a
    scale-with-data sort.  Bin assignment is one floor over identical
    IEEE doubles in both engines, so the sketch content is
    hash-checkable, not just its estimates.
    """
    width = (hi - lo) / nbins
    bins = histogram_bins(df, col, lo, hi, nbins)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    return bins.select(
        "bin",
        (F.col("bin") * int(width * 100)).alias("lo_edge_e2"),
        ((F.col("bin") + 1) * int(width * 100)).alias("hi_edge_e2"),
        "cnt",
        F.sum("cnt").over(w).alias("cum_cnt"),
    )


def value_histogram_sql(
    col: str = "value",
    table: str = "events",
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    nbins: int = HIST_NBINS,
) -> str:
    width = (hi - lo) / nbins
    return f"""
WITH b AS (
  SELECT CAST(LEAST({nbins - 1},
                    GREATEST(0, FLOOR(({col} - {lo}) / {width}))) AS BIGINT) AS bin
  FROM {table}),
c AS (SELECT bin, COUNT(*) AS cnt FROM b GROUP BY bin)
SELECT bin,
       CAST(bin * {int(width * 100)} AS BIGINT) AS lo_edge_e2,
       CAST((bin + 1) * {int(width * 100)} AS BIGINT) AS hi_edge_e2,
       cnt,
       CAST(SUM(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_cnt
FROM c"""


def hll_merge(parts: list[DataFrame]) -> DataFrame:
    """Merge HLL register tables from independent shards: elementwise
    max per register — the property that lets 1000 executors (or 1000
    daily partitions) sketch independently and combine for free.
    Input/output schema: (register, max_rho)."""
    if not parts:
        raise ValueError("hll_merge needs at least one shard")
    merged = parts[0]
    for p_ in parts[1:]:
        merged = merged.unionAll(p_)
    return merged.groupBy("register").agg(F.max("max_rho").alias("max_rho"))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch
# ---------------------------------------------------------------------------
# The third cardinality tool next to exact COUNT(DISTINCT) and HLL:
# keep the k smallest hash values per group; the kth smallest pins
# down the sampled fraction of hash space, so D ≈ (k-1)/F(h_k).
# Standard error ~ 1/sqrt(k-2) — tighter than HLL at equal sketch
# rows — and, unlike HLL, the sketch doubles as a uniform sample of
# the distinct keys (the bottom-k-by-hash sample, x46's idea applied
# to the DISTINCT domain).  Mergeable by construction: the global
# k-minimum set of a union is contained in the union of per-shard
# k-minimum sets, so merged-shard estimates equal whole-table
# estimates EXACTLY (not just approximately — asserted in tests).
#
# Determinism: hashes are md5 hex (lexicographic order == numeric
# order), the estimate numerator (k-1)·16^12 has 7 significant bits
# and the kth value is 48 bits — both exact in a double, so the one
# division is a single correctly-rounded IEEE op identical in any
# engine, and the floored estimate survives the hash gate.

KMV_K = 128
_KMV_HEX = 12  # 48 bits of estimate material: exact in a double
_KMV_SPACE = 16 ** _KMV_HEX
# Two-phase hash-space prefilter: only md5 values below this prefix
# (first hex digit 0 — 1/16 of the space) ever reach the distinct
# exchange.  A group with >= k distinct survivors is EXACT (its true
# bottom-k lies entirely below the threshold); smaller groups fall
# back to the unfiltered path.  1/16 keeps the exchange 16x smaller
# than the full vocabulary while proving every group whose distinct
# domain is >~ 16k comfortably (E[survivors] = vocab/16 >= k needs
# vocab >= 2048; the margin above that makes under-sampling noise
# irrelevant — and a group that fails the proof is still exact via
# the fallback, just not cheap).
_KMV_PREFILTER = "1"
_KMV_PREFILTER_FRAC = 16


def kmv_sketch(
    df: DataFrame,
    key: str,
    group_col: str,
    k: int = KMV_K,
    two_phase: bool = False,
) -> DataFrame:
    """(grp, h, pos): the ``k`` smallest md5 values of the DISTINCT
    ``key`` values per group.  One distinct aggregate (map-side
    partial, dedups before anything ranks) + one per-group window over
    distinct hashes only — never the raw rows.

    ``two_phase=True`` is the scale armor for the 100 TB case where the
    distinct domain GROWS with the corpus (the sf10 decade exposed it:
    a mutated-vocabulary corpus made the plain ``.distinct()`` exchange
    the whole vocabulary — 38.4 s at sf10 — to build a k=128-row
    sketch).  A hash-space threshold prefilter caps the exchange
    instead of merely capping the sort: rows whose md5 >= the
    ``_KMV_PREFILTER`` bound collapse map-side to ONE ``(grp, NULL)``
    marker per partition (the NULL keeps every group visible without a
    second scan), so the distinct exchange carries ~vocab/16 survivor
    rows (``_KMV_PREFILTER_FRAC``) plus O(P x groups) markers.  A group with >= k distinct
    survivors is EXACT — its true bottom-k is entirely below the
    threshold; any group not proven (small vocabulary, < k survivors)
    is recomputed by the unfiltered path over just that group's rows
    (broadcast semi-join; at scale the set is empty and the fallback
    scan never runs — decided by one ``isEmpty`` on the tiny
    checkpointed survivor relation).  Identical output to the
    single-phase sketch in all cases; equality is asserted in tests.

    NOTE: eager — materializes the (tiny) masked survivor relation at
    call time to decide the fallback, like the fixpoint operators."""
    h = F.md5(F.concat_ws("|", F.lit("kmv"), F.col(key).cast("string")))
    w = Window.partitionBy("grp").orderBy("h")

    def _rank(distinct: DataFrame) -> DataFrame:
        return distinct.withColumn(
            "pos", F.row_number().over(w).cast("long")
        ).where(F.col("pos") <= k)

    if not two_phase:
        return _rank(
            df.select(F.col(group_col).alias("grp"), h.alias("h")).distinct()
        )
    masked = (
        df.select(
            F.col(group_col).alias("grp"),
            F.when(h < F.lit(_KMV_PREFILTER), h).alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    surv = masked.where(F.col("h").isNotNull())
    sketch = _rank(surv)
    # count("h") skips the NULL markers, so one agg yields both the
    # group universe (every group has at least a marker row) and its
    # exact survivor count.
    unproven = (
        masked.groupBy("grp")
        .agg(F.count("h").alias("_n"))
        .where(F.col("_n") < k)
        .select("grp")
    )
    if unproven.isEmpty():
        return sketch
    proven = sketch.join(F.broadcast(unproven), "grp", "left_anti")
    fb_base = df.join(
        F.broadcast(unproven),
        df[group_col] == unproven["grp"],
        "left_semi",
    )
    fb = _rank(
        fb_base.select(F.col(group_col).alias("grp"), h.alias("h")).distinct()
    )
    return proven.unionAll(fb)


def kmv_proof_audit(
    df: DataFrame, key: str, group_col: str, k: int = KMV_K
) -> DataFrame:
    """(grp, survivors, proven): the observable form of
    :func:`kmv_sketch`'s two-phase decision — per group, how many
    distinct keys fall below the 1/16 hash-space prefilter, and whether
    that count proves the group (>= ``k`` survivors means the true
    bottom-k lies entirely below the threshold, so the cheap filtered
    sketch is exact and the fallback scan never runs).  The x124/x126
    pre-flight discipline applied to the cardinality family: run this
    before a production two-phase pass to see which regime the corpus
    is in — zero unproven groups is the 100-TB posture (the r10
    vocab-growth decade measured survivors 1774-2001 at sf1_vg and
    19616-22151 at sf10_vg vs k=128; the shipped toy corpus sits at 2,
    all-fallback).  Exactly the ``masked`` relation from the sketch:
    one distinct (map-side combine, non-survivors collapse to a NULL
    marker that keeps every group visible) + one aggregate."""
    h = F.md5(F.concat_ws("|", F.lit("kmv"), F.col(key).cast("string")))
    masked = df.select(
        F.col(group_col).alias("grp"),
        F.when(h < F.lit(_KMV_PREFILTER), h).alias("h"),
    ).distinct()
    return masked.groupBy("grp").agg(
        F.count("h").cast("long").alias("survivors")
    ).select(
        "grp",
        "survivors",
        (F.col("survivors") >= k).cast("long").alias("proven"),
    )


def kmv_proof_audit_sql(pairs_sql: str, k: int = KMV_K) -> str:
    """DuckDB twin of :func:`kmv_proof_audit` over a (grp, key)
    relation given by ``pairs_sql``."""
    return f"""
WITH pairs AS ({pairs_sql}),
dw AS (SELECT DISTINCT grp, md5('kmv' || '|' || CAST(key AS VARCHAR)) AS h
       FROM pairs),
surv AS (
  SELECT grp,
         COUNT(DISTINCT CASE WHEN h < '{_KMV_PREFILTER}' THEN h END)
           AS survivors
  FROM dw GROUP BY grp
)
SELECT grp, CAST(survivors AS BIGINT) AS survivors,
       CAST(CASE WHEN survivors >= {k} THEN 1 ELSE 0 END AS BIGINT)
         AS proven
FROM surv"""


def kmv_estimates(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """(grp, n_kept, est_distinct) per group from a :func:`kmv_sketch`
    table.  A group with fewer than ``k`` distinct keys is EXACT (the
    sketch saw every key); otherwise (k-1)·16^12 / value(h_k)."""
    v = F.conv(F.substring(F.col("h"), 1, _KMV_HEX), 16, 10).cast("long")
    kth = sketch.groupBy("grp").agg(
        F.count("*").alias("n_kept"),
        F.max(F.when(F.col("pos") == k, v)).alias("v_k"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(float((k - 1) * _KMV_SPACE)) / F.col("v_k").cast("double")
    )
    return kth.select(
        "grp",
        "n_kept",
        F.floor(est).cast("long").alias("est_distinct"),
    )


def kmv_merge(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """One merged sketch (grp='__ALL__') from per-group sketches: the
    global k-minimum over the union of parts (dedup first — the same
    key hashes identically in every group).  The window is global but
    its input is <= n_groups * k rows, never the corpus."""
    w = Window.orderBy("h")
    return (
        sketch.select("h")
        .distinct()
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .where(F.col("pos") <= k)
        # column order matches kmv_sketch (grp, h, pos): positional
        # unionAll with sketch parts must not swap h and pos
        .select(F.lit("__ALL__").alias("grp"), "h", "pos")
    )


def _kmv_hex_to_int_sql(expr: str) -> str:
    digits = "0123456789abcdef"
    return " + ".join(
        f"(strpos('{digits}', substr({expr}, {i + 1}, 1)) - 1) * {16 ** (_KMV_HEX - 1 - i)}"
        for i in range(_KMV_HEX)
    )


def kmv_estimates_sql(pairs_sql: str, k: int = KMV_K) -> str:
    """DuckDB twin: per-group + merged '__ALL__' KMV estimates over a
    (grp, key) relation given by ``pairs_sql``."""
    num = (k - 1) * _KMV_SPACE
    v = _kmv_hex_to_int_sql(f"substr(h, 1, {_KMV_HEX})")
    return f"""
WITH pairs AS ({pairs_sql}),
dw AS (SELECT DISTINCT grp, md5('kmv' || '|' || CAST(key AS VARCHAR)) AS h
       FROM pairs),
sk AS (SELECT grp, h,
              ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS pos
       FROM dw),
kept AS (SELECT * FROM sk WHERE pos <= {k}),
mh AS (SELECT DISTINCT h FROM kept),
msk AS (SELECT '__ALL__' AS grp, h,
               ROW_NUMBER() OVER (ORDER BY h) AS pos
        FROM mh),
allk AS (SELECT * FROM kept UNION ALL SELECT * FROM msk WHERE pos <= {k}),
est AS (
  SELECT grp, COUNT(*) AS n_kept,
         MAX(CASE WHEN pos = {k} THEN {v} END) AS v_k
  FROM allk GROUP BY grp
)
SELECT grp, n_kept,
       CAST(FLOOR(CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                       ELSE {num} / CAST(v_k AS DOUBLE) END) AS BIGINT)
         AS est_distinct
FROM est"""


def kmv_overlap(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """(grp_a, grp_b, n_common, union_est, inter_est): pairwise set
    overlap of the sketched DISTINCT domains, computed from the
    per-group sketches ALONE — the corpus is never re-touched.  This
    is the KMV algebra HLL lacks: the bottom-k of A ∪ B is derivable
    from the bottom-ks of A and B (take the k smallest of their
    union), and the fraction of that merged sketch present in BOTH
    inputs is an unbiased Jaccard estimate, so
    ``inter ≈ J x |A ∪ B|`` comes for free.

    Cost: the sketch relation self-paired — <= |groups|² x 2k rows,
    independent of corpus size.  A group pair where the merged sketch
    saw every key (n_kept < k) is exact."""
    hs = sketch.select("grp", "h")
    a = hs.alias("a")
    b = hs.alias("b")
    pairs = (
        hs.select(F.col("grp").alias("grp_a"))
        .distinct()
        .join(
            hs.select(F.col("grp").alias("grp_b")).distinct(),
            F.col("grp_a") < F.col("grp_b"),
        )
    )
    # membership-flagged union of the two sketches per pair
    flagged = (
        pairs.join(a, F.col("a.grp") == F.col("grp_a"))
        .select("grp_a", "grp_b", F.col("a.h").alias("h"), F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionAll(
            pairs.join(b, F.col("b.grp") == F.col("grp_b")).select(
                "grp_a", "grp_b", F.col("b.h").alias("h"), F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
        .groupBy("grp_a", "grp_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("grp_a", "grp_b").orderBy("h")
    merged = flagged.withColumn(
        "pos", F.row_number().over(w).cast("long")
    ).where(F.col("pos") <= k)
    v = F.conv(F.substring(F.col("h"), 1, _KMV_HEX), 16, 10).cast("long")
    agg = merged.groupBy("grp_a", "grp_b").agg(
        F.count("*").alias("n_kept"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_common"),
        F.max(F.when(F.col("pos") == k, v)).alias("v_k"),
    )
    union_est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float((k - 1) * _KMV_SPACE)) / F.col("v_k").cast("double"))
    return agg.select(
        "grp_a",
        "grp_b",
        "n_common",
        F.floor(union_est).cast("long").alias("union_est"),
        F.floor(
            F.col("n_common").cast("double") / F.col("n_kept").cast("double")
            * union_est
        )
        .cast("long")
        .alias("inter_est"),
    )


def kmv_overlap_sql(pairs_sql: str, k: int = KMV_K) -> str:
    """DuckDB twin of :func:`kmv_overlap` over the same (grp, key)
    relation ``pairs_sql`` (sketches re-derived identically)."""
    num = (k - 1) * _KMV_SPACE
    v = _kmv_hex_to_int_sql(f"substr(h, 1, {_KMV_HEX})")
    return f"""
WITH pairs AS ({pairs_sql}),
dw AS (SELECT DISTINCT grp, md5('kmv' || '|' || CAST(key AS VARCHAR)) AS h
       FROM pairs),
sk AS (SELECT grp, h FROM (
         SELECT grp, h,
                ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS pos
         FROM dw) WHERE pos <= {k}),
gp AS (SELECT a.grp AS grp_a, b.grp AS grp_b
       FROM (SELECT DISTINCT grp FROM sk) a
       JOIN (SELECT DISTINCT grp FROM sk) b ON a.grp < b.grp),
fl AS (
  SELECT grp_a, grp_b, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
    SELECT gp.grp_a, gp.grp_b, s.h, 1 AS in_a, 0 AS in_b
    FROM gp JOIN sk s ON s.grp = gp.grp_a
    UNION ALL
    SELECT gp.grp_a, gp.grp_b, s.h, 0 AS in_a, 1 AS in_b
    FROM gp JOIN sk s ON s.grp = gp.grp_b
  ) GROUP BY grp_a, grp_b, h
),
mk AS (SELECT * FROM (
         SELECT fl.*, ROW_NUMBER() OVER (
           PARTITION BY grp_a, grp_b ORDER BY h) AS pos
         FROM fl) WHERE pos <= {k}),
ag AS (
  SELECT grp_a, grp_b, COUNT(*) AS n_kept,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_common,
         MAX(CASE WHEN pos = {k} THEN {v} END) AS v_k
  FROM mk GROUP BY grp_a, grp_b
)
SELECT grp_a, grp_b, n_common,
       CAST(FLOOR(CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                       ELSE {num} / CAST(v_k AS DOUBLE) END) AS BIGINT)
         AS union_est,
       CAST(FLOOR(CAST(n_common AS DOUBLE) / CAST(n_kept AS DOUBLE)
                  * (CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                          ELSE {num} / CAST(v_k AS DOUBLE) END))
            AS BIGINT) AS inter_est
FROM ag"""
