"""Deterministic sampling and dataset-split operators for training-data
pipelines (extension surface — the reference has no sampling; its corpus
is consumed whole, PageRankAlgorithm.java:60-136).

Design for 100 TB:

- Every assignment is a PURE COLUMN EXPRESSION of the row's own key —
  no RNG state, no driver coordination, no shuffle.  A row's split is
  reproducible across retries, executors, and engine versions, which is
  the property training pipelines actually need (`rand()` with a seed is
  only reproducible per-partition-layout, which a cluster does not
  preserve).
- The hash family is ``md5(seed || '|' || key)`` hex, the same
  cross-engine-stable family the dedup operators use
  (operators/dedup.py): Spark and DuckDB produce identical lowercase
  hex, so thresholds compare identically as plain strings — the oracle
  needs no engine-specific hash shim.
- Fractions are mapped to thresholds over the first ``HEX_DIGITS`` hex
  chars (65536 buckets): resolution 1/65536 ≈ 0.0015%, far below any
  practical split-fraction precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.sqltext import sql_quote

HEX_DIGITS = 4
_BUCKETS = 16**HEX_DIGITS


def _bucket_hex(key: Column, seed: str) -> Column:
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(seed), key.cast("string"))), 1, HEX_DIGITS
    )


def _bucket_hex_sql(key_expr: str, seed: str) -> str:
    return f"substr(md5('{seed}' || '|' || CAST({key_expr} AS VARCHAR)), 1, {HEX_DIGITS})"


def _thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """(split_name, upper_hex_threshold) with cumulative boundaries.
    The last split absorbs rounding remainder (its threshold is ffff+1
    conceptually — implemented as the CASE ELSE arm)."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, cum = [], 0.0
    for name, frac in fractions.items():
        cum += frac
        out.append((name, format(min(round(cum * _BUCKETS), _BUCKETS - 1), "04x")))
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    seed: str = "split-0",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test by default)
    purely from ``md5(seed|key)`` — deterministic, shuffle-free,
    retry-stable.  Dict order of ``fractions`` fixes the bucket layout,
    so the same (fractions, seed) always yields the same assignment."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    thr = _thresholds(fractions)
    bucket = _bucket_hex(F.col(key_col), seed)
    expr: Column | None = None
    for name, hi in thr[:-1]:
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = thr[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def hash_split_sql(
    key_expr: str,
    fractions: dict[str, float] | None = None,
    seed: str = "split-0",
) -> str:
    """DuckDB CASE expression twin of :func:`hash_split`."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    thr = _thresholds(fractions)
    b = _bucket_hex_sql(key_expr, seed)
    arms = " ".join(
        f"WHEN {b} < '{hi}' THEN '{name}'" for name, hi in thr[:-1]
    )
    return f"CASE {arms} ELSE '{thr[-1][0]}' END"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: str = "sample-0",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows: row survives
    iff its hash bucket falls below the stratum's threshold.  Unlike
    ``df.sampleBy`` (per-partition RNG — resample on retry/re-layout),
    membership is a pure function of (seed, key), so a 1000-executor
    re-run, a lost-task retry, and a laptop all keep the same rows.
    Strata absent from ``fractions`` keep ``default_fraction``."""
    bucket = _bucket_hex(F.col(key_col), seed)
    thr: Column | None = None
    for stratum, frac in fractions.items():
        hexthr = format(min(round(frac * _BUCKETS), _BUCKETS), "05x")
        cond = F.col(strata_col) == stratum
        thr = F.when(cond, hexthr) if thr is None else thr.when(cond, hexthr)
    default_hex = format(min(round(default_fraction * _BUCKETS), _BUCKETS), "05x")
    thr = F.lit(default_hex) if thr is None else thr.otherwise(default_hex)
    # bucket is 4 hex digits, thresholds 5 — a full fraction (1.0 →
    # '10000') sorts above every bucket, so fraction 1.0 keeps all rows
    return df.where(F.concat(F.lit("0"), bucket) < thr)


def stratified_sample_sql(
    strata_expr: str,
    fractions: dict[str, float],
    key_expr: str,
    seed: str = "sample-0",
    default_fraction: float = 0.0,
) -> str:
    """DuckDB WHERE-clause twin of :func:`stratified_sample`."""
    b = _bucket_hex_sql(key_expr, seed)
    arms = " ".join(
        f"WHEN {strata_expr} = {sql_quote(s)} THEN "
        f"'{format(min(round(f * _BUCKETS), _BUCKETS), '05x')}'"
        for s, f in fractions.items()
    )
    default_hex = format(min(round(default_fraction * _BUCKETS), _BUCKETS), "05x")
    return f"('0' || {b}) < (CASE {arms} ELSE '{default_hex}' END)"


def quantile_bins(
    df: DataFrame,
    order_cols: list,
    n_bins: int,
    out_col: str = "bin",
) -> DataFrame:
    """Assign every row an equi-depth quantile bin (1..n_bins) under the
    total order ``order_cols`` — decile/percentile bucketing for curriculum
    ordering or quality-tier selection.

    ``bin = (pos - 1) * n_bins div N + 1`` over the parallel global
    position (operators/ranking.py — range partitions + offsets, never a
    single-partition window).  Bin sizes differ by at most 1.  INTEGER
    division (`div`, not `/` — Spark's `/` is double division, whose
    truncation can disagree with exact integer division by one ulp), so
    the bin boundary cannot drift cross-engine.  N comes from one count
    action (the S4 driver-scalar channel, same as PageRank's page
    count)."""
    from .ranking import with_global_position

    # position first, count after: `pos` is eagerly materialized by
    # with_global_position, so N is a cheap cache read — counting `df`
    # directly (the pre-r11 order) re-ran the caller's whole scoring
    # subtree once just for the row count.  `ordered=False`: bin
    # assignment needs the pos COLUMN, not a presentation sort.
    pos = with_global_position(df, order_cols, ordered=False)
    n = pos.count()
    return pos.withColumn(
        out_col,
        F.expr(f"(pos - 1) * {int(n_bins)} div {int(n)} + 1").cast("long"),
    )


def _mix_arms(weights: dict[str, float], default_weight: float):
    """Per-stratum (base_copies, fractional-part hex threshold)."""
    def arm(w: float) -> tuple[int, str]:
        if w < 0:
            raise ValueError(f"negative mix weight {w}")
        base = int(w)
        frac = w - base
        return base, format(min(round(frac * _BUCKETS), _BUCKETS), "05x")

    return {s: arm(w) for s, w in weights.items()}, arm(default_weight)


def weighted_mix(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    seed: str = "mix-0",
    default_weight: float = 1.0,
    copy_col: str = "copy",
) -> DataFrame:
    """Deterministic weighted re-mixing of data sources: a row whose
    stratum has weight ``w`` appears ``floor(w)`` times plus one more
    iff its hash bucket falls below ``frac(w)`` — so a 2.5× domain is
    upsampled to 2 or 3 copies (expected 2.5) and a 0.25× domain is
    downsampled, all as a pure function of (seed, key).  This is the
    epoch-mixing operator of a training pipeline (oversample rare
    high-quality sources, damp boilerplate) with exact reproducibility
    across retries and re-partitioning.

    Replication is ``explode(sequence(1, n))`` — no RNG, no join; the
    ``copy_col`` index (1-based) lets downstream shuffles decorrelate
    copies.  Scale: output rows ≤ ceil(max weight) × input, produced
    map-side with zero shuffles."""
    arms, default_arm = _mix_arms(weights, default_weight)
    bucket5 = F.concat(F.lit("0"), _bucket_hex(F.col(key_col), seed))
    base: Column | None = None
    thr: Column | None = None
    for stratum, (b, h) in arms.items():
        cond = F.col(strata_col) == stratum
        base = F.when(cond, b) if base is None else base.when(cond, b)
        thr = F.when(cond, h) if thr is None else thr.when(cond, h)
    db, dh = default_arm
    base = F.lit(db) if base is None else base.otherwise(db)
    thr = F.lit(dh) if thr is None else thr.otherwise(dh)
    n = (base + (bucket5 < thr).cast("int")).alias("_n_copies")
    out = df.withColumn("_n_copies", n).where(F.col("_n_copies") >= 1)
    return out.withColumn(
        copy_col, F.explode(F.sequence(F.lit(1), F.col("_n_copies")))
    ).drop("_n_copies")


def weighted_mix_sql(
    strata_expr: str,
    weights: dict[str, float],
    key_expr: str,
    seed: str = "mix-0",
    default_weight: float = 1.0,
) -> str:
    """DuckDB fragment twin of :func:`weighted_mix`: emits
    ``(n_copies_expr, copy-unnest_expr)`` usage as a full FROM-lateral
    snippet the caller embeds; returns the n_copies CASE expression."""
    arms, (db, dh) = _mix_arms(weights, default_weight)
    b = _bucket_hex_sql(key_expr, seed)
    base_arms = " ".join(
        f"WHEN {strata_expr} = {sql_quote(s)} THEN {a[0]}" for s, a in arms.items()
    )
    thr_arms = " ".join(
        f"WHEN {strata_expr} = {sql_quote(s)} THEN '{a[1]}'" for s, a in arms.items()
    )
    return (
        f"(CASE {base_arms} ELSE {db} END"
        f" + CASE WHEN ('0' || {b}) < (CASE {thr_arms} ELSE '{dh}' END)"
        f" THEN 1 ELSE 0 END)"
    )


def bottom_k_sample(
    df: DataFrame, key_col: str, k: int, seed: str = "bk-0"
) -> DataFrame:
    """Deterministic FIXED-SIZE uniform sample: the ``k`` rows with the
    smallest ``md5(seed|key)`` — the bottom-k-hash sketch.  Complements
    the fixed-FRACTION samplers (:func:`hash_split`,
    :func:`stratified_sample`): same retry/layout stability (pure
    function of the key), but the output size is exactly ``k`` rows
    regardless of input cardinality.

    Scale shape: ``orderBy(hash).limit(k)`` compiles to
    TakeOrderedAndProject — each partition keeps its local bottom-k and
    the driver merges P·k candidate rows; the full input is never
    globally sorted and never shuffled.  md5 makes ties impossible for
    distinct keys, so the result is total-order unique."""
    key = F.md5(
        F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string"))
    )
    return df.withColumn("_bk", key).orderBy("_bk").limit(k).drop("_bk")


def bottom_k_sample_sql(
    select_cols: str, table: str, key_expr: str, k: int, seed: str = "bk-0"
) -> str:
    """DuckDB twin of :func:`bottom_k_sample`."""
    return (
        f"SELECT {select_cols} FROM {table} "
        f"ORDER BY md5('{seed}' || '|' || CAST({key_expr} AS VARCHAR)) "
        f"LIMIT {k}"
    )


def bottom_k_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    seed: str = "bkg-0",
) -> DataFrame:
    """Fixed-size deterministic sample PER GROUP: within each
    ``group_col`` value, keep the ``k`` rows with the smallest
    ``md5(seed|key)`` — balanced eval-set construction (equal-sized
    slices per domain/language/source regardless of group skew).

    Scale shape: one hash shuffle on the group key + a rank window
    within each group — the window state is O(1) per row (streaming
    row_number), and membership is a pure function of (seed, key), so
    retries and different partition layouts agree row-for-row."""
    from pyspark.sql import Window

    key = F.md5(
        F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(key.asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def bottom_k_per_group_sql(
    select_cols: str,
    table: str,
    group_expr: str,
    key_expr: str,
    k: int,
    seed: str = "bkg-0",
) -> str:
    """DuckDB twin of :func:`bottom_k_per_group`."""
    return f"""
SELECT {select_cols} FROM (
  SELECT {select_cols},
         row_number() OVER (
           PARTITION BY {group_expr}
           ORDER BY md5('{seed}' || '|' || CAST({key_expr} AS VARCHAR))
         ) AS rn
  FROM {table})
WHERE rn <= {k}"""


# --------------------------------------------------------------------------
# Curriculum / mixture ordering: the global TRAINING ORDER for a
# weighted multi-source corpus.  weighted_mix decides how many copies
# of each row exist; this decides WHEN each row is seen — sources are
# interleaved proportionally to weight (weight-4 sources appear 4x as
# often as weight-1 early on), the schedule every mixture-ratio
# training run needs.
# --------------------------------------------------------------------------

# Fixed-point scale for the rational schedule key r/w.  Any integer
# weight w produces key = (r * PREC) div w — exact when w divides PREC
# (all of 1..10 do), deterministically floored otherwise.
CURRICULUM_PREC = 2520  # lcm(1..10)


def curriculum_order(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weight: Column,
    seed: str = "cur-0",
    num_partitions: int | None = None,
) -> DataFrame:
    """(pos, source, id): a deterministic global training order that
    interleaves sources proportionally to ``weight`` (an integer
    column expression, e.g. a CASE over source names).

    Mechanics: rows are ranked WITHIN their source by the md5 hash
    family (deterministic, layout-independent); row r of a weight-w
    source is scheduled at rational key r/w (fixed-point:
    ``r * PREC div w``), so between any two consecutive appearances of
    a weight-1 source, a weight-4 source appears four times.  The
    global position over (key, source, rank) is assigned by the
    range-partitioned parallel counter (``with_global_position``) —
    one source-hash shuffle + one range shuffle, no single-partition
    window anywhere.
    """
    from .ranking import with_global_position
    from pyspark.sql import Window

    w_rank = Window.partitionBy(source_col).orderBy(
        _bucket_hex(F.col(id_col), seed), F.col(id_col)
    )
    ranked = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("id"),
        F.row_number().over(w_rank).cast("long").alias("rnk"),
        weight.cast("long").alias("w"),
    ).select(
        "source",
        "id",
        "rnk",
        F.expr(f"(rnk * {CURRICULUM_PREC}) div w").alias("sched_key"),
    )
    return with_global_position(
        ranked,
        [F.asc("sched_key"), F.asc("source"), F.asc("rnk")],
        pos_col="pos",
        num_partitions=num_partitions,
    ).select("pos", "source", "id")


def curriculum_order_sql(
    table: str,
    source_expr: str,
    id_expr: str,
    weight_expr: str,
    seed: str = "cur-0",
) -> str:
    """DuckDB twin: identical ranks, keys and tiebreaks via plain
    window functions (single-node, any scale DuckDB can hold)."""
    return f"""
WITH r AS (
  SELECT {source_expr} AS source, {id_expr} AS id,
         CAST({weight_expr} AS BIGINT) AS w,
         ROW_NUMBER() OVER (
           PARTITION BY {source_expr}
           ORDER BY {_bucket_hex_sql(id_expr, seed)}, {id_expr}
         ) AS rnk
  FROM {table})
SELECT ROW_NUMBER() OVER (ORDER BY (rnk * {CURRICULUM_PREC}) // w, source, rnk)
         AS pos,
       source, id
FROM r"""


# ---------------------------------------------------------------------------
# Temperature-scaled mixture rebalancing: the multilingual-corpus
# resampler (p_g ∝ n_g^α).  With α < 1 the head group (e.g. English)
# is downsampled toward the tail groups — the standard knob for
# balancing a training mixture without upsampling anything.
# ---------------------------------------------------------------------------

TEMP_SEED = "temp-0"


def _temp_rates(df: DataFrame, group_col: str) -> DataFrame:
    """(group, n_before, thr): per-group admission thresholds for
    α = 0.5 temperature sampling, computed declaratively (no driver
    round-trip).  The keep-rate that turns counts n_g into targets
    ∝ n_g^α is r_g = (min_n / n_g)^(1-α); α = 0.5 makes that a single
    ``sqrt`` — IEEE-correctly-rounded in both engines, so the floor'd
    threshold is cross-engine deterministic (general ``pow`` is exp/ln
    and is NOT).  The smallest group keeps everything (r = 1).

    Scale: the rate relation is |groups| rows (languages/sources — tiny
    forever); the min is a 1-row broadcast."""
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n_before")
    )
    mn = counts.agg(F.min("n_before").alias("min_n"))
    return counts.crossJoin(F.broadcast(mn)).select(
        "grp",
        "n_before",
        F.floor(
            F.sqrt(F.col("min_n").cast("double") / F.col("n_before")) * _BUCKETS
        )
        .cast("long")
        .alias("thr"),
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    seed: str = TEMP_SEED,
) -> DataFrame:
    """Rows of ``df`` admitted by α = 0.5 temperature sampling over
    ``group_col``: row survives iff its md5 bucket clears its group's
    data-derived threshold.  Per-row membership stays a pure function
    of (seed, key, the group's count) — retry/layout-stable like every
    sampler here; the only addition over :func:`stratified_sample` is
    that the fractions come FROM the data (one tiny aggregate,
    broadcast back).  The threshold is compared in 5-hex-digit space so
    thr = 65536 ('10000') keeps every row of the smallest group."""
    rates = _temp_rates(df, group_col).select(
        F.col("grp").alias("__tm_grp"), F.col("thr").alias("__tm_thr")
    )
    bucket = F.concat(F.lit("0"), _bucket_hex(F.col(key_col), seed))
    return (
        df.join(F.broadcast(rates), df[group_col] == rates["__tm_grp"])
        .where(bucket < F.format_string("%05x", F.col("__tm_thr")))
        .drop("__tm_grp", "__tm_thr")
    )


def temperature_mix_summary(
    df: DataFrame, group_col: str, key_col: str, seed: str = TEMP_SEED
) -> DataFrame:
    """(grp, n_before, thr, n_after): the audit view of
    :func:`temperature_mix` — what each group's keep-threshold was and
    how many rows cleared it."""
    admitted = (
        temperature_mix(df, group_col, key_col, seed)
        .groupBy(F.col(group_col).alias("grp"))
        .agg(F.count("*").alias("n_after"))
    )
    return (
        _temp_rates(df, group_col)
        .join(admitted, "grp", "left")
        .select(
            "grp",
            "n_before",
            "thr",
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
        )
    )


def temperature_mix_summary_sql(
    table: str, group_expr: str, key_expr: str, seed: str = TEMP_SEED
) -> str:
    """DuckDB twin of :func:`temperature_mix_summary` (identical rate
    arithmetic: BIGINT counts → DOUBLE divide → sqrt → floor)."""
    b = _bucket_hex_sql(key_expr, seed)
    return f"""
WITH c AS (
  SELECT {group_expr} AS grp, COUNT(*) AS n_before FROM {table} GROUP BY 1
),
m AS (SELECT MIN(n_before) AS min_n FROM c),
r AS (
  SELECT grp, n_before,
         CAST(FLOOR(SQRT(CAST(min_n AS DOUBLE) / n_before) * {_BUCKETS})
              AS BIGINT) AS thr
  FROM c CROSS JOIN m
),
a AS (
  SELECT {group_expr} AS grp, COUNT(*) AS n_after
  FROM {table} t JOIN r ON {group_expr} = r.grp
  WHERE ('0' || {b}) < printf('%05x', thr)
  GROUP BY 1
)
SELECT r.grp, r.n_before, r.thr, COALESCE(a.n_after, 0) AS n_after
FROM r LEFT JOIN a ON r.grp = a.grp"""


# ---------------------------------------------------------------------------
# Deterministic training-epoch shuffle
# ---------------------------------------------------------------------------

EPOCH_SHARDS = 8


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int = EPOCH_SHARDS,
    epochs: int = 2,
) -> DataFrame:
    """(epoch, shard, pos, key): a fresh deterministic permutation of
    the dataset per training epoch, materialized as shard assignments
    with within-shard positions — the "global shuffle" a data loader
    needs, WITHOUT a global sort.

    Mechanics per epoch e: h = md5('epoch<e>|key'); shard = first 4
    hex digits mod n_shards (uniform, so shards balance to ~n/shards
    rows regardless of key skew); pos = rank of h within the shard.
    Reading shards in order of (shard, pos) yields a uniform random
    permutation that is a PURE FUNCTION of (epoch, key): retry-stable,
    layout-independent, reproducible from the epoch number alone, and
    uncorrelated across epochs (independent hash prefixes).

    Scale shape: one projection + one window per epoch, partitioned by
    (epoch, shard) — n_shards * epochs independent sort groups, each
    ~n/n_shards rows; nothing ever passes through a single partition.
    At the 100 TB grain n_shards is the loader's file-shard count
    (thousands), keeping each sort group worker-sized."""
    parts = []
    for e in range(1, epochs + 1):
        h = F.md5(
            F.concat_ws("|", F.lit(f"epoch{e}"), F.col(key_col).cast("string"))
        )
        parts.append(
            df.select(
                F.lit(e).cast("long").alias("epoch"),
                (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_shards).alias(
                    "shard"
                ),
                h.alias("_h"),
                F.col(key_col).alias("key"),
            )
        )
    un = parts[0]
    for p_ in parts[1:]:
        un = un.unionAll(p_)
    w = Window.partitionBy("epoch", "shard").orderBy("_h")
    return un.select(
        "epoch",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
        "key",
    )


def epoch_shuffle_sql(
    table: str,
    key_expr: str,
    n_shards: int = EPOCH_SHARDS,
    epochs: int = 2,
) -> str:
    """DuckDB twin of :func:`epoch_shuffle`."""
    digits = "0123456789abcdef"
    selects = []
    for e in range(1, epochs + 1):
        h = f"md5('epoch{e}' || '|' || CAST({key_expr} AS VARCHAR))"
        shard_terms = " + ".join(
            f"(strpos('{digits}', substr({h}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
            for i in range(4)
        )
        selects.append(
            f"SELECT {e} AS epoch, ({shard_terms}) % {n_shards} AS shard,"
            f" {h} AS _h, {key_expr} AS key FROM {table}"
        )
    body = "\n  UNION ALL ".join(selects)
    return f"""
WITH hashed AS (
  {body}
)
SELECT CAST(epoch AS BIGINT) AS epoch, CAST(shard AS BIGINT) AS shard,
       ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY _h) AS pos,
       key
FROM hashed"""


# --------------------------------------------------------------------------
# Weighted sampling without replacement (x104): per-source top-k by the
# Efraimidis-Spirakis A-ES key ln(u) / w — each doc's selection
# probability is proportional to its weight (chars here: "sample
# tokens, not documents", so a 10 kB doc is 100x likelier than a
# 100 B one), u derived from md5(seed|doc_id), NOT an RNG — the
# sample is a pure function of the row key, so retries, re-layouts
# and re-runs agree row-for-row (the property seeded rand() does not
# have on a cluster).  Scale shape: one group-key shuffle + a
# streaming row_number per group (Spark's WindowGroupLimit pushes the
# rank<=k cut into the sort, so no group ever materializes fully).
# The float key only ORDERS rows; adjacent md5-derived keys differ by
# >> 1 ulp, so both engines elect the same rows; outputs are integers.
# --------------------------------------------------------------------------

AES_K = 20
AES_SEED = "aes-0"
_AES_HEX = 13  # 52 bits: exact in BIGINT and in DOUBLE


def weighted_sample_per_group(
    documents: DataFrame, k: int = AES_K, seed: str = AES_SEED
) -> DataFrame:
    """(doc_id, source, n_chars, rk): the k docs per source electing
    the largest ln(u)/n_chars (u in (0, 1] from 52 md5 bits);
    zero-weight docs are excluded (they can never be sampled)."""
    from pyspark.sql import Window

    h = F.md5(F.concat_ws("|", F.lit(seed), F.col("doc_id").cast("string")))
    v = F.conv(F.substring(h, 1, _AES_HEX), 16, 10).cast("long")
    u = (v + 1).cast("double") / F.lit(float(2 ** (4 * _AES_HEX)))
    key = F.log(u) / F.col("n_chars")
    w = Window.partitionBy("source").orderBy(F.desc("_aes_key"), "doc_id")
    return (
        documents.where(F.col("n_chars") > 0)
        .select("doc_id", "source", "n_chars", key.alias("_aes_key"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select("doc_id", "source", "n_chars", "rk")
    )


def weighted_sample_sql(k: int = AES_K, seed: str = AES_SEED) -> str:
    """DuckDB twin: identical 52-bit md5 uniform and A-ES key
    (hex→int via strpos digit expansion — DuckDB has no conv())."""
    digits = "0123456789abcdef"
    v = " + ".join(
        f"(strpos('{digits}', substr(h, {i + 1}, 1)) - 1) * {16 ** (_AES_HEX - 1 - i)}"
        for i in range(_AES_HEX)
    )
    return f"""
WITH hashed AS (
  SELECT doc_id, source, n_chars,
         md5('{seed}' || '|' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents WHERE n_chars > 0
),
keyed AS (
  SELECT doc_id, source, n_chars,
         LN(CAST(({v}) + 1 AS DOUBLE) / {float(2 ** (4 * _AES_HEX))}) / n_chars
           AS aes_key
  FROM hashed
)
SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS rk FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY source ORDER BY aes_key DESC, doc_id) AS rk
  FROM keyed)
WHERE rk <= {k}"""


# --------------------------------------------------------------------------
# Budgeted quality mix (x132): x61's temperature allocation, but the
# kept rows are the BEST-scoring per group instead of a hash-random
# subset — the "quality-filtered temperature sampling" a production
# mix actually ships (score with x129, allocate per source, keep the
# top of each source's score distribution).  Selection is
# HISTOGRAM-FIRST (the d6/w10 discipline): the per-source cutoff is
# found on the bounded (group, score) grid — one aggregate + a window
# over grid rows, never a row_number over a whole source's documents
# (a 30-TB source would otherwise become one task).  Only boundary
# ties (rows AT the cutoff score) pay a per-(group, score) window,
# bounded by the tie count; the deterministic min-doc_id tiebreak
# makes the kept set exactly replayable in SQL.
# --------------------------------------------------------------------------


def quality_budget_mix(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
) -> DataFrame:
    """Rows of ``df`` kept by α = 0.5 temperature allocation over
    ``group_col``, best ``score_col`` first: group g with n_g rows
    keeps n_keep(g) = floor(sqrt(min_n / n_g) · n_g) rows — the
    smallest group survives whole, large groups are downsampled to
    their temperature share, and within every group the KEPT rows are
    the top scorers (ties at the cutoff broken by min ``id_col``).
    Output = the kept rows of ``df`` (all columns)."""
    g, s, i = F.col(group_col), F.col(score_col), F.col(id_col)
    counts = df.groupBy(group_col).agg(F.count("*").alias("__qm_n"))
    min_n = counts.agg(F.min("__qm_n").alias("__qm_min"))
    alloc = counts.crossJoin(F.broadcast(min_n)).select(
        g.alias("__qm_grp"),
        F.floor(
            F.sqrt(F.col("__qm_min").cast("double") / F.col("__qm_n"))
            * F.col("__qm_n")
        )
        .cast("long")
        .alias("__qm_keep"),
    )
    hist = df.groupBy(group_col, score_col).agg(F.count("*").alias("__qm_c"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(s.desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grid = hist.select(
        g.alias("__qm_grp2"),
        s.alias("__qm_score"),
        "__qm_c",
        F.coalesce(F.sum("__qm_c").over(w), F.lit(0)).alias("__qm_above"),
    )
    cut = (
        grid.join(
            F.broadcast(alloc),
            F.col("__qm_grp2") == F.col("__qm_grp"),
        )
        # the grid row containing the cutoff: rows strictly above it
        # fit the budget, rows through it overflow (or exactly fill)
        .where(
            (F.col("__qm_above") < F.col("__qm_keep"))
            & (F.col("__qm_above") + F.col("__qm_c") >= F.col("__qm_keep"))
        )
        .select(
            "__qm_grp",
            F.col("__qm_score").alias("__qm_cut"),
            (F.col("__qm_keep") - F.col("__qm_above")).alias("__qm_slots"),
        )
    )
    joined = df.join(F.broadcast(cut), g == F.col("__qm_grp"))
    # two branches so the corpus never shuffles for the tiebreak: rows
    # strictly above the cutoff keep with NO wide op (broadcast filter
    # only); only rows AT the cutoff score — bounded by the tie count —
    # pay a per-group window.  Two scans of the input; callers with an
    # expensive scored subtree should persist it first.
    above = joined.where(s > F.col("__qm_cut")).drop(
        "__qm_grp", "__qm_cut", "__qm_slots"
    )
    tie_w = Window.partitionBy(group_col).orderBy(i.asc())
    at_cut = (
        joined.where(s == F.col("__qm_cut"))
        .withColumn("__qm_rk", F.row_number().over(tie_w))
        .where(F.col("__qm_rk") <= F.col("__qm_slots"))
        .drop("__qm_grp", "__qm_cut", "__qm_slots", "__qm_rk")
    )
    return above.unionByName(at_cut)


def quality_budget_mix_sql(
    table_sql: str,
    group_expr: str,
    score_expr: str,
    id_expr: str,
    out_cols: str,
) -> str:
    """DuckDB twin of :func:`quality_budget_mix` — identical
    allocation arithmetic (BIGINT counts → DOUBLE sqrt → floor) and
    the same histogram-first cutoff + min-id boundary tiebreak.
    ``out_cols`` must list the output columns EXPLICITLY (a '*' here
    would leak the __grp/__score/__rk/__cut helper columns and
    diverge from the Spark twin's schema)."""
    return f"""
WITH __t AS MATERIALIZED ({table_sql}),
__c AS (SELECT {group_expr} AS grp, COUNT(*) AS n FROM __t GROUP BY 1),
__m AS (SELECT MIN(n) AS min_n FROM __c),
__alloc AS (
  SELECT grp,
         CAST(FLOOR(SQRT(CAST(min_n AS DOUBLE) / n) * n) AS BIGINT) AS keep_n
  FROM __c CROSS JOIN __m
),
__hist AS (
  SELECT {group_expr} AS grp, {score_expr} AS score, COUNT(*) AS c
  FROM __t GROUP BY 1, 2
),
__grid AS (
  SELECT grp, score, c,
         COALESCE(SUM(c) OVER (PARTITION BY grp ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
  FROM __hist
),
__cut AS (
  SELECT g.grp AS __cut_grp, g.score AS __cut, a.keep_n - g.above AS __slots
  FROM __grid g JOIN __alloc a USING (grp)
  WHERE g.above < a.keep_n AND g.above + g.c >= a.keep_n
),
__rk AS (
  SELECT {out_cols}, {group_expr} AS __grp, {score_expr} AS __score,
         ROW_NUMBER() OVER (PARTITION BY {group_expr}, {score_expr}
                            ORDER BY {id_expr} ASC) AS __rk
  FROM __t
)
SELECT {out_cols} FROM __rk r JOIN __cut k ON r.__grp = k.__cut_grp
WHERE r.__score > k.__cut
   OR (r.__score = k.__cut AND r.__rk <= k.__slots)"""


# --------------------------------------------------------------------------
# DSIR importance resampling (x136): Data Selection with Importance
# Resampling (Xie et al. 2023, arXiv:2302.03169) — pick raw-pool
# documents whose hashed-n-gram distribution looks like a TARGET
# domain.  Features are word bigrams hashed into DSIR_BUCKETS buckets
# (the classifier-family md5 idiom, text_analysis._cls_hash); the
# importance log-weight of a document is
#     sum_b cnt_b * ln( p_tgt(b) / p_raw(b) )
# with add-one smoothing on both bucket distributions, and selection
# is Gumbel-top-k over (log-weight + Gumbel(u)) with u a pure md5
# function of doc_id — i.e. sampling WITHOUT replacement proportional
# to the importance weight, deterministic across retries/layouts
# (the A-ES/x104 discipline; seeded rand() is layout-dependent).
#
# Determinism: per-bucket log-ratios are quantized to e6 integers
# FIRST (one ln over an exact-integer rational per bucket — the
# x103/PMI convention), so every per-document total is an EXACT
# integer sum and both engines agree bit-for-bit regardless of
# summation order.  The Gumbel key -ln(-ln(u)) is likewise quantized
# to e6 per document before the exact integer add.
#
# Scale shape (100 TB): the feature pass is one explode + one
# (doc_id, bucket) partial-agg'd groupBy; the model is a FIXED
# DSIR_BUCKETS-row relation (broadcast at scoring time — never a
# corpus-side shuffle); scoring is one broadcast join + one doc_id
# aggregate; selection is TakeOrderedAndProject (per-partition top-k
# + driver merge), never a global single-partition window.  The two
# bucket totals (T, R) fit the smoothing terms of the paper: at
# corpus scales where (cnt+1)*(total+B) would exceed 2^53, split the
# ln into ln(cnt+1)-ln(total+B) per side and re-pin the op order.
# --------------------------------------------------------------------------

DSIR_TARGET = ("src0", "src1", "src2", "src3")
DSIR_BUCKETS = 4096
DSIR_KEEP_DEN = 10  # keep floor(|raw| / 10) documents
DSIR_GUMBEL_SEED = "dsir-g0"
_DSIR_HEX = 13  # 52-bit md5 uniform, exact in BIGINT and DOUBLE


def _dsir_feats(documents: DataFrame) -> DataFrame:
    """(doc_id, source, bucket, cnt): hashed word-bigram bag per doc."""
    from .text_analysis import _cls_hash, _toks

    toked = documents.select("doc_id", "source", _toks().alias("t")).where(
        F.size("t") >= 2
    )
    bg = F.zip_with(
        F.expr("slice(t, 1, size(t) - 1)"),
        F.expr("slice(t, 2, size(t) - 1)"),
        lambda a, b: F.concat_ws("#", a, b),
    )
    return (
        toked.select("doc_id", "source", F.explode(bg).alias("g"))
        .select(
            "doc_id",
            "source",
            (_cls_hash(F.col("g")) % DSIR_BUCKETS).alias("bucket"),
        )
        .groupBy("doc_id", "source", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def _dsir_model_from_feats(
    feats: DataFrame, target_sources: tuple[str, ...]
) -> DataFrame:
    """(bucket, lr_e6) from a precomputed feature relation."""
    spark = feats.sparkSession
    is_tgt = F.col("source").isin(*target_sources)
    dist = feats.groupBy("bucket").agg(
        F.sum(F.when(is_tgt, F.col("cnt")).otherwise(F.lit(0))).alias("tc"),
        F.sum(F.when(~is_tgt, F.col("cnt")).otherwise(F.lit(0))).alias("rc"),
    )
    totals = dist.agg(
        F.sum("tc").alias("tt"), F.sum("rc").alias("rt")
    )  # 1-row scalar, S4 pattern
    b = DSIR_BUCKETS
    return (
        spark.range(b)
        .select(F.col("id").cast("long").alias("bucket"))
        .join(dist, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.floor(
                F.log(
                    (
                        (F.coalesce("tc", F.lit(0)) + 1).cast("double")
                        * (F.col("rt") + b).cast("double")
                    )
                    / (
                        (F.coalesce("rc", F.lit(0)) + 1).cast("double")
                        * (F.col("tt") + b).cast("double")
                    )
                )
                * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("lr_e6"),
        )
    )


def dsir_model(
    documents: DataFrame, target_sources: tuple[str, ...] = DSIR_TARGET
) -> DataFrame:
    """(bucket, lr_e6): the DSIR importance model fit on a STATIC
    corpus snapshot — e6-quantized ln(p_tgt/p_raw) per hashed-bigram
    bucket with add-one smoothing.  A fixed DSIR_BUCKETS-row relation:
    fit once, broadcast everywhere (the slowly-changing-dimension
    discipline — at ingest you score with the model you have).
    Eagerly materialized so a caller scoring many batches (z22) pays
    the distribution fit exactly once.  The feature relation is
    corpus-exploded-scale, so it is persist()-ed (spillable) only for
    the duration of the fit and released once the 4096-row model is
    pinned — the x103 materialize policy (an eager localCheckpoint of
    feats would leave unreleasable corpus-scale blocks behind; two
    back-to-back runs OOMed an 8g session at sf10)."""
    feats = _dsir_feats(documents).persist()
    model = _dsir_model_from_feats(feats, target_sources).localCheckpoint(
        eager=True
    )
    feats.unpersist()
    return model


def _score_feats(feats: DataFrame, model: DataFrame) -> DataFrame:
    """(doc_id, n_feats, total_lr_e6): the shared scoring aggregate —
    broadcast model join + one doc_id aggregate (exact integer sums).
    The ONE place the scoring math lives (review finding, r11 ext:
    dsir_score and dsir_resample previously each inlined it)."""
    return (
        feats.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.sum(F.col("cnt") * F.col("lr_e6")).alias("total_lr_e6"),
        )
    )


def dsir_score(documents: DataFrame, model: DataFrame) -> DataFrame:
    """(doc_id, source, n_feats, total_lr_e6): every document of
    ``documents`` scored under a fitted (bucket, lr_e6) model —
    feature explode → broadcast model join → one doc_id aggregate;
    docs with < 2 tokens carry log-weight 0 (the empty product)."""
    per = _score_feats(_dsir_feats(documents), model)
    return (
        documents.select("doc_id", "source")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("total_lr_e6", F.lit(0)).alias("total_lr_e6"),
        )
    )


def dsir_resample(
    documents: DataFrame,
    target_sources: tuple[str, ...] = DSIR_TARGET,
    keep_den: int = DSIR_KEEP_DEN,
    seed: str = DSIR_GUMBEL_SEED,
) -> DataFrame:
    """(doc_id, source, n_feats, total_lr_e6, sel_e6): the
    floor(|raw| / keep_den) raw-pool docs (source NOT in
    ``target_sources``) electing the largest sel_e6 = total_lr_e6 +
    gumbel_e6 — Gumbel-top-k importance resampling toward the target
    domain.  Docs with < 2 tokens have no features and carry
    log-weight 0 (the empty product), so they stay samplable.

    The corpus-scale feature relation is persist()-ed (spillable) for
    its two uses — the distribution fit and the per-doc scoring — and
    RELEASED before returning, with the k-row result eagerly pinned
    instead (the x103 materialize policy; see dsir_model)."""
    is_tgt = F.col("source").isin(*target_sources)
    feats = _dsir_feats(documents).persist()
    model = _dsir_model_from_feats(feats, target_sources)
    per = _score_feats(feats.where(~is_tgt), model)
    raw_docs = documents.where(~is_tgt).select("doc_id", "source")
    h = F.md5(F.concat_ws("|", F.lit(seed), F.col("doc_id").cast("string")))
    v = F.conv(F.substring(h, 1, _DSIR_HEX), 16, 10).cast("long")
    # u in (0, 1) STRICTLY (the +1 denominator bump): u = 1 would send
    # -ln(-ln(u)) to +inf and overflow the e6 cast
    u = (v + 1).cast("double") / F.lit(float(2 ** (4 * _DSIR_HEX) + 1))
    g_e6 = (
        F.floor(-F.log(-F.log(u)) * 1e6 + F.lit(0.5000001)).cast("long")
    )
    scored = raw_docs.join(per, "doc_id", "left").select(
        "doc_id",
        "source",
        F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        F.coalesce("total_lr_e6", F.lit(0)).alias("total_lr_e6"),
        (F.coalesce("total_lr_e6", F.lit(0)) + g_e6).alias("sel_e6"),
    )
    # bounded driver scalar (S5 pattern): the keep budget
    k = int(raw_docs.count()) // keep_den
    out = (
        scored.orderBy(F.desc("sel_e6"), "doc_id")
        .limit(k)
        .localCheckpoint(eager=True)  # k rows — pin, then free feats
    )
    feats.unpersist()
    return out


def _dsir_model_ctes(
    target_sources: tuple[str, ...], per_where: str = ""
) -> str:
    """The shared DuckDB CTE chain (toked → feats → dist → totals →
    model → per) used by BOTH dsir_resample_sql and dsir_score_sql —
    the ONE place the SQL-side feature/model/scoring math lives
    (review finding, r11 ext: the two builders previously duplicated
    ~35 lines each, so a tokenization or smoothing change could
    silently desync the twins).  ``per_where`` optionally restricts
    the scored side (the resampler scores the raw pool only)."""
    from .text_analysis import _cls_hash_sql

    b = DSIR_BUCKETS
    tgt = ", ".join(sql_quote(s) for s in target_sources)
    return f"""toked AS (
  SELECT doc_id, source, t FROM (
    SELECT doc_id, source, list_filter(string_split_regex(
             lower(trim(regexp_replace(text, '[^a-zA-Z]+', ' ', 'g'))), ' +'),
             t -> t != '') AS t
    FROM documents)
  WHERE len(t) >= 2
),
feats AS MATERIALIZED (
  SELECT doc_id, source, bucket, COUNT(*) AS cnt FROM (
    SELECT doc_id, source,
           {_cls_hash_sql("g")} % {b} AS bucket
    FROM (
      SELECT doc_id, source,
             unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || '#' || t[i+1])) AS g
      FROM toked))
  GROUP BY doc_id, source, bucket
),
dist AS (
  SELECT bucket,
         SUM(CASE WHEN source IN ({tgt}) THEN cnt ELSE 0 END) AS tc,
         SUM(CASE WHEN source NOT IN ({tgt}) THEN cnt ELSE 0 END) AS rc
  FROM feats GROUP BY bucket
),
totals AS (SELECT SUM(tc) AS tt, SUM(rc) AS rt FROM dist),
model AS (
  SELECT s.bucket,
         CAST(FLOOR(LN(
             (CAST(COALESCE(tc, 0) + 1 AS DOUBLE)
              * CAST(rt + {b} AS DOUBLE))
             / (CAST(COALESCE(rc, 0) + 1 AS DOUBLE)
                * CAST(tt + {b} AS DOUBLE))
           ) * 1e6 + 0.5000001) AS BIGINT) AS lr_e6
  FROM (SELECT unnest(generate_series(0, {b - 1})) AS bucket) s
  LEFT JOIN dist USING (bucket) CROSS JOIN totals
),
per AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_feats,
         CAST(SUM(cnt * lr_e6) AS BIGINT) AS total_lr_e6
  FROM feats JOIN model USING (bucket)
  {per_where}
  GROUP BY doc_id
)"""


def dsir_resample_sql(
    target_sources: tuple[str, ...] = DSIR_TARGET,
    keep_den: int = DSIR_KEEP_DEN,
    seed: str = DSIR_GUMBEL_SEED,
) -> str:
    """DuckDB twin of :func:`dsir_resample` (identical hash family,
    quantization points, and tiebreak)."""
    tgt = ", ".join(sql_quote(s) for s in target_sources)
    digits = "0123456789abcdef"
    v = " + ".join(
        f"(strpos('{digits}', substr(h, {i + 1}, 1)) - 1)"
        f" * {16 ** (_DSIR_HEX - 1 - i)}"
        for i in range(_DSIR_HEX)
    )
    ctes = _dsir_model_ctes(
        target_sources, per_where=f"WHERE source NOT IN ({tgt})"
    )
    return f"""
WITH {ctes},
raw_docs AS (
  SELECT doc_id, source,
         md5({sql_quote(seed)} || '|' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents WHERE source NOT IN ({tgt})
),
scored AS (
  SELECT r.doc_id, r.source,
         COALESCE(n_feats, 0) AS n_feats,
         COALESCE(total_lr_e6, 0) AS total_lr_e6,
         COALESCE(total_lr_e6, 0)
           + CAST(FLOOR(-LN(-LN(
                 CAST(({v}) + 1 AS DOUBLE)
                 / {float(2 ** (4 * _DSIR_HEX) + 1)}))
               * 1e6 + 0.5000001) AS BIGINT) AS sel_e6
  FROM raw_docs r LEFT JOIN per USING (doc_id)
)
SELECT doc_id, source, n_feats, total_lr_e6, sel_e6
FROM scored
QUALIFY row_number() OVER (ORDER BY sel_e6 DESC, doc_id)
        <= (SELECT COUNT(*) // {keep_den} FROM raw_docs)"""


def dsir_score_sql(
    target_sources: tuple[str, ...] = DSIR_TARGET,
) -> str:
    """DuckDB twin of :func:`dsir_score` with the model fit on the
    full static ``documents`` table (the z22 at-ingest contract: the
    model trained on the snapshot scores every arriving document)."""
    return f"""
WITH {_dsir_model_ctes(target_sources)}
SELECT d.doc_id, d.source,
       COALESCE(n_feats, 0) AS n_feats,
       COALESCE(total_lr_e6, 0) AS total_lr_e6
FROM (SELECT doc_id, source FROM documents) d
LEFT JOIN per USING (doc_id)"""
