"""Relational demonstration queries (TPC-H-ish) over the testdata star
schema — the general query surface a user of the engine gets beyond the
reference's two pipelines: multi-way joins, grouped aggregation,
window functions, sessionization, pivot.

Cross-engine determinism: monetary/measure doubles are quantized to
integers PER ROW (same double input + same ops → bit-identical in both
engines), then summed as integers — integer sums are order-independent,
so shuffle/summation order cannot flip a value hash.  (Summing doubles
then rounding would NOT be safe: ~1e-11 relative noise at 1e8 scale
dwarfs any quantum.)

Scale notes: every join below is a shuffle join on the natural key with
the small dimensions (region/nation/supplier/customer at this ratio)
broadcast by AQE automatically; aggregates get map-side partial
aggregation; no Python touches any row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _q(col: F.Column, scale: int) -> F.Column:
    """Per-row quantize: floor(x*10^scale + 0.5 + 1e-6) as bigint."""
    return F.floor(col * (10**scale) + F.lit(0.5000001)).cast("long")


def _sq(expr: str, scale: int) -> str:
    return f"CAST(FLOOR(({expr}) * 1e{scale} + 0.5000001) AS BIGINT)"


def _ssum(expr: str, scale: int) -> str:
    """Quantized sum for the DuckDB oracle.  The outer cast matters:
    DuckDB's SUM(BIGINT) returns HUGEINT, which degrades to float64 on
    the pandas/Arrow hash path — values bit-identical to Spark's would
    still hash-mismatch without it."""
    return f"CAST(SUM({_sq(expr, scale)}) AS BIGINT)"


# --------------------------------------------------------------------------
# Q1-style pricing summary
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= "1998-09-02"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            _q(F.col("l_quantity"), 2).alias("qty_e2"),
            _q(F.col("l_extendedprice"), 2).alias("base_e2"),
            _q(disc_price, 4).alias("disc_e4"),
            _q(charge, 6).alias("charge_e6"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty_e2").alias("sum_qty_e2"),
            F.sum("base_e2").alias("sum_base_e2"),
            F.sum("disc_e4").alias("sum_disc_e4"),
            F.sum("charge_e6").alias("sum_charge_e6"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_ssum("l_quantity", 2)} AS sum_qty_e2,
       {_ssum("l_extendedprice", 2)} AS sum_base_e2,
       {_ssum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_e4,
       {_ssum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge_e6,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Q3-style shipping priority (3-way join, top-10)
# --------------------------------------------------------------------------


def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = _q(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .select("o_orderkey", rev.alias("rev_e4"))
        .groupBy("o_orderkey")
        .agg(F.sum("rev_e4").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("o_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT o_orderkey,
       {_ssum("l_extendedprice * (1 - l_discount)", 4)} AS revenue_e4
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue_e4 DESC, o_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Q5-style regional revenue (6-way join)
# --------------------------------------------------------------------------


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = _q(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .join(cust, nation.n_nationkey == cust.c_nationkey)
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == nation.n_nationkey),
        )
        .select("r_name", "n_name", rev.alias("rev_e4"))
        .groupBy("r_name", "n_name")
        .agg(F.sum("rev_e4").alias("revenue_e4"), F.count("*").alias("n_items"))
    )


Q5_SQL = f"""
SELECT r_name, n_name,
       {_ssum("l_extendedprice * (1 - l_discount)", 4)} AS revenue_e4,
       COUNT(*) AS n_items
FROM region
JOIN nation ON r_regionkey = n_regionkey
JOIN customer ON n_nationkey = c_nationkey
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------------
# Window: top-3 orders per customer
# --------------------------------------------------------------------------


def w1_window_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    price = _q(F.col("o_totalprice"), 2)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("price_e2"), F.asc("o_orderkey")
    )
    return (
        orders.select("o_custkey", "o_orderkey", price.alias("price_e2"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
    )


W1_SQL = f"""
SELECT * FROM (
  SELECT o_custkey, o_orderkey,
         {_sq("o_totalprice", 2)} AS price_e2,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY {_sq("o_totalprice", 2)} DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# Bounded ROWS frame: per-user rolling mean over the last 7 events —
# the moving-average window shape (w1 covers ranking frames, e1 lag;
# this is the only bounded sliding frame).  The rolling mean divides a
# sum of e2-quantized integers by the frame row count — exact-operand
# division, bit-identical cross-engine.
# --------------------------------------------------------------------------

ROLL_FRAME = 6  # preceding rows -> 7-event window


def w2_rolling_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ROLL_FRAME, Window.currentRow)
    )
    v = _q(F.col("value"), 2)
    return ev.select(
        "event_id",
        "user_id",
        v.alias("value_e2"),
        F.sum(v).over(w).alias("roll_sum_e2"),
        F.count("*").over(w).alias("roll_n"),
        _q(F.sum(v).over(w) / F.count("*").over(w), 0).alias("roll_mean_e2"),
    )


W2_SQL = f"""
SELECT event_id, user_id,
       {_sq("value", 2)} AS value_e2,
       CAST(SUM({_sq("value", 2)}) OVER w AS BIGINT) AS roll_sum_e2,
       COUNT(*) OVER w AS roll_n,
       {_sq(f"CAST(SUM({_sq('value', 2)}) OVER w AS DOUBLE) / COUNT(*) OVER w", 0)} AS roll_mean_e2
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ROLL_FRAME} PRECEDING AND CURRENT ROW)"""


# --------------------------------------------------------------------------
# Sessionization: 30-minute inactivity gap (lag + running sum)
# --------------------------------------------------------------------------

SESSION_GAP_S = 1800


def e1_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap compared in integer microseconds on both engines — mixing
    # second-truncated and fractional epochs would flip boundary gaps
    is_new = F.when(
        F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
        > SESSION_GAP_S * 1_000_000,
        1,
    ).otherwise(0)
    with_sess = ev.withColumn("new_sess", is_new)
    return with_sess.groupBy("user_id").agg(
        (F.sum("new_sess") + 1).cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


E1_SQL = f"""
SELECT user_id,
       CAST(SUM(new_sess) + 1 AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)
              > {SESSION_GAP_S} * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
)
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Native session windows: Spark's built-in session_window aggregation in
# BATCH mode — the engine-native complement to the lag/cumsum e1 shape
# and the custom stateful streaming sessionizer (z2).  Emits one row per
# SESSION (not per user), so it also exercises the per-session grain.
#
# Boundary semantics (verified on PySpark 4.1.2): session_window
# MERGES events exactly gap apart — a session [t, t+gap) is extended
# by an event at t+gap, so only diff > gap opens a new session.  This
# matches e1's strict-> lag test, and the oracle's break predicate is
# therefore strict `>` as well.
# --------------------------------------------------------------------------


def e4_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("sw"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_q(F.col("value"), 2)).alias("sum_value_e2"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("sess_start_us"),
            F.unix_micros(F.col("sw.end")).alias("sess_end_us"),
            "n_events",
            "sum_value_e2",
        )
    )


E4_SQL = f"""
WITH marked AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)
              > {SESSION_GAP_S} * 1000000
              THEN 1 ELSE 0 END AS brk,
         {_sq("value", 2)} AS v_e2
  FROM events
),
sess AS (
  SELECT user_id, ts_us, v_e2,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       MIN(ts_us) AS sess_start_us,
       MAX(ts_us) + {SESSION_GAP_S} * 1000000 AS sess_end_us,
       COUNT(*) AS n_events,
       CAST(SUM(v_e2) AS BIGINT) AS sum_value_e2
FROM sess GROUP BY user_id, sid
"""


# --------------------------------------------------------------------------
# Tumbling-window aggregation (batch twin of the streaming operator)
# --------------------------------------------------------------------------


def e2_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
            _q(F.col("value"), 2).alias("value_e2"),
        )
        .groupBy("hour_epoch", "event_type")
        .agg(F.count("*").alias("n"), F.sum("value_e2").alias("sum_value_e2"))
    )


E2_SQL = f"""
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type,
       COUNT(*) AS n,
       {_ssum("value", 2)} AS sum_value_e2
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Pivot: per-user activity matrix over the fixed event-type domain
# --------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def e3_pivot_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for absent combos; normalize to 0 for hash parity
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in EVENT_TYPES],
    )


E3_SQL = f"""
SELECT user_id,
       {", ".join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in EVENT_TYPES)}
FROM events
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Unpivot (melt): the inverse reshape of e3 — wide per-type count
# columns back to (user_id, event_type, n) rows.  Exercises Spark's
# unpivot/melt API; the oracle re-derives the long form directly.
# Zero-count combinations are kept (the unpivot of a dense wide table
# is dense), matching the CROSS JOIN in the oracle.
# --------------------------------------------------------------------------


def e5_unpivot_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = e3_pivot_activity(spark, sf_dir)
    return wide.unpivot(
        ids=["user_id"],
        values=[f"n_{t}" for t in EVENT_TYPES],
        variableColumnName="type_col",
        valueColumnName="n",
    ).select(
        "user_id",
        F.expr("substring(type_col, 3)").alias("event_type"),
        F.col("n").cast("long").alias("n"),
    )


E5_SQL = f"""
WITH types AS (SELECT unnest(ARRAY[{", ".join(f"'{t}'" for t in EVENT_TYPES)}]) AS event_type),
users AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id, t.event_type,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM users u CROSS JOIN types t
LEFT JOIN (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
) c ON c.user_id = u.user_id AND c.event_type = t.event_type
"""


# --------------------------------------------------------------------------
# Time-weighted average: the TSDB aggregate — each observation holds
# until the next one, so the mean weights each value by its holding
# interval, not by row count.  The weighted sum multiplies the
# e2-quantized value by WHOLE SECONDS held (both integer-exact); the
# final ratio divides two exact longs — bit-identical cross-engine.
# The last observation per user has no successor and drops out, the
# standard open-interval convention.
# --------------------------------------------------------------------------


def w3_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    dt_s = (F.lead(ts_us).over(w) - ts_us) / F.lit(1_000_000)
    rows = ev.select(
        "user_id",
        _q(F.col("value"), 2).alias("v_e2"),
        F.floor(dt_s).cast("long").alias("dt_s"),
    ).where(F.col("dt_s").isNotNull())
    agg = rows.groupBy("user_id").agg(
        F.sum(F.col("v_e2") * F.col("dt_s")).alias("weighted_e2s"),
        F.sum("dt_s").alias("total_s"),
        F.count("*").alias("n_intervals"),
    )
    twa = F.when(
        F.col("total_s") > 0,
        F.col("weighted_e2s").cast("double") / F.col("total_s"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "user_id",
        "weighted_e2s",
        "total_s",
        "n_intervals",
        F.floor(twa * 1e4 + F.lit(0.5000001)).cast("long").alias("twa_e6"),
    )


W3_SQL = f"""
WITH rows_ AS (
  SELECT user_id,
         {_sq("value", 2)} AS v_e2,
         CAST(FLOOR((LEAD(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) - epoch_us(ts))
             / 1000000.0) AS BIGINT) AS dt_s
  FROM events
),
agg AS (
  SELECT user_id,
         CAST(SUM(v_e2 * dt_s) AS BIGINT) AS weighted_e2s,
         CAST(SUM(dt_s) AS BIGINT) AS total_s,
         COUNT(*) AS n_intervals
  FROM rows_ WHERE dt_s IS NOT NULL GROUP BY user_id
)
SELECT user_id, weighted_e2s, total_s, n_intervals,
       CAST(FLOOR((CASE WHEN total_s > 0
                        THEN CAST(weighted_e2s AS DOUBLE) / total_s
                        ELSE 0.0 END) * 1e4 + 0.5000001) AS BIGINT) AS twa_e6
FROM agg
"""


# --------------------------------------------------------------------------
# Statistical aggregates: exact interpolated percentiles + dispersion.
# Verified bit-identical cross-engine (Spark percentile == DuckDB
# quantile_cont, both type-7 interpolation; stddev/avg agree to the ulp
# on identical input doubles), so post-aggregation e6 quantization is
# safe here.
# --------------------------------------------------------------------------


def s1_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        _q(F.expr("percentile(value, 0.5)"), 6).alias("p50_e6"),
        _q(F.expr("percentile(value, 0.95)"), 6).alias("p95_e6"),
        _q(F.stddev_samp("value"), 6).alias("sd_e6"),
        _q(F.avg("value"), 6).alias("mean_e6"),
        F.count("*").alias("n"),
    )


S1_STATS_SQL = f"""
SELECT event_type,
       {_sq("quantile_cont(value, 0.5)", 6)} AS p50_e6,
       {_sq("quantile_cont(value, 0.95)", 6)} AS p95_e6,
       {_sq("stddev_samp(value)", 6)} AS sd_e6,
       {_sq("avg(value)", 6)} AS mean_e6,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Grouping sets: ROLLUP and CUBE (multi-level aggregation in one pass —
# Catalyst expands to a single Expand + HashAggregate, not N scans)
# --------------------------------------------------------------------------


def g1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag", "l_linestatus", _q(F.col("l_quantity"), 2).alias("qty_e2")
        )
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("qty_e2").alias("sum_qty_e2"), F.count("*").alias("n"))
        # NULL marks the rolled-up level; coalesce to a sentinel so the
        # value hash treats grouping NULLs identically in both engines
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("l_returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("l_linestatus"),
            "sum_qty_e2",
            "n",
        )
    )


G1_SQL = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       {_ssum("l_quantity", 2)} AS sum_qty_e2,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def g2_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.date_format("ts", "EEEE").alias("dow"),
            _q(F.col("value"), 2).alias("value_e2"),
        )
        .cube("event_type", "dow")
        .agg(F.sum("value_e2").alias("sum_value_e2"), F.count("*").alias("n"))
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("dow"), F.lit("ALL")).alias("dow"),
            "sum_value_e2",
            "n",
        )
    )


G2_SQL = f"""
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(dayname(ts), 'ALL') AS dow,
       {_ssum("value", 2)} AS sum_value_e2,
       COUNT(*) AS n
FROM events
GROUP BY CUBE (event_type, dayname(ts))
"""


# --------------------------------------------------------------------------
# Semi / anti joins (existence tests without row multiplication)
# --------------------------------------------------------------------------


def sj1_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


SJ1_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def sj2_customers_without_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join with non-trivial output on this data: only user_ids
    0-149 appear in events, so most of the 1500 customers survive
    (customers-without-orders would be vacuously empty here)."""
    cust = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    return cust.join(
        ev, cust.c_custkey == ev.user_id, "left_anti"
    ).select("c_custkey", "c_name")


SJ2_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
"""


# --------------------------------------------------------------------------
# Range join: for each purchase, the same user's activity in the
# preceding hour (self band join).  Equi key (user) + range predicate on
# time — Catalyst plans the equi part as the shuffle key and evaluates
# the band as a join residual, so it scales like a hash join, not a
# cross product.
# --------------------------------------------------------------------------

RANGE_US = 3600 * 1_000_000  # 1 hour


def rj1_pre_purchase_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.unix_micros(F.col("ts")).alias("p_us"),
    )
    prior = ev.select(
        "user_id", F.unix_micros(F.col("ts")).alias("e_us"), "value"
    )
    joined = purchases.join(
        prior,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("e_us") >= F.col("p_us") - F.lit(RANGE_US))
        & (F.col("e_us") < F.col("p_us")),
    )
    return joined.groupBy("purchase_id").agg(
        F.count("*").alias("n_events"),
        F.sum(_q(F.col("value"), 2)).alias("sum_value_e2"),
    )


RJ1_SQL = f"""
SELECT p.event_id AS purchase_id, COUNT(*) AS n_events,
       {_ssum("e.value", 2)} AS sum_value_e2
FROM events p JOIN events e
  ON e.user_id = p.user_id
 AND epoch_us(e.ts) >= epoch_us(p.ts) - {RANGE_US}
 AND epoch_us(e.ts) < epoch_us(p.ts)
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
"""


# --------------------------------------------------------------------------
# Set operations: union / intersect / except as user-level ops
# --------------------------------------------------------------------------


ERROR_PRONE = 15  # users with more than this many errors get subtracted
                  # (median is ~13 on this data → a real split, not vacuous)


def st1_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-user set algebra: (purchasers ∩ clickers) ∪ signups,
    minus error-prone users — exercising UNION/INTERSECT/EXCEPT
    DISTINCT (every user has ≥1 error on this data, so subtracting
    plain error-users would be vacuously empty)."""
    ev = load_table(spark, sf_dir, "events")

    def users_of(t: str) -> DataFrame:
        return ev.where(F.col("event_type") == t).select("user_id")

    error_prone = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > ERROR_PRONE)
        .select("user_id")
    )
    return (
        users_of("purchase")
        .intersect(users_of("click"))  # INTERSECT (distinct)
        .union(users_of("signup"))
        .distinct()
        .subtract(error_prone)  # EXCEPT (distinct)
    )


ST1_SQL = f"""
SELECT DISTINCT user_id FROM (
  SELECT user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'click'
  )
  UNION
  SELECT user_id FROM events WHERE event_type = 'signup'
)
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error'
GROUP BY user_id HAVING COUNT(*) > {ERROR_PRONE}
"""


# --------------------------------------------------------------------------
# Q14-style promo revenue share (lineitem × part — the one table no
# other query touches; the big-side scan joins a broadcast dimension)
# --------------------------------------------------------------------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = _q(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    joined = li.join(part, li.l_partkey == part.p_partkey).select(
        F.col("p_type"), rev.alias("rev_e4")
    )
    return (
        joined.groupBy(F.col("p_type").startswith("PROMO").alias("is_promo"))
        .agg(F.sum("rev_e4").alias("revenue_e4"), F.count("*").alias("n"))
    )


Q14_SQL = f"""
SELECT p_type LIKE 'PROMO%' AS is_promo,
       {_ssum("l_extendedprice * (1 - l_discount)", 4)} AS revenue_e4,
       COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q18-style large-volume orders: aggregate → HAVING → join back — the
# one relational shape the other queries don't cover (filtering on an
# aggregate BEFORE joining dimensions).  The HAVING runs on the
# aggregated (small) relation, so the expensive joins only see the
# ~0.5% of orders that survive.
# --------------------------------------------------------------------------

LARGE_ORDER_QTY_E2 = 300 * 100  # sum(l_quantity) > 300, in e2 units


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.select("l_orderkey", _q(F.col("l_quantity"), 2).alias("qty_e2"))
        .groupBy("l_orderkey")
        .agg(F.sum("qty_e2").alias("sum_qty_e2"))
        .where(F.col("sum_qty_e2") > LARGE_ORDER_QTY_E2)  # HAVING
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            _q(F.col("o_totalprice"), 2).alias("total_e2"),
            "sum_qty_e2",
        )
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       {_sq("o_totalprice", 2)} AS total_e2, sum_qty_e2
FROM orders
JOIN (
  SELECT l_orderkey, {_ssum("l_quantity", 2)} AS sum_qty_e2
  FROM lineitem GROUP BY l_orderkey
  HAVING {_ssum("l_quantity", 2)} > {LARGE_ORDER_QTY_E2}
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# JSON scalar functions over the events.props column (absent from the
# reference — extension surface; stays JVM-side via from_json)
# --------------------------------------------------------------------------


def j1_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.sum(F.col("k").cast("long")).alias("sum_k"),
            F.max(F.col("k").cast("long")).alias("max_k"),
            F.count("*").alias("n"),
        )
    )


J1_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       COUNT(*) AS n
FROM events
WHERE json_extract(props, '$.k') IS NOT NULL
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# The spark.sql surface: the engine is also queryable as plain ANSI SQL
# over registered views (sources.tables.register_views)
# --------------------------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape, submitted as SQL text — same Catalyst pipeline
    as the DataFrame API (the oracle is the identical statement on
    DuckDB, modulo the e4 quantization)."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(f"""
        SELECT {_ssum("l_extendedprice * l_discount", 4)} AS revenue_e4,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """)


Q6_SQL = f"""
SELECT {_ssum("l_extendedprice * l_discount", 4)} AS revenue_e4,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# Q4-style order-priority check: EXISTS with a CORRELATED date predicate
# (lineitem shipped >60 days after its order's date).  Compiles to a
# left-semi join whose condition mixes the equi key with the correlated
# inequality — the equi part is still the shuffle key, so it scales as a
# hash join; no other query covers correlated-EXISTS.
# --------------------------------------------------------------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q7-style volume shipping: the nation dimension joined TWICE in two
# roles (supplier's nation vs customer's nation) — broadcast both
# copies; only the big-side lineitem scan shuffles.
# --------------------------------------------------------------------------

Q7_PAIR = ("NATION_1", "NATION_2")


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    a, b = Q7_PAIR
    rev = _q(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .where(
            ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
            rev.alias("rev_e4"),
        )
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(F.sum("rev_e4").alias("revenue_e4"), F.count("*").alias("n"))
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       {_ssum("l_extendedprice * (1 - l_discount)", 4)} AS revenue_e4,
       COUNT(*) AS n
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{Q7_PAIR[0]}' AND n2.n_name = '{Q7_PAIR[1]}')
   OR (n1.n_name = '{Q7_PAIR[1]}' AND n2.n_name = '{Q7_PAIR[0]}')
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# Q8-style national market share: what fraction of a region's revenue in
# one part segment is supplied by a given nation, per year.  The share
# ratio is emitted as two quantized integer columns (numerator /
# denominator) rather than a double — integer sums are
# summation-order-independent, so the cross-engine hash can't wobble.
# Shape not covered elsewhere: conditional aggregation over a 6-way join
# where the SAME dimension (nation) plays two roles (customer's region
# membership + supplier's nationality).
# --------------------------------------------------------------------------

Q8_REGION = "ASIA"
Q8_NATION = "NATION_19"  # present among ASIA-facing PROMO suppliers at every SF
Q8_TYPE = "PROMO"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # customer-side role: nation → region gate (broadcast both)
    cn = (
        nation.join(
            F.broadcast(region.where(F.col("r_name") == Q8_REGION)),
            nation.n_regionkey == region.r_regionkey,
        )
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    # supplier-side role: nationality label
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    rev = _q(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(F.broadcast(part.where(F.col("p_type") == Q8_TYPE)),
                li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("c_nk"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("long").alias("order_year"),
            rev.alias("rev_e4"),
            F.when(F.col("supp_nation") == Q8_NATION, F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_target"),
        )
        .groupBy("order_year")
        .agg(
            F.sum(F.when(F.col("is_target") == 1, F.col("rev_e4")).otherwise(F.lit(0)))
            .alias("nation_rev_e4"),
            F.sum("rev_e4").alias("total_rev_e4"),
            F.count("*").alias("n"),
        )
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(SUM(CASE WHEN n2.n_name = '{Q8_NATION}'
                     THEN {_sq("l_extendedprice * (1 - l_discount)", 4)}
                     ELSE 0 END) AS BIGINT) AS nation_rev_e4,
       {_ssum("l_extendedprice * (1 - l_discount)", 4)} AS total_rev_e4,
       COUNT(*) AS n
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_type = '{Q8_TYPE}'
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = '{Q8_REGION}'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q9-style product-type profit by supplier nation and year.  The TPC-H
# original prices cost from partsupp.ps_supplycost; this testdata has no
# partsupp, so cost is modeled as a fixed fraction of p_retailprice —
# the SHAPE (profit = revenue − cost over a part×supplier×orders join,
# grouped by nation×year, with per-row signed quantization) is what's
# exercised.
# --------------------------------------------------------------------------

Q9_COST_RATE = 0.1  # cost per unit = 10% of retail price


def q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    amount = _q(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * Q9_COST_RATE,
        4,
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("s_nk"))
        .select(
            "nation",
            F.year("o_orderdate").cast("long").alias("order_year"),
            amount.alias("amount_e4"),
        )
        .groupBy("nation", "order_year")
        .agg(F.sum("amount_e4").alias("profit_e4"), F.count("*").alias("n"))
    )


Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       {_ssum(f"l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * {Q9_COST_RATE}", 4)} AS profit_e4,
       COUNT(*) AS n
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Q10-style returned items: which customers returned the most revenue in
# a quarter (4-way join filtered on both fact tables, top-20)
# --------------------------------------------------------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = _q(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            _q(F.col("c_acctbal"), 2).alias("acctbal_e2"),
            rev.alias("rev_e4"),
        )
        .groupBy("c_custkey", "c_name", "nation", "acctbal_e2")
        .agg(F.sum("rev_e4").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name AS nation,
       {_sq("c_acctbal", 2)} AS acctbal_e2,
       {_ssum("l_extendedprice * (1 - l_discount)", 4)} AS revenue_e4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue_e4 DESC, c_custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# Q12-style priority shipping: conditional aggregation (CASE inside SUM)
# classifying lines by their order's priority, per ship-year
# --------------------------------------------------------------------------

HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.when(F.col("o_orderpriority").isin(*HIGH_PRIORITIES), 1).otherwise(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(high).cast("long").alias("high_lines"),
            F.sum(1 - high).cast("long").alias("low_lines"),
            F.count("*").alias("n_lines"),
        )
    )


Q12_SQL = f"""
SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM(CASE WHEN o_orderpriority IN {HIGH_PRIORITIES!r} THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
       CAST(SUM(CASE WHEN o_orderpriority IN {HIGH_PRIORITIES!r} THEN 0 ELSE 1 END) AS BIGINT) AS low_lines,
       COUNT(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q13-style customer distribution: LEFT OUTER join + two-level
# aggregation (orders per customer, then customers per order-count) —
# the only query exercising outer-join null-preserving aggregation
# --------------------------------------------------------------------------


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        # COUNT(col) skips NULLs, so order-less customers count 0
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# Q15-style top supplier: aggregate, then filter on the aggregate's own
# MAX — a scalar subquery over a derived relation.  Spark side keeps it
# distributed: the 1-row max is broadcast back, never collect()ed.
# --------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.select("l_suppkey", _q(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("rev_e4"))
        .groupBy("l_suppkey")
        .agg(F.sum("rev_e4").alias("total_e4"))
    )
    mx = rev.agg(F.max("total_e4").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_e4 == mx.mx)
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_e4")
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, {_ssum("l_extendedprice * (1 - l_discount)", 4)} AS total_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_e4
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_e4 = (SELECT MAX(total_e4) FROM rev)
"""


# --------------------------------------------------------------------------
# Q17-style small-quantity revenue: per-key average as a CORRELATED
# threshold (quantity below 20% of the part's mean order size).
# Cross-engine determinism: l_quantity is integer-valued, so AVG is an
# exact-operand division — both engines produce the bit-identical
# double, and the < comparison cannot flip.
# --------------------------------------------------------------------------

Q17_BRAND = "Brand#5"


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == Q17_BRAND)
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("lim")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("lim"))
        .agg(
            F.sum(_q(F.col("l_extendedprice"), 2)).alias("total_price_e2"),
            F.count("*").alias("n_lines"),
        )
    )


Q17_SQL = f"""
SELECT {_ssum("l_extendedprice", 2)} AS total_price_e2,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey
JOIN (SELECT l_partkey AS a_partkey, AVG(l_quantity) * 0.2 AS lim
      FROM lineitem GROUP BY l_partkey) a
  ON l.l_partkey = a.a_partkey
WHERE p_brand = '{Q17_BRAND}' AND l.l_quantity < a.lim
"""


# --------------------------------------------------------------------------
# Q19-style disjunctive predicates: OR-of-ANDs across two tables — the
# shape that tests whether the optimizer can still push the per-table
# parts of the disjunction down to the scans
# --------------------------------------------------------------------------

Q19_ARMS = (
    ("Brand#1", 1, 15, 1, 20),
    ("Brand#2", 16, 30, 10, 30),
    ("Brand#3", 31, 50, 20, 40),
)


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # Every OR-arm constrains (p_brand, p_size), so the part-only
    # disjunction is a valid pre-filter: push it onto `part` BEFORE the
    # broadcast.  At TPC-H sf100 `part` is 20M rows — broadcasting it
    # unfiltered is a driver OOM; filtered, the broadcast side is only
    # the rows any arm could match (and the filter reaches the parquet
    # scan as a pushed predicate).
    part_arm = None
    arm = None
    for brand, s_lo, s_hi, q_lo, q_hi in Q19_ARMS:
        p = (F.col("p_brand") == brand) & F.col("p_size").between(s_lo, s_hi)
        c = p & F.col("l_quantity").between(q_lo, q_hi)
        part_arm = p if part_arm is None else (part_arm | p)
        arm = c if arm is None else (arm | c)
    rev = _q(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(F.broadcast(part.where(part_arm)), li.l_partkey == part.p_partkey)
        .where(arm)
        .agg(F.sum(rev).alias("revenue_e4"), F.count("*").alias("n"))
    )


Q19_SQL = f"""
SELECT {_ssum("l_extendedprice * (1 - l_discount)", 4)} AS revenue_e4,
       COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {" OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
    f"AND l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in Q19_ARMS)}
"""


# --------------------------------------------------------------------------
# Q22-style global sales opportunity: wealthy customers (balance above
# the positive-balance average) with no RECENT order (none since
# LAPSED_CUTOFF — every customer has *some* order on this data, so the
# unqualified variant would be vacuously empty), per nation.  The
# average threshold is computed over e2-quantized integers so the
# scalar is an exact-operand division — bit-identical cross-engine.
# --------------------------------------------------------------------------

LAPSED_CUTOFF = "2000-01-01"


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", _q(F.col("c_acctbal"), 2).alias("acctbal_e2")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= LAPSED_CUTOFF)
        .select("o_custkey")
    )
    thr = cust.where(F.col("acctbal_e2") > 0).agg(
        F.avg("acctbal_e2").alias("thr")
    )
    return (
        cust.join(F.broadcast(thr), cust.acctbal_e2 > thr.thr)
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count("*").alias("n_cust"),
            F.sum("acctbal_e2").alias("total_bal_e2"),
        )
    )


Q22_SQL = f"""
WITH c2 AS (
  SELECT c_custkey, c_nationkey, {_sq("c_acctbal", 2)} AS acctbal_e2
  FROM customer
)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       COUNT(*) AS n_cust,
       CAST(SUM(acctbal_e2) AS BIGINT) AS total_bal_e2
FROM c2
WHERE acctbal_e2 > (SELECT AVG(acctbal_e2) FROM c2 WHERE acctbal_e2 > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '{LAPSED_CUTOFF}')
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Snapshot diff (incremental-ETL shape): compare per-order aggregate
# state at two ship-date cutoffs — which orders APPEARED, which grew
# (CHANGED), which were already complete (SAME).  One full-outer join
# of two aggregate states on the key; the CDC pattern for maintaining
# derived tables without reprocessing history.
#
# Scale note: the full-outer form is the GENERAL shape (two independent
# snapshot tables, e.g. yesterday's materialization vs today's).  For
# this same-source special case a single scan with conditional
# aggregation (SUM(CASE WHEN < T1 ...) vs SUM over the < T2 filter)
# halves the I/O; the general form is kept because two real snapshots
# cannot be fused.
# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# SCD type-2 build (the other half of the CDC story): turn the event
# change feed into a VERSIONED dimension — one row per observed state,
# [valid_from, valid_to) via lead(), open interval (NULL valid_to,
# encoded as -1 for hash parity) on the current version.  One window
# over the natural key; no self-join.
# --------------------------------------------------------------------------


def d2_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    return ev.select(
        "user_id",
        "event_id",
        _q(F.col("value"), 2).alias("value_e2"),
        ts_us.alias("valid_from_us"),
        F.coalesce(F.lead(ts_us).over(w), F.lit(-1)).alias("valid_to_us"),
        F.lead(ts_us).over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("long").alias("version"),
    )


D2_SQL = f"""
SELECT user_id, event_id,
       {_sq("value", 2)} AS value_e2,
       epoch_us(ts) AS valid_from_us,
       COALESCE(LEAD(epoch_us(ts)) OVER w, -1) AS valid_to_us,
       LEAD(epoch_us(ts)) OVER w IS NULL AS is_current,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


SNAP_T1 = "1997-01-01"
SNAP_T2 = "1998-01-01"


def d1_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def snap(cutoff: str, col: str) -> DataFrame:
        return (
            li.where(F.col("l_shipdate") < cutoff)
            .select("l_orderkey", _q(F.col("l_quantity"), 2).alias("q"))
            .groupBy("l_orderkey")
            .agg(F.sum("q").alias(col))
        )

    old = snap(SNAP_T1, "old_qty_e2")
    new = snap(SNAP_T2, "new_qty_e2")
    # full outer: keys can exist in either snapshot alone
    joined = old.join(new, "l_orderkey", "full_outer")
    status = (
        F.when(F.col("old_qty_e2").isNull(), "added")
        .when(F.col("new_qty_e2").isNull(), "removed")  # impossible for
        # a monotone cutoff — kept so the operator generalizes to
        # non-append sources; the oracle proves the count is 0
        .when(F.col("old_qty_e2") != F.col("new_qty_e2"), "changed")
        .otherwise("same")
    )
    return (
        joined.select(
            status.alias("status"),
            F.coalesce(F.col("new_qty_e2"), F.lit(0)).alias("n_q"),
            F.coalesce(F.col("old_qty_e2"), F.lit(0)).alias("o_q"),
        )
        .groupBy("status")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("n_q") - F.col("o_q")).alias("delta_qty_e2"),
        )
    )


D1_SQL = f"""
WITH old AS (
  SELECT l_orderkey, {_ssum("l_quantity", 2)} AS old_qty_e2
  FROM lineitem WHERE l_shipdate < TIMESTAMP '{SNAP_T1}' GROUP BY 1
),
new AS (
  SELECT l_orderkey, {_ssum("l_quantity", 2)} AS new_qty_e2
  FROM lineitem WHERE l_shipdate < TIMESTAMP '{SNAP_T2}' GROUP BY 1
)
SELECT CASE WHEN old_qty_e2 IS NULL THEN 'added'
            WHEN new_qty_e2 IS NULL THEN 'removed'
            WHEN old_qty_e2 != new_qty_e2 THEN 'changed'
            ELSE 'same' END AS status,
       COUNT(*) AS n_orders,
       CAST(SUM(COALESCE(new_qty_e2, 0) - COALESCE(old_qty_e2, 0)) AS BIGINT) AS delta_qty_e2
FROM old FULL OUTER JOIN new USING (l_orderkey)
GROUP BY 1"""


# --------------------------------------------------------------------------
# Exact grouped quantiles: interpolated median / p90 per group — the
# order-statistic aggregate shape (s1 covers moments; this is the sort-
# based family).  Exact percentile is a full per-group sort, which is
# the point: at scale you'd swap in approx_percentile (t-digest sketch,
# mergeable, one pass) and accept the error bound; the exact form is
# the oracle-checkable baseline.  Both engines define quantiles by the
# same linear interpolation at rank (n-1)p, on identical doubles.
# --------------------------------------------------------------------------


def s2_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("p50"),
            F.percentile("l_quantity", 0.9).alias("p90"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            _q(F.col("p50"), 6).alias("p50_e6"),
            _q(F.col("p90"), 6).alias("p90_e6"),
            "n",
        )
    )


S2_SQL = f"""
SELECT l_returnflag,
       {_sq("quantile_cont(l_quantity, 0.5)", 6)} AS p50_e6,
       {_sq("quantile_cont(l_quantity, 0.9)", 6)} AS p90_e6,
       COUNT(*) AS n
FROM lineitem GROUP BY 1
"""


# --------------------------------------------------------------------------
# Funnel analysis (product-analytics shape): strictly-ordered
# first-occurrence conversion view -> click -> purchase per user.
# A user reaches step k if the FIRST occurrence of each step is
# strictly later than the previous step's first occurrence.  One
# conditional-min aggregation per user (timestamps as integer micros —
# exact comparisons), then one global roll-up: no joins, no windows,
# two shuffles total regardless of event volume.
# --------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def e6_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    firsts = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, ts_us)).alias(f"t{i}")
            for i, s in enumerate(FUNNEL_STEPS)
        ]
    )
    s0 = F.col("t0").isNotNull()
    s1 = s0 & (F.col("t1") > F.col("t0"))
    s2 = s1 & (F.col("t2") > F.col("t1"))
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.sum(s0.cast("long")).alias("n_step1"),
        F.sum(s1.cast("long")).alias("n_step2"),
        F.sum(s2.cast("long")).alias("n_step3"),
    )


E6_SQL = f"""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN epoch_us(ts) END) AS t0,
         MIN(CASE WHEN event_type = '{FUNNEL_STEPS[1]}' THEN epoch_us(ts) END) AS t1,
         MIN(CASE WHEN event_type = '{FUNNEL_STEPS[2]}' THEN epoch_us(ts) END) AS t2
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_step1,
       CAST(SUM(CASE WHEN t0 IS NOT NULL AND t1 > t0 THEN 1 ELSE 0 END) AS BIGINT) AS n_step2,
       CAST(SUM(CASE WHEN t0 IS NOT NULL AND t1 > t0 AND t2 > t1 THEN 1 ELSE 0 END) AS BIGINT) AS n_step3
FROM firsts
"""


# --------------------------------------------------------------------------
# Retention cohort matrix: users grouped by FIRST-ACTIVITY week
# (cohort), counted as active per week offset — the standard retention
# triangle.  Weeks are integer days-since-epoch div 7 (exact in both
# engines); one min-aggregate per user + one join back + one
# count-distinct roll-up.
# --------------------------------------------------------------------------


def _week(ts_col) -> F.Column:
    return F.expr(f"(unix_micros({ts_col}) div 86400000000) div 7")


def e7_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", _week("ts").alias("week")
    )
    firsts = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(firsts, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


E7_SQL = """
WITH wk AS (
  SELECT user_id, (epoch_us(ts) // 86400000000) // 7 AS week FROM events
),
firsts AS (SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id)
SELECT cohort_week, week - cohort_week AS week_offset,
       CAST(COUNT(DISTINCT wk.user_id) AS BIGINT) AS n_active
FROM wk JOIN firsts USING (user_id)
GROUP BY cohort_week, week_offset
"""


# --------------------------------------------------------------------------
# Per-user EWMA (exponential smoothing): the sequential recurrence
# s_t = a*x_t + (1-a)*s_{t-1}, s_0 = x_0 — inherently order-dependent
# state, expressed WITHOUT a UDF as a column-expression fold over the
# per-user event sequence (collect -> sort_array for a deterministic
# order -> aggregate()).  Both engines run the identical IEEE fold in
# the identical order, so the final state is bit-identical before the
# e6 quantization.  Per-user sequences are bounded (one user's
# history), so the collected arrays are group-local state — the same
# budget a streaming stateful operator would hold.
# --------------------------------------------------------------------------

EWMA_ALPHA = 0.25


def w4_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = F.sort_array(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col("ts")).alias("ts_us"),
                F.col("event_id").alias("event_id"),
                F.col("value").alias("v"),
            )
        )
    )
    a = EWMA_ALPHA
    fold = F.aggregate(
        F.transform("seq", lambda s: s["v"]),
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(a * x + (1 - a) * acc),
    )
    return (
        ev.groupBy("user_id")
        .agg(seq.alias("seq"))
        .select(
            "user_id",
            F.size("seq").cast("long").alias("n_events"),
            _q(fold, 6).alias("ewma_e6"),
        )
    )


_EWMA_REDUCE = (
    f"list_reduce(vals, (acc, x) -> {EWMA_ALPHA} * x + {1 - EWMA_ALPHA} * acc)"
)

W4_SQL = f"""
SELECT user_id,
       CAST(len(vals) AS BIGINT) AS n_events,
       {_sq(_EWMA_REDUCE, 6)} AS ewma_e6
FROM (
  SELECT user_id,
         array_agg(value ORDER BY ts, event_id) AS vals
  FROM events GROUP BY user_id)
"""


# Per-user funnel stage (0-3) — the row-grain view of e6, and the
# batch twin of the streaming funnel state machine (z11).
E6_STAGE_SQL = f"""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN epoch_us(ts) END) AS t0,
         MIN(CASE WHEN event_type = '{FUNNEL_STEPS[1]}' THEN epoch_us(ts) END) AS t1,
         MIN(CASE WHEN event_type = '{FUNNEL_STEPS[2]}' THEN epoch_us(ts) END) AS t2
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(CASE WHEN t0 IS NULL THEN 0
                 WHEN t1 IS NULL OR t1 <= t0 THEN 1
                 WHEN t2 IS NULL OR t2 <= t1 THEN 2
                 ELSE 3 END AS BIGINT) AS stage
FROM firsts
"""


# --------------------------------------------------------------------------
# Per-user outlier flagging (data-quality shape): purchases whose value
# deviates from the user's own mean by more than 2 population standard
# deviations.  All moments are computed over e3-quantized integer
# values, so every sum is order-independent BIGINT arithmetic and the
# 2σ comparison is the EXACT integer inequality
#   (n·v − S)² > 4·(n·SS − S²)      [× n² both sides]
# — no float in the decision, hence bit-identical across engines.
# One user-keyed window (single shuffle); the fleet-wide alternative
# (groupBy + join back) costs a second shuffle for no benefit here.
# Bounds: v3 ≤ 5·10⁵ (value ≤ 500).  The LINEAR moments are int64-safe
# (SS ≤ n·v3max² = 2.5·10¹⁵ at n = 10⁴), but the QUADRATIC decision
# terms are not: S² and (n·v3 − S)² reach ~2.5·10¹⁹ at n = 10⁴ — past
# int64 max, where non-ANSI Spark wraps silently while DuckDB errors
# (bigint-safe only up to n ≈ 6·10³ max-value purchases per user).  So
# the decision inequality is evaluated in EXACT wide integer types on
# both engines — decimal(38,0) in Spark, HUGEINT (int128) in DuckDB,
# both exact to well past 10³⁸ ≫ the ~10²⁰ worst case at n = 10⁶ —
# keeping the comparison bit-identical at any realistic per-user count.
# --------------------------------------------------------------------------

OUTLIER_MIN_EVENTS = 5


def e8_purchase_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    v3 = F.floor(F.col("value") * 1000 + F.lit(0.5000001)).cast("long")
    w = Window.partitionBy("user_id")
    scored = ev.select(
        "event_id",
        "user_id",
        v3.alias("v3"),
    ).select(
        "event_id",
        "user_id",
        "v3",
        F.count("*").over(w).alias("n"),
        F.sum("v3").over(w).alias("s"),
        F.sum(F.col("v3") * F.col("v3")).over(w).alias("ss"),
    )
    # quadratic terms in decimal(38,0): exact, overflow-proof (see above)
    wide = "decimal(38,0)"
    n_w = F.col("n").cast(wide)
    s_w = F.col("s").cast(wide)
    dev = n_w * F.col("v3").cast(wide) - s_w
    var_n2 = n_w * F.col("ss").cast(wide) - s_w * s_w
    return (
        scored.where(
            (F.col("n") >= OUTLIER_MIN_EVENTS) & (dev * dev > 4 * var_n2)
        )
        .select("event_id", "user_id", "v3", "n")
        .orderBy("event_id")
    )


E8_SQL = f"""
WITH p AS (
  SELECT event_id, user_id,
         CAST(FLOOR(value * 1000 + 0.5000001) AS BIGINT) AS v3
  FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT event_id, user_id, v3,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         SUM(v3) OVER (PARTITION BY user_id) AS s,
         SUM(v3 * v3) OVER (PARTITION BY user_id) AS ss
  FROM p
)
SELECT event_id, user_id, v3, n
FROM m
WHERE n >= {OUTLIER_MIN_EVENTS}
  AND CAST(n * v3 - s AS HUGEINT) * CAST(n * v3 - s AS HUGEINT)
      > 4 * (CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# Daily new-user counts + running cumulative (growth-accounting shape).
# Exact running distinct-count is O(users) state; the standard scalable
# decomposition is first-occurrence flagging: one user-keyed aggregate
# finds each user's first active day, one day-keyed count, then a
# cumulative window over the DAY relation — which is bounded (365
# rows/year) no matter how many events feed it, so the single-partition
# running-sum window is safe at any scale.
# --------------------------------------------------------------------------


def w5_running_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    daily = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


W5_SQL = """
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
),
daily AS (
  SELECT first_day AS day, COUNT(*) AS new_users FROM firsts GROUP BY first_day
)
SELECT CAST(day AS VARCHAR) AS day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM daily
"""


# --------------------------------------------------------------------------
# Last-touch attribution: each purchase credits the user's most recent
# click within the preceding 30 minutes.  Pure reuse of the as-of join
# operator (backward + tolerance — operators/asof.py): one user-keyed
# shuffle + per-key sort, no range explosion.  Tie semantics (same-
# timestamp clicks -> largest event_id) match the oracle's ORDER BY
# DESC LIMIT 1 by the operator's documented contract.
# --------------------------------------------------------------------------

ATTRIBUTION_WINDOW_S = 1800


def e9_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = asof_join(
        purchases,
        clicks,
        left_on="user_id",
        right_on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["click_id"],
        how="left",
        tolerance_s=ATTRIBUTION_WINDOW_S,
    )
    return out.select(
        "event_id",
        "user_id",
        F.coalesce("r_click_id", F.lit(-1)).alias("attributed_click_id"),
    )


E9_SQL = f"""
SELECT p.event_id, p.user_id,
       COALESCE((
         SELECT c.event_id FROM events c
         WHERE c.event_type = 'click' AND c.user_id = p.user_id
           AND epoch_us(c.ts) <= epoch_us(p.ts)
           AND epoch_us(p.ts) - epoch_us(c.ts) <= {ATTRIBUTION_WINDOW_S} * 1000000
         ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
       ), -1) AS attributed_click_id
FROM events p WHERE p.event_type = 'purchase'
"""


# --------------------------------------------------------------------------
# CDC MERGE / upsert-apply (SCD type-1): apply a change batch (upserts
# + deletes, each with a sequence number) onto a keyed base table,
# latest-change-wins.  Completes the ETL trio: d1 diffs two snapshots,
# d2 builds SCD2 version history, d3 APPLIES changes.  The change set
# is derived deterministically from the orders table (URGENT orders
# act as the feed: key = o_custkey, seq = o_orderkey, delete when
# o_orderkey % 10 >= 8) so both engines compute the identical batch.
# Shape: one change-key window (latest per key) + one full-outer join
# with the base — the exact plan a Delta/Iceberg MERGE lowers to.
# --------------------------------------------------------------------------


def d3_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5000001))
        .cast("long")
        .alias("bal_c2"),
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    changes = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 10 >= 8, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5000001))
        .cast("long")
        .alias("new_bal_c2"),
    )
    w = Window.partitionBy("c_custkey").orderBy(F.desc("seq"))
    latest = (
        changes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    merged = cust.alias("b").join(
        latest.alias("ch"), "c_custkey", "full_outer"
    )
    return (
        merged.select(
            "c_custkey",
            F.when(F.col("ch.op") == "upsert", F.col("ch.new_bal_c2"))
            .otherwise(F.col("b.bal_c2"))
            .alias("bal_c2"),
            F.when(F.col("ch.op") == "delete", F.lit("deleted"))
            .when(
                (F.col("ch.op") == "upsert") & F.col("b.bal_c2").isNotNull(),
                F.lit("updated"),
            )
            .when(F.col("ch.op") == "upsert", F.lit("inserted"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
        .where(F.col("status") != "deleted")
    )


D3_SQL = """
WITH base AS (
  SELECT c_custkey, CAST(FLOOR(c_acctbal * 100 + 0.5000001) AS BIGINT) AS bal_c2 FROM customer
),
changes AS (
  SELECT o_custkey AS c_custkey, o_orderkey AS seq,
         CASE WHEN o_orderkey % 10 >= 8 THEN 'delete' ELSE 'upsert' END AS op,
         CAST(FLOOR(o_totalprice * 100 + 0.5000001) AS BIGINT) AS new_bal_c2
  FROM orders WHERE o_orderpriority = '1-URGENT'
),
latest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
    FROM changes) WHERE rn = 1
),
merged AS (
  SELECT COALESCE(b.c_custkey, ch.c_custkey) AS c_custkey,
         CASE WHEN ch.op = 'upsert' THEN ch.new_bal_c2 ELSE b.bal_c2 END AS bal_c2,
         CASE WHEN ch.op = 'delete' THEN 'deleted'
              WHEN ch.op = 'upsert' AND b.bal_c2 IS NOT NULL THEN 'updated'
              WHEN ch.op = 'upsert' THEN 'inserted'
              ELSE 'kept' END AS status
  FROM base b FULL OUTER JOIN latest ch ON b.c_custkey = ch.c_custkey
)
SELECT c_custkey, bal_c2, status FROM merged WHERE status != 'deleted'
"""


# --------------------------------------------------------------------------
# Hourly OHLC-style buckets (time-series candle shape): per event type
# and hour, the first/last/min/max of value.  first/last are argmin/
# argmax over integer-microsecond timestamps with event_id tiebreaks —
# expressed as MIN/MAX over a (ts, event_id, value_e3) struct, i.e. an
# ordinary aggregate with map-side partial merge (NOT a per-bucket
# sort window): one shuffle at any volume, mergeable across shards.
# --------------------------------------------------------------------------


def w6_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v3 = F.floor(F.col("value") * 1000 + F.lit(0.5000001)).cast("long")
    ts_us = F.unix_micros(F.col("ts"))
    keyed = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).cast("string").alias("hour"),
        F.struct(
            ts_us.alias("t"), F.col("event_id").alias("e"), v3.alias("v")
        ).alias("o"),
        v3.alias("v3"),
    )
    return keyed.groupBy("event_type", "hour").agg(
        F.min("o").getField("v").alias("open_v3"),
        F.max("o").getField("v").alias("close_v3"),
        F.min("v3").alias("low_v3"),
        F.max("v3").alias("high_v3"),
        F.count("*").alias("n"),
    )


W6_SQL = """
WITH k AS (
  SELECT event_type,
         CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
         epoch_us(ts) AS t, event_id AS e,
         CAST(FLOOR(value * 1000 + 0.5000001) AS BIGINT) AS v3
  FROM events
)
SELECT event_type, hour,
       MIN(struct_pack(t := t, e := e, v := v3)).v AS open_v3,
       MAX(struct_pack(t := t, e := e, v := v3)).v AS close_v3,
       MIN(v3) AS low_v3,
       MAX(v3) AS high_v3,
       COUNT(*) AS n
FROM k GROUP BY event_type, hour
"""


# --------------------------------------------------------------------------
# Debounce (recency dedup): keep an event only if the PREVIOUS event
# of the same (user, type) is more than DEBOUNCE_GAP_S older (or there
# is none) — the duplicate-click / repeated-webhook suppressor.  One
# key-partitioned LAG window (single shuffle); ties on the timestamp
# are ordered by event_id so the decision is deterministic.  Distinct
# from session dedup: a long burst of sub-gap events keeps ONLY rows
# that follow a real gap, measured against the immediately preceding
# event, kept or not.
# --------------------------------------------------------------------------

DEBOUNCE_GAP_S = 600


def e10_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("t"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("t"), F.col("event_id")
    )
    return (
        ev.withColumn("prev_t", F.lag("t").over(w))
        .where(
            F.col("prev_t").isNull()
            | (F.col("t") - F.col("prev_t") > DEBOUNCE_GAP_S * 1_000_000)
        )
        .select("event_id", "user_id", "event_type")
    )


E10_SQL = f"""
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS t,
         LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY epoch_us(ts), event_id) AS prev_t
  FROM events
)
WHERE prev_t IS NULL OR t - prev_t > {DEBOUNCE_GAP_S} * 1000000
"""


# --------------------------------------------------------------------------
# Session concurrency timeline (sweep line): how many user sessions
# are simultaneously active, as a per-hour maximum.  The classic
# interval-overlap aggregate, done WITHOUT a global-order window over
# the events: a two-level prefix sum —
#   level 1: running sum of +1/-1 markers WITHIN each hour (hours are
#            independent sort groups, all hours in parallel);
#   level 2: carry-in per hour = prefix sum of per-hour delta totals
#            over the HOUR relation (bounded: one row per hour of
#            history — ~9k rows/year — so its global window is a
#            driver-scale relation, the o1 parallel-positions trick).
# max_active(hour) = carry_in + greatest(0, max(level-1 running sum)):
# the greatest(0, ·) term accounts for the level INHERITED at hour
# start — an hour whose markers are all session-closes still peaked at
# carry_in (the instant the hour began), and a marker-less hour inside
# a long session reports exactly carry_in.  Marker-less covered hours
# are emitted via a dense hour spine (bounded: one row per hour of
# history), left-joined against the marker aggregate.
# Marker ordering within an instant is pinned (delta, user, session)
# so the running sum is deterministic on both engines.
# --------------------------------------------------------------------------

_HOUR_US = 3600 * 1_000_000


def _session_intervals(ev: DataFrame) -> DataFrame:
    """(user_id, sess_id, s, e): per-user session intervals in epoch
    micros, e1's gap rule at session grain."""
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_sess = F.when(
        us - F.lag(us).over(w) > SESSION_GAP_S * 1_000_000, 1
    ).otherwise(0)
    return (
        ev.select("user_id", "event_id", "ts", us.alias("us"))
        .withColumn("sess_id", F.sum(new_sess).over(wrun).cast("long"))
        .groupBy("user_id", "sess_id")
        .agg(F.min("us").alias("s"), F.max("us").alias("e"))
    )


_SESS_SQL = f"""
SELECT user_id, sess_id, MIN(us) AS s, MAX(us) AS e FROM (
  SELECT user_id, us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM (
    SELECT user_id, event_id, epoch_us(ts) AS us,
           CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id)
                > {SESSION_GAP_S} * 1000000
                THEN 1 ELSE 0 END AS new_sess
    FROM events
  )
) GROUP BY user_id, sess_id
"""


def concurrency_timeline(ev: DataFrame) -> DataFrame:
    """(hour, max_active) from an events frame — see block comment."""
    sess = _session_intervals(ev)
    # hour-spine bounds from the RAW events (min ts / max ts + 1us
    # covers every marker: session endpoints are event timestamps) — a
    # column-only partial agg, so Catalyst does NOT re-derive the
    # sessionization subtree for the spine branch
    spine = (
        ev.agg(
            F.expr(f"min(unix_micros(ts)) div {_HOUR_US}").alias("lo"),
            F.expr(f"(max(unix_micros(ts)) + 1) div {_HOUR_US}").alias("hi"),
        )
        .select(F.explode(F.sequence("lo", "hi")).alias("hour"))
    )
    # one explode, not a unionAll of two selects over sess — the union
    # form plans the whole sessionization subtree TWICE (two scans +
    # two user-keyed windows over events); exploding a 2-element
    # marker array derives sessions once
    deltas = sess.select(
        "user_id",
        "sess_id",
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("delta")),
                F.struct((F.col("e") + 1).alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("m"),
    ).select(
        "user_id",
        "sess_id",
        F.col("m.t").alias("t"),
        F.col("m.delta").alias("delta"),
    )
    # positive epoch micros: `div` (truncation) == floor on both sides
    hour = F.expr(f"t div {_HOUR_US}")
    w1 = Window.partitionBy("hour").orderBy(
        "t", "delta", "user_id", "sess_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = deltas.withColumn("hour", hour).withColumn(
        "running", F.sum("delta").over(w1)
    )
    h = r.groupBy("hour").agg(
        F.max("running").alias("in_max"),
        F.sum("delta").alias("hd"),
    )
    # dense hour spine (built above from the raw events): marker-less
    # hours covered by long sessions must still report — they carry the
    # inherited level.  Bounded: one row per hour of history.
    hs = spine.join(h, "hour", "left").select(
        "hour",
        F.coalesce("in_max", F.lit(0)).alias("in_max"),
        F.coalesce("hd", F.lit(0)).alias("hd"),
    )
    w2 = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, -1)
    return hs.select(
        "hour",
        (
            F.coalesce(F.sum("hd").over(w2), F.lit(0))
            + F.greatest(F.lit(0), F.col("in_max"))
        )
        .cast("long")
        .alias("max_active"),
    ).orderBy("hour")


def w7_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return concurrency_timeline(load_table(spark, sf_dir, "events"))


W7_SQL = f"""
WITH sess AS ({_SESS_SQL}),
d AS (
  SELECT user_id, sess_id, s AS t, 1 AS delta FROM sess
  UNION ALL
  SELECT user_id, sess_id, e + 1 AS t, -1 AS delta FROM sess
),
r AS (
  SELECT t // {_HOUR_US} AS hour, delta,
         SUM(delta) OVER (PARTITION BY t // {_HOUR_US}
                          ORDER BY t, delta, user_id, sess_id
                          ROWS UNBOUNDED PRECEDING) AS running
  FROM d
),
h AS (SELECT hour, MAX(running) AS in_max, SUM(delta) AS hd
      FROM r GROUP BY hour),
spine AS (
  SELECT UNNEST(range(MIN(epoch_us(ts)) // {_HOUR_US},
                      (MAX(epoch_us(ts)) + 1) // {_HOUR_US} + 1)) AS hour
  FROM events
),
hs AS (
  SELECT spine.hour,
         COALESCE(in_max, 0) AS in_max,
         COALESCE(hd, 0) AS hd
  FROM spine LEFT JOIN h ON spine.hour = h.hour
)
SELECT CAST(hour AS BIGINT) AS hour,
       CAST(COALESCE(SUM(hd) OVER (ORDER BY hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + GREATEST(0, in_max) AS BIGINT) AS max_active
FROM hs ORDER BY hour
"""


# --------------------------------------------------------------------------
# Interval-overlap join WITHOUT an equi key (rj1 has one — the user).
# "How many sessions, across ALL users, were active at the instant of
# each purchase?"  The naive form is a cross join with a range
# residual — quadratic.  The scale form BUCKETIZES time: each session
# explodes to the hours it covers (sessions are gap-bounded, so the
# per-session hour fan-out is small and bounded), each purchase maps
# to its one hour, and the join becomes an equi join ON HOUR with the
# exact [s, e] containment as a residual predicate.  Each (purchase,
# session) overlap pair appears exactly once — the purchase instant
# lies in one hour — so no post-join dedup is needed.  Skewed hours
# (everyone online at once) shard further with the x16 salting tools.
# --------------------------------------------------------------------------


def interval_overlap_counts(ev: DataFrame) -> DataFrame:
    """(purchase_id, n_active) from an events frame — see block
    comment."""
    sess = _session_intervals(ev)
    sess_h = sess.select(
        "s",
        "e",
        F.explode(
            F.sequence(
                F.expr(f"s div {_HOUR_US}"), F.expr(f"e div {_HOUR_US}")
            )
        ).alias("hour"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.unix_micros(F.col("ts")).alias("t"),
        F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("hour"),
    )
    return (
        purchases.join(
            sess_h,
            (purchases.hour == sess_h.hour)
            & (F.col("s") <= F.col("t"))
            & (F.col("t") <= F.col("e")),
        )
        .groupBy("purchase_id")
        .agg(F.count("*").alias("n_active"))
    )


def rj2_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return interval_overlap_counts(load_table(spark, sf_dir, "events"))


RJ2_SQL = f"""
WITH sess AS ({_SESS_SQL})
SELECT p.event_id AS purchase_id, COUNT(*) AS n_active
FROM events p JOIN sess s
  ON s.s <= epoch_us(p.ts) AND epoch_us(p.ts) <= s.e
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
"""


# --------------------------------------------------------------------------
# Bag-semantics set algebra (st2): INTERSECT ALL / EXCEPT ALL with
# multiplicities — the reconciliation shape (ledger diffs, replayed
# event streams) where DISTINCT semantics (st1) silently erases how
# MANY occurrences differ.  Spark's exceptAll/intersectAll plan as a
# count-and-replicate aggregate (no row-by-row matching); output is
# re-aggregated to (side, user_id, event_type, n) so the result is
# order-free and hash-stable.
# --------------------------------------------------------------------------


def st2_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even-half vs odd-half (by event_id) multiset reconciliation of
    (user_id, event_type) occurrences: 'surplus' = even EXCEPT ALL odd,
    'common' = even INTERSECT ALL odd, with multiplicities."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_id") % 2 == 0).select("user_id", "event_type")
    b = ev.where(F.col("event_id") % 2 == 1).select("user_id", "event_type")

    def agg(df: DataFrame, side: str) -> DataFrame:
        return df.groupBy("user_id", "event_type").agg(
            F.count("*").alias("n")
        ).select(F.lit(side).alias("side"), "user_id", "event_type", "n")

    return agg(a.exceptAll(b), "surplus").unionAll(
        agg(a.intersectAll(b), "common")
    )


ST2_SQL = """
WITH a AS (SELECT user_id, event_type FROM events WHERE event_id % 2 = 0),
b AS (SELECT user_id, event_type FROM events WHERE event_id % 2 = 1),
surplus AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b),
common AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
SELECT 'surplus' AS side, user_id, event_type, COUNT(*) AS n
FROM surplus GROUP BY user_id, event_type
UNION ALL
SELECT 'common' AS side, user_id, event_type, COUNT(*) AS n
FROM common GROUP BY user_id, event_type
"""


# --------------------------------------------------------------------------
# Session splice (w9): split every session at hour boundaries and
# report each piece's exact duration — the interval-SPLITTING
# complement of w7's sweep line, the shape billing/occupancy systems
# need ("attribute each session's time to the hour it was spent in").
# Half-open [s, e+1) micros: pieces are pure integer arithmetic, the
# per-session hour fan-out is gap-bounded (same explode as rj2), and
# piece durations conserve exactly: sum(piece_us) = e + 1 - s.
# --------------------------------------------------------------------------


def session_splice(ev: DataFrame) -> DataFrame:
    """(user_id, sess_id, hour, piece_us): one row per (session, hour
    covered), integer micros of the session spent in that hour."""
    sess = _session_intervals(ev)
    h = F.col("hour")
    lo = F.greatest(F.col("s"), h * _HOUR_US)
    hi = F.least(F.col("e") + 1, (h + 1) * _HOUR_US)
    return sess.select(
        "user_id",
        "sess_id",
        F.explode(
            F.sequence(
                F.expr(f"s div {_HOUR_US}"), F.expr(f"e div {_HOUR_US}")
            )
        ).alias("hour"),
        "s",
        "e",
    ).select(
        "user_id",
        "sess_id",
        "hour",
        (hi - lo).cast("long").alias("piece_us"),
    )


def w9_session_splice(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_splice(load_table(spark, sf_dir, "events"))


W9_SQL = f"""
WITH sess AS ({_SESS_SQL}),
pieces AS (
  SELECT user_id, sess_id, s, e,
         unnest(range(s // {_HOUR_US}, e // {_HOUR_US} + 1)) AS hour
  FROM sess
)
SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
       CAST(hour AS BIGINT) AS hour,
       CAST(LEAST(e + 1, (hour + 1) * {_HOUR_US})
            - GREATEST(s, hour * {_HOUR_US}) AS BIGINT) AS piece_us
FROM pieces
"""


# --------------------------------------------------------------------------
# Distribution drift (PSI): the data-quality monitor a long-running
# ingest needs — has the VALUE distribution of each event type shifted
# between a reference slice and a current slice?  Population Stability
# Index over 10 fixed value buckets with add-one smoothing:
#   PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)
# Each bucket's contribution is e6-quantized BEFORE the sum (the x52
# per-term-quantization precedent), so the only floats are one ln and
# two divisions per (type, bucket) — identical one-ulp-stable ops on
# both engines — and the final PSI is an exact integer sum.  The
# bucket spine is generated (types × 0..9) so empty buckets still
# contribute their smoothed mass.  Halves split on event_id parity
# (the deterministic stand-in for yesterday/today partitions).
# --------------------------------------------------------------------------

PSI_BUCKETS = 10
PSI_BUCKET_E2 = 5000  # 50.00 value units per bucket; values top out ~500


def d5_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v_e2 = F.floor(F.col("value") * 100 + F.lit(0.5000001)).cast("long")
    base = ev.select(
        "event_type",
        (F.col("event_id") % 2).alias("half"),
        F.least(
            F.lit(PSI_BUCKETS - 1), F.expr(f"CAST(floor((value * 100 + 0.5000001)) AS BIGINT) div {PSI_BUCKET_E2}")
        ).alias("bucket"),
    )
    counts = base.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_cur"),
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(PSI_BUCKETS).select(F.col("id").alias("bucket"))
        )
    )
    full = spine.join(counts, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    tw = Window.partitionBy("event_type")
    p = (F.col("n_ref") + 1).cast("double") / (
        F.sum("n_ref").over(tw) + PSI_BUCKETS
    ).cast("double")
    q = (F.col("n_cur") + 1).cast("double") / (
        F.sum("n_cur").over(tw) + PSI_BUCKETS
    ).cast("double")
    contrib_e6 = F.floor((p - q) * F.log(p / q) * 1e6 + F.lit(0.5000001)).cast(
        "long"
    )
    return (
        full.withColumn("c", contrib_e6)
        .groupBy("event_type")
        .agg(
            F.sum("c").alias("psi_e6"),
            F.sum("n_ref").alias("n_ref"),
            F.sum("n_cur").alias("n_cur"),
        )
    )


D5_SQL = f"""
WITH base AS (
  SELECT event_type, event_id % 2 AS half,
         LEAST({PSI_BUCKETS - 1},
               CAST(FLOOR(value * 100 + 0.5000001) AS BIGINT) // {PSI_BUCKET_E2})
           AS bucket
  FROM events
),
counts AS (
  SELECT event_type, bucket,
         SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n_ref,
         SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n_cur
  FROM base GROUP BY event_type, bucket
),
spine AS (
  SELECT t.event_type, b.bucket
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(range(0, {PSI_BUCKETS})) AS bucket) b
),
filled AS (
  SELECT s.event_type, s.bucket,
         COALESCE(c.n_ref, 0) AS n_ref, COALESCE(c.n_cur, 0) AS n_cur
  FROM spine s LEFT JOIN counts c
    ON c.event_type = s.event_type AND c.bucket = s.bucket
),
pq AS (
  SELECT event_type, n_ref, n_cur,
         CAST(n_ref + 1 AS DOUBLE)
           / (SUM(n_ref) OVER (PARTITION BY event_type) + {PSI_BUCKETS}) AS p,
         CAST(n_cur + 1 AS DOUBLE)
           / (SUM(n_cur) OVER (PARTITION BY event_type) + {PSI_BUCKETS}) AS q
  FROM filled
)
SELECT event_type,
       CAST(SUM(CAST(FLOOR((p - q) * ln(p / q) * 1e6 + 0.5000001) AS BIGINT))
            AS BIGINT) AS psi_e6,
       CAST(SUM(n_ref) AS BIGINT) AS n_ref,
       CAST(SUM(n_cur) AS BIGINT) AS n_cur
FROM pq GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift (d6) — PSI's (d5) nonparametric
# sibling: per event type, the KS statistic sup_v |F_ref(v) − F_cur(v)|
# between the value distributions of the two event_id-parity halves.
# PSI needs a bucket grid and smoothing; KS is binning-free and
# catches shape shifts PSI's 10 coarse buckets can blur.
#
# EXACT-INTEGER statistic: both ECDFs are evaluated on the e2-quantized
# value grid, and the sup is taken over |cum_ref·n_cur − cum_cur·n_ref|
# (cross-multiplied — no float division until the final e6 quantize),
# so both engines compare bit-identical integers.  Scale shape: one
# (type, value)-keyed count with map-side partial aggregation first —
# the running-sum windows then operate on the DISTINCT-VALUE GRID
# (bounded: values live on the e2 grid, ≤ ~50k rows per type), never
# on raw events — the d5/w10 histogram-first discipline.
# --------------------------------------------------------------------------


def ks_grid_counts(ev: DataFrame) -> DataFrame:
    """(event_type, v_e2, c_ref, c_cur): the e2-grid half counts — the
    ADDITIVE state KS needs, shared with the streaming twin (z17),
    whose complete-mode state is exactly this bounded grid."""
    base = ev.select(
        "event_type",
        (F.col("event_id") % 2).alias("half"),
        F.floor(F.col("value") * 100 + F.lit(0.5000001))
        .cast("long")
        .alias("v_e2"),
    )
    return base.groupBy("event_type", "v_e2").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c_cur"),
    )


def ks_from_counts(counts: DataFrame) -> DataFrame:
    """The KS finish over the bounded grid relation — batch post-pass
    for both d6 (batch counts) and z17 (drained streaming counts)."""
    tw = Window.partitionBy("event_type")
    cw = (
        Window.partitionBy("event_type")
        .orderBy("v_e2")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gaps = counts.select(
        "event_type",
        F.sum("c_ref").over(tw).alias("n_ref"),
        F.sum("c_cur").over(tw).alias("n_cur"),
        (
            F.abs(
                F.sum("c_ref").over(cw) * F.sum("c_cur").over(tw)
                - F.sum("c_cur").over(cw) * F.sum("c_ref").over(tw)
            )
        ).alias("gap_num"),
    )
    return gaps.groupBy("event_type").agg(
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        # KS is UNDEFINED when either sample is empty — emit NULL,
        # never a NaN-cast 0 (Spark CAST(0.0/0 AS LONG) = 0 would
        # silently report "no drift" for a one-sided type AND
        # hash-mismatch DuckDB's NULL)
        F.when(
            (F.max("n_ref") > 0) & (F.max("n_cur") > 0),
            F.floor(
                F.max("gap_num").cast("double")
                / (F.max("n_ref") * F.max("n_cur"))
                * 1e6
                + F.lit(0.5000001)
            ).cast("long"),
        ).alias("ks_e6"),
    )


def ks_drift(ev: DataFrame) -> DataFrame:
    """(event_type, n_ref, n_cur, ks_e6) over ``ev(event_id,
    event_type, value)`` — see the block comment above."""
    return ks_from_counts(ks_grid_counts(ev))


def d6_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ks_drift(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Conversion-lag percentiles (e11) — the latency summary behind e9's
# attribution: for every purchase with an attributed click (backward
# as-of within the window), the click→purchase lag in whole seconds,
# summarized as EXACT p50/p90/p99 by histogram-CDF nearest rank.
# No row sort anywhere: the as-of join is the e9 machinery (one key
# shuffle + per-key sort), the percentile pass aggregates to the
# integer lag GRID first (≤ ATTRIBUTION_WINDOW_S distinct values —
# bounded by the tolerance, not the data), and the running-sum window
# runs over that bounded grid (the w10/x96 discipline).
# --------------------------------------------------------------------------


def conversion_lag_percentiles(ev: DataFrame) -> DataFrame:
    """One row: (n_conv, p50_s, p90_s, p99_s)."""
    from ..operators.asof import asof_join

    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    matched = asof_join(
        purchases,
        clicks,
        left_on="user_id",
        right_on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["click_ts"],
        how="inner",
        tolerance_s=ATTRIBUTION_WINDOW_S,
    )
    lags = matched.select(
        (
            (F.unix_micros("ts") - F.unix_micros("r_click_ts"))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("lag_s")
    )
    hist = lags.groupBy("lag_s").agg(F.count("*").alias("c"))
    cw = Window.orderBy("lag_s").rowsBetween(Window.unboundedPreceding, 0)
    tw = Window.partitionBy()
    cdf = hist.select(
        "lag_s",
        F.sum("c").over(cw).alias("cum"),
        F.sum("c").over(tw).alias("n"),
    )
    # nearest rank: smallest lag with cum >= ceil(q·n/100)
    def pick(q: int):
        rank = F.expr(f"CAST(({q} * n + 99) div 100 AS BIGINT)")
        return F.min(
            F.when(F.col("cum") >= rank, F.col("lag_s"))
        ).cast("long")

    return cdf.agg(
        F.max("n").cast("long").alias("n_conv"),
        pick(50).alias("p50_s"),
        pick(90).alias("p90_s"),
        pick(99).alias("p99_s"),
    )


def e11_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conversion_lag_percentiles(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Hour-of-week seasonality profile (w12) — the diurnal/weekly shape of
# each event type: counts per hour-of-week slot plus each slot's share
# of the type's total and the type's peak slot.  The ingest-health
# check behind "is this crawl source day-batched or continuous", and
# the denominator a seasonal anomaly rule needs before calling a
# quiet Sunday an outage.
#
# The slot is PURE EPOCH ARITHMETIC — (epoch_hours + anchor) % 168,
# week anchored at Monday 00:00 UTC — so both engines compute the
# identical integer without touching locale-dependent dayofweek
# conventions (Spark counts Sunday=1, DuckDB Sunday=0: a classic
# cross-engine trap).  Scale shape: ONE (type, slot) count with
# map-side combine (grid ≤ types × 168), a type-total window over the
# bounded grid, and an argmin-as-MIN-struct peak — no row ever passes
# a window.
# --------------------------------------------------------------------------

# 1970-01-01 00:00 is a Thursday, so Monday 00:00 sits 96 h into the
# epoch week; adding 168-96 = 72 re-anchors slot 0 to Monday 00:00 UTC
_HOW_ANCHOR_H = 72


def hourweek_grid(ev: DataFrame) -> DataFrame:
    """(event_type, how, n): the additive hour-of-week grid — shared
    with the streaming twin (z19), whose complete-mode state is
    exactly this ≤ types×168 relation."""
    # FLOOR division (not double-divide-then-truncate): DuckDB's `//`
    # floors, and trunc != floor for negative micros — pre-1970
    # timestamps would diverge between the engines otherwise.
    slots = ev.select(
        "event_type",
        (
            F.floor(
                F.unix_micros("ts") / F.lit(3_600_000_000)
            ).cast("long")
            + _HOW_ANCHOR_H
        ).alias("h"),
    ).select("event_type", (F.col("h") % 168).alias("how"))
    return slots.groupBy("event_type", "how").agg(F.count("*").alias("n"))


def hourweek_from_grid(grid: DataFrame) -> DataFrame:
    """The share/peak finish over the bounded grid — batch post-pass
    for both w12 (batch grid) and z19 (drained streaming grid)."""
    tw = Window.partitionBy("event_type")
    return (
        grid.withColumn("total", F.sum("n").over(tw))
        .withColumn(
            "peak",
            F.min(
                F.struct((-F.col("n")).alias("negn"), F.col("how").alias("hw"))
            ).over(tw),
        )
        .select(
            "event_type",
            "how",
            "n",
            F.floor(
                F.col("n").cast("double") / F.col("total") * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("share_e6"),
            F.col("peak.hw").cast("long").alias("peak_how"),
        )
    )


def hourweek_profile(ev: DataFrame) -> DataFrame:
    """(event_type, how, n, share_e6, peak_how) — how ∈ [0, 168),
    0 = Monday 00:00 UTC."""
    return hourweek_from_grid(hourweek_grid(ev))


def w12_hourweek_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourweek_profile(load_table(spark, sf_dir, "events"))


W12_SQL = f"""
WITH slots AS (
  SELECT event_type,
         ((epoch_us(ts) // 3600000000) + {_HOW_ANCHOR_H}) % 168 AS how
  FROM events
),
grid AS (
  SELECT event_type, how, COUNT(*) AS n FROM slots GROUP BY event_type, how
),
tot AS (
  SELECT event_type, how, n,
         SUM(n) OVER (PARTITION BY event_type) AS total
  FROM grid
),
peak AS (
  SELECT event_type, how AS peak_how FROM (
    SELECT event_type, how,
           ROW_NUMBER() OVER (
             PARTITION BY event_type ORDER BY n DESC, how ASC) AS rn
    FROM grid
  ) WHERE rn = 1
)
SELECT t.event_type, CAST(t.how AS BIGINT) AS how, CAST(t.n AS BIGINT) AS n,
       CAST(FLOOR(CAST(t.n AS DOUBLE) / t.total * 1e6 + 0.5000001)
            AS BIGINT) AS share_e6,
       CAST(p.peak_how AS BIGINT) AS peak_how
FROM tot t JOIN peak p ON p.event_type = t.event_type
"""


E11_SQL = f"""
WITH lags AS (
  SELECT CAST((epoch_us(p.ts) - (
           SELECT epoch_us(c.ts) FROM events c
           WHERE c.event_type = 'click' AND c.user_id = p.user_id
             AND epoch_us(c.ts) <= epoch_us(p.ts)
             AND epoch_us(p.ts) - epoch_us(c.ts)
                 <= {ATTRIBUTION_WINDOW_S} * 1000000
           ORDER BY c.ts DESC LIMIT 1
         )) // 1000000 AS BIGINT) AS lag_s
  FROM events p WHERE p.event_type = 'purchase'
),
hist AS (
  SELECT lag_s, COUNT(*) AS c FROM lags WHERE lag_s IS NOT NULL
  GROUP BY lag_s
),
cdf AS (
  SELECT lag_s,
         SUM(c) OVER (ORDER BY lag_s ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER () AS n
  FROM hist
)
SELECT CAST(MAX(n) AS BIGINT) AS n_conv,
       CAST(MIN(CASE WHEN cum >= (50 * n + 99) // 100 THEN lag_s END)
            AS BIGINT) AS p50_s,
       CAST(MIN(CASE WHEN cum >= (90 * n + 99) // 100 THEN lag_s END)
            AS BIGINT) AS p90_s,
       CAST(MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN lag_s END)
            AS BIGINT) AS p99_s
FROM cdf
"""


D6_SQL = """
WITH base AS (
  SELECT event_type, event_id % 2 AS half,
         CAST(FLOOR(value * 100 + 0.5000001) AS BIGINT) AS v_e2
  FROM events
),
counts AS (
  SELECT event_type, v_e2,
         SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c_ref,
         SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c_cur
  FROM base GROUP BY event_type, v_e2
),
gaps AS (
  SELECT event_type,
         SUM(c_ref) OVER (PARTITION BY event_type) AS n_ref,
         SUM(c_cur) OVER (PARTITION BY event_type) AS n_cur,
         ABS(SUM(c_ref) OVER (PARTITION BY event_type ORDER BY v_e2
                              ROWS UNBOUNDED PRECEDING)
             * SUM(c_cur) OVER (PARTITION BY event_type)
             - SUM(c_cur) OVER (PARTITION BY event_type ORDER BY v_e2
                                ROWS UNBOUNDED PRECEDING)
             * SUM(c_ref) OVER (PARTITION BY event_type)) AS gap_num
  FROM counts
)
SELECT event_type,
       CAST(MAX(n_ref) AS BIGINT) AS n_ref,
       CAST(MAX(n_cur) AS BIGINT) AS n_cur,
       CASE WHEN MAX(n_ref) = 0 OR MAX(n_cur) = 0 THEN NULL
            ELSE CAST(FLOOR(CAST(MAX(gap_num) AS DOUBLE)
                            / (MAX(n_ref) * MAX(n_cur)) * 1e6 + 0.5000001)
                      AS BIGINT)
       END AS ks_e6
FROM gaps GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Inter-event gap histogram: the arrival-process shape per event type,
# as power-of-two buckets of the per-user gap in seconds.  The bucket
# is the integer MSB position — length(bin(gap)) - 1 == floor(log2) —
# so the log-scale histogram involves NO floating log (whose ulp at
# exact powers of two could flip a bucket cross-engine).  One
# user-keyed lag window (shards with the key) + one bounded aggregate
# (<= types x 64 buckets).
# --------------------------------------------------------------------------


def w8_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("gap_us", us - F.lag(us).over(w))
        # integer division: gaps are non-negative (ordered by ts), so
        # truncation == floor on both engines; no float quotient
        .withColumn("gap_s", F.expr("gap_us div 1000000"))
        .where(F.col("gap_s").isNotNull())
    )
    bucket = F.when(F.col("gap_s") <= 0, F.lit(-1)).otherwise(
        F.length(F.expr("bin(gap_s)")) - 1
    )
    return (
        gaps.select("event_type", bucket.cast("long").alias("log2_bucket"))
        .groupBy("event_type", "log2_bucket")
        .agg(F.count("*").alias("n_gaps"))
    )


W8_SQL = """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id))
           // 1000000 AS gap_s
  FROM events
)
SELECT event_type,
       CAST(CASE WHEN gap_s <= 0 THEN -1
                 ELSE length(bin(gap_s))
                      - length(regexp_extract(bin(gap_s), '^0*', 0)) - 1
            END AS BIGINT) AS log2_bucket,
       COUNT(*) AS n_gaps
FROM g WHERE gap_s IS NOT NULL
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Right-to-be-forgotten deletion with audit: remove every event of a
# deletion-request user set and account for exactly what was removed.
# The deletion list is always tiny relative to the fact table, so it
# rides a BROADCAST — the fact table never shuffles; before/after/
# deleted counts come from ONE pass (flag + conditional sum), not a
# separate pre-count job.  The derived request list (signup users with
# user_id % 7 == 0) stands in for the compliance queue feed.
# --------------------------------------------------------------------------


def d4_forget_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    forget = (
        ev.where(
            (F.col("event_type") == "signup") & (F.col("user_id") % 7 == 0)
        )
        .select("user_id")
        .distinct()
        .withColumn("_del", F.lit(1))
    )
    flagged = ev.join(F.broadcast(forget), "user_id", "left")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("*").alias("n_before"),
            F.sum(F.coalesce(F.col("_del"), F.lit(0)))
            .cast("long")
            .alias("n_deleted"),
        )
        .select(
            "event_type",
            "n_before",
            "n_deleted",
            (F.col("n_before") - F.col("n_deleted")).alias("n_after"),
        )
    )


D4_SQL = """
WITH forget AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'signup' AND user_id % 7 = 0
)
SELECT event_type, COUNT(*) AS n_before,
       CAST(SUM(CASE WHEN user_id IN (SELECT user_id FROM forget)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
       COUNT(*) - CAST(SUM(CASE WHEN user_id IN (SELECT user_id FROM forget)
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_after
FROM events GROUP BY event_type
"""



# --------------------------------------------------------------------------
# Robust per-type anomaly detection via MAD (w10): flag events whose
# value deviates from the TYPE MEDIAN by more than 3 sigma-equivalents
# of the median absolute deviation (3 * 1.4826 = 4.4478) — the robust
# twin of e8's mean/stddev rule, immune to the outliers it hunts.
# Exact medians WITHOUT a per-type row sort: values live on a cent
# grid, so each pass collapses to a (type, cents) HISTOGRAM first and
# takes the lower-median by nearest rank over the CDF — window
# partitions hold distinct grid values (range-bounded), never rows —
# the x96 envelope, run twice (values, then absolute deviations).
# All arithmetic is integer cents; the only float op is the one
# threshold product, identical in both engines.
# --------------------------------------------------------------------------

MAD_K = 4.4478  # 3 * 1.4826 (normal-consistency constant)


def _grid_lower_median(grid: DataFrame, col: str) -> DataFrame:
    """(event_type, med) lower median of integer ``col`` via histogram
    CDF nearest-rank: min grid value whose cumulative count reaches
    rank (n+1) div 2."""
    hist = grid.groupBy("event_type", col).agg(F.count("*").alias("cnt"))
    n = hist.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    cdf = hist.withColumn(
        "cum",
        F.sum("cnt").over(Window.partitionBy("event_type").orderBy(col)),
    )
    return (
        cdf.join(F.broadcast(n), "event_type")
        .where(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min(col).alias("med"))
    )


def w10_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5000001))
        .cast("long")
        .alias("v_c"),
    )
    med = _grid_lower_median(base, "v_c").withColumnRenamed("med", "med_c")
    dev = base.join(F.broadcast(med), "event_type").withColumn(
        "dev_c", F.abs(F.col("v_c") - F.col("med_c"))
    )
    mad = _grid_lower_median(
        dev.select("event_type", "dev_c"), "dev_c"
    ).withColumnRenamed("med", "mad_c")
    thr = F.floor(F.col("mad_c") * MAD_K + F.lit(0.5000001)).cast("long")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("dev_c") > thr)
        .select("event_id", "event_type", "v_c", "dev_c", "med_c", "mad_c")
    )


W10_SQL = f"""
WITH base AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 100 + 0.5000001) AS BIGINT) AS v_c
  FROM events
),
h1 AS (SELECT event_type, v_c, COUNT(*) AS cnt FROM base GROUP BY 1, 2),
n1 AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n FROM h1 GROUP BY 1),
c1 AS (
  SELECT event_type, v_c,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY v_c) AS cum
  FROM h1
),
med AS (
  SELECT c1.event_type, MIN(v_c) AS med_c
  FROM c1 JOIN n1 USING (event_type)
  WHERE cum >= (n + 1) // 2 GROUP BY 1
),
dev AS (
  SELECT b.event_id, b.event_type, b.v_c, m.med_c,
         ABS(b.v_c - m.med_c) AS dev_c
  FROM base b JOIN med m USING (event_type)
),
h2 AS (SELECT event_type, dev_c, COUNT(*) AS cnt FROM dev GROUP BY 1, 2),
n2 AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n FROM h2 GROUP BY 1),
c2 AS (
  SELECT event_type, dev_c,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev_c) AS cum
  FROM h2
),
mad AS (
  SELECT c2.event_type, MIN(dev_c) AS mad_c
  FROM c2 JOIN n2 USING (event_type)
  WHERE cum >= (n + 1) // 2 GROUP BY 1
)
SELECT d.event_id, d.event_type, d.v_c, d.dev_c, d.med_c, ma.mad_c
FROM dev d JOIN mad ma USING (event_type)
WHERE d.dev_c > CAST(FLOOR(ma.mad_c * {MAD_K} + 0.5000001) AS BIGINT)"""


# --------------------------------------------------------------------------
# CUSUM change-point detection (w11): per event type, the hour where
# the cumulative event-count deviation from a flat rate peaks — the
# classic level-shift detector over an ingest/telemetry series.  The
# statistic is exact-integer: with n hours and tot events, the scaled
# deviation at hour k is |n*prefix_k - k*tot| (= n*tot * |S_k| for the
# usual normalized CUSUM S_k), so both engines compare identical
# BIGINTs and divide once at the end.  Scale shape: the raw event
# relation collapses to a (type, hour) histogram FIRST (map-side
# combinable); the windows run over that time-bounded grid (hundreds
# of rows per type), never over events; ties elect the earliest hour.
# --------------------------------------------------------------------------


def w11_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cusum_changepoint(load_table(spark, sf_dir, "events"))


def cusum_changepoint(ev: DataFrame) -> DataFrame:
    hourly = (
        ev.select(
            "event_type",
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias(
                "hour_epoch"
            ),
        )
        .groupBy("event_type", "hour_epoch")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy("hour_epoch")
    pre = hourly.select(
        "event_type",
        "hour_epoch",
        F.row_number().over(w).cast("long").alias("k"),
        F.sum("cnt").over(w).alias("prefix"),
    )
    tots = hourly.groupBy("event_type").agg(
        F.count("*").alias("n_hours"), F.sum("cnt").alias("total_events")
    )
    dev = pre.join(F.broadcast(tots), "event_type").withColumn(
        "absdev",
        F.abs(
            F.col("n_hours") * F.col("prefix")
            - F.col("k") * F.col("total_events")
        ),
    )
    mx = dev.groupBy("event_type").agg(F.max("absdev").alias("max_absdev"))
    peak = (
        dev.join(F.broadcast(mx), "event_type")
        .where(F.col("absdev") == F.col("max_absdev"))
        .groupBy("event_type")
        .agg(F.min("hour_epoch").alias("peak_hour_epoch"))
    )
    return (
        tots.join(mx, "event_type")
        .join(peak, "event_type")
        .select(
            "event_type",
            "n_hours",
            "total_events",
            "peak_hour_epoch",
            "max_absdev",
            F.floor(
                F.col("max_absdev").cast("double")
                / (F.col("n_hours") * F.col("total_events"))
                * 1e6
                + F.lit(0.5000001)
            )
            .cast("long")
            .alias("cusum_e6"),
        )
    )


W11_SQL = """
WITH hourly AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
pre AS (
  SELECT event_type, hour_epoch,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY hour_epoch) AS BIGINT) AS k,
         SUM(cnt) OVER (PARTITION BY event_type
                        ORDER BY hour_epoch) AS prefix
  FROM hourly
),
tots AS (
  SELECT event_type, COUNT(*) AS n_hours,
         CAST(SUM(cnt) AS BIGINT) AS total_events
  FROM hourly GROUP BY 1
),
dev AS (
  SELECT p.event_type, p.hour_epoch,
         ABS(t.n_hours * p.prefix - p.k * t.total_events) AS absdev
  FROM pre p JOIN tots t USING (event_type)
),
mx AS (
  SELECT event_type, CAST(MAX(absdev) AS BIGINT) AS max_absdev
  FROM dev GROUP BY 1
),
peak AS (
  SELECT d.event_type, MIN(d.hour_epoch) AS peak_hour_epoch
  FROM dev d JOIN mx USING (event_type)
  WHERE d.absdev = mx.max_absdev GROUP BY 1
)
SELECT t.event_type, t.n_hours, t.total_events, p.peak_hour_epoch,
       m.max_absdev,
       CAST(FLOOR(CAST(m.max_absdev AS DOUBLE)
                  / (t.n_hours * t.total_events) * 1e6 + 0.5000001)
            AS BIGINT) AS cusum_e6
FROM tots t JOIN mx m USING (event_type) JOIN peak p USING (event_type)"""


RELATIONAL_QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q4_order_priority": q4_order_priority,
    "q5_region_revenue": q5_region_revenue,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_profit": q9_profit,
    "q10_returned_items": q10_returned_items,
    "q12_priority_lines": q12_priority_lines,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity": q17_small_quantity,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive": q19_disjunctive,
    "q22_sales_opportunity": q22_sales_opportunity,
    "j1_json_extract": j1_json_extract,
    "s1_value_stats": s1_value_stats,
    "s2_grouped_quantiles": s2_grouped_quantiles,
    "w1_window_top3": w1_window_top3,
    "w2_rolling_mean": w2_rolling_mean,
    "e1_sessions": e1_sessions,
    "e2_hourly_rollup": e2_hourly_rollup,
    "e3_pivot_activity": e3_pivot_activity,
    "e4_session_windows": e4_session_windows,
    "e5_unpivot_activity": e5_unpivot_activity,
    "e6_funnel_steps": e6_funnel_steps,
    "e7_retention_cohorts": e7_retention_cohorts,
    "w4_ewma": w4_ewma,
    "e8_purchase_outliers": e8_purchase_outliers,
    "e9_attribution": e9_attribution,
    "w5_running_actives": w5_running_actives,
    "d3_merge_upsert": d3_merge_upsert,
    "d4_forget_users": d4_forget_users,
    "w8_gap_histogram": w8_gap_histogram,
    "d5_drift_psi": d5_drift_psi,
    "d6_ks_drift": d6_ks_drift,
    "e11_conversion_lag": e11_conversion_lag,
    "w12_hourweek_profile": w12_hourweek_profile,
    "w7_concurrency": w7_concurrency,
    "w9_session_splice": w9_session_splice,
    "w10_mad_outliers": w10_mad_outliers,
    "w11_cusum_changepoint": w11_cusum_changepoint,
    "rj2_interval_overlap": rj2_interval_overlap,
    "w6_hourly_ohlc": w6_hourly_ohlc,
    "e10_debounce": e10_debounce,
    "w3_time_weighted": w3_time_weighted,
    "g1_rollup": g1_rollup,
    "g2_cube": g2_cube,
    "sj1_semi_join": sj1_customers_with_orders,
    "sj2_anti_join": sj2_customers_without_events,
    "rj1_range_join": rj1_pre_purchase_activity,
    "st1_set_ops": st1_set_ops,
    "st2_bag_ops": st2_bag_ops,
    "d1_snapshot_diff": d1_snapshot_diff,
    "d2_scd2_versions": d2_scd2_versions,
}

RELATIONAL_ORACLE = {
    "q1_pricing_summary": Q1_SQL,
    "q3_top_orders": Q3_SQL,
    "q4_order_priority": Q4_SQL,
    "q5_region_revenue": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_profit": Q9_SQL,
    "q10_returned_items": Q10_SQL,
    "q12_priority_lines": Q12_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity": Q17_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_disjunctive": Q19_SQL,
    "q22_sales_opportunity": Q22_SQL,
    "j1_json_extract": J1_SQL,
    "s1_value_stats": S1_STATS_SQL,
    "s2_grouped_quantiles": S2_SQL,
    "w1_window_top3": W1_SQL,
    "w2_rolling_mean": W2_SQL,
    "e1_sessions": E1_SQL,
    "e2_hourly_rollup": E2_SQL,
    "e3_pivot_activity": E3_SQL,
    "e4_session_windows": E4_SQL,
    "e5_unpivot_activity": E5_SQL,
    "e6_funnel_steps": E6_SQL,
    "e7_retention_cohorts": E7_SQL,
    "w4_ewma": W4_SQL,
    "e8_purchase_outliers": E8_SQL,
    "e9_attribution": E9_SQL,
    "w5_running_actives": W5_SQL,
    "d3_merge_upsert": D3_SQL,
    "d4_forget_users": D4_SQL,
    "w8_gap_histogram": W8_SQL,
    "d5_drift_psi": D5_SQL,
    "d6_ks_drift": D6_SQL,
    "e11_conversion_lag": E11_SQL,
    "w12_hourweek_profile": W12_SQL,
    "w7_concurrency": W7_SQL,
    "w9_session_splice": W9_SQL,
    "w10_mad_outliers": W10_SQL,
    "w11_cusum_changepoint": W11_SQL,
    "st2_bag_ops": ST2_SQL,
    "rj2_interval_overlap": RJ2_SQL,
    "w6_hourly_ohlc": W6_SQL,
    "e10_debounce": E10_SQL,
    "w3_time_weighted": W3_SQL,
    "g1_rollup": G1_SQL,
    "g2_cube": G2_SQL,
    "sj1_semi_join": SJ1_SQL,
    "sj2_anti_join": SJ2_SQL,
    "rj1_range_join": RJ1_SQL,
    "st1_set_ops": ST1_SQL,
    "d1_snapshot_diff": D1_SQL,
    "d2_scd2_versions": D2_SQL,
}
