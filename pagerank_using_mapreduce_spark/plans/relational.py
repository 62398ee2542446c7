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
       SUM({_sq("l_quantity", 2)}) AS sum_qty_e2,
       SUM({_sq("l_extendedprice", 2)}) AS sum_base_e2,
       SUM({_sq("l_extendedprice * (1 - l_discount)", 4)}) AS sum_disc_e4,
       SUM({_sq("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)}) AS sum_charge_e6,
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
       SUM({_sq("l_extendedprice * (1 - l_discount)", 4)}) AS revenue_e4
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
       SUM({_sq("l_extendedprice * (1 - l_discount)", 4)}) AS revenue_e4,
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
       SUM(new_sess) + 1 AS n_sessions,
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
       SUM({_sq("value", 2)}) AS sum_value_e2
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


RELATIONAL_QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_region_revenue": q5_region_revenue,
    "w1_window_top3": w1_window_top3,
    "e1_sessions": e1_sessions,
    "e2_hourly_rollup": e2_hourly_rollup,
    "e3_pivot_activity": e3_pivot_activity,
}

RELATIONAL_ORACLE = {
    "q1_pricing_summary": Q1_SQL,
    "q3_top_orders": Q3_SQL,
    "q5_region_revenue": Q5_SQL,
    "w1_window_top3": W1_SQL,
    "e1_sessions": E1_SQL,
    "e2_hourly_rollup": E2_SQL,
    "e3_pivot_activity": E3_SQL,
}
