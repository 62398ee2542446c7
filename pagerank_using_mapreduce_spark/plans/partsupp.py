"""TPC-H partsupp-family query shapes (Q2/Q11/Q16/Q20/Q21) over a
DERIVED part-supplier relation.

The testdata schema ships no ``partsupp`` table (COVERAGE.md's one
remaining TPC-H gap), so these five shapes were blocked.  They are
unblocked here the same way TPC-H's own dbgen defines the relation —
as pure integer arithmetic over (part x supplier): every part gets
exactly ``PS_PER_PART`` supplier rows whose keys, stock quantities and
supply costs are deterministic functions of ``p_partkey`` and the
supplier count.  Spark and the DuckDB oracle evaluate the SAME integer
formulas, so the derived relation is bit-identical cross-engine and the
standard hash gate applies to all five queries.

Supplier-assignment formula: ``(p_partkey + i * (S div 4)) % S`` for
``i`` in 0..3.  For any S >= 4 the four offsets ``i*(S div 4)`` are
distinct and < S, so each part's four suppliers are distinct — no
degenerate duplicate (partkey, suppkey) pairs at any scale factor
(S is 10 / 100 / 1000 at sf0.001 / 0.01 / 0.1).

Monetary values stay integer end-to-end (``ps_supplycost_e2`` is
cents), so sums and min/max are order-independent — the same
cross-engine-determinism discipline as plans/relational.py.

Scale notes (100 TB discipline):
- The derived relation is never materialized: it is a projection +
  4-way explode over the ``part`` scan, pipelined into whatever join
  consumes it (partsupp = 4x|part| rows but only 4 slim columns).
- Selective part-side filters (q2's type/size, q16's brand/type/size,
  q20's name prefix) are applied BEFORE the explode so the fan-out
  never touches excluded parts, and the filter reaches the parquet
  scan as a pushed predicate.
- supplier/nation/region joins are broadcast (dimension-sized);
  the only big-to-big shuffles are the per-key aggregations
  (q20/q21 over lineitem), which get map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .relational import _q, _sq, _ssum

PS_PER_PART = 4

# Integer-arithmetic constants for the derived columns.  Arbitrary
# primes; the only requirements are determinism and value ranges
# (availqty 1..9999, supplycost_e2 100..99999 i.e. $1.00-$999.99).
_AVAIL_A, _AVAIL_B, _AVAIL_MOD = 31, 37, 9999
_COST_A, _COST_B, _COST_MOD, _COST_MIN = 97, 71, 99900, 100


def derived_partsupp(
    spark: SparkSession, sf_dir: str, part: DataFrame | None = None
) -> DataFrame:
    """The derived partsupp relation: 4 supplier rows per part.

    ``part`` may be a pre-filtered part DataFrame — filters applied
    before the explode never pay the 4x fan-out (and keep predicate
    pushdown on the parquet scan).  The supplier count crosses
    cluster -> driver as an action result (the S5 scalar-channel
    pattern, reference PageRankAlgorithm.java:77-78) and is folded
    into the column expressions as a literal.
    """
    if part is None:
        part = load_table(spark, sf_dir, "part")
    s_cnt = load_table(spark, sf_dir, "supplier").count()
    if s_cnt < PS_PER_PART:
        raise ValueError(f"need >= {PS_PER_PART} suppliers, got {s_cnt}")
    step = s_cnt // PS_PER_PART
    p = F.col("p_partkey")
    i = F.col("i")
    return part.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(PS_PER_PART - 1))).alias("i")
    ).select(
        "*",
        p.alias("ps_partkey"),
        ((p + i * F.lit(step)) % s_cnt).cast("long").alias("ps_suppkey"),
        ((p * _AVAIL_A + i * _AVAIL_B) % _AVAIL_MOD + 1)
        .cast("long")
        .alias("ps_availqty"),
        ((p * _COST_A + i * _COST_B) % _COST_MOD + _COST_MIN)
        .cast("long")
        .alias("ps_supplycost_e2"),
    )


def _partsupp_cte(filtered_part_sql: str = "SELECT * FROM part") -> str:
    """DuckDB CTE computing the identical relation (``i`` unnested
    0..3, supplier count as a scalar subquery — all BIGINT math)."""
    return f"""scnt AS (SELECT COUNT(*) AS s FROM supplier),
partsupp AS (
  SELECT p.*,
         p_partkey AS ps_partkey,
         (p_partkey + i * (s // {PS_PER_PART})) % s AS ps_suppkey,
         (p_partkey * {_AVAIL_A} + i * {_AVAIL_B}) % {_AVAIL_MOD} + 1 AS ps_availqty,
         (p_partkey * {_COST_A} + i * {_COST_B}) % {_COST_MOD} + {_COST_MIN} AS ps_supplycost_e2
  FROM ({filtered_part_sql}) p
  CROSS JOIN (SELECT UNNEST(range({PS_PER_PART})) AS i)
  CROSS JOIN scnt
)"""


# --------------------------------------------------------------------------
# Q2-style minimum-cost supplier: for each qualifying part, the
# supplier(s) in a region offering the MINIMUM supply cost — the
# correlated-min shape (aggregate per key, join back on equality with
# the aggregate).  Ties on the min keep every minimal supplier, same
# as TPC-H.
# --------------------------------------------------------------------------

Q2_REGION = "EUROPE"
Q2_TYPE = "LARGE"
Q2_SIZE_MAX = 15
Q2_TOPN = 100


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_SIZE_MAX)
    )
    # filter BEFORE the 4x explode; the filtered part side is tiny
    ps = derived_partsupp(spark, sf_dir, part=part)
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q2_REGION)
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nat.join(reg, nat.n_regionkey == reg.r_regionkey).select(
                    "n_nationkey", "n_name"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = ps.join(supp, ps.ps_suppkey == supp.s_suppkey).select(
        "ps_partkey", "p_name", "ps_supplycost_e2", "s_name", "s_acctbal", "n_name"
    )
    min_cost = costs.groupBy(F.col("ps_partkey").alias("m_partkey")).agg(
        F.min("ps_supplycost_e2").alias("min_cost_e2")
    )
    return (
        costs.join(
            min_cost,
            (costs.ps_partkey == F.col("m_partkey"))
            & (costs.ps_supplycost_e2 == F.col("min_cost_e2")),
        )
        .select(
            _q(F.col("s_acctbal"), 2).alias("acctbal_e2"),
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("partkey"),
            "p_name",
            F.col("ps_supplycost_e2").alias("cost_e2"),
        )
        # (s_name, partkey) is unique in the result -> total order, so
        # the LIMIT cut is deterministic cross-engine
        .orderBy(F.desc("acctbal_e2"), "s_name", "partkey")
        .limit(Q2_TOPN)
    )


Q2_SQL = f"""
WITH {_partsupp_cte(f"SELECT * FROM part WHERE p_type = '{Q2_TYPE}' AND p_size <= {Q2_SIZE_MAX}")},
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
),
costs AS (
  SELECT ps_partkey, p_name, ps_supplycost_e2, s_name, s_acctbal, n_name
  FROM partsupp JOIN eu ON ps_suppkey = s_suppkey
)
SELECT {_sq("s_acctbal", 2)} AS acctbal_e2, s_name, n_name,
       ps_partkey AS partkey, p_name, ps_supplycost_e2 AS cost_e2
FROM costs c
WHERE ps_supplycost_e2 = (SELECT MIN(ps_supplycost_e2) FROM costs c2
                          WHERE c2.ps_partkey = c.ps_partkey)
ORDER BY acctbal_e2 DESC, s_name, partkey
LIMIT {Q2_TOPN}
"""


# --------------------------------------------------------------------------
# Q11-style important stock: per-part inventory value held by one
# region's suppliers, kept only where it exceeds a FRACTION of the
# global total — aggregate filtered against a scalar aggregate of
# itself.  The fraction test is pure integer math
# (value * DEN > total), so the threshold cannot wobble cross-engine.
# --------------------------------------------------------------------------

Q11_REGION = "ASIA"
Q11_FRACTION_DEN = 2000  # keep parts worth > total/2000


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q11_REGION)
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat.join(reg, nat.n_regionkey == reg.r_regionkey)),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    vals = (
        ps.join(F.broadcast(supp.select("s_suppkey")), ps.ps_suppkey == F.col("s_suppkey"), "left_semi")
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_e2") * F.col("ps_availqty")).alias("value_e2"),
        )
        .groupBy("ps_partkey")
        .agg(F.sum("value_e2").alias("value_e2"))
    )
    total = vals.agg(F.sum("value_e2").alias("total_e2"))
    return (
        vals.join(
            F.broadcast(total),
            vals.value_e2 * Q11_FRACTION_DEN > F.col("total_e2"),
        )
        .select(F.col("ps_partkey").alias("partkey"), "value_e2")
        .orderBy(F.desc("value_e2"), "partkey")
    )


Q11_SQL = f"""
WITH {_partsupp_cte()},
asia AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q11_REGION}'
),
vals AS (
  SELECT ps_partkey, CAST(SUM(ps_supplycost_e2 * ps_availqty) AS BIGINT) AS value_e2
  FROM partsupp
  WHERE ps_suppkey IN (SELECT s_suppkey FROM asia)
  GROUP BY ps_partkey
)
SELECT ps_partkey AS partkey, value_e2
FROM vals
WHERE value_e2 * {Q11_FRACTION_DEN} > (SELECT SUM(value_e2) FROM vals)
ORDER BY value_e2 DESC, partkey
"""


# --------------------------------------------------------------------------
# Q16-style supplier count: distinct suppliers able to provide each
# (brand, type, size) bucket, excluding one brand/type and suppliers
# on a complaint list (modeled as negative account balance — the
# testdata schema has no s_comment).  NOT IN compiles to an anti-join.
# --------------------------------------------------------------------------

Q16_EXCL_BRAND = "Brand#5"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 5, 9, 15, 21, 28, 35, 44)


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & F.col("p_size").isin(*Q16_SIZES)
    )
    ps = derived_partsupp(spark, sf_dir, part=part)
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        ps.join(
            F.broadcast(bad.select("s_suppkey")),
            ps.ps_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("size"))
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "size")
    )


Q16_SQL = f"""
WITH {_partsupp_cte(
    f"SELECT * FROM part WHERE p_brand <> '{Q16_EXCL_BRAND}' "
    f"AND p_type <> '{Q16_EXCL_TYPE}' "
    f"AND p_size IN ({', '.join(map(str, Q16_SIZES))})")}
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS size,
       CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp
WHERE ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, size
ORDER BY supplier_cnt DESC, p_brand, p_type, size
"""


# --------------------------------------------------------------------------
# Q20-style promotion candidates: suppliers in a region holding EXCESS
# stock of name-matched parts — availqty more than half of what that
# (part, supplier) pair actually shipped in the target year.  The
# nested-IN chain (supplier IN ... partsupp WHERE part IN ... AND
# qty > correlated sum) flattens to joins + one aggregation; the
# half-of test is integer-exact (2*avail > shipped).
# --------------------------------------------------------------------------

Q20_NAME_PREFIX = "small"
Q20_YEAR_LO, Q20_YEAR_HI = "1996-01-01", "1997-01-01"
Q20_REGION = "AMERICA"


def q20_promotion_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").startswith(Q20_NAME_PREFIX)
    )
    ps = derived_partsupp(spark, sf_dir, part=part)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= Q20_YEAR_LO) & (F.col("l_shipdate") < Q20_YEAR_HI)
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_q(F.col("l_quantity"), 0)).alias("shipped_qty")
    )
    excess = ps.join(
        shipped,
        (ps.ps_partkey == shipped.l_partkey) & (ps.ps_suppkey == shipped.l_suppkey),
    ).where(F.col("ps_availqty") * 2 > F.col("shipped_qty"))
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q20_REGION)
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat.join(reg, nat.n_regionkey == reg.r_regionkey)),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    return (
        supp.join(
            excess.select("ps_suppkey").distinct(),
            supp.s_suppkey == F.col("ps_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


Q20_SQL = f"""
WITH {_partsupp_cte(f"SELECT * FROM part WHERE p_name LIKE '{Q20_NAME_PREFIX}%'")},
shipped AS (
  SELECT l_partkey, l_suppkey, {_ssum("l_quantity", 0)} AS shipped_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q20_YEAR_LO}'
    AND l_shipdate <  TIMESTAMP '{Q20_YEAR_HI}'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q20_REGION}'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    WHERE ps_availqty * 2 > shipped_qty)
ORDER BY s_name
"""


# --------------------------------------------------------------------------
# Q21-style waiting supplier: on finished multi-supplier orders, find
# the supplier who was the ONLY late one (shipped > 60 days after the
# order date — the testdata has no commit/receipt dates, so lateness
# is modeled against o_orderdate).  TPC-H phrases this as
# EXISTS(other supplier) AND NOT EXISTS(other late supplier); both
# quantifiers collapse into ONE aggregation per order (distinct
# suppliers, distinct late suppliers, and the single late supplier as
# a conditional min) — one shuffle instead of two lineitem self-joins,
# the formulation you'd want at 100 TB.
# --------------------------------------------------------------------------

Q21_LATE_DAYS = 60
Q21_STATUS = "F"
Q21_TOPN = 100


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == Q21_STATUS
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q21_LATE_DAYS} DAYS"
    )
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
                "n_late"
            ),
            F.min(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("late_supp"),
        )
        .where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        per_order.groupBy("late_supp")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("late_supp") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(Q21_TOPN)
    )


Q21_SQL = f"""
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
                             THEN l_suppkey END) AS n_late,
         MIN(CASE WHEN l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
                  THEN l_suppkey END) AS late_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = '{Q21_STATUS}'
  GROUP BY l_orderkey
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT {Q21_TOPN}
"""


PARTSUPP_QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_stock": q11_important_stock,
    "q16_supplier_cnt": q16_supplier_cnt,
    "q20_promotion_candidates": q20_promotion_candidates,
    "q21_waiting_supplier": q21_waiting_supplier,
}

PARTSUPP_ORACLE = {
    "q2_min_cost_supplier": Q2_SQL,
    "q11_important_stock": Q11_SQL,
    "q16_supplier_cnt": Q16_SQL,
    "q20_promotion_candidates": Q20_SQL,
    "q21_waiting_supplier": Q21_SQL,
}
