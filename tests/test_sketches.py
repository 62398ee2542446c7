"""HLL sketch: register determinism + estimator error bound."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.operators.sketches import (
    HLL_P,
    hll_estimate,
    hll_registers,
)
from pagerank_using_mapreduce_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_hll_estimate_within_error_bound(spark):
    li = load_table(spark, SF, "lineitem")
    regs = [
        (r["register"], r["max_rho"])
        for r in hll_registers(li, "l_orderkey").collect()
    ]
    est = hll_estimate(regs)
    exact = li.select("l_orderkey").distinct().count()
    sigma = 1.04 / math.sqrt(1 << HLL_P)
    assert abs(est - exact) <= 5 * sigma * exact, (est, exact)


def test_hll_registers_deterministic_and_bounded(spark):
    li = load_table(spark, SF, "lineitem")
    a = sorted(map(tuple, hll_registers(li, "l_orderkey").collect()))
    b = sorted(map(tuple, hll_registers(li.repartition(7), "l_orderkey").collect()))
    assert a == b, "registers must not depend on physical layout"
    assert len(a) <= (1 << HLL_P)
    assert all(0 <= reg < (1 << HLL_P) and 1 <= rho <= 53 for reg, rho in a)


def test_hll_union_merge(spark):
    """Sketch mergeability — the property that makes HLL the scale
    path: registers of a union == elementwise max of the parts'
    registers."""
    li = load_table(spark, SF, "lineitem")
    lo = li.where(F.col("l_orderkey") % 2 == 0)
    hi = li.where(F.col("l_orderkey") % 2 == 1)
    whole = dict(
        map(tuple, hll_registers(li, "l_orderkey").collect())
    )
    pa = dict(map(tuple, hll_registers(lo, "l_orderkey").collect()))
    pb = dict(map(tuple, hll_registers(hi, "l_orderkey").collect()))
    merged: dict[int, int] = {}
    for d in (pa, pb):
        for k, v in d.items():
            merged[k] = max(merged.get(k, 0), v)
    assert merged == whole
