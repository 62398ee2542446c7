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


def test_cms_never_underestimates_and_bounds_error(spark):
    from pagerank_using_mapreduce_spark.operators.sketches import (
        CMS_WIDTH,
        cms_counts,
        cms_estimate,
    )

    li = load_table(spark, SF, "lineitem")
    counts = [tuple(r) for r in cms_counts(li, "l_suppkey").collect()]
    exact = {
        r["l_suppkey"]: r["n"]
        for r in li.groupBy("l_suppkey").agg(F.count("*").alias("n")).collect()
    }
    total = sum(exact.values())
    bound = 5 * total / CMS_WIDTH  # well beyond the e/width expectation
    for k, n in exact.items():
        est = cms_estimate(counts, k)
        assert est >= n, (k, est, n)
        assert est - n <= bound, (k, est, n, bound)


def test_cms_counts_layout_independent_and_mass_preserving(spark):
    from pagerank_using_mapreduce_spark.operators.sketches import (
        CMS_DEPTH,
        cms_counts,
    )

    li = load_table(spark, SF, "lineitem")
    a = sorted(map(tuple, cms_counts(li, "l_suppkey").collect()))
    b = sorted(map(tuple, cms_counts(li.repartition(5), "l_suppkey").collect()))
    assert a == b
    n = li.count()
    # every row contributes exactly one increment per sketch row
    for i in range(CMS_DEPTH):
        assert sum(c for r, _, c in a if r == i) == n


def test_bloom_no_false_negatives_and_pruning(spark):
    from pagerank_using_mapreduce_spark.operators.sketches import (
        bloom_positions,
        bloom_probe,
    )

    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pos = bloom_positions(orders, "o_orderkey")
    flags = {
        r["key"]: r["bloom_pass"]
        for r in bloom_probe(li, "l_orderkey", pos).collect()
    }
    truth = {r["o_orderkey"] for r in orders.select("o_orderkey").distinct().collect()}
    probed = set(flags)
    # NO false negatives: every true key that was probed passes
    for k in truth & probed:
        assert flags[k], k
    # the filter actually prunes: most non-members fail
    non_members = [k for k in probed if k not in truth]
    passed_fp = [k for k in non_members if flags[k]]
    assert len(passed_fp) <= max(5, 0.02 * len(non_members)), (
        len(passed_fp), len(non_members))


def test_cms_join_estimate_upper_bounds_exact(spark):
    """The inner-product estimator never underestimates the true join
    size, and at this width the overshoot is small."""
    from pagerank_using_mapreduce_spark.operators.sketches import (
        cms_join_size_estimate,
    )

    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    row = cms_join_size_estimate(li, "l_orderkey", orders, "o_orderkey").first()
    assert row["est_rows"] >= row["exact_rows"]
    assert row["est_rows"] <= 2 * row["exact_rows"]


def test_cms_heavy_hitters_contains_true_top(spark):
    """The CMS top-k (estimates never underestimate) must contain every
    key whose TRUE count exceeds the estimated cutoff."""
    from pagerank_using_mapreduce_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    li = load_table(spark, SF, "lineitem")
    got = [(r["key"], r["est_count"])
           for r in cms_heavy_hitters(li, "l_suppkey", top_n=10).collect()]
    exact = {
        r["l_suppkey"]: r["n"]
        for r in li.groupBy("l_suppkey").agg(F.count("*").alias("n")).collect()
    }
    cutoff = min(e for _, e in got)
    picked = {k for k, _ in got}
    for k, n in exact.items():
        if n > cutoff:
            assert k in picked, (k, n, cutoff)
    for k, e in got:
        assert e >= exact[k]


def test_value_histogram_mass_edges_and_merge(spark):
    """Counts sum to the input size, cum is monotone ending at the
    total, clamping puts out-of-range values in the edge bins, and the
    sketch is mergeable (sharded counts sum to the global counts)."""
    from pagerank_using_mapreduce_spark.operators.sketches import (
        value_histogram,
    )

    vals = [(-5.0,), (0.0,), (9.99,), (10.0,), (250.0,), (499.9,), (777.0,)]
    df = spark.createDataFrame(vals, ["value"])
    rows = {r["bin"]: r for r in value_histogram(df, "value").collect()}
    assert sum(r["cnt"] for r in rows.values()) == len(vals)
    assert rows[0]["cnt"] == 3  # -5 clamped, 0.0, 9.99
    assert rows[49]["cnt"] == 2  # 499.9 and 777 clamped
    assert rows[1]["cnt"] == 1 and rows[25]["cnt"] == 1
    cums = [r["cum_cnt"] for r in sorted(rows.values(), key=lambda r: r["bin"])]
    assert cums == sorted(cums) and cums[-1] == len(vals)
    assert rows[1]["lo_edge_e2"] == 1000 and rows[1]["hi_edge_e2"] == 2000
    # mergeability: per-shard bin counts add to the global histogram
    a = value_histogram(df.limit(3), "value").collect()
    b = value_histogram(df.subtract(df.limit(3)), "value").collect()
    merged = {}
    for r in list(a) + list(b):
        merged[r["bin"]] = merged.get(r["bin"], 0) + r["cnt"]
    assert merged == {b_: r["cnt"] for b_, r in rows.items()}


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def test_kmv_exact_when_small_and_error_bound(spark):
    import math

    from pagerank_using_mapreduce_spark.operators.sketches import (
        KMV_K,
        kmv_estimates,
        kmv_sketch,
    )

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("source"), F.col("l_orderkey").alias("key")
    )
    sk = kmv_sketch(li, "key", "source")
    est = {r["grp"]: r for r in kmv_estimates(sk).collect()}
    exact = {
        r["source"]: r["n"]
        for r in li.distinct().groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    sigma = 1.0 / math.sqrt(KMV_K - 2)
    for g, n in exact.items():
        row = est[g]
        if n < KMV_K:
            # saw every key: exact by construction
            assert row["est_distinct"] == n, (g, row, n)
        else:
            assert abs(row["est_distinct"] - n) <= 5 * sigma * n, (g, row, n)


def test_kmv_merge_law_and_layout_independence(spark):
    from pagerank_using_mapreduce_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch,
    )

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("source"), F.col("l_orderkey").alias("key")
    )
    sk = kmv_sketch(li, "key", "source")
    # merged-from-parts == sketch of the whole table directly: the
    # global k-minimum of distinct hashes is contained in the union of
    # per-group k-minimum sets
    merged = sorted(
        (r["pos"], r["h"]) for r in kmv_merge(sk).collect()
    )
    direct = sorted(
        (r["pos"], r["h"])
        for r in kmv_sketch(
            li.select(F.lit("__ALL__").alias("source"), "key"), "key", "source"
        ).collect()
    )
    assert merged == direct
    relaid = sorted(
        (r["grp"], r["pos"], r["h"])
        for r in kmv_sketch(li.repartition(7), "key", "source").collect()
    )
    orig = sorted((r["grp"], r["pos"], r["h"]) for r in sk.collect())
    assert relaid == orig, "sketch must not depend on physical layout"


def test_kmv_overlap_bounds_vs_exact(spark):
    """The sketch-only overlap estimates must track the exact values:
    inter_est within 5 combined-sigma of the true intersection for
    every source pair, exact when the merged sketch saw every key, and
    J = n_common/n_kept in [0, 1]."""
    import math

    from pagerank_using_mapreduce_spark.operators.sketches import (
        KMV_K,
        kmv_overlap,
        kmv_sketch,
    )

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("source"), F.col("l_orderkey").alias("key")
    )
    sk = kmv_sketch(li, "key", "source")
    got = {
        (r["grp_a"], r["grp_b"]): r for r in kmv_overlap(sk).collect()
    }
    per = {
        r["source"]: {x["key"] for x in li.where(F.col("source") == r["source"]).select("key").distinct().collect()}
        for r in li.select("source").distinct().collect()
    }
    assert got, "at least one source pair"
    for (ga, gb), r in got.items():
        A, B = per[ga], per[gb]
        true_u, true_i = len(A | B), len(A & B)
        assert 0 <= r["n_common"] <= KMV_K
        if len(A | B) < KMV_K:
            assert r["union_est"] == true_u and r["inter_est"] == true_i
        else:
            sigma_u = true_u / math.sqrt(KMV_K - 2)
            assert abs(r["union_est"] - true_u) <= 5 * sigma_u
            # Jaccard sigma ~ sqrt(J(1-J)/k); propagate through x union
            j = true_i / true_u if true_u else 0.0
            sigma_i = true_u * math.sqrt(max(j * (1 - j), 1e-9) / KMV_K) + j * sigma_u
            assert abs(r["inter_est"] - true_i) <= 5 * sigma_i + 1, (
                (ga, gb), r, true_i
            )


def test_kmv_two_phase_identical(spark):
    """The scale-armored two-phase sketch (hash-space prefilter + exact
    fallback for unproven groups) must produce the IDENTICAL sketch,
    regardless of physical layout.  Small-vocabulary groups here all
    take the fallback branch — the proven branch is covered below."""
    from pagerank_using_mapreduce_spark.operators.sketches import kmv_sketch

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("source"), F.col("l_orderkey").alias("key")
    )
    one = sorted(map(tuple, kmv_sketch(li, "key", "source").collect()))
    two = sorted(
        map(
            tuple,
            kmv_sketch(
                li.repartition(13), "key", "source", two_phase=True
            ).collect(),
        )
    )
    assert one == two


def test_kmv_two_phase_proven_and_mixed(spark):
    """Exercise the prefilter's PROVEN branch (a group with enough
    distinct keys that >= k survivors land below the 1/16 hash-space
    threshold, so its bottom-k never touches the fallback scan) and the
    mixed case where a tiny group rides the fallback in the same call.
    Both must equal the single-phase sketch exactly."""
    from pagerank_using_mapreduce_spark.operators.sketches import (
        KMV_K,
        _KMV_PREFILTER_FRAC,
        kmv_sketch,
    )

    # big group: 6144 distinct keys -> E[survivors] = 6144/16 = 384 >> k=128
    need = KMV_K * _KMV_PREFILTER_FRAC * 3
    big = spark.range(need).select(
        F.lit("big").alias("source"), F.col("id").cast("string").alias("key")
    )
    tiny = spark.range(40).select(
        F.lit("tiny").alias("source"),
        (F.col("id") + 9_000_000).cast("string").alias("key"),
    )
    df = big.unionAll(tiny)
    one = sorted(map(tuple, kmv_sketch(df, "key", "source").collect()))
    two = sorted(
        map(tuple, kmv_sketch(df.repartition(13), "key", "source", two_phase=True).collect())
    )
    assert one == two
    # the tiny group is exact (saw every key): 40 sketch rows
    assert sum(1 for g, _, _ in two if g == "tiny") == 40
    assert sum(1 for g, _, _ in two if g == "big") == KMV_K


def test_kmv_proof_audit_matches_branch_rule(spark):
    """x127's per-group verdict must equal the decision relation inside
    kmv_sketch(two_phase=True): survivors = |distinct keys whose md5
    falls below the 1/16 threshold| (replayed here with hashlib), and
    proven <=> survivors >= k.  Same proven+fallback fixture as the
    two-phase law test, plus repartition-invariance."""
    import hashlib

    from pagerank_using_mapreduce_spark.operators.sketches import (
        KMV_K,
        _KMV_PREFILTER,
        _KMV_PREFILTER_FRAC,
        kmv_proof_audit,
    )

    need = KMV_K * _KMV_PREFILTER_FRAC * 3
    big = spark.range(need).select(
        F.lit("big").alias("source"), F.col("id").cast("string").alias("key")
    )
    tiny = spark.range(40).select(
        F.lit("tiny").alias("source"),
        (F.col("id") + 9_000_000).cast("string").alias("key"),
    )
    df = big.unionAll(tiny)
    got = {
        r["grp"]: (r["survivors"], r["proven"])
        for r in kmv_proof_audit(df, "key", "source").collect()
    }

    def survivors(keys):
        return sum(
            1
            for v in keys
            if hashlib.md5(f"kmv|{v}".encode()).hexdigest() < _KMV_PREFILTER
        )

    want = {
        "big": survivors(str(i) for i in range(need)),
        "tiny": survivors(str(i + 9_000_000) for i in range(40)),
    }
    assert got == {
        g: (s, int(s >= KMV_K)) for g, s in want.items()
    }
    assert got["big"][1] == 1 and got["tiny"][1] == 0
    rep = {
        r["grp"]: (r["survivors"], r["proven"])
        for r in kmv_proof_audit(df.repartition(13), "key", "source").collect()
    }
    assert rep == got
