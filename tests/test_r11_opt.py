"""Focused tests for the round-11 optimization changes: measured-size
partitioning, the single-exchange symmetric-edge dedup, the skippable
presentation sort, and the doc-level setsim verification."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_adaptive_partitions_clamps(spark):
    from pagerank_using_mapreduce_spark.operators.scale import (
        adaptive_partitions,
    )

    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert adaptive_partitions(spark, 0) == 1
    assert adaptive_partitions(spark, 5_000) == 1
    assert adaptive_partitions(spark, 16_384 * 3 + 1) == min(shuffle, 4)
    # conf cap rules at scale
    assert adaptive_partitions(spark, 10**12) == shuffle


def test_undirected_edges_keyed_single_exchange(spark):
    """The keyed form must (a) return the identical pair set as the
    keyless form and (b) plan exactly ONE hashpartitioning exchange
    (the repartition satisfies the distinct's clustering — the old
    shape paid distinct's own exchange plus the caller's)."""
    from pagerank_using_mapreduce_spark.operators.graph import (
        undirected_edges,
    )

    pages = spark.createDataFrame(
        [("a", ["b", "c"]), ("b", ["a"]), ("c", []), ("d", ["ghost"])],
        "title string, links array<string>",
    )
    keyless = {tuple(r) for r in undirected_edges(pages).collect()}
    keyed_df = undirected_edges(pages, key="src", num_partitions=4)
    keyed = {tuple(r) for r in keyed_df.collect()}
    assert keyed == keyless == {
        ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")
    }
    # the old caller shape repartitioned AFTER the distinct — one more
    # full exchange of the symmetric relation than the keyed form,
    # where the repartition satisfies the distinct's clustering
    old_shape = undirected_edges(pages).repartition(4, "src")
    old_shape.collect()

    def n_exchanges(df):
        return df._jdf.queryExecution().executedPlan().toString().count(
            "Exchange hashpartitioning"
        )

    # strictly fewer (measured 9 vs 11 on this fixture: the keyed form
    # drops the distinct's own (src, dst) exchange; AQE layout makes
    # the exact delta fixture-dependent)
    assert n_exchanges(keyed_df) < n_exchanges(old_shape)


def test_with_global_position_unordered_same_positions(spark):
    from pagerank_using_mapreduce_spark.operators.ranking import (
        with_global_position,
    )

    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 37 % 100).alias("v")
    )
    ordered = with_global_position(df, [F.asc("v"), F.asc("id")])
    unordered = with_global_position(
        df, [F.asc("v"), F.asc("id")], ordered=False
    )
    a = {(r["id"], r["pos"]) for r in ordered.collect()}
    b = {(r["id"], r["pos"]) for r in unordered.collect()}
    assert a == b


def test_setsim_array_verify_matches_exploded(spark):
    """The sha-path (doc-level array intersect) must produce the exact
    rows of the no-sha exploded-gram path — same pairs, same integer
    inter/sz, same jacc_e6."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        setsim_join,
        shingle_arrays,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "a completely different document body here now"),
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    sha = shingle_arrays(docs).localCheckpoint(eager=True)
    via_arrays = sorted(
        tuple(r) for r in setsim_join(docs, sha=sha).collect()
    )
    via_grams = sorted(tuple(r) for r in setsim_join(docs).collect())
    assert via_arrays == via_grams
    assert via_arrays  # the fixture has true pairs (1,2),(1,4),(2,4)
