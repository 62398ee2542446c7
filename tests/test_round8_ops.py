"""Goldens for the round-8 operators: x118 exact-span contamination
(the fixed-length k-gram variant of x113), x119 LSH band-config
frontier (the x116 recall audit swept over bandings), x120
cross-source duplication matrix, and x121 duplication spectrum.  The
engine-vs-engine hash gate lives in the DuckDB oracles; these pin the
SEMANTICS — in particular the one claim that justifies x118's
existence: a shared span BELOW the winnowing guarantee floor that the
winnowed screen provably samples away and the exact screen catches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

# ---------------------------------------------------------------------------
# x118 exact-span contamination
# ---------------------------------------------------------------------------

# Found by offline search over context words (seed 7, trial 12): both
# docs share the 6-token span "quantum entangled photon pairs decay
# rapidly" (< the 8-token winnow guarantee floor for k=4/w=5), and
# their winnowed fingerprint sets are DISJOINT — the per-window min
# election lands on context grams in both docs, so the x113 screen
# sees zero shared fingerprints.  The test re-verifies the disjointness
# (self-validating fixture) rather than trusting this comment.
GOLDEN_TRAIN = (
    "damson apple jackfruit cherry quantum entangled photon pairs "
    "decay rapidly imbe banana feijoa olive"
)
GOLDEN_EVAL = (
    "copper nickel dusk jade quantum entangled photon pairs decay "
    "rapidly granite pearl ember flint"
)


def test_x118_golden_winnow_misses_exact_catches(spark):
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        exact_contamination,
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [(1, GOLDEN_TRAIN), (100, GOLDEN_EVAL)], "doc_id long, text string"
    )
    # the winnowed screen (x113's mechanism) shares NOTHING
    fps = winnow_fingerprints(docs).collect()
    train_fps = {r.fp for r in fps if r.doc_id == 1}
    eval_fps = {r.fp for r in fps if r.doc_id == 100}
    assert train_fps and eval_fps
    assert not (train_fps & eval_fps), (
        "fixture invalid: winnowing caught the span"
    )
    # the exact screen fires: a 6-token shared span is exactly one
    # shared 6-gram
    hits = exact_contamination(docs, split_at=100).collect()
    assert [(r.train_doc, r.eval_doc, r.n_shared) for r in hits] == [
        (1, 100, 1)
    ]


def test_x118_longer_span_counts_grams(spark):
    """An L-token shared span yields L - k + 1 shared k-grams."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        EXACT_CONTAM_K,
        exact_contamination,
    )

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [(1, "prefix words here " + span), (100, span + " suffix words")],
        "doc_id long, text string",
    )
    hits = exact_contamination(docs, split_at=100).collect()
    assert [(r.train_doc, r.eval_doc, r.n_shared) for r in hits] == [
        (1, 100, 8 - EXACT_CONTAM_K + 1)
    ]


def test_x118_df_cap_drops_boilerplate(spark):
    """A gram in more than df_cap training docs is boilerplate: it
    must not fire, and with a bigger cap the same gram does."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        exact_contamination,
    )

    span = "one two three four five six"
    rows = [(i, f"ctx{'x' * i} " + span) for i in range(1, 4)]  # 3 train docs
    rows.append((100, span + " evalside tail"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    none = exact_contamination(docs, split_at=100, df_cap=2).collect()
    assert none == []
    some = exact_contamination(docs, split_at=100, df_cap=3).collect()
    assert {(r.train_doc, r.eval_doc) for r in some} == {
        (1, 100), (2, 100), (3, 100)
    }


def test_x118_no_cross_side_pairs(spark):
    """Train-train and eval-eval overlaps never appear."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        exact_contamination,
    )

    span = "shared phrase of six tokens exactly"
    docs = spark.createDataFrame(
        [(1, "a " + span), (2, "b " + span)],  # both train
        "doc_id long, text string",
    )
    assert exact_contamination(docs, split_at=100).collect() == []


# ---------------------------------------------------------------------------
# x119 LSH band-config frontier
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def frontier_rows(spark):
    from pagerank_using_mapreduce_spark.operators import dedup as dd

    docs = dd.augment_docs(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
            "doc_id", "text"
        )
    )
    rows = {
        r.n_bands: r
        for r in dd.lsh_band_frontier(docs).collect()
    }
    return rows


def test_x119_one_row_per_config(frontier_rows):
    from pagerank_using_mapreduce_spark.operators.dedup import (
        FRONTIER_CONFIGS,
    )

    assert set(frontier_rows) == {nb for nb, _ in FRONTIER_CONFIGS}
    for nb, rpb in FRONTIER_CONFIGS:
        assert frontier_rows[nb].rows_per_band == rpb


def test_x119_truth_side_config_independent(frontier_rows):
    n_exacts = {r.n_exact for r in frontier_rows.values()}
    assert len(n_exacts) == 1


def test_x119_nested_bandings_monotone(frontier_rows):
    """(2,6) -> (6,2) -> (12,1) band partitions NEST (each coarse band
    is a concatenation of finer bands), so a coarse-band bucket match
    implies every covered fine band matches too: candidates and found
    pairs are non-decreasing along the chain.  (3,4)/(4,3) don't nest
    with each other — only the chain is asserted."""
    chain = [frontier_rows[2], frontier_rows[6], frontier_rows[12]]
    for lo, hi in zip(chain, chain[1:]):
        assert lo.n_candidates <= hi.n_candidates
        assert lo.n_found <= hi.n_found
        assert lo.recall_e6 <= hi.recall_e6


def test_x119_shipped_config_reproduces_x116(spark, frontier_rows):
    """The (4 bands, 3 rows) frontier row IS the x116 audit's banding:
    n_exact matches, and the frontier's candidate recall bounds the
    pipeline recall from above (x116 measures candidates AFTER the
    exact-Jaccard verify, which can only drop pairs)."""
    from pagerank_using_mapreduce_spark.operators import dedup as dd

    docs = dd.augment_docs(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
            "doc_id", "text"
        )
    )
    exact = dd.setsim_join(docs, num=1, den=2).select("doc_a", "doc_b")
    lsh = dd.near_dup_pipeline(docs).select("doc_a", "doc_b")
    n_exact = exact.count()
    n_found_pipeline = exact.join(lsh, ["doc_a", "doc_b"]).count()
    row = frontier_rows[4]
    assert row.n_exact == n_exact
    # verify can only remove candidate pairs, never add
    assert row.n_found >= n_found_pipeline
    # on this corpus the verified pipeline keeps every true pair the
    # banding surfaced, so the numbers coincide exactly
    assert row.n_found == n_found_pipeline


# ---------------------------------------------------------------------------
# x120 cross-source duplication matrix
# ---------------------------------------------------------------------------


def test_x120_unordered_pairs_and_offset_arithmetic(spark):
    """Pairs are unordered (least/greatest), same-source dups land on
    the diagonal, and augmented copies (+1e9 / +2e9 ids) inherit their
    base doc's source via the id-offset arithmetic."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        NEAR_DUP_OFFSET,
        cross_source_dups,
    )

    docs = spark.createDataFrame(
        [(1, "web"), (2, "news"), (3, "web")],
        "doc_id long, source string",
    )
    pairs = spark.createDataFrame(
        [
            # news->web and web->news: must collapse into ONE cell
            (2, 1), (1 + NEAR_DUP_OFFSET, 2),
            # same-source diagonal, one side an augmented copy
            (3, 1 + 2 * NEAR_DUP_OFFSET),
        ],
        "doc_a long, doc_b long",
    )
    out = {
        (r.source_a, r.source_b): r.n_pairs
        for r in cross_source_dups(docs, pairs).collect()
    }
    assert out == {("news", "web"): 2, ("web", "web"): 1}


# ---------------------------------------------------------------------------
# x121 duplication spectrum
# ---------------------------------------------------------------------------


def test_x121_buckets_and_within_doc_repeats(spark):
    """Bucket = floor(log2 cnt); within-doc repeats count as separate
    occurrences (memorization pressure counts every exposure)."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        gram_spectrum,
    )

    # n=2 grams: doc 1 emits "a b","b a","a b","b c" -> "a b" twice
    # WITHIN one doc; doc 2 emits "a b","b c" -> "a b" x3 (bucket 1),
    # "b c" x2 (bucket 1), "b a" x1 (bucket 0).
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b c")], "doc_id long, text string"
    )
    out = {
        r.log2_bucket: (r.n_grams, r.n_occurrences)
        for r in gram_spectrum(docs, n=2).collect()
    }
    assert out == {0: (1, 1), 1: (2, 5)}


def test_x121_exact_power_of_two_bucket_edge(spark):
    """cnt=4 must land in bucket 2, not 1 — the exact-power-of-two
    edge that a floating log2 could flip by one ulp."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        gram_spectrum,
    )

    docs = spark.createDataFrame(
        [(i, "same exact phrase") for i in range(4)],
        "doc_id long, text string",
    )
    out = gram_spectrum(docs, n=3).collect()
    assert [(r.log2_bucket, r.n_grams, r.n_occurrences) for r in out] == [
        (2, 1, 4)
    ]


def test_x121_short_docs_emit_no_grams(spark):
    """Docs shorter than n tokens contribute nothing (no empty-array
    explode rows, no NULL gram)."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        gram_spectrum,
    )

    docs = spark.createDataFrame(
        [(1, "too short"), (2, "also tiny")], "doc_id long, text string"
    )
    assert gram_spectrum(docs, n=5).collect() == []


# ---------------------------------------------------------------------------
# x122 soft-dedup sampling weights
# ---------------------------------------------------------------------------


def test_x122_cluster_mass_equals_one_doc(spark):
    """A 3-chain cluster weighs 1/3 each; the singleton weighs 1.0;
    total sampling mass == number of clusters."""
    from pagerank_using_mapreduce_spark.operators.dedup import dedup_weights

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "alpha beta gamma delta epsilon zeta eta theta"),
            (4, "completely different words entirely unrelated content here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup_weights(docs).collect()}
    assert {rows[i].canonical_id for i in (1, 2, 3)} == {1}
    for i in (1, 2, 3):
        assert (rows[i].cluster_size, rows[i].weight_e6) == (3, 333333)
    assert (rows[4].cluster_size, rows[4].weight_e6) == (1, 1_000_000)
    n_clusters = len({r.canonical_id for r in rows.values()})
    total_e6 = sum(r.weight_e6 for r in rows.values())
    # 3 * 333333 + 1000000 = 1999999 ~ 2 clusters (floor quantization)
    assert abs(total_e6 - n_clusters * 1_000_000) <= len(rows)
