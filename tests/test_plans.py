"""Physical-plan property tests: the scale-critical claims in the
docstrings, asserted against Catalyst's actual output so they cannot
silently regress.

These parse ``explain``-style plan strings — brittle against Spark
version changes by nature, so each assertion targets a stable
substring (node names, ReadSchema) rather than exact plan shapes.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


# Queries whose plans are ALLOWED to contain Python evaluation:
# the multimodal family is mapInPandas by design; z1/z2 are streaming
# (not built here).
PYTHON_OK = {
    "x11_multimodal_decode",
    "x17_resize",
    "x18_features",
    "x24_frame_sample",  # sampling over the mapInPandas decode output
    "x69_pixel_decode",  # real raster byte-walk (numpy per Arrow batch)
    "x70_pixel_resize",  # real nearest-neighbor resample on raster bytes
    "x71_wav_decode",    # real PCM sample byte-walk
    "x85_audio_features",  # real PCM feature byte-walk (energy/ZCR)
    "x98_scene_cuts",  # real luma-plane byte-walk (SAD shot detection)
    "x112_image_ahash",  # real raster byte-walk (perceptual hash bits)
    "x115_audio_contour",  # real PCM byte-walk (energy-contour bits)
    "x134_png_decode",  # real zlib IDAT inflate + unfilter byte-walk
    "x137_embedding_contamination",  # Arrow-batched eval-matrix scorer
    # (x15-style pinned numpy fold; broadcast-constant eval side)
    "z1_stream_rollup",
    "z2_stream_sessions",
    "z11_stream_funnel",  # applyInPandasWithState state machine
}


def test_no_python_in_batch_query_plans(spark):
    """Every batch query compiles to pure JVM operators — no
    row-at-a-time or Arrow Python evaluation anywhere in the hot path —
    and NO plan anywhere contains a CartesianProduct (a non-broadcast
    cross join replicates both sides; every pairwise operator must go
    through blocking keys or a broadcast nested loop instead)."""
    offenders, cartesian = [], []
    for name, fn in QUERIES.items():
        plan = _plan(fn(spark, SF))
        if name not in PYTHON_OK and (
            "EvalPython" in plan or "MapInPandas" in plan
        ):
            offenders.append(name)
        if "CartesianProduct" in plan:
            cartesian.append(name)
    assert not offenders, f"Python in plans of: {offenders}"
    assert not cartesian, f"CartesianProduct in plans of: {cartesian}"


def test_token_counts_prunes_to_text_column(spark):
    plan = _plan(QUERIES["p678_token_counts"](spark, SF))
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "text:string" in scan and "doc_id" not in scan


def test_q5_broadcasts_dimensions(spark):
    plan = _plan(QUERIES["q5_region_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_cosine_topk_keeps_collection_unshuffled(spark):
    """The collection side must reach the scoring join without an
    Exchange: queries are broadcast TO the scan, never vice versa."""
    plan = _plan(QUERIES["x5_cosine_topk"](spark, SF))
    join_pos = plan.index("BroadcastNestedLoopJoin")
    assert "BroadcastExchange" in plan
    # the only Exchange allowed below/around the scan side is the
    # broadcast of the 5-row query set and the final top-k window
    assert plan.count("Exchange hashpartitioning") <= 1


def test_semi_anti_joins_use_semi_anti_nodes(spark):
    assert "Semi" in _plan(QUERIES["sj1_semi_join"](spark, SF))
    assert "Anti" in _plan(QUERIES["sj2_anti_join"](spark, SF))


def test_rollup_is_single_expand_pass(spark):
    plan = _plan(QUERIES["g1_rollup"](spark, SF))
    assert "Expand" in plan
    # one scan of lineitem, not one per grouping level (each scan node
    # contributes exactly one Location: line in the details section)
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_topk_is_take_ordered(spark):
    plan = _plan(QUERIES["o1_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_pushdown_reaches_scan(spark):
    plan = _plan(QUERIES["x5_cosine_topk"](spark, SF))
    assert "LessThan(vec_id,5)" in plan  # PushedFilters on the query side


def test_q4_compiles_to_semi_join_with_date_pushdown(spark):
    plan = _plan(QUERIES["q4_order_priority"](spark, SF))
    assert "Semi" in plan  # correlated EXISTS → left-semi, not a fan-out join
    # the o_orderdate range reaches the orders scan as a pushed filter
    assert "PushedFilters" in plan and "GreaterThanOrEqual(o_orderdate" in plan


def test_q19_pushes_disjunction_arms_to_scans(spark):
    """The per-table parts of the OR-of-ANDs must reach both scans:
    brand/size arms to part, quantity bounds cannot be split per-row
    but brand Or-filter appears in part's PushedFilters."""
    plan = _plan(QUERIES["q19_disjunctive"](spark, SF))
    assert "Or(And(EqualTo(p_brand,Brand#1)" in plan


def test_q7_broadcasts_both_nation_roles(spark):
    plan = _plan(QUERIES["q7_volume_shipping"](spark, SF))
    assert plan.count("BroadcastExchange") >= 2


def test_q13_outer_join_preserved(spark):
    plan = _plan(QUERIES["q13_customer_distribution"](spark, SF))
    assert "LeftOuter" in plan


def test_x25_split_is_scan_project_only(spark):
    """hash_split adds zero shuffles: the plan is scan → project."""
    plan = _plan(QUERIES["x25_train_test_split"](spark, SF))
    assert "Exchange" not in plan


def test_x26_sample_filter_reaches_scan_side(spark):
    """stratified_sample is a pure filter — no shuffle, no join."""
    plan = _plan(QUERIES["x26_stratified_sample"](spark, SF))
    assert "Exchange" not in plan or "Exchange hashpartitioning" not in plan


def test_hll_registers_single_exchange(spark):
    """The sketch is one aggregate: exactly one shuffle node (partial
    max → final max over 2^p register groups), nothing else wide."""
    import re

    plan = _plan(QUERIES["x35_hll_registers"](spark, SF))
    nodes = [l for l in plan.splitlines() if re.match(r"\(\d+\) Exchange", l)]
    assert len(nodes) == 1, nodes
    assert "EvalPython" not in plan


def test_repetition_stats_prunes_scan(spark):
    """x34's scans prune: the token side reads only doc_id+text; no
    scan drags in lang/source/n_chars."""
    plan = _plan(QUERIES["x34_repetition_stats"](spark, SF))
    scans = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert any("text:string" in l and "doc_id" in l for l in scans)
    assert all("lang" not in l and "source" not in l and "n_chars" not in l
               for l in scans)


def _scan_ids(plan: str, table: str) -> list[str]:
    """Node ids of parquet scans over `table` in a formatted plan."""
    ids = []
    for block in plan.split("\n\n"):
        m = re.match(r"\((\d+)\) Scan parquet", block.strip())
        if m and f"{table}.parquet" in block:
            ids.append(m.group(1))
    return ids


def _scan_block(plan: str, table: str) -> str:
    for block in plan.split("\n\n"):
        if re.match(r"\(\d+\) Scan parquet", block.strip()) and (
            f"{table}.parquet" in block
        ):
            return block
    raise AssertionError(f"no {table} scan in plan")


def _broadcast_subtrees(plan: str) -> list[str]:
    """The tree text under each BroadcastExchange node (its build side)."""
    tree = plan.split("\n\n")[0].splitlines()

    def start(line: str) -> int:
        m = re.search(r"[^\s:+\-]", line)
        return m.start() if m else 0

    subs = []
    for i, line in enumerate(tree):
        if "BroadcastExchange" in line:
            d = start(line)
            sub = []
            for nxt in tree[i + 1 :]:
                if start(nxt) <= d:
                    break
                sub.append(nxt)
            subs.append("\n".join(sub))
    return subs


def test_q8_broadcasts_all_dimensions(spark):
    """Q8's six joins: all dimension sides broadcast, and no
    BroadcastExchange subtree contains the lineitem scan (the fact side
    is the probe, never the build)."""
    plan = _plan(QUERIES["q8_market_share"](spark, SF))
    assert "BroadcastHashJoin" in plan
    li_ids = _scan_ids(plan, "lineitem")
    assert li_ids, "expected a lineitem scan"
    for sub in _broadcast_subtrees(plan):
        for lid in li_ids:
            assert f"({lid})" not in sub, "lineitem scan inside a broadcast"


def test_q19_broadcasts_filtered_part_only(spark):
    """Q19's broadcast side is `part` pre-filtered by the part-only
    arm disjunction: the filter reaches the part scan as a pushed
    predicate, and lineitem is never on the build side (at sf100 an
    unfiltered part broadcast is a driver OOM)."""
    plan = _plan(QUERIES["q19_disjunctive"](spark, SF))
    part_scan = _scan_block(plan, "part")
    pushed = [l for l in part_scan.splitlines() if "PushedFilters" in l]
    assert pushed and "p_brand" in pushed[0], part_scan
    li_ids = _scan_ids(plan, "lineitem")
    subs = _broadcast_subtrees(plan)
    assert subs, "expected a BroadcastExchange"
    for sub in subs:
        for lid in li_ids:
            assert f"({lid})" not in sub, "lineitem scan inside a broadcast"


def test_driver_rotation_head_is_intact():
    """The driver hash-checks only the first 50 queries() entries, so
    the rotation head must stay exactly as planned and every rotated
    name must exist with an oracle — an accidental re-order silently
    drops hard-gate coverage."""
    from pagerank_using_mapreduce_spark.plans.registry import (
        _DRIVER_ROTATION,
        ORACLE_SQL,
        QUERIES,
    )

    names = list(QUERIES)
    # Rotation may name additions before they land; the head must be
    # exactly the implemented subset of the rotation, in order — this
    # pins the FULL 50-slot composition (VERDICT r06 #6), not just a
    # prefix: every rotated name, in rotation order, leads queries().
    implemented = [n for n in _DRIVER_ROTATION if n in QUERIES]
    assert names[: len(implemented)] == implemented
    assert list(ORACLE_SQL) == names  # oracle table mirrors query order
    assert set(implemented) <= set(ORACLE_SQL)
    # r11 additions are a hard requirement in the first slots — they
    # have no driver row before r11 (VERDICT r08 #3's rule).
    additions = [
        "x133_variant_stats_sampled", "c6_trained_curation",
        "x134_png_decode", "x135_normalized_dedup",
        "z21_stream_png_decode", "x136_dsir_resample",
        "x137_embedding_contamination", "z22_stream_dsir_score",
        "z23_stream_contamination", "c7_dsir_curation",
        "x138_boilerplate_removal", "x139_lsh_contamination",
        "z24_stream_boilerplate", "c8_scrub_curation",
    ]
    assert names[: len(additions)] == additions
    # the head must fill all 50 driver slots (anything less wastes
    # hash-gate coverage; anything more silently drops the tail)
    assert len(implemented) == 50, len(implemented)
    # The r10-overflow r05 remnants must lead the staleness refresh
    # this round (COVERAGE.md "Computed r11 rotation head").
    overflow = [
        "z12_stream_moments", "x67_orc_roundtrip", "x68_dataset_profile",
        "x69_pixel_decode", "x70_pixel_resize",
    ]
    assert names[14:19] == overflow


def test_x94_vocab_join_shape(spark):
    """Pins x94's skew-free vocab-join plan (VERDICT r07 #1): the r07
    '3.2x regression' was measured to be a transient host-load window
    in one bench session (driver's same-day record: 0.42 s ~= r06's
    0.40; isolation today: same), not a plan change — this test makes
    any FUTURE plan drift visible.  Invariants: no cartesian product;
    anything on a broadcast build side is post-aggregation (vocab- or
    doc-scale), never the raw exploded token stream; the word-freq
    aggregate shuffles on word and the per-doc aggregates on doc_id
    (hapax keys are globally unique by construction, so the word join
    is skew-free at any corpus size)."""
    plan = _plan(QUERIES["x94_rare_token_docs"](spark, SF))
    assert "CartesianProduct" not in plan
    for sub in _broadcast_subtrees(plan):
        assert "HashAggregate" in sub, (
            "raw token stream on a broadcast build side:\n" + sub
        )
    assert "hashpartitioning(word" in plan
    assert "hashpartitioning(doc_id" in plan


def test_partsupp_filter_precedes_explode(spark):
    """q2's part-side filters are applied BEFORE the 4x partsupp
    explode: the type/size predicates reach the part parquet scan as
    pushed filters (an explode-then-filter plan would fan out every
    part row first)."""
    plan = _plan(QUERIES["q2_min_cost_supplier"](spark, SF))
    part_scan = _scan_block(plan, "part")
    pushed = [l for l in part_scan.splitlines() if "PushedFilters" in l]
    assert pushed and "p_type" in pushed[0] and "p_size" in pushed[0], part_scan
    assert "Generate" in plan  # the explode is present


def test_q21_aggregates_instead_of_self_joining(spark):
    """q21 collapses EXISTS/NOT-EXISTS into one per-order aggregation:
    exactly one lineitem scan in the plan (the self-join formulation
    would need two or three), and lineitem is never on a broadcast
    build side."""
    plan = _plan(QUERIES["q21_waiting_supplier"](spark, SF))
    li_ids = _scan_ids(plan, "lineitem")
    assert len(li_ids) == 1, f"expected one lineitem scan, got {li_ids}"
    for sub in _broadcast_subtrees(plan):
        assert f"({li_ids[0]})" not in sub, "lineitem scan inside a broadcast"


def test_global_position_ops_avoid_single_partition(spark):
    """The distributed-prefix-sum family (packing, curriculum order,
    quantile bins) must never compile to an Exchange SinglePartition —
    that would be the naive global window (the reference's 1-reducer
    sort reborn), the exact bottleneck these operators exist to avoid."""
    for name in (
        "x45_sequence_packing",
        "x49_curriculum_order",
        "x29_quantile_bins",
    ):
        plan = _plan(QUERIES[name](spark, SF))
        assert "Exchange SinglePartition" not in plan, name


def test_paragraph_dedup_shuffles_on_digest_not_text(spark):
    """x60's scale claim, asserted: every hash-partitioned exchange in
    the plan is keyed on para_hash / doc_id — the text column never
    appears in any Exchange's output schema."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        augment_docs,
        paragraph_dedup,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        paragraph_dedup(augment_docs(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(para_hash" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line, line


def test_concurrency_timeline_golden(spark):
    """Two users: A [t0, t0+10m], B [t0+5m, t0+15m] overlap 5 minutes
    -> max_active 2 in t0's hour; C alone two days later -> 1.  Also
    pins the two-level prefix-sum carry: B's session crossing the hour
    boundary raises the NEXT hour's carry-in."""
    import datetime as dt

    from pagerank_using_mapreduce_spark.plans.relational import (
        concurrency_timeline,
        interval_overlap_counts,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 50, 0)

    def ev(eid, user, minutes, etype="click"):
        return (
            eid,
            t0 + dt.timedelta(minutes=minutes),
            user,
            etype,
            1.0,
            "{}",
        )

    rows = [
        ev(1, 1, 0),
        ev(2, 1, 10),          # A: [10:50, 11:00]
        ev(3, 2, 5),
        ev(4, 2, 15),          # B: [10:55, 11:05] crosses the hour
        ev(5, 3, 2 * 24 * 60), # C alone, two days later
        ev(6, 2, 8, "purchase"),  # during A and B -> n_active 2
        ev(7, 3, 2 * 24 * 60, "purchase"),  # only C's session -> 1
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    tl = {r["hour"]: r["max_active"] for r in concurrency_timeline(events).collect()}
    h0 = int(t0.timestamp()) // 3600
    assert tl[h0] == 2, tl
    # At 11:00.000000 BOTH A and B are still active (A closes at
    # 11:00.000001 under the e+1 inclusive-close convention): the hour's
    # peak is the inherited carry-in, not carry + a negative in-hour max.
    assert tl[h0 + 1] == 2, tl
    assert tl[h0 + 48] == 1, tl
    # dense spine: marker-less hours report the inherited level (0 here
    # between B's close and C's session) instead of being absent
    assert tl[h0 + 2] == 0, tl
    assert tl[h0 + 24] == 0, tl
    ov = {
        r["purchase_id"]: r["n_active"]
        for r in interval_overlap_counts(events).collect()
    }
    assert ov == {6: 2, 7: 1}, ov


def test_d4_accounting_conserves_rows(spark):
    from pagerank_using_mapreduce_spark.plans.relational import d4_forget_users
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = d4_forget_users(spark, sf).collect()
    total = load_table(spark, sf, "events").count()
    assert sum(r["n_before"] for r in out) == total
    assert all(r["n_after"] == r["n_before"] - r["n_deleted"] for r in out)
    assert any(r["n_deleted"] > 0 for r in out), "deletion set must bite"


def test_w7_prefix_sum_is_two_level(spark):
    """w7's scale claim: running sums over EVENT-scale data are
    partitioned (by user for sessionization, by hour for the level-1
    sweep); the only single-partition exchange feeds the carry-in
    window over the bounded one-row-per-hour relation.  Also pins the
    single-derivation shape: sessionization must appear ONCE (the
    unionAll form planned the whole subtree twice)."""
    plan = _plan(QUERIES["w7_concurrency"](spark, SF))
    assert "windowspecdefinition(hour" in plan  # level-1 per-hour sum
    # the only single-partition exchange feeds the bounded
    # one-row-per-hour relation (carry-in window / spine bounds agg) —
    # never event-scale data
    assert plan.count("SinglePartition") == 1, plan.count("SinglePartition")
    # exactly one user-keyed sessionization subtree: the lag window
    # over (user_id, ts, event_id) appears once
    assert plan.count("lag(") == 1, plan.count("lag(")


def test_x79_shard_manifest_distributed_rank(spark):
    """x79's global by-length rank must ride range partitions + the
    per-partition window — never a single-partition window over the
    document relation.  with_global_position eagerly checkpoints its
    result (cache-release fix), which cuts the lineage the registry
    query's plan would show — so inspect the op's LAZY form, the exact
    plan the checkpoint evaluates."""
    from pyspark.sql import functions as F

    from pagerank_using_mapreduce_spark.operators.ranking import (
        with_global_position,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    lazy = with_global_position(
        docs.select("doc_id", F.length("text").alias("len")),
        [F.desc("len"), F.asc("doc_id")],
        materialize=False,
    )
    plan = _plan(lazy)
    assert "rangepartitioning" in plan
    # the rank window partitions by _pid (parallel positions)
    assert "windowspecdefinition(_pid" in plan
    # no window with an empty partition spec over doc-scale data: every
    # windowspecdefinition carries a partition column
    import re as _re

    for m in _re.finditer(r"windowspecdefinition\(([^,]+),", plan):
        assert m.group(1).strip().startswith("_pid"), m.group(0)
    # and the registry query built on it stays free of single-partition
    # exchanges downstream of the checkpoint
    outer = _plan(QUERIES["x79_shard_manifest"](spark, SF))
    assert "SinglePartition" not in outer


def test_x77_epoch_shuffle_sharded_windows(spark):
    """x77: one exchange on (epoch, shard) + one window partitioned by
    (epoch, shard) — the loader shuffle with no global sort."""
    plan = _plan(QUERIES["x77_epoch_shuffle"](spark, SF))
    assert "windowspecdefinition(epoch" in plan
    assert "SinglePartition" not in plan
    assert "rangepartitioning" not in plan  # no global sort anywhere


def test_w8_bucket_is_integer_msb(spark):
    """w8's log2 bucket must equal floor(log2(gap)) computed in exact
    integer arithmetic — total gaps conserved across buckets."""
    import math

    from pyspark.sql import functions as FF

    from pagerank_using_mapreduce_spark.plans.relational import w8_gap_histogram
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    rows = w8_gap_histogram(spark, SF).collect()
    for r in rows:
        assert r["log2_bucket"] >= -1
    # conservation: sum == number of (user, type) consecutive pairs
    ev = load_table(spark, SF, "events")
    n_pairs = (
        ev.groupBy("user_id", "event_type")
        .agg((FF.count("*") - 1).alias("p"))
        .agg(FF.sum("p"))
        .collect()[0][0]
    )
    assert sum(r["n_gaps"] for r in rows) == n_pairs
    # spot-check the msb arithmetic on known values
    for gap, want in ((1, 0), (2, 1), (3, 1), (4, 2), (1023, 9), (1024, 10)):
        assert len(bin(gap)) - 3 == want == int(math.floor(math.log2(gap)))


def test_d5_psi_identical_halves_is_zero(spark):
    """PSI of a distribution against itself must be ~0: feed d5's
    machinery the SAME half twice by checking that each per-type PSI
    on real data is small (parity halves of one generator) and
    non-negative up to quantization, and that a planted shift is
    detected.  The planted test constructs events where half 1's
    values are pushed into the top bucket — PSI must exceed the
    classic 0.25 'significant shift' threshold."""
    import datetime as dt

    from pyspark.sql import functions as FF

    from pagerank_using_mapreduce_spark.plans.relational import d5_drift_psi

    real = d5_drift_psi(spark, SF).collect()
    assert real, "per-type rows expected"
    for r in real:
        # PSI is >= 0 mathematically; each quantized contribution can
        # round down by at most 1e-6 (small-sample types at sf0.001
        # legitimately read high — ~200 events/type gives PSI noise of
        # the same order as the classic 0.25 threshold, so no upper
        # bound is asserted on real data)
        assert r["psi_e6"] >= -10, r

    t0 = dt.datetime(2024, 1, 1)

    def events_of(vals):
        rows = [
            (i, t0, 1, "click", float(v), "{}") for i, v in enumerate(vals)
        ]
        return spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )

    import shutil
    import tempfile

    # identical halves: p == q in every bucket -> PSI exactly 0
    same = events_of([10.0 if i % 4 < 2 else 490.0 for i in range(400)])
    # shifted halves: even ids (half 0) low, odd ids (half 1) high
    shift = events_of([10.0 if i % 2 == 0 else 490.0 for i in range(400)])
    for ev, pred in ((same, lambda p: p == 0), (shift, lambda p: p > 250_000)):
        d = tempfile.mkdtemp(prefix="psi_case_")
        try:
            ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
            got = {
                r["event_type"]: r["psi_e6"]
                for r in d5_drift_psi(spark, d).collect()
            }
            assert pred(got["click"]), got
        finally:
            shutil.rmtree(d, ignore_errors=True)


def test_x106_audit_budget_is_bounded_in_plan(spark):
    """VERDICT r06 #2 done-criterion: the audit election compiles to
    TakeOrderedAndProject (bottom-k, O(P*k) driver merge — a fixed row
    budget at any collection size) and the collection is never
    hash-shuffled on vec_id (queries broadcast, the x5 shape)."""
    plan = _plan(QUERIES["x106_label_noise"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning(vec_id" not in plan


def test_x108_hot_shingle_join_is_salted_in_plan(spark):
    """VERDICT r06 #3 done-criterion: the hot-shingle candidate join
    carries the salt columns as join keys — per-key candidates are
    bounded by cap² regardless of shingle df."""
    plan = _plan(QUERIES["x108_setsim_join"](spark, SF))
    assert "salt_p" in plan and "salt_q" in plan


def test_x123_keep_best_plan_shape(spark):
    """Pins the quality-canonical plan: no cartesian product, and the
    corpus-scale relations (the quality-score side and the label
    relation) never land on a broadcast build side — the argmax is a
    canonical_id-keyed window over uniform keys, and the scores join
    is an id-keyed shuffle.  Tiny broadcast sides (the pair-graph
    fixpoint's label relation is pair-members-only at this sf, and
    AQE may legitimately broadcast it) must at least be
    post-aggregation/post-join, never the raw token stream."""
    plan = _plan(QUERIES["x123_quality_canonical"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    for sub in _broadcast_subtrees(plan):
        assert "Generate" not in sub, (
            "exploded token stream on a broadcast build side:\n" + sub
        )


def test_x124_bucket_stats_plan_shape(spark):
    """Pins the bucket-occupancy audit's safety property: a pure
    aggregate pipeline — no collect_list, no pair explosion, no join
    at all (the reason the audit is safe to run at any skew before
    arming the lsh_candidates fuse)."""
    plan = _plan(QUERIES["x124_lsh_bucket_stats"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "collect_list" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_oracle_sweep_shards_partition_registry():
    """The sharded round-close sweep (tools/check_oracle.py --shard=i/K)
    must be a COMPLETE DISJOINT partition of the registry for any K —
    a dropped name would silently lose sweep coverage, an overlap
    wastes the wall-clock the sharding exists to bound."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        os.path.join(os.path.dirname(__file__), "..", "tools", "check_oracle.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pagerank_using_mapreduce_spark.plans.registry import QUERIES

    for k in (1, 3, 5):
        shards = [mod._shard_names(i, k) for i in range(k)]
        union = set().union(*shards)
        assert union == set(QUERIES)
        assert sum(len(s) for s in shards) == len(QUERIES)  # disjoint
        # cost balance: LPT can't leave a shard grossly overloaded by
        # COUNT (cost weights differ, so allow 2x the even share)
        if k > 1:
            assert max(len(s) for s in shards) <= 2 * len(QUERIES) // k


def test_x138_scrub_is_exchange_free(spark):
    """Pins x138's headline scale property: given the fitted hot list,
    the scrub pass is a fully NARROW doc-local rewrite — zero
    exchanges, so document text never shuffles at any corpus size.
    (The hot-set fit is the separate digest-only wide pass.)"""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        remove_boilerplate,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    plan = _plan(remove_boilerplate(docs, ["deadbeef"]))
    assert "Exchange" not in plan


def test_x139_eval_band_side_broadcasts(spark):
    """Pins x139's candidate-generation shape: with auto-broadcast
    DISABLED, the band-keyed candidate join is still a broadcast join
    — only the explicit hint can do that — and the build side's
    subtree carries the EVAL-split filter (its train arm folds to
    false), so the corpus-scale train band relation never shuffles or
    broadcasts for candidates.  (A bare 'BroadcastHashJoin in plan'
    check would stay green via AQE auto-broadcast at test scale even
    with the hint removed.)"""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(QUERIES["x139_lsh_contamination"](spark, SF))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    blocks = {}
    for b in plan.split("\n\n"):
        m = re.match(r"\((\d+)\) (\w+)", b.strip())
        if m:
            blocks[m.group(1)] = b.strip()
    # the candidate join is hint-broadcast on the band keys
    bhj = [b for b in blocks.values()
           if b.startswith("(") and "BroadcastHashJoin" in b.splitlines()[0]
           and "band#" in b]
    assert bhj, "no broadcast band-keyed candidate join under hint-only"
    # exactly one band-table broadcast build, and it is the EVAL side
    exch = [i for i, b in blocks.items()
            if "BroadcastExchange" in b.splitlines()[0]
            and "band#" in b and "bucket#" in b]
    assert len(exch) == 1, exch
    tree = plan.split("\n\n")[0].splitlines()

    def indent(line):
        m = re.search(r"[^\s:+\-]", line)
        return m.start() if m else 0

    sub = []
    for i, line in enumerate(tree):
        if f"BroadcastExchange ({exch[0]})" in line:
            d = indent(line)
            for nxt in tree[i + 1:]:
                if indent(nxt) <= d:
                    break
                sub.append(nxt)
    filt_ids = [m.group(1) for line in sub
                for m in [re.search(r"Filter \((\d+)\)", line)] if m]
    assert any("THEN false" in blocks[i] for i in filt_ids), (
        "band broadcast build side is not the eval-split slice"
    )
