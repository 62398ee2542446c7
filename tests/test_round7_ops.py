"""Goldens for the round-7 operators: x109 winnowing fingerprints,
x110 duplicated-span coverage, x111 label-agreement kappa, d6 KS
drift.  Each is checked against a hand-computed (or exact python
replay) expectation on a tiny fixture — the engine-vs-engine hash gate
lives in the DuckDB oracles; these pin the SEMANTICS."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cpus=4, shuffle_partitions=4, app_name="test_r7")
    yield s


# ---------------------------------------------------------------------------
# x109 winnowing
# ---------------------------------------------------------------------------


def _py_winnow(text: str, k: int, w: int) -> set[tuple[int, str]]:
    """Exact python replay of the operator: k-gram md5s, per-window
    min with rightmost tie-break, distinct selections."""
    toks = [t for t in "".join(
        c if c.isalpha() else " " for c in text.lower()
    ).split() if t]
    grams = [
        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
    ]
    hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    sel: set[tuple[int, str]] = set()
    for s in range(len(hs) - w + 1):
        window = hs[s : s + w]
        mh = min(window)
        # rightmost position of the min within the window
        p = s + max(i for i, h in enumerate(window) if h == mh)
        sel.add((p + 1, hs[p]))
    return sel


def test_x109_winnow_matches_python_replay(spark):
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon",
        "one two three four five six seven one two three four five",
        "tiny doc",  # < k + w - 1 tokens: no full window, no output
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict[int, set] = {}
    for r in winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    assert got.get(0) == _py_winnow(texts[0], WINNOW_K, WINNOW_W)
    assert got.get(1) == _py_winnow(texts[1], WINNOW_K, WINNOW_W)
    assert 2 not in got


def test_x109_shared_run_guarantee(spark):
    """Two docs sharing a run of >= w + k - 1 tokens must share a
    fingerprint HASH (the winnowing coverage guarantee); positions may
    differ."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    shared = "red orange yellow green blue indigo violet ultra"  # 8 = w+k-1
    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee " + shared + " ff gg hh"),
            (2, shared + " zz yy xx ww vv uu tt"),
        ],
        "doc_id long, text string",
    )
    fps: dict[int, set] = {1: set(), 2: set()}
    for r in winnow_fingerprints(docs).collect():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2], "shared 8-token run must share a fingerprint"


# ---------------------------------------------------------------------------
# x110 duplicated-span coverage
# ---------------------------------------------------------------------------


def test_x110_dup_span_golden(spark):
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        dup_span_coverage,
    )

    # docs 1 and 2 share tokens 1-6 ("common one two three four five"):
    # two duplicated 5-grams covering positions 1..6 in each; doc 3 is
    # all-unique
    docs = spark.createDataFrame(
        [
            (1, "common one two three four five alpha beta gamma delta"),
            (2, "common one two three four five zeta eta theta iota"),
            (3, "lonely words that repeat nowhere else at all here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dup_span_coverage(docs).collect()}
    assert got[1]["n_tokens"] == 10 and got[1]["covered"] == 6
    assert got[1]["dup_frac_e6"] == 600_000
    assert got[2]["covered"] == 6 and got[2]["dup_frac_e6"] == 600_000
    assert got[3]["covered"] == 0 and got[3]["dup_frac_e6"] == 0


def test_x110_within_doc_repeat_counts(spark):
    """A 5-gram repeated WITHIN one doc also marks coverage (corpus
    occurrence count > 1, not distinct-doc count)."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        dup_span_coverage,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e x a b c d e"), (2, "totally unrelated words here now")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dup_span_coverage(docs).collect()}
    # "a b c d e" occurs twice in doc 1 -> covers positions 1-5 and 7-11
    assert got[1]["n_tokens"] == 11 and got[1]["covered"] == 10
    assert got[2]["covered"] == 0


# ---------------------------------------------------------------------------
# x111 label-agreement kappa
# ---------------------------------------------------------------------------


def test_x111_kappa_golden(spark):
    """3 clean label-0 vectors, 3 clean label-1 vectors, one label-1
    vector sitting in cluster 0: confusion = {(0,0):3, (1,1):3,
    (1,0):1} -> kappa = (7*6 - 24) / (49 - 24) = 0.72 exactly."""
    from pagerank_using_mapreduce_spark.operators.similarity import (
        label_agreement_kappa,
    )

    rows = [(i, [1.0, 0.0], 0) for i in range(3)]
    rows += [(3 + i, [0.0, 1.0], 1) for i in range(3)]
    rows += [(6, [1.0, 0.01], 1)]  # mislabeled: lands in cluster 0
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    r = label_agreement_kappa(emb).collect()[0]
    assert r["n"] == 7 and r["n_agree"] == 6
    assert r["po_e6"] == 857_143  # 6/7
    assert r["pe_e6"] == 489_796  # 24/49
    assert r["kappa_e6"] == 720_000  # 18/25

    plan = label_agreement_kappa(emb)._jdf.queryExecution().explainString(
        emb.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # centroids broadcast TO the scan; the collection never shuffles
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_x111_perfect_agreement_is_one(spark):
    from pagerank_using_mapreduce_spark.operators.similarity import (
        label_agreement_kappa,
    )

    rows = [(i, [1.0, 0.0], 0) for i in range(3)]
    rows += [(3 + i, [0.0, 1.0], 1) for i in range(3)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    r = label_agreement_kappa(emb).collect()[0]
    assert r["n_agree"] == 6 and r["kappa_e6"] == 1_000_000


# ---------------------------------------------------------------------------
# d6 KS drift
# ---------------------------------------------------------------------------


def test_d6_ks_golden(spark):
    """Identical halves -> KS 0; disjoint supports -> KS 1; a known
    partial shift -> the hand-computed sup gap."""
    from pagerank_using_mapreduce_spark.plans.relational import ks_drift

    rows = []
    # type a: ref {1,2,3} (even ids), cur {1,2,3} (odd ids) -> ks 0
    for i, v in enumerate([1.0, 1.0, 2.0, 2.0, 3.0, 3.0]):
        rows.append((i, "a", v))
    # type b: ref {1,1,2}, cur {3,3,4} -> disjoint -> ks 1
    for j, (v_ref, v_cur) in enumerate([(1.0, 3.0), (1.0, 3.0), (2.0, 4.0)]):
        rows.append((100 + 2 * j, "b", v_ref))
        rows.append((101 + 2 * j, "b", v_cur))
    # type c: ref {1,2}, cur {1,3}: gaps at v=1:0, v=2: |2*2-1*2|=2,
    # v=3: 0 -> ks = 2/4 = 0.5
    rows += [(200, "c", 1.0), (201, "c", 1.0), (202, "c", 2.0), (203, "c", 3.0)]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    got = {r["event_type"]: r for r in ks_drift(ev).collect()}
    assert got["a"]["ks_e6"] == 0
    assert got["b"]["ks_e6"] == 1_000_000
    assert got["c"]["ks_e6"] == 500_000
    assert got["b"]["n_ref"] == 3 and got["b"]["n_cur"] == 3


# ---------------------------------------------------------------------------
# x112 image aHash
# ---------------------------------------------------------------------------


def test_x112_ahash_matches_generative_replay(spark):
    """The mapInPandas byte-walk aHash must equal a python replay of
    the generative pixel formula — assembly, padding, decode and the
    exact-integer mean threshold all have to line up."""
    from pagerank_using_mapreduce_spark.operators.multimodal import (
        RASTER_MAX_H,
        RASTER_MAX_W,
        ahash_images,
        binarize_raster,
    )

    docs = spark.createDataFrame(
        [(5, "abc"), (11, "hello world"), (42, "x")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in ahash_images(binarize_raster(docs)).collect()}
    for doc_id, text in [(5, "abc"), (11, "hello world"), (42, "x")]:
        blen = len(text.encode())
        w = blen % RASTER_MAX_W + 1
        h = (blen * 7) % RASTER_MAX_H + 1
        lm = [
            299 * ((x * 7 + r * 11 + doc_id * 3) % 256)
            + 587 * ((x * 13 + r * 29 + doc_id * 7) % 256)
            + 114 * ((x * 31 + r * 17 + doc_id) % 256)
            for r in range(h)
            for x in range(w)
        ]
        total, n = sum(lm), len(lm)
        bits = "".join("1" if v * n > total else "0" for v in lm)
        r = got[doc_id]
        assert (r["width"], r["height"]) == (w, h)
        assert r["ahash"] == bits and r["n_ones"] == bits.count("1")


# ---------------------------------------------------------------------------
# x113 winnow contamination
# ---------------------------------------------------------------------------


def test_x113_finds_planted_leaks(spark):
    """augment_docs' near-dup copies are verbatim leaks of their source
    (plus a tail): every eval doc must pair with exactly its source at
    a high shared-fingerprint count, and unrelated docs must not pair."""
    from pagerank_using_mapreduce_spark.plans.extensions import (
        q_x113_winnow_contamination,
    )
    from pagerank_using_mapreduce_spark.operators.dedup import (
        NEAR_DUP_OFFSET,
        augment_docs,
    )
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    # letters-only tokens: the tokenizer strips digits, so f"a{i}"-style
    # names would collapse into one repeated word
    abc = "abcdefghijkl"
    words_a = " ".join(f"alpha{c} beta{c} gamma{c}" for c in abc)
    words_b = " ".join(f"delta{c} eps{c} zeta{c}" for c in abc)
    docs = spark.createDataFrame(
        [(10, words_a), (20, words_b), (3, "short unrelated words here")],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(augment_docs(docs))
    train = fps.where(F.col("doc_id") < NEAR_DUP_OFFSET).select(
        F.col("doc_id").alias("train_doc"), "fp"
    )
    ev = fps.where(F.col("doc_id") >= NEAR_DUP_OFFSET).select(
        F.col("doc_id").alias("eval_doc"), "fp"
    )
    pairs = {
        (r["train_doc"], r["eval_doc"]): r["n_shared"]
        for r in train.join(ev, "fp")
        .groupBy("train_doc", "eval_doc")
        .agg(F.countDistinct("fp").alias("n_shared"))
        .where(F.col("n_shared") >= 2)
        .collect()
    }
    assert (10, 10 + NEAR_DUP_OFFSET) in pairs
    assert (20, 20 + NEAR_DUP_OFFSET) in pairs
    # no cross-contamination between unrelated sources
    assert (10, 20 + NEAR_DUP_OFFSET) not in pairs
    assert (20, 10 + NEAR_DUP_OFFSET) not in pairs


# ---------------------------------------------------------------------------
# e11 conversion-lag percentiles
# ---------------------------------------------------------------------------


def test_e11_lag_percentiles_golden(spark):
    """10 conversions with lags 1..10 s: nearest-rank p50 = 5,
    p90 = 9, p99 = 10; a purchase outside the window is dropped;
    a purchase picks its MOST RECENT prior click."""
    import datetime as dt

    from pagerank_using_mapreduce_spark.plans.relational import (
        ATTRIBUTION_WINDOW_S,
        conversion_lag_percentiles,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0
    for u in range(1, 11):  # user u: click at t0, purchase at t0 + u s
        rows.append((eid, u, "click", t0)); eid += 1
        rows.append((eid, u, "purchase", t0 + dt.timedelta(seconds=u))); eid += 1
    # user 50: an EARLIER click then a later one 3 s before purchase —
    # the as-of must use the most recent (lag 3, not 600)
    rows.append((eid, 50, "click", t0)); eid += 1
    rows.append((eid, 50, "click", t0 + dt.timedelta(seconds=597))); eid += 1
    rows.append((eid, 50, "purchase", t0 + dt.timedelta(seconds=600))); eid += 1
    # user 99: click far outside the window -> no conversion row
    rows.append((eid, 99, "click", t0)); eid += 1
    rows.append(
        (eid, 99, "purchase",
         t0 + dt.timedelta(seconds=ATTRIBUTION_WINDOW_S + 60))
    ); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    r = conversion_lag_percentiles(ev).collect()[0]
    # lags: 1..10 plus user 50's 3 -> n=11; sorted: 1,2,3,3,4,...,10
    assert r["n_conv"] == 11
    assert r["p50_s"] == 5  # rank ceil(0.5*11)=6 -> 6th smallest = 5
    assert r["p90_s"] == 9  # rank 10 -> 9
    assert r["p99_s"] == 10


# ---------------------------------------------------------------------------
# x114 duplicated-span removal
# ---------------------------------------------------------------------------


def test_x114_removal_golden(spark):
    """Covered positions are excised and the survivor stream
    fingerprinted; a fully-duplicated doc cleans to the empty hash."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        dup_span_removal,
    )

    same = "aa bb cc dd ee"
    docs = spark.createDataFrame(
        [
            (1, "common one two three four five alpha beta gamma delta"),
            (2, "common one two three four five zeta eta theta iota"),
            (3, same),
            (4, same),  # exact pair: every position covered
            (5, "all unique tokens nothing shared anywhere at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dup_span_removal(docs).collect()}
    assert got[1]["kept_tokens"] == 4
    assert got[1]["cleaned_fp"] == hashlib.md5(
        b"alpha beta gamma delta"
    ).hexdigest()
    assert got[3]["kept_tokens"] == 0
    assert got[3]["cleaned_fp"] == hashlib.md5(b"").hexdigest()
    assert got[5]["kept_tokens"] == got[5]["n_tokens"] == 8
    assert got[5]["cleaned_fp"] == hashlib.md5(
        b"all unique tokens nothing shared anywhere at all"
    ).hexdigest()


# ---------------------------------------------------------------------------
# z17 streaming KS
# ---------------------------------------------------------------------------


def test_z17_stream_equals_batch_d6(spark):
    """The drained streaming KS grid finished with ks_from_counts must
    row-for-row equal the batch d6 on the same input."""
    from pagerank_using_mapreduce_spark.plans.extensions import q_z17_stream_ks
    from pagerank_using_mapreduce_spark.plans.relational import d6_ks_drift

    sf = "/root/testdata/sf0.001"
    stream_rows = sorted(
        tuple(r) for r in q_z17_stream_ks(spark, sf).collect()
    )
    batch_rows = sorted(tuple(r) for r in d6_ks_drift(spark, sf).collect())
    assert stream_rows == batch_rows and stream_rows


# ---------------------------------------------------------------------------
# z18 streaming attribution
# ---------------------------------------------------------------------------


def test_z18_out_of_order_click_corrects_attribution(spark, tmp_path):
    """A click delivered in a LATER micro-batch than its purchase must
    retroactively correct the attribution (order-insensitive state);
    the final per-purchase answer equals the batch as-of rule."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pagerank_using_mapreduce_spark.streaming import events as se

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, kind, sec):
        return {
            "event_id": eid,
            "ts": t0 + dt.timedelta(seconds=sec),
            "user_id": uid,
            "event_type": kind,
            "value": 1.0,
            "props": "{}",
        }

    # batch a: user 1's purchase BEFORE its click arrives; user 2 in order
    batch_a = [ev(100, 1, "purchase", 50), ev(201, 2, "click", 10),
               ev(200, 2, "purchase", 20)]
    # batch b: user 1's click (ts before the purchase) arrives late;
    # plus a too-old click for user 3's purchase
    batch_b = [ev(101, 1, "click", 40), ev(301, 3, "click", 0),
               ev(300, 3, "purchase", 0 + 3000)]
    d = tmp_path / "z18_split"
    d.mkdir()
    schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("props", pa.string())]
    )
    pq.write_table(pa.Table.from_pylist(batch_a, schema=schema), d / "a.parquet")
    pq.write_table(pa.Table.from_pylist(batch_b, schema=schema), d / "b.parquet")

    latest: dict = {}

    def collect(batch_df, _bid):
        for r in batch_df.collect():
            latest[r["event_id"]] = r["attributed_click_id"]

    stream = se.attribution_stream(
        se.read_event_stream(spark, str(d), max_files_per_trigger=1),
        window_s=1800,
    )
    se.run_foreach_batch(stream, collect, output_mode="update")

    assert latest[100] == 101  # corrected by the late click
    assert latest[200] == 201  # in-order attribution
    assert latest[300] == -1   # click outside the 1800 s window


# ---------------------------------------------------------------------------
# g17 local bridges
# ---------------------------------------------------------------------------


def test_g17_local_bridges_golden(spark):
    """p1/p2/p3 co-cite t (a K3 — no edge there is a bridge); p4
    shares only t2 with p1: the (p1, p4) edge closes no triangle and
    is the one local bridge, carrying deg(p1)=3, deg(p4)=1."""
    from pagerank_using_mapreduce_spark.operators.graph import local_bridges

    pages = spark.createDataFrame(
        [
            ("p1", ["t", "t2"]),
            ("p2", ["t"]),
            ("p3", ["t"]),
            ("p4", ["t2"]),
            ("t", []),
            ("t2", []),
        ],
        "title string, links array<string>",
    )
    got = {(r["a"], r["b"]): (r["deg_a"], r["deg_b"])
           for r in local_bridges(pages).collect()}
    assert got == {("p1", "p4"): (3, 1)}


# ---------------------------------------------------------------------------
# x115 audio energy contour
# ---------------------------------------------------------------------------


def test_x115_audio_contour_matches_generative_replay(spark):
    """The byte-walk contour equals a python replay of the generative
    sample formula, including window assignment and the n < W edge."""
    from pagerank_using_mapreduce_spark.operators.multimodal import (
        CONTOUR_WINDOWS,
        WAV_MAX_SAMPLES,
        audio_contour,
        binarize_audio,
    )

    docs = spark.createDataFrame(
        [(7, "hello"), (13, "a longer text body here"), (99, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in audio_contour(binarize_audio(docs)).collect()}
    for doc_id, text in [(7, "hello"), (13, "a longer text body here"), (99, "")]:
        n = len(text.encode()) % WAV_MAX_SAMPLES + 1
        vals = [
            ((i * 37 + doc_id * 11) % 65536) - 65536
            if ((i * 37 + doc_id * 11) % 65536) >= 32768
            else ((i * 37 + doc_id * 11) % 65536)
            for i in range(n)
        ]
        w = min(CONTOUR_WINDOWS, n)
        e = [0] * w
        for i, v in enumerate(vals):
            e[(i * w) // n] += v * v
        bits = "".join("1" if e[j] > e[j - 1] else "0" for j in range(1, w))
        r = got[doc_id]
        assert r["n_samples"] == n and r["n_windows"] == w
        assert r["contour"] == bits


# ---------------------------------------------------------------------------
# x116 LSH recall vs exact truth
# ---------------------------------------------------------------------------


def test_x116_lsh_pairs_are_subset_of_exact(spark):
    """Both pipelines verify the same exact-Jaccard threshold, so the
    LSH pair set must be a SUBSET of the AllPairs ground truth (the
    only possible error is a banding miss), and the audit row's counts
    must be consistent."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        augment_docs,
        near_dup_pipeline,
        setsim_join,
    )
    from pagerank_using_mapreduce_spark.plans.extensions import (
        q_x116_lsh_recall,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    docs = augment_docs(
        load_table(spark, "/root/testdata/sf0.001", "documents").select(
            "doc_id", "text"
        ).limit(150)
    )
    exact = {(r["doc_a"], r["doc_b"])
             for r in setsim_join(docs, num=1, den=2).collect()}
    lsh = {(r["doc_a"], r["doc_b"])
           for r in near_dup_pipeline(docs).collect()}
    assert lsh <= exact and exact

    r = q_x116_lsh_recall(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_found"] + r["n_missed"] == r["n_exact"]
    assert 0 <= r["recall_e6"] <= 1_000_000


def test_x111_single_label_kappa_is_null(spark):
    """pe = 1 (one label everywhere) makes kappa UNDEFINED: the
    column must be NULL, never a NaN-cast 0 (DuckDB's 0/0 is NULL)."""
    from pagerank_using_mapreduce_spark.operators.similarity import (
        label_agreement_kappa,
    )

    emb = spark.createDataFrame(
        [(i, [1.0, 0.01 * i], 5) for i in range(4)],
        "vec_id long, embedding array<float>, label int",
    )
    r = label_agreement_kappa(emb).collect()[0]
    assert r["n"] == 4 and r["n_agree"] == 4
    assert r["po_e6"] == 1_000_000 and r["pe_e6"] == 1_000_000
    assert r["kappa_e6"] is None


def test_d6_one_sided_type_is_null(spark):
    """An event_type whose events all share one event_id parity has an
    empty sample on one side: KS is UNDEFINED -> NULL, not 0."""
    from pagerank_using_mapreduce_spark.plans.relational import ks_drift

    ev = spark.createDataFrame(
        [(0, "only_ref", 1.0), (2, "only_ref", 2.0), (4, "only_ref", 3.0)],
        "event_id long, event_type string, value double",
    )
    r = ks_drift(ev).collect()[0]
    assert r["n_ref"] == 3 and r["n_cur"] == 0
    assert r["ks_e6"] is None


# ---------------------------------------------------------------------------
# w12 hour-of-week profile
# ---------------------------------------------------------------------------


def test_w12_hourweek_anchor_and_shares(spark):
    """2024-01-01 is a Monday: midnight UTC must land in slot 0 and
    Tuesday 05:00 in slot 29; shares sum to ~1e6 per type and the peak
    slot ties to the smallest how."""
    import datetime as dt

    from pagerank_using_mapreduce_spark.plans.relational import (
        hourweek_profile,
    )

    mon = dt.datetime(2024, 1, 1, 0, 30, tzinfo=dt.timezone.utc)
    tue5 = dt.datetime(2024, 1, 2, 5, 10, tzinfo=dt.timezone.utc)
    rows = [(1, "a", mon), (2, "a", mon), (3, "a", tue5), (4, "b", tue5)]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    got = {(r["event_type"], r["how"]): r for r in hourweek_profile(ev).collect()}
    assert got[("a", 0)]["n"] == 2 and got[("a", 0)]["share_e6"] == 666_667
    assert got[("a", 29)]["n"] == 1
    assert got[("a", 0)]["peak_how"] == 0 == got[("a", 29)]["peak_how"]
    assert got[("b", 29)]["share_e6"] == 1_000_000
    assert got[("b", 29)]["peak_how"] == 29


# ---------------------------------------------------------------------------
# x117 product quantization
# ---------------------------------------------------------------------------


def test_x117_pq_exact_when_quantization_is_lossless(spark):
    """Served with a codebook that contains every sub-vector exactly,
    ADC == the exact e6 dot product for every (query, vector) pair —
    the zero-distortion identity (in-line training on so degenerate a
    fixture can collapse cells when md5 seeding draws two identical
    sub-vectors, so the frozen-codebook serving path is the right
    surface for this property)."""
    from pagerank_using_mapreduce_spark.operators.similarity import (
        pq_topk,
    )

    # 4-dim vectors, 2 subspaces of 2 dims; sub-vectors drawn from
    # {(1,0), (0,2)} in each subspace -> 4 distinct combos, repeated
    subs = [(1.0, 0.0), (0.0, 2.0)]
    rows = []
    vid = 0
    for a in subs:
        for b in subs:
            for _ in range(2):
                rows.append((vid, list(a) + list(b)))
                vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = [[list(s) for s in subs], [list(s) for s in subs]]
    out = pq_topk(emb, k=100, m_sub=2, books=books).collect()
    vecs = dict(rows)
    assert len(out) == 5 * 7  # N_QUERIES x (n - self)
    for r in out:
        q, v = vecs[r["query_id"]], vecs[r["vec_id"]]
        exact = sum(x * y for x, y in zip(q, v))
        assert r["adc_e6"] == round(exact * 1e6), r


def test_x117_serving_is_projection_only(spark):
    """After training, the serving path is one projection over the
    collection × a broadcast of the Q query tables: the ONLY hash
    exchange in the plan is the final per-query top-k window."""
    from pagerank_using_mapreduce_spark.plans.registry import QUERIES

    df = QUERIES["x117_pq_topk"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_z19_stream_equals_batch_w12(spark):
    """The drained streaming hour-of-week grid finished with
    hourweek_from_grid must row-for-row equal batch w12."""
    from pagerank_using_mapreduce_spark.plans.extensions import (
        q_z19_stream_hourweek,
    )
    from pagerank_using_mapreduce_spark.plans.relational import (
        w12_hourweek_profile,
    )

    sf = "/root/testdata/sf0.001"
    stream_rows = sorted(tuple(r) for r in q_z19_stream_hourweek(spark, sf).collect())
    batch_rows = sorted(tuple(r) for r in w12_hourweek_profile(spark, sf).collect())
    assert stream_rows == batch_rows and stream_rows


def test_z18_drain_last_write_wins_multibatch(spark, tmp_path):
    """ADVICE r07: the DRIVER drain path (run_available_now) must hold
    under multi-batch delivery, not only the single-file staging dir —
    with ``last_write_key`` the drained table keeps each event_id's
    LAST emission, so duplicate/contradictory re-emissions from
    update-mode re-attribution collapse to the corrected answer."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pagerank_using_mapreduce_spark.streaming import events as se

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, kind, sec):
        return {
            "event_id": eid,
            "ts": t0 + dt.timedelta(seconds=sec),
            "user_id": uid,
            "event_type": kind,
            "value": 1.0,
            "props": "{}",
        }

    batch_a = [ev(100, 1, "purchase", 50), ev(201, 2, "click", 10),
               ev(200, 2, "purchase", 20)]
    batch_b = [ev(101, 1, "click", 40)]
    d = tmp_path / "z18_lww"
    d.mkdir()
    schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("props", pa.string())]
    )
    pq.write_table(pa.Table.from_pylist(batch_a, schema=schema), d / "a.parquet")
    pq.write_table(pa.Table.from_pylist(batch_b, schema=schema), d / "b.parquet")

    stream = se.attribution_stream(
        se.read_event_stream(spark, str(d), max_files_per_trigger=1),
        window_s=1800,
    )
    out = se.run_available_now(
        stream, "t_z18_lww", output_mode="update",
        last_write_key=["event_id"],
    ).collect()
    got = {r["event_id"]: r["attributed_click_id"] for r in out}
    assert len(out) == len(got), "duplicate event_id rows survived drain"
    assert got == {100: 101, 200: 201}
