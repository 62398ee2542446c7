"""Sampling/split/curation operators (operators/sampling.py,
text_analysis n-grams + redaction)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.operators.sampling import (
    hash_split,
    quantile_bins,
    stratified_sample,
)
from pagerank_using_mapreduce_spark.operators.text_analysis import (
    ngram_counts,
    redact_numbers,
)
from pagerank_using_mapreduce_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "key")


def test_hash_split_partitions_and_fractions(ids):
    out = hash_split(ids, "key").groupBy("split").count().collect()
    by = {r["split"]: r["count"] for r in out}
    assert set(by) == {"train", "val", "test"}
    assert sum(by.values()) == 2000
    # binomial(2000, 0.8) is within ±4 sigma of 1600 (~±72)
    assert 1520 <= by["train"] <= 1680
    assert 120 <= by["val"] <= 280


def test_hash_split_deterministic_and_seed_sensitive(ids):
    a = {r["key"]: r["split"] for r in hash_split(ids, "key").collect()}
    b = {r["key"]: r["split"] for r in hash_split(ids, "key").collect()}
    assert a == b
    c = {r["key"]: r["split"] for r in hash_split(ids, "key", seed="other").collect()}
    assert a != c  # a different seed must reshuffle assignments


def test_hash_split_rejects_bad_fractions(ids):
    with pytest.raises(ValueError):
        hash_split(ids, "key", {"train": 0.5, "test": 0.1})


def test_stratified_sample_rates_and_determinism(spark):
    df = spark.range(0, 3000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 3 == 0, "a").otherwise("b").alias("s"),
    )
    kept = stratified_sample(df, "s", {"a": 1.0, "b": 0.1}, key_col="key")
    by = {r["s"]: r["cnt"] for r in kept.groupBy("s").agg(F.count("*").alias("cnt")).collect()}
    assert by["a"] == 1000  # fraction 1.0 keeps every row
    assert 130 <= by.get("b", 0) <= 270  # ~200 ± 4 sigma
    # absent stratum → default 0.0 → dropped entirely
    none = stratified_sample(df, "s", {"a": 0.5}, key_col="key")
    assert none.where(F.col("s") == "b").count() == 0
    # determinism: same rows both evaluations
    k1 = sorted(r["key"] for r in kept.collect())
    k2 = sorted(r["key"] for r in kept.collect())
    assert k1 == k2


def test_quantile_bins_equi_depth(spark):
    df = spark.range(0, 1003).select(F.col("id").alias("v"))
    out = quantile_bins(df, [F.asc("v")], 10, out_col="b")
    sizes = {r["b"]: r["n"] for r in out.groupBy("b").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == set(range(1, 11))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # bins respect the order: every value in bin k < every value in k+1
    rows = out.select("b", "v").collect()
    hi = {}
    lo = {}
    for r in rows:
        hi[r["b"]] = max(hi.get(r["b"], -1), r["v"])
        lo[r["b"]] = min(lo.get(r["b"], 1 << 60), r["v"])
    for k in range(1, 10):
        assert hi[k] < lo[k + 1]


def test_ngram_counts_windows_and_edges(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "x"), (4, "")],
        ["doc_id", "text"],
    )
    out = {r["ngram"]: r["cnt"] for r in ngram_counts(df, 2).collect()}
    # 1-token and empty docs contribute nothing; no partial windows
    assert out == {"a b": 2, "b c": 1}
    tri = {r["ngram"]: r["cnt"] for r in ngram_counts(df, 3).collect()}
    assert tri == {"a b c": 1}
    with pytest.raises(ValueError):
        ngram_counts(df, 1)


def test_redact_numbers(spark):
    df = spark.createDataFrame(
        [("t", "id=123 x=45"), ("t", "id=123 x=45"), ("t", "none"), ("u", "9")],
        ["event_type", "props"],
    )
    out = {r["event_type"]: r for r in redact_numbers(df).collect()}
    assert out["t"]["total_runs"] == 4  # two runs in each duplicated payload
    assert out["t"]["n_events"] == 3
    # the two identical payloads redact identically; 'none' differs
    assert out["t"]["distinct_payloads"] == 2
    assert out["u"]["total_runs"] == 1


def test_weighted_mix_copies_and_determinism(spark):
    from pagerank_using_mapreduce_spark.operators.sampling import weighted_mix

    df = spark.range(0, 1000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 2 == 0, "up").otherwise("drop").alias("s"),
    )
    out = weighted_mix(df, "s", {"up": 2.5, "drop": 0.0}, key_col="key")
    by = {r["s"]: r["cnt"] for r in out.groupBy("s").agg(F.count("*").alias("cnt")).collect()}
    assert "drop" not in by  # weight 0 removes the stratum entirely
    # 500 'up' rows at 2.5x -> expected 1250, binomial(500, .5)+1000 within ±4σ
    assert 1150 <= by["up"] <= 1350
    # every key appears 2 or 3 times, copies numbered 1..n
    per_key = {
        r["key"]: sorted(r["copies"])
        for r in out.groupBy("key").agg(F.collect_list("copy").alias("copies")).collect()
    }
    assert all(c in ([1, 2], [1, 2, 3]) for c in per_key.values())
    # determinism across evaluations
    again = weighted_mix(df, "s", {"up": 2.5, "drop": 0.0}, key_col="key")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    with pytest.raises(ValueError):
        weighted_mix(df, "s", {"up": -1.0}, key_col="key")


def test_weighted_mix_default_weight_passthrough(spark):
    from pagerank_using_mapreduce_spark.operators.sampling import weighted_mix

    df = spark.range(0, 100).select(F.col("id").alias("key"), F.lit("other").alias("s"))
    out = weighted_mix(df, "s", {"x": 3.0}, key_col="key")  # 'other' -> default 1.0
    assert out.count() == 100
    assert out.agg(F.max("copy")).first()[0] == 1


def test_bottom_k_sample_fixed_size_deterministic(spark):
    """Exactly k rows, identical across re-evaluations and partition
    layouts, equal to the single-node bottom-k of the same hash."""
    import hashlib

    from pagerank_using_mapreduce_spark.operators.sampling import (
        bottom_k_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(
        r["doc_id"] for r in bottom_k_sample(docs, "doc_id", k=25).collect()
    )
    assert len(got) == 25
    rows = [r["doc_id"] for r in docs.select("doc_id").collect()]
    want = sorted(
        sorted(
            rows,
            key=lambda d: hashlib.md5(f"bk-0|{d}".encode()).hexdigest(),
        )[:25]
    )
    assert got == want
    again = sorted(
        r["doc_id"]
        for r in bottom_k_sample(docs.repartition(7), "doc_id", k=25).collect()
    )
    assert again == got


def test_bottom_k_sample_plan_is_take_ordered(spark):
    from pagerank_using_mapreduce_spark.operators.sampling import (
        bottom_k_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = bottom_k_sample(docs, "doc_id", k=25)._jdf.queryExecution().toString()
    assert "TakeOrderedAndProject" in plan


def test_bottom_k_per_group_balanced_and_deterministic(spark):
    """Exactly min(k, group size) rows per group; membership identical
    to the single-node per-group bottom-k of the same hash."""
    import hashlib
    from collections import defaultdict

    from pagerank_using_mapreduce_spark.operators.sampling import (
        bottom_k_per_group,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    k = 7
    got = defaultdict(set)
    for r in bottom_k_per_group(docs, "source", "doc_id", k=k).collect():
        got[r["source"]].add(r["doc_id"])
    by_src = defaultdict(list)
    for r in docs.select("source", "doc_id").collect():
        by_src[r["source"]].append(r["doc_id"])
    for src, ids in by_src.items():
        want = set(
            sorted(
                ids,
                key=lambda d: hashlib.md5(f"bkg-0|{d}".encode()).hexdigest(),
            )[:k]
        )
        assert got[src] == want, src
        assert len(got[src]) == min(k, len(ids))


def test_curriculum_order_interleaves_by_weight(spark):
    """With sources of weight 1 and 4, the first appearances follow the
    rational schedule r/w: among the earliest 2*(4+1) scheduled rows,
    the weight-4 source supplies ~4x the rows of the weight-1 source;
    positions are a 1..N permutation; result is partition-invariant."""
    from pyspark.sql import functions as F

    from pagerank_using_mapreduce_spark.operators.sampling import (
        curriculum_order,
    )

    rows = [(f"d{i}", "heavy" if i % 2 == 0 else "light") for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "source"])
    w = F.when(F.col("source") == "heavy", 4).otherwise(1)
    out = curriculum_order(df, "source", "id", weight=w).collect()
    assert sorted(r["pos"] for r in out) == list(range(1, 201))
    head = [r["source"] for r in sorted(out, key=lambda r: r["pos"])[:10]]
    assert head.count("heavy") == 8 and head.count("light") == 2
    # partition invariance
    out2 = curriculum_order(df, "source", "id", weight=w, num_partitions=3).collect()
    assert {tuple(r) for r in out} == {tuple(r) for r in out2}


def test_curriculum_order_sql_twin_agrees(spark):
    import duckdb

    from pyspark.sql import functions as F

    from pagerank_using_mapreduce_spark.operators.sampling import (
        curriculum_order,
        curriculum_order_sql,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = sorted(
        (int(r.pos), r.source, int(r.id))
        for _, r in con.execute(
            curriculum_order_sql(
                "documents", "source", "doc_id",
                "CAST(substring(source, 4) AS INT) % 4 + 1",
            )
        ).df().iterrows()
    )
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = sorted(
        (r["pos"], r["source"], r["id"])
        for r in curriculum_order(
            docs, "source", "doc_id",
            weight=F.expr("CAST(substring(source, 4) AS INT) % 4 + 1"),
        ).collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# Temperature-scaled mixture rebalancing
# ---------------------------------------------------------------------------


def test_temperature_mix_smallest_group_keeps_all(spark):
    from pagerank_using_mapreduce_spark.operators.sampling import (
        temperature_mix,
        temperature_mix_summary,
    )

    rows = [(i, "big") for i in range(900)] + [
        (i + 10_000, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "key long, grp string")
    summ = {
        r["grp"]: r for r in temperature_mix_summary(df, "grp", "key").collect()
    }
    assert summ["small"]["n_after"] == 100  # thr = 65536 keeps every row
    assert summ["small"]["thr"] == 65536
    # big group's keep-rate ~ sqrt(100/900) = 1/3
    assert summ["big"]["thr"] == int((100 / 900) ** 0.5 * 65536)
    assert 230 <= summ["big"]["n_after"] <= 370  # ±4σ around 300
    # membership is deterministic
    a = sorted(r["key"] for r in temperature_mix(df, "grp", "key").collect())
    b = sorted(r["key"] for r in temperature_mix(df, "grp", "key").collect())
    assert a == b


# ---------------------------------------------------------------------------
# Paragraph-grain exact dedup
# ---------------------------------------------------------------------------


def test_paragraph_dedup_first_occurrence_wins(spark):
    from pagerank_using_mapreduce_spark.operators.dedup import paragraph_dedup

    para_a = " ".join(["alpha"] * 10)
    para_b = " ".join(["beta"] * 10)
    para_c = " ".join(["gamma"] * 10)
    docs = spark.createDataFrame(
        [
            (1, f"{para_a} {para_b}"),     # both kept (first occurrence)
            (2, f"{para_b} {para_c}"),     # para_b dropped, para_c kept
            (3, para_a),                   # dropped entirely
            (4, "tail words only"),        # short partial window, kept
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert (out[1]["n_paras"], out[1]["n_kept"], out[1]["n_dropped"]) == (2, 2, 0)
    assert (out[2]["n_kept"], out[2]["n_dropped"]) == (1, 1)
    assert (out[3]["n_kept"], out[3]["n_dropped"]) == (0, 1)
    assert (out[4]["n_paras"], out[4]["n_kept"]) == (1, 1)


def test_paragraph_dedup_within_doc_repeats(spark):
    from pagerank_using_mapreduce_spark.operators.dedup import paragraph_dedup

    para = " ".join(["rep"] * 10)
    docs = spark.createDataFrame(
        [(7, f"{para} {para} {para}")], "doc_id long, text string"
    )
    row = paragraph_dedup(docs).collect()[0]
    # the doc repeats its own paragraph: only the first window survives
    assert (row["n_paras"], row["n_kept"], row["n_dropped"]) == (3, 1, 2)


# ---------------------------------------------------------------------------
# Bigram lift (collocation mining)
# ---------------------------------------------------------------------------


def test_bigram_lift_golden(spark):
    from pagerank_using_mapreduce_spark.operators.text_analysis import bigram_lift

    # "new york" always adjacent (5x); filler words never repeat a pair
    text = "new york " * 5 + "a b c d e f g h i j"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = bigram_lift(docs, min_count=5, top_k=10).collect()
    assert out, "collocation must survive the min_count filter"
    top = out[0]
    assert (top["left"], top["right"]) == ("new", "york")
    # N = 20 tokens, B = 19 bigrams, cnt(new,york)=5, cnt(new)=cnt(york)=5:
    # lift = (5/19) / ((5/20)*(5/20)) = 4.2105...
    assert top["lift_e6"] == int((5 / 19) / ((5 / 20) * (5 / 20)) * 1e6 + 0.5000001)


# ---------------------------------------------------------------------------
# Per-user purchase outliers (integer-exact 2-sigma rule)
# ---------------------------------------------------------------------------


def test_purchase_outliers_golden(spark):
    from pagerank_using_mapreduce_spark.plans.relational import (
        e8_purchase_outliers,
    )
    import datetime as dt
    import tempfile

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: five 10.0s and one 100.0 -> the 100 is > 2 sigma out
    # (with only FOUR 10s the extreme lands exactly ON the 2-sigma
    # boundary — dev^2 == 4*var — and the strict > excludes it)
    for i, v in enumerate([10.0, 10.0, 10.0, 10.0, 10.0, 100.0]):
        rows.append((i, t0, 1, "purchase", v, "{}"))
    # user 2: uniform values, never an outlier
    for i, v in enumerate([5.0, 5.0, 5.0, 5.0, 5.0]):
        rows.append((100 + i, t0, 2, "purchase", v, "{}"))
    # user 3: too few purchases for the rule to fire
    rows.append((200, t0, 3, "purchase", 999.0, "{}"))
    # non-purchase events are ignored even when extreme
    rows.append((300, t0, 1, "view", 1e6, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        out = e8_purchase_outliers(spark, d).collect()
    assert [(r["event_id"], r["user_id"]) for r in out] == [(5, 1)]


def test_attribution_golden(spark):
    """Last-touch attribution: nearest click at-or-before within 30
    min wins; same-timestamp clicks break ties to the LARGEST click
    id; clicks outside the window or after the purchase never match."""
    from pagerank_using_mapreduce_spark.plans.relational import e9_attribution
    import datetime as dt
    import tempfile

    t = lambda m: dt.datetime(2024, 1, 1, 12, m)
    rows = [
        # user 1: click 10 min before -> attributed
        (1, t(0), 1, "click", 0.0, "{}"),
        (2, t(10), 1, "purchase", 5.0, "{}"),
        # user 2: only click is 40 min before -> outside window
        (3, t(0), 2, "click", 0.0, "{}"),
        (4, t(40), 2, "purchase", 5.0, "{}"),
        # user 3: two clicks at the same instant as the purchase -> max id
        (5, t(5), 3, "click", 0.0, "{}"),
        (6, t(5), 3, "click", 0.0, "{}"),
        (7, t(5), 3, "purchase", 5.0, "{}"),
        # user 4: click strictly after the purchase -> no match
        (8, t(20), 4, "purchase", 5.0, "{}"),
        (9, t(25), 4, "click", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        out = {r["event_id"]: r["attributed_click_id"]
               for r in e9_attribution(spark, d).collect()}
    assert out == {2: 1, 4: -1, 7: 6, 8: -1}


def test_running_actives_golden(spark):
    """Cumulative new-user curve: users counted on their FIRST day only."""
    from pagerank_using_mapreduce_spark.plans.relational import w5_running_actives
    import datetime as dt
    import tempfile

    d1, d2, d3 = (dt.datetime(2024, 1, k, 10) for k in (1, 2, 3))
    rows = [
        (1, d1, 10, "view", 0.0, "{}"),
        (2, d1, 11, "view", 0.0, "{}"),
        (3, d2, 10, "view", 0.0, "{}"),   # returning, not new
        (4, d2, 12, "view", 0.0, "{}"),
        (5, d3, 13, "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        out = [(r["day"], r["new_users"], r["cum_users"])
               for r in w5_running_actives(spark, d).orderBy("day").collect()]
    assert out == [("2024-01-01", 2, 2), ("2024-01-02", 1, 3), ("2024-01-03", 1, 4)]


def test_merge_upsert_golden(spark):
    """CDC apply: latest-seq change wins; deletes drop the row;
    upserts on unseen keys insert; untouched keys survive as 'kept'."""
    from pagerank_using_mapreduce_spark.plans.relational import d3_merge_upsert
    import tempfile

    cust = spark.createDataFrame(
        [(1, "n", "a", 1, "p", 10.0, "s", "c"),
         (2, "n", "a", 1, "p", 20.0, "s", "c"),
         (3, "n", "a", 1, "p", 30.0, "s", "c")],
        "c_custkey long, c_name string, c_address string, c_nationkey long, "
        "c_phone string, c_acctbal double, c_mktsegment string, c_comment string",
    )
    # urgent orders: custkey 1 gets two upserts (seq 11 then 21 wins),
    # custkey 2 a delete (seq 18, %10>=8), custkey 9 an insert (seq 31)
    orders = spark.createDataFrame(
        [(11, 1, "O", 111.0, "1994-01-01", "1-URGENT", "c", 0, "x"),
         (21, 1, "O", 222.0, "1994-01-02", "1-URGENT", "c", 0, "x"),
         (18, 2, "O", 999.0, "1994-01-03", "1-URGENT", "c", 0, "x"),
         (31, 9, "O", 333.0, "1994-01-04", "1-URGENT", "c", 0, "x"),
         (41, 3, "O", 444.0, "1994-01-05", "3-MEDIUM", "c", 0, "x")],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate string, o_orderpriority string, o_clerk string, "
        "o_shippriority long, o_comment string",
    )
    with tempfile.TemporaryDirectory() as d:
        cust.write.parquet(f"{d}/customer.parquet")
        orders.write.parquet(f"{d}/orders.parquet")
        out = {r["c_custkey"]: (r["bal_c2"], r["status"])
               for r in d3_merge_upsert(spark, d).collect()}
    assert out == {
        1: (22200, "updated"),   # seq 21 wins over seq 11
        3: (3000, "kept"),       # MEDIUM order is not in the feed
        9: (33300, "inserted"),
    }  # custkey 2 deleted


def test_source_keywords_golden(spark):
    """A word concentrated in one source tops that source's list with
    lift > 1; per-source lists are capped and ranked deterministically."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        source_keywords,
    )

    common = "the and of to in " * 4   # shared background
    docs = spark.createDataFrame(
        [(1, common + "quantum quantum quantum quantum quantum", "s1"),
         (2, common + "banana banana banana banana banana", "s2")],
        "doc_id long, text string, source string",
    )
    out = [(r["source"], r["word"], r["rnk"], r["lift_e6"])
           for r in source_keywords(docs, per_source=2, min_count=5).collect()]
    top = {s: w for s, w, r, _ in out if r == 1}
    assert top == {"s1": "quantum", "s2": "banana"}
    assert all(l > 1_000_000 for s, w, r, l in out if r == 1)
    assert max(r for _, _, r, _ in out) <= 2


def test_hourly_ohlc_golden(spark):
    """open = value of the earliest event in the bucket, close = the
    latest (event_id breaks timestamp ties); low/high independent."""
    from pagerank_using_mapreduce_spark.plans.relational import w6_hourly_ohlc
    import datetime as dt
    import tempfile

    t = lambda m, s=0: dt.datetime(2024, 1, 1, 9, m, s)
    rows = [
        (1, t(5), 1, "click", 30.0, "{}"),
        (2, t(1), 1, "click", 10.0, "{}"),   # earliest -> open
        (3, t(59), 1, "click", 20.0, "{}"),  # latest -> close
        (4, t(30), 1, "click", 99.0, "{}"),  # high
        # same-timestamp tie: larger event_id wins close
        (5, t(59), 1, "view", 1.0, "{}"),
        (6, t(59), 1, "view", 2.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        out = {r["event_type"]: r for r in w6_hourly_ohlc(spark, d).collect()}
    c = out["click"]
    assert (c["open_v3"], c["close_v3"], c["low_v3"], c["high_v3"], c["n"]) == (
        10000, 20000, 10000, 99000, 4
    )
    v = out["view"]
    assert (v["open_v3"], v["close_v3"]) == (1000, 2000)


def test_debounce_golden(spark):
    """Bursts within the gap are suppressed relative to the immediately
    PRECEDING event (kept or not); a real gap re-admits; other keys
    unaffected."""
    from pagerank_using_mapreduce_spark.plans.relational import e10_debounce
    import datetime as dt
    import tempfile

    t = lambda m: dt.datetime(2024, 1, 1, 9, m)
    rows = [
        (1, t(0), 1, "click", 0.0, "{}"),    # kept (first)
        (2, t(5), 1, "click", 0.0, "{}"),    # 5 min after #1 -> dropped
        (3, t(11), 1, "click", 0.0, "{}"),   # 6 min after #2 -> dropped
        (4, t(30), 1, "click", 0.0, "{}"),   # 19 min after #3 -> kept
        (5, t(2), 1, "view", 0.0, "{}"),     # different type -> kept
        (6, t(3), 2, "click", 0.0, "{}"),    # different user -> kept
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        kept = sorted(r["event_id"] for r in e10_debounce(spark, d).collect())
    assert kept == [1, 4, 5, 6]


# ---------------------------------------------------------------------------
# epoch_shuffle
# ---------------------------------------------------------------------------


def test_epoch_shuffle_is_a_permutation_per_epoch(spark):
    from pagerank_using_mapreduce_spark.operators.sampling import (
        EPOCH_SHARDS,
        epoch_shuffle,
    )

    docs = load_table(spark, SF, "documents")
    out = epoch_shuffle(docs, "doc_id").collect()
    n = docs.count()
    keys = {r["doc_id"] for r in docs.select("doc_id").collect()}
    for e in (1, 2):
        rows = [r for r in out if r["epoch"] == e]
        assert len(rows) == n
        assert {r["key"] for r in rows} == keys, "every doc exactly once"
        by_shard = {}
        for r in rows:
            assert 0 <= r["shard"] < EPOCH_SHARDS
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        for shard, poss in by_shard.items():
            assert sorted(poss) == list(range(1, len(poss) + 1)), (
                "positions must be contiguous within a shard"
            )
        # hash-balanced: no shard more than 2x the ideal share at n=500
        assert max(len(v) for v in by_shard.values()) <= 2 * n / EPOCH_SHARDS


def test_epoch_shuffle_epochs_differ_and_rerun_stable(spark):
    from pagerank_using_mapreduce_spark.operators.sampling import epoch_shuffle

    docs = load_table(spark, SF, "documents")
    a = epoch_shuffle(docs, "doc_id")
    order = {
        (r["epoch"], r["shard"], r["pos"]): r["key"] for r in a.collect()
    }
    again = {
        (r["epoch"], r["shard"], r["pos"]): r["key"]
        for r in epoch_shuffle(docs.repartition(5), "doc_id").collect()
    }
    assert order == again, "pure function of (epoch, key)"
    e1 = [v for (e, s, p), v in sorted(order.items()) if e == 1]
    e2 = [v for (e, s, p), v in sorted(order.items()) if e == 2]
    assert e1 != e2, "epochs must present different orders"


def test_x136_dsir_replay_and_partition_invariance(spark):
    """The DSIR election is an exact Python replay (hashed-bigram
    importance log-weights + md5 Gumbel keys) and invariant under
    repartitioning — selection is a pure function of row content."""
    import hashlib
    import math
    import re
    from collections import Counter

    import pandas as pd

    from pagerank_using_mapreduce_spark.operators.sampling import (
        DSIR_BUCKETS,
        DSIR_GUMBEL_SEED,
        DSIR_KEEP_DEN,
        DSIR_TARGET,
        _DSIR_HEX,
        dsir_resample,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    got = sorted(
        (r["doc_id"], r["source"], r["n_feats"], r["total_lr_e6"], r["sel_e6"])
        for r in dsir_resample(docs).collect()
    )
    got_shuffled = sorted(
        (r["doc_id"], r["source"], r["n_feats"], r["total_lr_e6"], r["sel_e6"])
        for r in dsir_resample(docs.repartition(17)).collect()
    )
    assert got == got_shuffled and got

    def toks(text):
        return [
            t
            for t in re.sub(r"[^a-zA-Z]+", " ", text).strip().lower().split(" ")
            if t
        ]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:10], 16) % DSIR_BUCKETS

    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    feats = {}  # doc_id -> Counter(bucket)
    src = {}
    for _, r in pdf.iterrows():
        src[r["doc_id"]] = r["source"]
        t = toks(r["text"])
        if len(t) >= 2:
            feats[r["doc_id"]] = Counter(
                bucket(a + "#" + b) for a, b in zip(t, t[1:])
            )
    tc, rc = Counter(), Counter()
    for did, c in feats.items():
        (tc if src[did] in DSIR_TARGET else rc).update(c)
    T, R = sum(tc.values()), sum(rc.values())
    b = DSIR_BUCKETS
    lr = {
        i: math.floor(
            math.log(
                (float(tc[i] + 1) * float(R + b))
                / (float(rc[i] + 1) * float(T + b))
            )
            * 1e6
            + 0.5000001
        )
        for i in range(b)
    }
    rows = []
    for did, s in src.items():
        if s in DSIR_TARGET:
            continue
        c = feats.get(did, Counter())
        n_feats = sum(c.values())
        total = sum(cnt * lr[i] for i, cnt in c.items())
        h = hashlib.md5(f"{DSIR_GUMBEL_SEED}|{did}".encode()).hexdigest()
        v = int(h[:_DSIR_HEX], 16)
        u = (v + 1) / float(2 ** (4 * _DSIR_HEX) + 1)
        g = math.floor(-math.log(-math.log(u)) * 1e6 + 0.5000001)
        rows.append((did, s, n_feats, total, total + g))
    k = len(rows) // DSIR_KEEP_DEN
    want = sorted(sorted(rows, key=lambda r: (-r[4], r[0]))[:k])
    assert got == want


def test_x136_dsir_prefers_target_like_docs(spark):
    """With a strong vocabulary split, the kept raw docs are exactly
    the ones sharing the target domain's bigrams (the Gumbel noise is
    O(1e6·small) — far below the log-ratio separation here)."""
    from pagerank_using_mapreduce_spark.operators.sampling import (
        dsir_resample,
    )

    tgt_text = "alpha beta " * 30
    bad_text = "gamma delta " * 30
    rows = [(i, tgt_text, "en", "tgt", len(tgt_text)) for i in range(10)]
    # raw pool: ids 100-119 target-like, 200-279 off-domain -> k = 10
    rows += [(100 + i, tgt_text, "en", "raw", len(tgt_text)) for i in range(10)]
    rows += [(200 + i, bad_text, "en", "raw", len(bad_text)) for i in range(80)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    kept = dsir_resample(docs, target_sources=("tgt",), keep_den=9)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [100 + i for i in range(10)]


def test_z22_stream_dsir_drains_to_batch(spark):
    """The foreachBatch-scored document stream must drain to EXACTLY
    the batch dsir_score relation under the snapshot-fit model: per-doc
    scores are independent, so micro-batch partitioning cannot change
    a single row."""
    from pagerank_using_mapreduce_spark.operators.sampling import (
        dsir_model,
        dsir_score,
    )
    from pagerank_using_mapreduce_spark.plans.registry import QUERIES
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    drained = {
        tuple(r)
        for r in QUERIES["z22_stream_dsir_score"](spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents")
    batch = {
        tuple(r) for r in dsir_score(docs, dsir_model(docs)).collect()
    }
    assert drained == batch and drained


def test_c7_dsir_curation_composes_its_stages(spark):
    """The c7 manifest must equal the hand-composed chain of its three
    component operators (DSIR selection -> exact dedup canonical ->
    n-gram decontamination) — the composition pin; each component's
    own correctness is pinned by its registry oracle."""
    from pagerank_using_mapreduce_spark.operators.dedup import exact_dedup
    from pagerank_using_mapreduce_spark.operators.sampling import (
        dsir_resample,
    )
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        ngram_contamination,
    )
    from pagerank_using_mapreduce_spark.plans.registry import QUERIES
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    got = {
        r["source"]: (r["n_docs"], r["total_chars"])
        for r in QUERIES["c7_dsir_curation"](spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents")
    sel = {r["doc_id"] for r in dsir_resample(docs).collect()}
    kept = docs.where(docs.doc_id.isin(*sel))
    canon = {
        r["doc_id"]
        for r in exact_dedup(kept).where("is_canonical").collect()
    }
    contam = {
        r["doc_id"] for r in ngram_contamination(docs).collect()
    }
    clean = canon - contam
    want = {}
    for r in docs.where(docs.doc_id.isin(*clean)).collect():
        n, c = want.get(r["source"], (0, 0))
        want[r["source"]] = (n + 1, c + r["n_chars"])
    assert got == want and got
    assert clean != sel, "dedup/decontamination must actually bite"
