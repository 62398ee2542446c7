"""Round-6 operator tests: w9/st2/x92-x100/g13 property checks
(the oracle sweep is the value gate; these pin semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_w9_pieces_conserve_session_time(spark):
    from pagerank_using_mapreduce_spark.plans.relational import (
        _session_intervals,
        session_splice,
    )

    from pagerank_using_mapreduce_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    total_pieces = session_splice(ev).agg(F.sum("piece_us")).collect()[0][0]
    total_sessions = (
        _session_intervals(ev)
        .agg(F.sum(F.col("e") + 1 - F.col("s")))
        .collect()[0][0]
    )
    assert total_pieces == total_sessions


def test_st2_bag_identity(spark):
    """|A| = |A except all B| + |A intersect all B| — the multiset
    identity DISTINCT semantics break."""
    from pagerank_using_mapreduce_spark.plans.relational import st2_bag_ops

    from pagerank_using_mapreduce_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    n_a = ev.where(F.col("event_id") % 2 == 0).count()
    out = st2_bag_ops(spark, SF)
    sums = {
        r["side"]: r["n"]
        for r in out.groupBy("side").agg(F.sum("n").alias("n")).collect()
    }
    assert sums.get("surplus", 0) + sums.get("common", 0) == n_a


def test_x93_entropy_bounds(spark):
    import math

    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        doc_entropy,
    )

    rows = doc_entropy(_docs(spark)).collect()
    hi = math.log2(26) * 1e6 + 1
    assert rows and all(0 <= r["entropy_e6"] <= hi for r in rows)
    # a single-letter doc has zero entropy; a varied one doesn't
    toy = spark.createDataFrame(
        [(1, "aaaa aaa"), (2, "the quick brown fox jumps")],
        ["doc_id", "text"],
    )
    ent = {r["doc_id"]: r["entropy_e6"] for r in doc_entropy(toy).collect()}
    assert ent[1] == 0 and ent[2] > 2_000_000


def test_x96_percentiles_match_naive(spark):
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        length_percentiles,
    )
    from pagerank_using_mapreduce_spark.functions.textops import (
        strip_non_alpha,
        tokens,
    )

    docs = _docs(spark)
    got = {
        r["source"]: (r["p50"], r["p90"], r["p99"])
        for r in length_percentiles(docs).collect()
    }
    lens = (
        docs.select("source", F.size(tokens(strip_non_alpha(F.col("text")))).alias("n"))
        .collect()
    )
    import math
    from collections import defaultdict

    by_src = defaultdict(list)
    for r in lens:
        by_src[r["source"]].append(r["n"])
    for src, vals in by_src.items():
        vals.sort()
        for p, want in zip((50, 90, 99), got[src]):
            naive = vals[math.ceil(p / 100 * len(vals)) - 1]
            assert want == naive, (src, p, want, naive)


def test_g13_truss_support_holds_among_survivors(spark):
    """Reported support is evaluated on the PRE-peel edge set of the
    last round, so for every survivor it is >= k-2 and an upper bound
    on its triangle count within the final survivor graph."""
    from pagerank_using_mapreduce_spark.operators.graph import (
        TRUSS_K,
        cocitation_edges,
        truss_edges,
    )
    from pagerank_using_mapreduce_spark.plans.registry import _pages

    out = truss_edges(cocitation_edges(_pages(spark, SF))).collect()
    edges = {(r["a"], r["b"]) for r in out}
    assert out, "truss must be non-empty on the co-citation graph"
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for r in out:
        common = adj[r["a"]] & adj[r["b"]]
        assert r["support"] >= TRUSS_K - 2
        assert len(common) <= r["support"], (r, len(common))


def test_x100_quantization_roundtrip_bound(spark):
    """|v - q*s/127| <= s/254 + codes within [-127, 127]."""
    from pagerank_using_mapreduce_spark.operators.similarity import (
        quantize_embeddings,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = quantize_embeddings(emb).collect()
    raw = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    import collections

    scales = collections.defaultdict(float)
    for v in raw.values():
        for i, x in enumerate(v):
            scales[i] = max(scales[i], abs(float(x)))
    for r in rows:
        codes = [int(c) for c in r["q_codes"].split(",")]
        assert len(codes) == r["n_dims"]
        assert all(-127 <= c <= 127 for c in codes)
        v = raw[r["vec_id"]]
        for i, (c, x) in enumerate(zip(codes, v)):
            s = scales[i]
            if s > 0:
                assert abs(float(x) - c * s / 127) <= s / 254 + 1e-9


def test_x98_cuts_match_reference_sad(spark):
    """The decoder's cuts must equal a pure-Python replay of the luma
    formula + SAD threshold (byte-walk fidelity; note mod-256 wrap can
    legitimately fire a cut on flicker-only frames — the SAD rule IS
    the semantics, both engines compute it identically)."""
    from pagerank_using_mapreduce_spark.operators.multimodal import (
        SCENE_CUT_SAD,
        binarize_video,
        scene_cuts,
    )

    rows = scene_cuts(binarize_video(_docs(spark))).collect()
    assert rows and any(r["n_cuts"] > 0 for r in rows)
    for r in rows:
        d = r["doc_id"]
        p, nf = d % 3 + 2, d % 5 + 4
        w, h = d % 8 + 2, d % 6 + 2

        def luma(f, x, y):
            return (x * 7 + y * 11 + d * 3 + (f % 2) + (f // p) * 97) % 256

        want = []
        for f in range(1, nf):
            sad = sum(
                abs(luma(f, x, y) - luma(f - 1, x, y))
                for x in range(w)
                for y in range(h)
            )
            if sad >= SCENE_CUT_SAD * w * h:
                want.append(f)
        got = [int(x) for x in r["cut_frames"].split(",") if x]
        assert got == want, (d, got, want)
        # every true scene boundary must be detected (the 97-shift
        # always dominates the threshold)
        bounds = [f for f in range(1, nf) if f // p != (f - 1) // p]
        assert set(bounds) <= set(got), (d, bounds, got)


def test_x95_flags_augmented_exact_dups(spark):
    from pagerank_using_mapreduce_spark.operators.dedup import (
        EXACT_DUP_OFFSET,
        INGEST_WINDOW,
        augment_docs,
        window_dedup_rate,
    )

    from pagerank_using_mapreduce_spark.operators.dedup import (
        NEAR_DUP_OFFSET,
    )

    out = window_dedup_rate(augment_docs(_docs(spark))).collect()
    # the exact-copy windows must be 100% dups
    hot = [r for r in out if r["win"] >= EXACT_DUP_OFFSET // INGEST_WINDOW]
    assert hot and all(r["dup_rate_e6"] == 1_000_000 for r in hot)
    # the base windows must be 0% dups (no duplicates in the raw table)
    base = [r for r in out if r["win"] < NEAR_DUP_OFFSET // INGEST_WINDOW]
    assert base and all(r["dup_rate_e6"] == 0 for r in base)


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_x100_scales_broadcast_not_shuffled(spark):
    """The embedding collection must NOT shuffle for quantization: the
    only exchanges feed the bounded per-dim scale aggregate; the scales
    relation comes back as a broadcast."""
    from pagerank_using_mapreduce_spark.plans.registry import QUERIES

    plan = _plan(QUERIES["x100_quantize_embeddings"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # no hash-shuffle of the embeddings relation keyed on vec_id
    assert "hashpartitioning(vec_id" not in plan


def test_x94_hapax_join_is_not_broadcast(spark):
    """The hapax set is vocab-scale (Heaps' law) — it must ride a
    shuffle join on word, never a broadcast (which would OOM the
    executors at 100 TB).  Guard: no broadcast hint survives into the
    hapax join side."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        rare_token_docs,
    )

    plan = _plan(rare_token_docs(_docs(spark)))
    # the doc-words <-> hapax join keys on word via shuffle
    assert "hashpartitioning(word" in plan


def test_x92_iceberg_filter_after_partial_agg(spark):
    """The HAVING threshold must sit above the aggregate (tail dies in
    the partial agg), and lang totals must broadcast."""
    from pagerank_using_mapreduce_spark.plans.registry import QUERIES

    plan = _plan(QUERIES["x92_stratified_iceberg"](spark, SF))
    assert "BroadcastExchange" in plan
    assert "hashpartitioning(lang" in plan


def test_x93_doc_entropy_no_shuffle(spark):
    """Column-only op: zero exchanges in the whole plan."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        doc_entropy,
    )

    plan = _plan(doc_entropy(_docs(spark)))
    assert "Exchange" not in plan


def test_z16_stream_screen_equals_batch_x56(spark):
    """The foreachBatch streaming screen must drain to exactly the
    batch incremental screen's pair relation."""
    from pagerank_using_mapreduce_spark.plans.extensions import (
        q_x56_incremental_dedup,
        q_z16_stream_index_screen,
    )

    got = sorted(
        (r["new_doc"], r["existing_doc"], r["jaccard_e6"])
        for r in q_z16_stream_index_screen(spark, SF).collect()
    )
    want = sorted(
        (r["new_doc"], r["existing_doc"], r["jaccard_e6"])
        for r in q_x56_incremental_dedup(spark, SF).collect()
    )
    assert got == want and got


# ---------------------------------------------------------------- round 6b


def test_g14_adamic_adar_known_graph(spark):
    """A->C, A->D, B->C, B->D: undirected, {A,B} share {C,D} and
    {C,D} share {A,B}; neither pair is linked, every z has deg 2, so
    both pairs score 2 * floor(1e9/ln 2 + 0.5000001)."""
    import math

    from pagerank_using_mapreduce_spark.operators.graph import adamic_adar

    pages = spark.createDataFrame(
        [("a", ["c", "d"]), ("b", ["c", "d"]), ("c", []), ("d", [])],
        "title string, links array<string>",
    )
    got = {(r["a"], r["b"]): r for r in adamic_adar(pages).collect()}
    term = math.floor(1e9 / math.log(2.0) + 0.5000001)
    assert set(got) == {("a", "b"), ("c", "d")}
    for r in got.values():
        assert r["n_common"] == 2 and r["aa_e9"] == 2 * term


def test_g14_existing_edges_and_hubs_excluded(spark):
    """A linked pair never appears even with shared neighbors, and a
    common neighbor above the degree cap generates no pairs."""
    from pagerank_using_mapreduce_spark.operators.graph import adamic_adar

    # a-b linked AND sharing c, d: the (a, b) candidate must be dropped
    pages = spark.createDataFrame(
        [("a", ["b", "c", "d"]), ("b", ["c", "d"]), ("c", []), ("d", [])],
        "title string, links array<string>",
    )
    got = {(r["a"], r["b"]) for r in adamic_adar(pages).collect()}
    assert ("a", "b") not in got
    assert ("c", "d") in got  # c, d share a AND b (both deg >= 2)

    # star: hub z with 70 leaves (deg > cap) -> no pair rides through z
    leaves = [f"l{i:02d}" for i in range(70)]
    star = spark.createDataFrame(
        [("hub", leaves)] + [(l, []) for l in leaves],
        "title string, links array<string>",
    )
    assert adamic_adar(star).count() == 0


def test_x102_gopher_repetition_exact(spark):
    """'x y x y x y' has trigrams [x y x, y x y, x y x, y x y]: 4
    occurrences, 2 distinct, dup_frac = 1/2, top_share = 1/2."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        gopher_repetition,
    )

    docs = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "all fresh words here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_repetition(docs).collect()}
    assert got[1]["n_grams"] == 4 and got[1]["n_distinct"] == 2
    assert got[1]["dup_frac_e6"] == 500_000
    assert got[1]["top_share_e6"] == 500_000
    assert got[2]["dup_frac_e6"] == 0
    assert got[2]["top_share_e6"] == 500_000  # 2 distinct trigrams


def test_x103_bigram_ppl_exact_tiny_corpus(spark):
    """Corpus 'a b' + 'a b': bigram (a,b) c12=2, ctx c1=2, V=2 ->
    P = 3/4; both docs score xent = -ln(3/4), e6-quantized."""
    import math

    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        bigram_perplexity,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in bigram_perplexity(docs).collect()}
    logp_e6 = math.floor(math.log(3.0 / 4.0) * 1e6 + 0.5000001)
    for d in (1, 2):
        assert rows[d]["n_pairs"] == 1
        assert rows[d]["total_logp_e6"] == logp_e6
        assert rows[d]["xent_e6"] == -logp_e6  # floor(-x/1) == -x here


def test_x103_model_join_is_shuffle_keyed_on_gram(spark):
    """The bigram model is vocab²-scale — the scoring join must key on
    the gram pair via shuffle, never broadcast the model (the x94
    guard, one level up from single words)."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        bigram_perplexity,
    )

    plan = _plan(bigram_perplexity(_docs(spark), materialize=False))
    assert "hashpartitioning(w1" in plan


def test_w10_grid_lower_median_golden(spark):
    """Lower median by nearest rank: odd group -> middle, even group
    -> lower of the two middles."""
    from pagerank_using_mapreduce_spark.plans.relational import (
        _grid_lower_median,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 9), ("b", 1), ("b", 2), ("b", 3), ("b", 9)],
        "event_type string, v long",
    )
    got = {r["event_type"]: r["med"] for r in _grid_lower_median(df, "v").collect()}
    assert got == {"a": 2, "b": 2}  # b: rank (4+1) div 2 = 2 -> value 2


def test_w10_outlier_rule_replay(spark):
    """Every flagged row satisfies the integer MAD rule and a Python
    replay over the raw parquet agrees on the flagged id set."""
    import math
    from collections import defaultdict

    import pandas as pd

    from pagerank_using_mapreduce_spark.plans.relational import (
        MAD_K,
        w10_mad_outliers,
    )

    out = w10_mad_outliers(spark, SF).collect()
    for r in out:
        assert r["dev_c"] == abs(r["v_c"] - r["med_c"])
        assert r["dev_c"] > math.floor(r["mad_c"] * MAD_K + 0.5000001)

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["v_c"] = (ev["value"] * 100 + 0.5000001).apply(math.floor).astype(int)
    want = set()
    for t, g in ev.groupby("event_type"):
        vs = sorted(g["v_c"])
        med = vs[(len(vs) + 1) // 2 - 1]
        devs = sorted(abs(v - med) for v in vs)
        mad = devs[(len(devs) + 1) // 2 - 1]
        thr = math.floor(mad * MAD_K + 0.5000001)
        want |= {
            int(r["event_id"])
            for _, r in g.iterrows()
            if abs(r["v_c"] - med) > thr
        }
    assert {r["event_id"] for r in out} == want and want


def test_x104_weighted_sample_replay_and_stability(spark):
    """The elected set is an exact Python replay of the A-ES election
    (md5-uniform, key ln(u)/n_chars) and is invariant under
    repartitioning (pure function of the row key)."""
    import hashlib
    import math
    from collections import defaultdict

    import pandas as pd

    from pagerank_using_mapreduce_spark.operators.sampling import (
        AES_K,
        AES_SEED,
        _AES_HEX,
        weighted_sample_per_group,
    )

    docs = _docs(spark)
    got = {
        (r["source"], r["doc_id"]): r["rk"]
        for r in weighted_sample_per_group(docs).collect()
    }
    got_shuffled = {
        (r["source"], r["doc_id"]): r["rk"]
        for r in weighted_sample_per_group(docs.repartition(17)).collect()
    }
    assert got == got_shuffled and got

    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    keys = defaultdict(list)
    for _, r in pdf.iterrows():
        if r["n_chars"] <= 0:
            continue
        h = hashlib.md5(f"{AES_SEED}|{r['doc_id']}".encode()).hexdigest()
        v = int(h[:_AES_HEX], 16)
        key = math.log((v + 1) / 2 ** (4 * _AES_HEX)) / r["n_chars"]
        keys[r["source"]].append((-key, r["doc_id"]))
    want = {}
    for src, lst in keys.items():
        for i, (_, did) in enumerate(sorted(lst)[:AES_K], start=1):
            want[(src, did)] = i
    assert got == want


def test_x105_zipf_golden_power_law(spark):
    """freqs 24/12/8/6 at ranks 1..4 are an exact 1/rank law: slope
    -1, r2 ~ 1 (e3 log quantization leaves < 0.1% error)."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        zipf_slope,
    )

    text = " ".join(["aa"] * 24 + ["bb"] * 12 + ["cc"] * 8 + ["dd"] * 6)
    docs = spark.createDataFrame(
        [(1, text, "zz")], "doc_id long, text string, lang string"
    )
    row = zipf_slope(docs).collect()
    assert len(row) == 1 and row[0]["n_types"] == 4
    assert -1_010_000 < row[0]["slope_e6"] < -990_000
    assert row[0]["r2_e6"] > 999_000


def test_g15_local_clustering_golden(spark):
    """p1/p2/p3 co-cite t (a K3); p4 shares only t2 with p1: p2/p3
    have lcc 1, p1 (deg 3, one triangle) has 2/6, p4 (deg 1) is
    excluded."""
    from pagerank_using_mapreduce_spark.operators.graph import (
        local_clustering,
    )

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
    got = {r["title"]: r for r in local_clustering(pages).collect()}
    assert set(got) == {"p1", "p2", "p3"}
    assert got["p2"]["lcc_e6"] == 1_000_000 == got["p3"]["lcc_e6"]
    assert got["p1"]["deg"] == 3 and got["p1"]["n_tri"] == 1
    assert got["p1"]["lcc_e6"] == 333_333


def test_x106_label_noise_golden_and_no_collection_shuffle(spark):
    """A planted mislabel (cluster-A vector tagged 9) is flagged with
    majority = the cluster label and n_agree = 0; the audit sample is
    a FIXED ROW BUDGET (bottom-k-hash election → TakeOrderedAndProject,
    never a fraction of the table); the collection is never
    hash-shuffled on vec_id (queries broadcast, x5 shape)."""
    from pagerank_using_mapreduce_spark.operators.similarity import (
        label_noise_audit,
    )

    rows = [(i, [1.0, 0.01 * i], 9 if i == 0 else 0) for i in range(8)]
    rows += [(8 + j, [0.01 * j, 1.0], 1) for j in range(8)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    # default budget (32) covers all 16 rows: exactly the planted
    # mislabel is flagged, every clean vector agrees with its cluster
    out = {r["vec_id"]: r for r in label_noise_audit(emb).collect()}
    assert len(out) == 16
    r = out[0]
    assert r["own_label"] == 9
    assert r["maj_label"] == 0 and r["n_agree"] == 0 and r["flagged"] == 1
    assert all(v["flagged"] == 0 for i, v in out.items() if i != 0)

    # the budget is a hard bound on the audit (and thus the broadcast)
    # regardless of collection size
    assert len(label_noise_audit(emb, budget=4).collect()) == 4

    plan = _plan(label_noise_audit(emb))
    assert "hashpartitioning(vec_id" not in plan
    assert "TakeOrderedAndProject" in plan  # bounded bottom-k election


def test_x107_pii_golden_and_true_negatives(spark):
    """Planted PII is counted exactly per kind; a clean doc scans to
    zero on every pattern (no false fires on letters-only text)."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        pii_augment,
        pii_scan,
    )

    docs = spark.createDataFrame(
        [
            (0, "s0", "plain words only"),        # %7 %11 %13 -> all three
            (7, "s0", "nothing to see here"),     # email only
            (11, "s1", "more plain words"),       # ip only
            (13, "s1", "still plain"),            # phone only
            (3, "s1", "clean doc"),               # nothing
        ],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in pii_scan(pii_augment(docs)).collect()}
    assert out["s0"]["n_emails"] == 2 and out["s0"]["n_ips"] == 1
    assert out["s0"]["n_phones"] == 1 and out["s0"]["docs_with_pii"] == 2
    assert out["s0"]["pii_rate_e6"] == 1_000_000
    assert out["s1"]["n_emails"] == 0 and out["s1"]["n_ips"] == 1
    assert out["s1"]["n_phones"] == 1 and out["s1"]["docs_with_pii"] == 2
    assert out["s1"]["pii_rate_e6"] == 666_667


def test_x108_prefix_filter_equals_full_index(spark):
    """The prefix-filtered pair set equals the full-inverted-index pair
    set on the augmented sf0.001 corpus (completeness on real data),
    and a planted J=0.75 pair is found while J<0.7 pairs are not."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        SETSIM_DEN,
        SETSIM_NUM,
        setsim_join,
        shingles,
    )

    # planted near-identical pair -> J >= 0.7 (letters only: the
    # tokenizer strips digits)
    base = "aa bb cc dd ee ff gg hh ii jj kk ll mm nn"
    toy = spark.createDataFrame(
        [
            (1, base),
            (2, base + " tail pad"),     # near-identical -> match
            (3, "a b c d e f g h i j"),  # disjoint -> no match
        ],
        "doc_id long, text string",
    )
    got = {(r["doc_a"], r["doc_b"]) for r in setsim_join(toy).collect()}
    assert (1, 2) in got and all(3 not in p for p in got)

    docs = _docs(spark).limit(120)
    s = shingles(docs)
    full = (
        s.alias("a")
        .join(s.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .join(s.groupBy("doc_id").count().withColumnRenamed("doc_id", "doc_a").withColumnRenamed("count", "sz_a"), "doc_a")
        .join(s.groupBy("doc_id").count().withColumnRenamed("doc_id", "doc_b").withColumnRenamed("count", "sz_b"), "doc_b")
    )
    inter = (
        full.join(s.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(s.withColumnRenamed("doc_id", "doc_b"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("inter"))
    )
    want = {
        (r["doc_a"], r["doc_b"])
        for r in inter.where(
            F.lit(SETSIM_DEN) * F.col("inter")
            >= F.lit(SETSIM_NUM) * (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        ).collect()
    }
    got2 = {
        (r["doc_a"], r["doc_b"]) for r in setsim_join(docs).collect()
    }
    assert got2 == want


def test_x108_hot_shingle_salting_bounds_per_key_candidates(spark):
    """Worst-case skew fixture (VERDICT r06 #3): 40 IDENTICAL
    boilerplate docs put every shingle at df=40 into every prefix.
    With df_cap=4 the salted triangle join must (a) still emit the
    complete C(40,2) pair set at J=1, and (b) never put more than
    ~cap² candidate pairs on one (shingle, salt_p, salt_q) key —
    the unsalted join would put all 780 on a single key."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        SETSIM_DEN,
        SETSIM_NUM,
        _setsim_candidates,
        _setsim_prefix,
        setsim_join,
    )

    n, cap = 40, 4
    boiler = "aa bb cc dd ee ff gg hh"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(n)], "doc_id long, text string"
    )
    out = setsim_join(docs, df_cap=cap).collect()
    assert len(out) == n * (n - 1) // 2
    assert all(r["jacc_e6"] == 1_000_000 for r in out)
    assert {(r["doc_a"], r["doc_b"]) for r in out} == {
        (a, b) for a in range(n) for b in range(a + 1, n)
    }

    pref = _setsim_prefix(docs, 3, SETSIM_NUM, SETSIM_DEN)
    per_key = (
        _setsim_candidates(pref, SETSIM_NUM, SETSIM_DEN, cap)
        .groupBy("shingle", "salt_p", "salt_q")
        .count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("total"))
        .collect()[0]
    )
    # hash bucketing balances in expectation; 4x the cap² target is a
    # generous ceiling, still ~50x below the unsalted single-key 780
    assert per_key["mx"] <= 4 * cap * cap
    # completeness pre-distinct: every unordered pair appears
    assert per_key["total"] >= n * (n - 1) // 2


def test_g16_assortativity_goldens(spark):
    """Star K1,3 is perfectly disassortative (r = -1); a regular graph
    (K3) has zero degree variance and reports 0 by convention."""
    from pagerank_using_mapreduce_spark.operators.graph import (
        degree_assortativity,
    )

    star = spark.createDataFrame(
        [("hub", ["a", "b", "c"]), ("a", []), ("b", []), ("c", [])],
        "title string, links array<string>",
    )
    r = degree_assortativity(star).collect()[0]
    assert r["n_nodes"] == 4 and r["n_sym_edges"] == 6
    assert r["assortativity_e6"] == -1_000_000

    k3 = spark.createDataFrame(
        [("a", ["b", "c"]), ("b", ["c"]), ("c", [])],
        "title string, links array<string>",
    )
    r3 = degree_assortativity(k3).collect()[0]
    assert r3["assortativity_e6"] == 0 and r3["n_sym_edges"] == 6


def test_w11_cusum_level_shift_golden(spark):
    """Counts 1,1,5,5 per hour: the normalized CUSUM peaks right
    before the shift (k=2, |4*2 - 2*12| = 16), ties to the earliest
    hour, and the last hour's deviation is identically zero."""
    import datetime as dt

    from pagerank_using_mapreduce_spark.plans.relational import (
        cusum_changepoint,
    )

    rows = []
    counts = [1, 1, 5, 5]
    for h, c in enumerate(counts):
        for i in range(c):
            rows.append(
                (
                    len(rows),
                    dt.datetime(2024, 1, 1, 10 + h, 5 + i),
                    "a",
                )
            )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    r = cusum_changepoint(ev).collect()[0]
    assert r["n_hours"] == 4 and r["total_events"] == 12
    assert r["max_absdev"] == 16
    want_peak = int(dt.datetime(2024, 1, 1, 11).timestamp())
    assert r["peak_hour_epoch"] == want_peak
    assert r["cusum_e6"] == 333_333
