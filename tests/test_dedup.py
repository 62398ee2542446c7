from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.operators.dedup import (
    NEAR_DUP_OFFSET,
    EXACT_DUP_OFFSET,
    augment_docs,
    exact_dedup,
    lsh_candidates,
    minhash_signatures,
    near_dup_pipeline,
    shingles,
)

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
    (3, "alpha beta gamma delta epsilon zeta eta iota"),  # near dup of 1
    (4, "completely different words entirely unrelated content here"),
    (5, "xy"),  # < 3 tokens: no shingles
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(docs):
    got = {r["doc_id"]: r for r in exact_dedup(docs).collect()}
    assert got[1]["is_canonical"] and not got[2]["is_canonical"]
    assert got[2]["canonical_id"] == 1
    assert got[3]["is_canonical"] and got[4]["is_canonical"]


def test_shingles(docs):
    got = shingles(docs)
    assert got.where(F.col("doc_id") == 5).count() == 0  # too short
    one = {r["shingle"] for r in got.where(F.col("doc_id") == 1).collect()}
    assert "alpha beta gamma" in one and len(one) == 6


def test_minhash_identical_docs_identical_sigs(docs):
    sigs = {r["doc_id"]: r for r in minhash_signatures(shingles(docs)).collect()}
    assert [sigs[1][f"sig_{j}"] for j in range(12)] == [
        sigs[2][f"sig_{j}"] for j in range(12)
    ]
    # near-dup shares most but not necessarily all signature slots
    shared = sum(sigs[1][f"sig_{j}"] == sigs[3][f"sig_{j}"] for j in range(12))
    assert shared >= 6


def test_near_dup_pipeline_finds_planted_pairs(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard_e6"] for r in near_dup_pipeline(docs).collect()}
    assert pairs[(1, 2)] == 1_000_000  # exact dup -> jaccard 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] >= 500_000
    assert all(4 not in p for p in pairs)


def test_augment_deterministic_offsets(docs):
    aug = augment_docs(docs)
    ids = {r["doc_id"] for r in aug.select("doc_id").collect()}
    # doc 0 absent -> no near/exact copies from %10/%25 except doc 0 itself
    assert ids == {1, 2, 3, 4, 5}  # no doc_id % 10 == 0 in fixture


def test_lsh_candidates_subset_of_pairs(docs):
    cands = lsh_candidates(minhash_signatures(shingles(docs)))
    got = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    assert (1, 2) in got
    assert all(a < b for a, b in got)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def test_simhash_identical_docs_identical_fingerprints(docs):
    from pagerank_using_mapreduce_spark.operators.dedup import simhash

    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert fp[1] == fp[2]  # exact dups → identical fingerprint
    assert 0 <= fp[1] < (1 << 60)


def test_simhash_hamming_monotone(docs, spark):
    """Near-dup of doc 1 must be closer to it than the unrelated doc."""
    from pagerank_using_mapreduce_spark.operators.dedup import simhash

    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(fp[1], fp[3]) < ham(fp[1], fp[4])


def test_simhash_near_dups_finds_exact_pair(docs):
    from pagerank_using_mapreduce_spark.operators.dedup import (
        simhash,
        simhash_near_dups,
    )

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dups(simhash(docs)).collect()
    }
    assert pairs[(1, 2)] == 0  # exact dup at hamming 0
    assert all(h <= 6 for h in pairs.values())


def test_dedup_clusters_transitive_closure(spark):
    """A chain 1~2~3 (1 and 3 are NOT a direct near-dup pair of each
    other in general) must collapse to ONE canonical doc; unrelated and
    pairless docs map to themselves."""
    from pagerank_using_mapreduce_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "alpha beta gamma delta epsilon zeta eta iota"),
            (4, "completely different words entirely unrelated content here"),
            (5, "xy"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["canonical_id"], r["is_canonical"])
           for r in dedup_clusters(docs).collect()}
    # docs 1-3 form one cluster with min id 1 canonical
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[3] == (1, False)
    # 4 and 5 are singletons
    assert got[4] == (4, True)
    assert got[5] == (5, True)
    assert len(got) == 5


def test_cluster_pairs_long_chain_converges(spark):
    """Adversarial chain longer than any fixed round budget: a 12-hop
    pair chain 0~1~...~12 must fully collapse to canonical 0 — the
    zero-changes stop rule iterates until the fixpoint, then stops
    (min-label needs ~log2(d) doublings only if pointer-jumped; here
    ~d rounds, all on the tiny pair relation)."""
    from pagerank_using_mapreduce_spark.operators.dedup import cluster_pairs

    n = 13
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n + 2)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["canonical_id"]
           for r in cluster_pairs(docs, pairs).collect()}
    assert all(got[i] == 0 for i in range(n)), got
    # the two docs outside the chain stay singletons
    assert got[n] == n and got[n + 1] == n + 1


def test_incremental_dedup_matches_cross_boundary_pairs(spark):
    """Incremental screening of the synthetic batch against the
    existing corpus finds exactly the cross-boundary subset of the
    full self-join's verified pairs (same shingle/band parameters)."""
    from pyspark.sql import functions as F

    from pagerank_using_mapreduce_spark.operators import dedup as dd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    aug = dd.augment_docs(docs)
    new = aug.where(F.col("doc_id") >= dd.NEAR_DUP_OFFSET)
    existing = aug.where(F.col("doc_id") < dd.NEAR_DUP_OFFSET)
    got = {
        (r["new_doc"], r["existing_doc"], r["jaccard_e6"])
        for r in dd.incremental_near_dups(existing, new).collect()
    }
    full = {
        (max(r["doc_a"], r["doc_b"]), min(r["doc_a"], r["doc_b"]), r["jaccard_e6"])
        for r in dd.near_dup_pipeline(aug).collect()
        # cross-boundary = exactly one side in the synthetic batch
        if (r["doc_a"] >= dd.NEAR_DUP_OFFSET) != (r["doc_b"] >= dd.NEAR_DUP_OFFSET)
    }
    assert got == full and len(got) > 0


def test_fuzzy_word_pairs_complete_vs_brute_force(spark):
    """SymSpell depth-2 blocking finds EVERY pair within Levenshtein
    distance 2 — verified against a brute-force all-pairs check on a
    vocabulary exercising substitution, insertion, deletion and
    transposition."""
    from pagerank_using_mapreduce_spark.operators.fuzzy import fuzzy_word_pairs

    text = "cat bat cart ca act dog carts zebra zebro"
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    got = {
        (r["word_a"], r["word_b"]): r["dist"]
        for r in fuzzy_word_pairs(df).collect()
    }

    def lev(a, b):
        import functools

        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(
                d(i - 1, j) + 1,
                d(i, j - 1) + 1,
                d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )

        return d(len(a), len(b))

    words = sorted(set(text.split()))
    want = {
        (a, b): lev(a, b)
        for i, a in enumerate(words)
        for b in words[i + 1 :]
        if lev(a, b) <= 2
    }
    assert got == want
    assert ("act", "cat") in got and got[("act", "cat")] == 2  # transposition
    assert ("cat", "dog") not in got  # distance 3 excluded


def test_variant_bucket_stats_matches_manual(spark):
    """The x126 audit's one row equals a hand-computed delete-variant
    index over the same vocabulary, and sum_pairs is exactly the
    candidate-join row count the blocking will produce."""
    from pagerank_using_mapreduce_spark.operators.fuzzy import (
        variant_bucket_stats,
    )

    text = "cat bat cart ca act dog carts zebra zebro"
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    got = variant_bucket_stats(df).collect()[0].asDict()

    def dels(w):
        out = {w}
        d1 = {w[:i] + w[i + 1 :] for i in range(len(w))}
        out |= d1
        for v in d1:
            out |= {v[:i] + v[i + 1 :] for i in range(len(v))}
        return out

    index: dict[str, int] = {}
    for w in set(text.split()):
        for k in dels(w):
            index[k] = index.get(k, 0) + 1
    want = {
        "n_entries": sum(index.values()),
        "n_keys": len(index),
        "max_bucket": max(index.values()),
        "n_multi": sum(1 for c in index.values() if c >= 2),
        "sum_pairs": sum(c * (c - 1) // 2 for c in index.values()),
    }
    assert got == want


def test_variant_stats_sampled_estimator(spark):
    """x133 (VERDICT r10 #4): the sampled pre-flight's est_sum_pairs
    must (a) equal the exact audit EXACTLY at sample_den=1 (the
    zero-padded threshold regression pin — the den=1 frontier bug
    class), (b) land within binomial tolerance of exact on a synthetic
    few-thousand-word vocabulary at den=8, and (c) be deterministic
    (pure md5 — identical on re-evaluation)."""
    import itertools

    from pagerank_using_mapreduce_spark.operators.fuzzy import (
        variant_bucket_stats,
    )

    syll = [c + v for c in "bcdfglmnprst" for v in "aeiou"]
    words = ["".join(t) for t in itertools.product(syll, repeat=2)][:3000]
    rows = [
        (i, " ".join(words[i * 100 : (i + 1) * 100])) for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = variant_bucket_stats(df).collect()[0].asDict()

    one = variant_bucket_stats(df, sample_den=1).collect()[0].asDict()
    assert one["n_words"] == 3000
    assert one["est_sum_pairs"] == exact["sum_pairs"]
    assert one["est_entries"] == exact["n_entries"]

    est = variant_bucket_stats(df, sample_den=8).collect()[0].asDict()
    assert 3000 // 16 < est["n_words"] < 3000 * 3 // 16  # ~3000/8
    rel = est["est_sum_pairs"] / exact["sum_pairs"] - 1
    assert abs(rel) < 0.35, (rel, est, exact["sum_pairs"])
    rel_e = est["est_entries"] / exact["n_entries"] - 1
    assert abs(rel_e) < 0.2, (rel_e, est, exact["n_entries"])
    assert variant_bucket_stats(df, sample_den=8).collect()[0].asDict() == est


def test_fuzzy_max_bucket_fuse_excludes_detectably(spark):
    """Arming the skew fuse drops only pairs whose every shared variant
    key is oversized: a generous cap reproduces the exact output, a
    cap of 1 kills all multi-word keys (no candidates at all), and the
    audit's max_bucket says which regime a corpus is in."""
    from pagerank_using_mapreduce_spark.operators.fuzzy import (
        fuzzy_word_pairs,
        variant_bucket_stats,
    )

    text = "cat bat cart ca act dog carts zebra zebro"
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    exact = {
        (r["word_a"], r["word_b"]) for r in fuzzy_word_pairs(df).collect()
    }
    stats = variant_bucket_stats(df).collect()[0]
    wide = {
        (r["word_a"], r["word_b"])
        for r in fuzzy_word_pairs(df, max_bucket=stats["max_bucket"]).collect()
    }
    assert wide == exact and len(exact) > 0
    assert fuzzy_word_pairs(df, max_bucket=1).count() == 0


def test_fuzzy_join_parallelism_pinned(spark):
    """The candidate self-join must read a USER-specified exchange
    (repartition by variant key with explicit numPartitions), not an
    AQE-coalesced one: the r10 vocab-growth decade measured 253 s vs
    60 s at sf1_vg when AQE sized the join stage by its ~180 MB input
    while its output was the 255M-row candidate fan-out."""
    from pagerank_using_mapreduce_spark.operators.fuzzy import fuzzy_word_pairs

    df = spark.createDataFrame([(0, "cat bat dog")], ["doc_id", "text"])
    out = fuzzy_word_pairs(df)
    plan = out._jdf.queryExecution().explainString(
        out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "REPARTITION_BY_NUM" in plan


def test_fuzzy_pair_distinct_sharded(spark):
    """VERDICT r10 #1: the verified-pair DISTINCT must run on its own
    user-specified pair-keyed exchange, NOT as a map-side partial agg
    inside the candidate fan-out stage (where hash state scales with
    OUTPUT volume — ~840M pairs needed a 24g heap at sf10_vg).  Pin:
    (a) the plan carries a REPARTITION_BY_NUM exchange on
    (word_a, word_b), (b) no ENSURE_REQUIREMENTS exchange on the pair
    keys exists (the repartition satisfies the aggregate's required
    distribution, so both dedup halves run post-exchange), and (c) the
    shard count is output-shape-neutral: any pair_shards produces the
    identical pair set."""
    from pagerank_using_mapreduce_spark.operators.fuzzy import fuzzy_word_pairs

    df = spark.createDataFrame(
        [(0, "cat bat cart ca act dog carts zebra zebro")],
        ["doc_id", "text"],
    )
    out = fuzzy_word_pairs(df)
    plan = out._jdf.queryExecution().explainString(
        out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    pair_exchanges = [
        b
        for b in plan.split("\n\n")
        if re.search(r"hashpartitioning\(word_a#\d+, word_b#\d+", b)
    ]
    assert pair_exchanges, "pair-keyed exchange missing"
    assert all("REPARTITION_BY_NUM" in b for b in pair_exchanges)
    assert not any("ENSURE_REQUIREMENTS" in b for b in pair_exchanges)
    base = {(r["word_a"], r["word_b"], r["dist"]) for r in out.collect()}
    for shards in (1, 3):
        got = {
            (r["word_a"], r["word_b"], r["dist"])
            for r in fuzzy_word_pairs(df, pair_shards=shards).collect()
        }
        assert got == base


def test_vocab_normalize_neighborhood_argmax(spark):
    """x128 golden: each word maps to the highest-frequency word in
    its DIRECT lev-2 neighborhood (itself included), frequency tie ->
    lexicographically smallest; and normalization is one-hop — a
    bridge typo must NOT merge words farther than max_dist apart."""
    from pagerank_using_mapreduce_spark.operators.fuzzy import vocab_normalize

    # freqs: cat x4, cart x2, carts x1, dog x4, dig x4, zebra x1
    # chain: cat(4) -2- carts? lev(cat,carts)=2 yes; carts -1- cart
    text = "cat cat cat cat cart cart carts dog dog dog dog dig dig dig dig zebra"
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    got = {
        r["word"]: (r["canonical"], r["canonical_freq"])
        for r in vocab_normalize(df).collect()
    }
    assert got["cart"] == ("cat", 4)     # neighbor beats self (2 < 4)
    assert got["carts"] == ("cat", 4)    # lev(carts,cat)=2: direct neighbor
    assert got["cat"] == ("cat", 4)      # self is the argmax
    # tie between dog(4) and dig(4) at lev 1: lexicographically smallest
    assert got["dog"] == ("dig", 4)
    assert got["dig"] == ("dig", 4)
    assert got["zebra"] == ("zebra", 1)  # isolated word keeps itself
    # one-hop: carts maps via its OWN neighborhood; nothing chains it
    # through cart onto a word at lev > 2 from carts
    assert set(got) == {"cat", "cart", "carts", "dog", "dig", "zebra"}


def test_containment_catches_low_jaccard_subset(spark):
    """A short doc quoted wholesale inside a long one: Jaccard is far
    below the near-dup threshold (so x4 misses the pair by design),
    but containment = 1.0 and rare-shingle blocking recalls it."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        containment_pipeline,
        near_dup_pipeline,
    )

    import string

    short = "alpha beta gamma delta epsilon"
    # letters-only filler: digit-bearing words like "w0 w1 ..." all
    # collapse to the single token "w" under strip_non_alpha, which
    # silently makes doc 2's shingle set tiny and its Jaccard vs doc 1
    # exactly 0.5 — AT the near-dup threshold, so the "invisible to
    # x4" claim below would hinge on banding luck instead of math.
    filler = " ".join(
        f"q{a}{b}" for a in string.ascii_lowercase[:8]
        for b in string.ascii_lowercase[:5]
    )  # 40 distinct 3-letter words
    docs = spark.createDataFrame(
        [(1, short), (2, f"{short} {filler}"), (3, filler + " zeta")],
        "doc_id long, text string",
    )
    cont = {(r["doc_a"], r["doc_b"]): r["containment_e6"]
            for r in containment_pipeline(docs).collect()}
    assert cont[(1, 2)] == 1_000_000  # fully contained
    near = {(r["doc_a"], r["doc_b"]) for r in near_dup_pipeline(docs).collect()}
    assert (1, 2) not in near  # Jaccard 3/43 — invisible to the x4 screen


def test_minhash_audit_exact_dup_and_error_bound(spark):
    """Exact-dup pairs estimate Jaccard 1.0 with zero error; every
    estimate stays within a coarse K=12 sampling bound of the exact
    value on the augmented corpus."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        augment_docs,
        minhash_jaccard_audit,
        shingles,
        EXACT_DUP_OFFSET,
    )

    docs = augment_docs(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    rows = minhash_jaccard_audit(shingles(docs)).collect()
    assert rows
    exact_pairs = [
        r for r in rows if r["doc_b"] - r["doc_a"] == EXACT_DUP_OFFSET
    ]
    assert exact_pairs, "exact-dup copies must appear as candidates"
    for r in exact_pairs:
        assert (r["est_e6"], r["exact_e6"], r["abs_err_e6"]) == (
            1_000_000,
            1_000_000,
            0,
        )
    # K=12 signature: binomial std <= 1/(2*sqrt(12)) ~ 0.145; allow 4 sigma
    assert all(r["abs_err_e6"] <= 600_000 for r in rows)


def test_dedup_method_audit_planted_pairs_in_both(spark):
    """On the augmented corpus both screens must find the planted
    copies, so 'both' dominates and all three verdicts sum to the
    union of the two pair sets."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        augment_docs,
        dedup_method_audit,
        near_dup_pipeline,
        simhash,
        simhash_near_dups,
    )

    docs = augment_docs(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    audit = {r["verdict"]: r["n_pairs"] for r in dedup_method_audit(docs).collect()}
    jac = {(r["doc_a"], r["doc_b"]) for r in near_dup_pipeline(docs).collect()}
    sim = {(r["doc_a"], r["doc_b"])
           for r in simhash_near_dups(simhash(docs)).collect()}
    assert audit.get("both", 0) == len(jac & sim) > 0
    assert audit.get("jaccard_only", 0) == len(jac - sim)
    assert audit.get("simhash_only", 0) == len(sim - jac)


def test_threshold_curve_monotone_and_anchored(spark):
    """Higher cuts keep fewer (or equal) pairs/docs, and the 0.5 row
    must equal x4's pipeline output exactly (same candidates, same
    verify) — the curve is the sweep of the pipeline, not a parallel
    implementation that could drift."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        augment_docs,
        dedup_threshold_curve,
        lsh_candidates,
        minhash_signatures,
        shingles,
        verified_near_dups,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sh = shingles(augment_docs(docs))
    rows = sorted(
        dedup_threshold_curve(sh).collect(), key=lambda r: r["thr_e6"]
    )
    assert [r["thr_e6"] for r in rows] == [
        500_000, 600_000, 700_000, 800_000, 900_000
    ]
    for a, b in zip(rows, rows[1:]):
        assert a["n_pairs"] >= b["n_pairs"]
        assert a["n_docs"] >= b["n_docs"]
    pipeline = verified_near_dups(
        sh, lsh_candidates(minhash_signatures(sh))
    )
    assert rows[0]["n_pairs"] == pipeline.count()


def test_dedup_savings_consistent_with_clusters(spark):
    """x88's single row must agree with the cluster relation it
    composes: dropped = non-canonical members, byte sums exact."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        augment_docs,
        dedup_clusters,
    )
    from pagerank_using_mapreduce_spark.plans.extensions import (
        q_x88_dedup_savings,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    row = q_x88_dedup_savings(spark, sf).collect()[0]
    aug = augment_docs(load_table(spark, sf, "documents"))
    cl = dedup_clusters(aug)
    n_dropped = cl.where(~cl.is_canonical).count()
    assert row["n_dropped"] == n_dropped and n_dropped > 0
    assert row["n_docs"] == cl.count()
    assert 0 < row["bytes_dropped"] < row["bytes_total"]
    assert row["savings_e6"] == int(
        row["bytes_dropped"] / row["bytes_total"] * 1e6 + 0.5000001
    )


def test_persisted_index_equals_recompute(spark, tmp_path):
    """The stored band table must screen identically to a fresh
    recompute — byte-exact parquet roundtrip of the index."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        NEAR_DUP_OFFSET,
        augment_docs,
        band_table,
        incremental_near_dups,
        minhash_signatures,
        shingles,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    aug = augment_docs(load_table(spark, "/root/testdata/sf0.001", "documents"))
    new = aug.where(aug.doc_id >= NEAR_DUP_OFFSET)
    existing = aug.where(aug.doc_id < NEAR_DUP_OFFSET)
    d = str(tmp_path / "bands")
    band_table(minhash_signatures(shingles(existing))).write.parquet(d)
    stored = spark.read.parquet(d)
    a = sorted(map(tuple, incremental_near_dups(existing, new).collect()))
    b = sorted(
        map(tuple, incremental_near_dups(existing, new, index=stored).collect())
    )
    assert a == b and a


def test_update_band_index_idempotent_and_matches_rebuild(spark):
    """x91's append/compact: appending a batch to a stored index gives
    exactly the full-rebuild index, and re-appending the same batch is
    a no-op (distinct compaction)."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        band_table,
        minhash_signatures,
        shingles,
        update_band_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    b = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")

    def rows(df):
        return sorted(
            (r["doc_id"], r["band"], r["bucket"]) for r in df.collect()
        )

    idx_a = band_table(minhash_signatures(shingles(a)))
    appended = update_band_index(idx_a, b)
    rebuilt = band_table(
        minhash_signatures(shingles(a.unionAll(b)))
    )
    assert rows(appended) == rows(rebuilt)
    assert rows(update_band_index(appended, b)) == rows(appended)


def test_keep_best_prefers_quality_over_min_id(spark):
    """Quality-aware canonical selection (x123): the kept cluster
    member is the HIGHEST-quality one even when it is NOT the min id
    — the exact gap the min-id rule leaves open.  Doc 11 and 12 are
    near-dups; 12 carries extra stopword-rich tokens, so its composite
    quality (stopword ratio + length score) strictly exceeds 11's."""
    from pagerank_using_mapreduce_spark.operators.dedup import dedup_keep_best
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        quality_score,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon"
    )
    docs = spark.createDataFrame(
        [
            (11, base),
            (12, base + " and the of is to in"),
            (40, "completely different words entirely unrelated content"),
        ],
        "doc_id long, text string",
    )
    scores = quality_score(docs)
    q = {r["doc_id"]: r["quality_e6"] for r in scores.collect()}
    assert q[12] > q[11], q  # fixture sanity: quality must disagree with id
    got = {r["doc_id"]: r for r in dedup_keep_best(docs, scores).collect()}
    assert got[11]["keep_id"] == 12 and not got[11]["is_kept"]
    assert got[12]["keep_id"] == 12 and got[12]["is_kept"]
    # singleton keeps itself
    assert got[40]["keep_id"] == 40 and got[40]["is_kept"]


def test_keep_best_unscored_docs_survive(spark):
    """Score coverage is OPTIONAL (ADVICE r09): a doc absent from
    ``scores`` must stay in the output with NULL quality (ordered
    NULLS LAST) and lose the argmax to any scored cluster-mate — even
    a NEGATIVELY scored one, since scores may be signed (x129) and a
    numeric sentinel like -1 would beat them; a cluster with NO
    scored member falls back to min-id.  An inner join would have
    silently dropped doc 11 and crowned 12 by forfeit."""
    from pagerank_using_mapreduce_spark.operators.dedup import dedup_keep_best

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon"
    )
    docs = spark.createDataFrame(
        [
            (11, base),
            (12, base + " extra"),
            (40, "completely different words entirely unrelated content"),
        ],
        "doc_id long, text string",
    )
    # only the HIGHER id of the near-dup pair is scored — and scored
    # NEGATIVE, so a -1 sentinel would have beaten it; singleton 40
    # is unscored too (its cluster falls back to min-id = itself).
    scores = spark.createDataFrame(
        [(12, -500_000)], "doc_id long, quality_e6 long"
    )
    got = {r["doc_id"]: r for r in dedup_keep_best(docs, scores).collect()}
    assert set(got) == {11, 12, 40}  # nobody dropped
    assert got[11]["keep_id"] == 12 and got[11]["quality_e6"] is None
    assert got[12]["keep_id"] == 12 and got[12]["is_kept"]
    assert got[40]["keep_id"] == 40 and got[40]["is_kept"]
    assert got[40]["quality_e6"] is None


def test_frontier_sampled_truth_mode(spark):
    """The sampled frontier must equal the full frontier run over the
    pre-filtered sub-corpus (sampling composes at the document grain —
    nothing else changes), and the md5 sample rule must be
    deterministic: repartitioning cannot move a doc in or out."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        frontier_sample,
        lsh_band_frontier,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, f"{base} word{i} word{i + 1} word{i + 2}") for i in range(60)]
        + [(1000 + i, f"{base} word{i} word{i + 1} tail") for i in range(8)],
        "doc_id long, text string",
    )
    sampled = lsh_band_frontier(docs, sample_den=3)
    manual = lsh_band_frontier(frontier_sample(docs, 3))
    assert sorted(map(tuple, sampled.collect())) == sorted(
        map(tuple, manual.collect())
    )
    again = lsh_band_frontier(docs.repartition(7), sample_den=3)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, sampled.collect())
    )
    # the sample must be a PROPER subset at this size (rule is live)
    n_s = frontier_sample(docs, 3).count()
    assert 0 < n_s < 68
    # sample_den=1 means NO sampling: its 5-hex threshold '10000'
    # exceeds every zero-padded 4-hex bucket, so every doc survives
    # (the unpadded compare silently kept ~1/16 — r10 review find)
    assert frontier_sample(docs, 1).count() == 68


def test_lsh_bucket_stats_and_max_bucket_fuse(spark):
    """lsh_bucket_stats must account for every band-table row, and the
    max_bucket fuse must drop oversized buckets' pairs while leaving
    small buckets untouched (detectable degradation, never OOM)."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        N_BANDS,
        band_table,
        lsh_bucket_stats,
        lsh_candidates,
        minhash_signatures,
        shingles,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, base) for i in range(1, 8)]  # 7 identical docs: one bucket/band
        + [(100, "totally different unrelated words appear only here")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(shingles(docs))
    stats = {r["band"]: r for r in lsh_bucket_stats(sigs).collect()}
    assert set(stats) == set(range(N_BANDS))
    for b, r in stats.items():
        assert r["max_bucket"] == 7
        assert r["n_multi"] == 1
        assert r["sum_pairs"] == 21  # C(7,2)
    # every band-table row lands in some bucket
    total_rows = band_table(sigs).count()
    assert total_rows == sum(
        rr["sz"]
        for rr in band_table(sigs).groupBy("band", "bucket").agg(
            F.count("*").alias("sz")
        ).collect()
    )
    # unfused: complete pair set among the 7 identical docs
    assert lsh_candidates(sigs).count() == 21
    # fuse below the blob size: the mass-dup bucket is dropped entirely
    assert lsh_candidates(sigs, max_bucket=5).count() == 0
    # fuse above it: unchanged
    assert lsh_candidates(sigs, max_bucket=7).count() == 21


def test_band_frontier_max_bucket_cap_visible(spark):
    """The frontier's mandatory bucket cap (the sf10 OOM armor): with
    the cap below a mass-dup blob's bucket size, every config reports
    the excluded buckets in n_oversized and enumerates no pairs from
    them; with the default cap nothing is excluded and counts match."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        lsh_band_frontier,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, base) for i in range(1, 9)]  # 8 identical docs
        + [(100, "totally different unrelated words appear only here")],
        "doc_id long, text string",
    )
    capped = {
        r["n_bands"]: r for r in lsh_band_frontier(docs, max_bucket=5).collect()
    }
    free = {
        r["n_bands"]: r for r in lsh_band_frontier(docs).collect()
    }
    for nb, r in capped.items():
        # identical docs share every band bucket: one 8-doc bucket per
        # band, all above the cap of 5
        assert r["n_oversized"] == nb, r
        assert r["n_candidates"] == 0, r
        assert free[nb]["n_oversized"] == 0
        assert free[nb]["n_candidates"] == 28  # C(8,2)


def test_normalized_dedup_merges_typo_variants(spark):
    """x135 golden: a doc differing from another ONLY by lev-2 typos
    of dominant words normalizes to the identical fingerprint and
    dedups (min-id election), while raw fingerprinting keeps both;
    docs with genuinely different content never merge; position
    sensitivity: same multiset, different order -> different
    fingerprints."""
    from pagerank_using_mapreduce_spark.operators.fuzzy import (
        normalized_fingerprint_dedup,
    )

    rows = [
        (1, "the quick brown fox jumps"),
        # 'brwn' is lev-1 from 'brown', 'quik' lev-1 from 'quick' —
        # both canonicalize to the (more frequent) clean spellings
        (2, "the quik brwn fox jumps"),
        (3, "the quick brown fox jumps"),  # raw exact dup of 1
        (4, "a completely different document"),
        (5, "fox brown quick the jumps"),  # same words, other order
        (6, ""),  # tokenless -> fp 0
    ]
    # repeat the clean words so they dominate the typo spellings
    rows += [(10 + i, "the quick brown fox jumps") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["norm_fp"], r["is_kept"])
        for r in normalized_fingerprint_dedup(df).collect()
    }
    clean_fp = got[1][0]
    assert got[2][0] == clean_fp and got[3][0] == clean_fp
    assert got[1][1] is True  # min-id keeps doc 1
    assert got[2][1] is False and got[3][1] is False
    assert got[4][0] != clean_fp and got[4][1] is True
    assert got[5][0] != clean_fp and got[5][1] is True  # order matters
    assert got[6][0] == 0 and got[6][1] is True


def test_boilerplate_removal_scrubs_hot_windows(spark):
    """x138 golden: a window-aligned boilerplate run present in > max_df
    docs is scrubbed from every doc (including the tail-partial and the
    all-boilerplate doc), while a window repeated in exactly max_df
    docs survives, reassembly preserves order, and tokenless docs stay
    with n_paras 0."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        boilerplate_removal,
    )

    boiler = "cookie banner text"
    rows = [
        (1, f"{boiler} a b c d e f"),
        (2, f"{boiler} g h i"),
        (3, f"{boiler} j k l"),
        (4, f"{boiler} m n o"),
        (5, f"{boiler} p q r s t"),  # tail window 's t' is partial
        (6, "u v w x y"),  # untouched
        (7, boiler),  # scrubbed to empty
        (8, "shared tri gram one two three"),
        (9, "shared tri gram four five six"),
        (10, "shared tri gram seven eight nine"),  # df == max_df: kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in boilerplate_removal(df, win=3, max_df=3).collect()
    }
    assert len(got) == 10
    assert got[1]["clean_text"] == "a b c d e f"
    assert (got[1]["n_paras"], got[1]["n_removed"]) == (3, 1)
    assert got[5]["clean_text"] == "p q r s t"  # order + partial tail
    assert got[6]["clean_text"] == "u v w x y"
    assert got[6]["n_removed"] == 0
    assert got[7]["clean_text"] == "" and got[7]["n_removed"] == 1
    # df == max_df is NOT boilerplate (rule is strictly greater-than)
    assert got[8]["clean_text"] == "shared tri gram one two three"


def test_boilerplate_zero_token_doc_kept(spark):
    from pagerank_using_mapreduce_spark.operators.dedup import (
        boilerplate_removal,
    )

    df = spark.createDataFrame(
        [(1, "some real words here"), (2, "12345 !!!")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in boilerplate_removal(df, win=3).collect()}
    assert got[2]["n_paras"] == 0 and got[2]["clean_text"] == ""
    assert got[1]["clean_text"] == "some real words here"


def test_boilerplate_max_hot_fuse(spark):
    """The S4-channel fuse raises instead of silently building an
    unbounded driver literal."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        boilerplate_hot_hashes,
    )

    rows = [(i, "cookie banner text") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="max_hot"):
        boilerplate_hot_hashes(df, win=3, max_df=3, max_hot=0)


def test_lsh_contamination_flags_cross_split_near_dups(spark):
    """x139 golden: train docs that near-duplicate an eval doc are
    flagged with the best eval neighbor (ties -> smallest eval id);
    clean train docs are absent.  Split membership is derived from the
    operator's own hash_split convention so the test is robust to the
    md5 layout."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        lsh_contamination,
    )
    from pagerank_using_mapreduce_spark.operators.sampling import hash_split

    ids = spark.createDataFrame(
        [(i,) for i in range(1, 300)], "doc_id long"
    )
    splits = {
        r["doc_id"]: r["split"]
        for r in hash_split(ids, "doc_id").collect()
    }
    test_ids = [i for i in sorted(splits) if splits[i] == "test"]
    train_ids = [i for i in sorted(splits) if splits[i] == "train"]
    e1, e2 = test_ids[0], test_ids[1]
    t1, t2, clean = train_ids[0], train_ids[1], train_ids[2]
    leaked = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (e1, leaked),
        (e2, leaked),  # second identical eval doc: tie on jaccard
        (t1, leaked),  # contaminated train doc (jaccard 1.0 vs both)
        (t2, leaked + " lambda"),  # near-dup of the eval doc
        (clean, "totally different unrelated words in this document"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in lsh_contamination(df).collect()}
    assert set(got) == {t1, t2}
    assert got[t1]["jaccard_e6"] == 1_000_000
    assert got[t1]["best_eval_id"] == min(e1, e2)  # tie -> smallest
    assert got[t2]["jaccard_e6"] >= 500_000


def test_boilerplate_relative_threshold(spark):
    """The default rule is RELATIVE — df > max(floor, n_docs // den) —
    so a window shared by a small fixed number of docs in a large
    corpus is duplicated content (x1/x4's job), not boilerplate."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        boilerplate_hot_hashes,
    )

    # 20 docs, den=4 -> threshold max(3, 5) = 5
    rows = [(i, f"cookie banner text unique{i} word{i} tok{i}")
            for i in range(6)]  # boiler window in 6 docs: 6 > 5 -> hot
    rows += [(100 + i, f"shared five doc run uniq{i} tail{i}")
             for i in range(5)]  # in 5 docs: 5 <= 5 -> NOT hot
    rows += [(200 + i, f"filler{i} words{i} only{i}") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hot = boilerplate_hot_hashes(df, win=3, df_den=4)
    import hashlib

    boiler_h = hashlib.md5(b"cookie banner text").hexdigest()
    shared_h = hashlib.md5(b"shared five doc").hexdigest()
    assert boiler_h in hot and shared_h not in hot


def test_c8_scrub_then_dedup_ordering(spark):
    """c8 golden: the scrub-first order is load-bearing — two docs that
    differ ONLY by boilerplate become exact duplicates after the scrub
    (raw dedup keeps both), a train doc equal to an eval doc is
    decontaminated away, and fully-boilerplate docs drop out."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        boilerplate_removal,
        exact_dedup,
        lsh_contamination,
    )
    from pagerank_using_mapreduce_spark.operators.sampling import hash_split

    ids = spark.createDataFrame([(i,) for i in range(1, 400)], "doc_id long")
    splits = {
        r["doc_id"]: r["split"] for r in hash_split(ids, "doc_id").collect()
    }
    test_ids = [i for i in sorted(splits) if splits[i] == "test"]
    train_ids = [i for i in sorted(splits) if splits[i] == "train"]
    e1 = test_ids[0]
    t1, t2, t3, t4, t5 = train_ids[:5]
    boiler = "cookie banner text"
    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    leaked = "shared benchmark answer string nobody should train on today"
    rows = [
        (t1, f"{boiler} {body}"),   # == t2 after scrub, differs before
        (t2, body),
        (t3, f"{boiler}"),          # fully boilerplate -> drops out
        (t4, leaked),               # == eval doc -> decontaminated
        (e1, leaked),
        (t5, f"{boiler} totally different unrelated words right here"),
    ]
    # make the boiler window hot: splice it into several filler docs
    rows += [
        (i, f"{boiler} filler{i} words{i} only{i} here{i}")
        for i in train_ids[5:10]
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # raw exact dedup does NOT merge t1/t2
    raw = {r["doc_id"]: r for r in exact_dedup(docs).collect()}
    assert raw[t1]["is_canonical"] and raw[t2]["is_canonical"]

    scrub = boilerplate_removal(docs, win=3, max_df=3)
    cleaned = scrub.where(F.col("clean_text") != "").select(
        "doc_id", F.col("clean_text").alias("text")
    )
    assert t3 not in {r["doc_id"] for r in cleaned.collect()}
    canon = {
        r["doc_id"]
        for r in exact_dedup(cleaned)
        .where(F.col("is_canonical"))
        .collect()
    }
    # after the scrub t1 and t2 are the same doc: exactly one survives
    assert len({t1, t2} & canon) == 1
    contam = {r["doc_id"] for r in lsh_contamination(cleaned).collect()}
    assert t4 in contam
    keep = canon - contam
    assert t4 not in keep and t5 in keep


def test_boilerplate_removal_partition_invariant(spark):
    """x138 is a pure function of the corpus content: the hot-set fit
    aggregates and the narrow scrub must produce identical rows at any
    input partitioning (the retry/re-layout stability every sampler
    and fit in this repo pins)."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        boilerplate_removal,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = sorted(
        map(tuple, boilerplate_removal(docs, win=3, max_df=3).collect())
    )
    b = sorted(
        map(
            tuple,
            boilerplate_removal(
                docs.repartition(7), win=3, max_df=3
            ).collect(),
        )
    )
    assert a == b and len(a) == docs.count()
