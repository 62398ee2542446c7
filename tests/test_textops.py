"""Parser-branch tests: every README assumption of the reference
(reference README.md:56-82), verified on hand-built page lines."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.functions.textops import (
    extract_doc_id,
    extract_links,
    extract_text_body,
    extract_text_full,
    extract_title,
    strip_non_alpha,
    tokens,
)


def _one(spark, raw, expr):
    return spark.createDataFrame([(raw,)], "raw string").select(expr.alias("v")).head()[0]


PAGE = (
    '<title>Anarchism</title><id>12</id><revision>'
    '<text xml:space="preserve">x [[A]] y [[B|alias b]] z '
    "[[File:pic.png|thumb [[Banana]] caption]] [[A]] w</text></revision>"
)


def test_title(spark):
    assert _one(spark, PAGE, extract_title("raw")) == "Anarchism"
    # untrimmed capture is trimmed at parse (SURVEY.md §7.4.5)
    assert _one(spark, "<title> X </title>", extract_title("raw")) == "X"


def test_doc_id(spark):
    assert _one(spark, PAGE, extract_doc_id("raw")) == "12"


def test_text_full_vs_body(spark):
    full = _one(spark, PAGE, extract_text_full("raw"))
    body = _one(spark, PAGE, extract_text_body("raw"))
    assert full.startswith('<text xml:space="preserve">') and full.endswith("</text>")
    assert body.startswith("x [[A]]") and body.endswith(" w")


def test_links_plain_piped_nested_duplicate(spark):
    links = _one(spark, PAGE, extract_links(extract_text_full("raw")))
    # piped kept whole (never resolved), nested resolves to innermost,
    # duplicate retained
    assert links == ["A", "B|alias b", "Banana", "A"]


def test_links_self_loop_kept(spark):
    raw = '<title>C</title><id>3</id><text a="1">[[C]]</text>'
    assert _one(spark, raw, extract_links(extract_text_full("raw"))) == ["C"]


def test_no_text_tag_page_has_no_links(spark):
    raw = "<title>D</title><id>4</id><revision></revision>"
    assert _one(spark, raw, extract_links(extract_text_full("raw"))) == []


def test_strip_non_alpha_and_tokens(spark):
    raw = "Hello, World! 42 times_3 End"
    assert _one(spark, raw, strip_non_alpha("raw")) == "Hello World times End"
    assert _one(spark, raw, tokens(strip_non_alpha("raw"))) == [
        "hello",
        "world",
        "times",
        "end",
    ]


def test_tokens_no_empties(spark):
    assert _one(spark, "  a  b  ", tokens("raw")) == ["a", "b"]
    assert _one(spark, "", tokens("raw")) == []


def test_approx_count_distinct_within_tolerance(spark):
    """Approximate aggregates exist and land within the documented HLL
    error envelope (no oracle — approximation differs per engine)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    exact = ev.select("user_id").distinct().count()
    approx = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("a")
    ).first()["a"]
    assert abs(approx - exact) / exact < 0.05


def test_char_lm_flags_gibberish(spark):
    """Under the corpus's own bigram model, a document made of rare
    bigrams scores a strictly lower average log-prob than the common
    documents; totals are integer and reproducible."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        char_lm_scores,
    )

    docs = [(i, "the cat sat on the mat") for i in range(9)] + [(9, "zq xv qj")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in char_lm_scores(df).collect()}
    assert len(rows) == 10
    common_avg = rows[0]["avg_logp_e6"]
    assert all(rows[i]["avg_logp_e6"] == common_avg for i in range(9))
    assert rows[9]["avg_logp_e6"] < common_avg
    assert all(r["total_logp_e6"] < 0 for r in rows.values())
    # determinism under re-evaluation
    again = {r["doc_id"]: r["total_logp_e6"] for r in char_lm_scores(df).collect()}
    assert again == {d: r["total_logp_e6"] for d, r in rows.items()}


def test_funnel_strict_first_occurrence_order(spark):
    """Golden funnel: u1 converts fully in order; u2 clicked before
    viewing (not counted past step 1); u3 never purchased; u4 has a
    view only; u5 tied timestamps don't advance (strict >)."""
    import datetime as dt

    from pagerank_using_mapreduce_spark.plans.relational import e6_funnel_steps

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, typ, s):
        return (uid, typ, t0 + dt.timedelta(seconds=s))

    rows = [
        ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 20),
        ev(2, "click", 0), ev(2, "view", 10), ev(2, "purchase", 20),
        ev(3, "view", 0), ev(3, "click", 5),
        ev(4, "view", 0),
        ev(5, "view", 0), ev(5, "click", 0), ev(5, "purchase", 1),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])

    import pagerank_using_mapreduce_spark.plans.relational as rel
    from unittest import mock

    with mock.patch.object(rel, "load_table", lambda s, d, n: df):
        out = e6_funnel_steps(spark, "unused").collect()[0]
    assert (out["n_users"], out["n_step1"], out["n_step2"], out["n_step3"]) == (
        5, 5, 2, 1,
    )


def test_ewma_fold_golden_and_cohorts(spark):
    """EWMA recurrence golden (alpha=0.25, values 1,2,3 in time order
    -> 1.6875) and cohort matrix golden on a 2-user fixture."""
    import datetime as dt

    from unittest import mock

    import pagerank_using_mapreduce_spark.plans.relational as rel

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: values 1,2,3 at t0, +7d, +14d (3 distinct weeks)
        (1, 1, t0, 1.0),
        (2, 1, t0 + dt.timedelta(days=7), 2.0),
        (3, 1, t0 + dt.timedelta(days=14), 3.0),
        # user 2: one event in user 1's second week
        (4, 2, t0 + dt.timedelta(days=7), 10.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    with mock.patch.object(rel, "load_table", lambda s, d, n: df):
        ew = {r["user_id"]: r for r in rel.w4_ewma(spark, "x").collect()}
        co = {
            (r["cohort_week"], r["week_offset"]): r["n_active"]
            for r in rel.e7_retention_cohorts(spark, "x").collect()
        }
    assert ew[1]["n_events"] == 3 and ew[1]["ewma_e6"] == 1687500
    assert ew[2]["ewma_e6"] == 10000000
    # user1 cohort week w: offsets 0,1,2; user2 cohort w+1: offset 0
    offsets = sorted((k[1], v) for k, v in co.items())
    assert offsets == [(0, 1), (0, 1), (1, 1), (2, 1)]


def test_ngram_contamination_flags_planted_phrase(spark):
    """Plant one exact 5-gram shared between a train doc and a test
    doc: exactly that train doc is flagged with n_shared == 1; clean
    train docs are absent from the output."""
    from pagerank_using_mapreduce_spark.operators.sampling import hash_split
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        ngram_contamination,
    )

    ids = list(range(40))
    base = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    splits = {
        r["doc_id"]: r["split"] for r in hash_split(base, "doc_id").collect()
    }
    train_ids = [i for i in ids if splits[i] == "train"]
    test_ids = [i for i in ids if splits[i] == "test"]
    assert train_ids and test_ids  # 40 ids always yield both at 80/10/10
    leaked_train, leak_src = train_ids[0], test_ids[0]
    phrase = "alpha bravo charlie delta echo"

    def alpha(n):  # digits would be stripped by the tokenizer
        return "".join("abcdefghij"[int(c)] for c in str(n))

    rows = []
    for i in ids:
        if i == leaked_train or i == leak_src:
            rows.append((i, f"pre{alpha(i)} " + phrase + f" tail{alpha(i)}"))
        else:
            rows.append((i, " ".join(f"w{alpha(i)}q{alpha(k)}" for k in range(8))))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["n_shared"] for r in ngram_contamination(df).collect()
    }
    assert got == {leaked_train: 1}


def test_dataset_profile_invariants(spark):
    """The one-row datasheet: totals positive, ratios in [0, 1e6],
    pct_en equals the direct metadata count."""
    from pagerank_using_mapreduce_spark.plans.extensions import (
        q_x68_dataset_profile,
    )

    r = q_x68_dataset_profile(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_docs"] == 500 and r["total_chars"] > 0
    assert 0 < r["distinct_words"] < r["total_tokens"]
    assert r["n_langs"] == 5 and r["n_sources"] == 20
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_en = docs.where("lang = 'en'").count()
    assert r["pct_en_e6"] == int(n_en / 500 * 1e6 + 0.5000001)
    assert 0 < r["mean_quality_e6"] < 1_000_000
    assert 0 < r["oov20_e6"] < 1_000_000


def test_composition_matrix_row_sums(spark):
    """Per-source lang columns sum to the source total, and the grand
    total equals the corpus token count."""
    from pagerank_using_mapreduce_spark.plans.extensions import (
        q_x74_composition_matrix,
    )
    from pagerank_using_mapreduce_spark.operators.bpe import word_freqs

    rows = q_x74_composition_matrix(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    for r in rows:
        langs_sum = sum(r[f"toks_{l}"] for l in ("de", "en", "es", "fr", "zh"))
        assert langs_sum == r["toks_total"]
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    total = word_freqs(docs).groupBy().sum("freq").collect()[0][0]
    assert sum(r["toks_total"] for r in rows) == total


def test_vocab_growth_monotone(spark):
    """The growth curve is monotone non-decreasing and ends at the
    full-corpus distinct-word count."""
    from pagerank_using_mapreduce_spark.plans.extensions import (
        q_x75_vocab_growth,
    )
    from pagerank_using_mapreduce_spark.operators.bpe import word_freqs

    r = q_x75_vocab_growth(spark, "/root/testdata/sf0.001").collect()[0]
    curve = [r[f"vocab_p{p}"] for p in (20, 40, 60, 80, 100)]
    assert curve == sorted(curve) and curve[0] > 0
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert curve[-1] == word_freqs(docs).count()


def test_x83_calibration_marginals(spark):
    """The contingency matrix's marginals must be the equi-depth bin
    sizes (each decile n/10 ±1 docs) and the total must be the corpus
    size — the matrix is a re-partition of the corpus, not a sample."""
    from pagerank_using_mapreduce_spark.plans.extensions import (
        q_x83_filter_calibration,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = q_x83_filter_calibration(spark, sf).collect()
    n = load_table(spark, sf, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n
    qm, mm = {}, {}
    for r in rows:
        assert 1 <= r["q_bin"] <= 10 and 1 <= r["m_bin"] <= 10
        qm[r["q_bin"]] = qm.get(r["q_bin"], 0) + r["n_docs"]
        mm[r["m_bin"]] = mm.get(r["m_bin"], 0) + r["n_docs"]
    for marg in (qm, mm):
        assert set(marg) == set(range(1, 11))
        assert max(marg.values()) - min(marg.values()) <= 1
