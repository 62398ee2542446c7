"""Property-based tests (hypothesis): invariants that hold for ALL
inputs, not just the fixtures.

The codec inherits the reference's in-band encoding limitation: titles
and link targets must not contain the separators ``##`` / ``@#@`` or a
tab (the reference would silently corrupt such records too —
PageRankAlgorithm.java:300-313 does no escaping).  The generators
exclude exactly those, nothing else (unicode is fair game).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pagerank_using_mapreduce_spark.functions.textops import (
    strip_non_alpha,
    tokens,
)
from pagerank_using_mapreduce_spark.sources.textio import (
    decode_rank_records,
    encode_rank_records,
)

_name = st.text(
    alphabet=st.characters(
        exclude_characters="#@\t\n\r", exclude_categories=("Cs",)
    ),
    min_size=1,
    max_size=30,
).filter(lambda s: s.strip() == s and s != "")

_pages = st.lists(
    st.tuples(
        _name,
        st.floats(min_value=1e-6, max_value=1e6, allow_nan=False),
        st.lists(_name, max_size=5),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)

_SETTINGS = settings(
    max_examples=15,  # each example is a Spark round-trip — keep it tight
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(pages=_pages)
@_SETTINGS
def test_codec_roundtrip_property(spark, pages):
    df = spark.createDataFrame(
        pages, "title string, rank double, links array<string>"
    )
    back = {
        r["title"]: r
        for r in decode_rank_records(encode_rank_records(df)).collect()
    }
    for title, rank, links in pages:
        assert back[title]["rank"] == rank
        assert back[title]["links"] == links


@given(text=st.text(max_size=200))
@_SETTINGS
def test_tokenizer_invariants(spark, text):
    """Tokens are always non-empty, lowercase, alpha-only — for ANY
    input (the inverted-index word-domain invariant, README.md:79-81)."""
    df = spark.createDataFrame([(text,)], "text string")
    toks = df.select(tokens(strip_non_alpha("text")).alias("t")).first()["t"]
    for t in toks:
        assert t != ""
        assert t.isalpha()
        assert t == t.lower()


_fractions = st.lists(
    st.floats(min_value=0.05, max_value=1.0), min_size=2, max_size=4
).map(lambda ws: {f"s{i}": w / sum(ws) for i, w in enumerate(ws)})


@given(fractions=_fractions, seed=st.sampled_from(["a", "b", "c"]))
@_SETTINGS
def test_hash_split_total_and_layout_independent(spark, fractions, seed):
    """For ANY fraction dict: every row lands in exactly one split, and
    the assignment is identical under a different physical layout
    (retry/re-partition stability — the property seeded rand() lacks)."""
    from pagerank_using_mapreduce_spark.operators.sampling import hash_split

    df = spark.range(0, 200).withColumnRenamed("id", "k")
    a = {r["k"]: r["split"] for r in hash_split(df, "k", fractions, seed=seed).collect()}
    b = {
        r["k"]: r["split"]
        for r in hash_split(df.repartition(7), "k", fractions, seed=seed).collect()
    }
    assert a == b
    assert len(a) == 200
    assert set(a.values()) <= set(fractions)


_graph = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=0, max_size=14
)


@given(raw_edges=_graph)
@_SETTINGS
def test_triangle_count_matches_naive(spark, raw_edges):
    """Degree-ordered triangle census equals the brute-force count on
    ANY small graph (including multi-edges and self-loops, which the
    undirected-distinct base drops)."""
    from itertools import combinations

    from pagerank_using_mapreduce_spark.operators.graph import triangle_count

    nodes = sorted({f"n{a}" for a, _ in raw_edges} | {f"n{b}" for _, b in raw_edges})
    adj = {t: [] for t in nodes}
    for a, b in raw_edges:
        adj[f"n{a}"].append(f"n{b}")
    pages = spark.createDataFrame(
        [(t, adj[t]) for t in nodes] or [("lone", [])],
        "title string, links array<string>",
    )
    und = {frozenset((a, b)) for a, bs in adj.items() for b in bs if a != b}
    naive = sum(
        1
        for tri in combinations(nodes, 3)
        if all(frozenset(p) in und for p in combinations(tri, 2))
    )
    row = triangle_count(pages).first()
    assert row["n_triangles"] == naive
    assert row["n_edges"] == len(und)


_doc_texts = st.lists(
    st.text(
        alphabet=st.characters(exclude_categories=("Cs",)),
        max_size=40,
    ),
    min_size=1,
    max_size=10,
)


@given(texts=_doc_texts, budget=st.integers(min_value=1, max_value=50))
@_SETTINGS
def test_pack_sequences_conserves_all_tokens(spark, texts, budget):
    """For ANY corpus and budget, the output equals a pure-Python
    replay of the packing semantics: lay docs out in (md5(doc_id),
    doc_id) order, assign each to chunk floor(tokens_before/budget),
    aggregate.  (An earlier version asserted contiguous seq ids —
    false in general: a doc longer than the budget covers whole chunks,
    which then contain no STARTING doc and legitimately emit no row;
    hypothesis found ['', '0 0'] at budget 1.)"""
    import hashlib
    import re

    from pagerank_using_mapreduce_spark.operators.packing import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = pack_sequences(docs, budget=budget).collect()
    got = {r["seq_id"]: (r["n_docs"], r["n_tokens"]) for r in rows}

    # trim in Spark/DuckDB strips SPACES only (not \r\t etc.), and the
    # split regex is ' +' — mirror that exactly, not Python's .strip()
    def ntok(s):
        return len([t for t in re.split(" +", s.strip(" ").lower()) if t])

    order = sorted(
        enumerate(texts),
        key=lambda p: (hashlib.md5(str(p[0]).encode()).hexdigest(), p[0]),
    )
    expect: dict[int, list[int]] = {}
    cum = 0
    for doc_id, s in order:
        n = ntok(s)
        seq = cum // budget
        d = expect.setdefault(seq, [0, 0])
        d[0] += 1
        d[1] += n
        cum += n
    assert got == {k: tuple(v) for k, v in expect.items()}


@given(
    n=st.integers(min_value=1, max_value=12),
    k=st.integers(min_value=1, max_value=15),
)
@_SETTINGS
def test_bottom_k_sample_size_and_subset(spark, n, k):
    """|sample| == min(k, n) for ANY k/n, and the sample is a subset
    of the input keys."""
    from pagerank_using_mapreduce_spark.operators.sampling import (
        bottom_k_sample,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(n)], "doc_id long, text string"
    )
    got = [r["doc_id"] for r in bottom_k_sample(docs, "doc_id", k=k).collect()]
    assert len(got) == min(k, n)
    assert len(set(got)) == len(got)
    assert set(got) <= set(range(n))


@given(
    texts=st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=400), min_size=1, max_size=6
    ),
    max_len=st.integers(min_value=2, max_value=20),
    stride_frac=st.integers(min_value=1, max_value=20),
)
@_SETTINGS
def test_chunk_windows_covers_every_token(spark, texts, max_len, stride_frac):
    """For ANY corpus and any 0 < stride <= max_len: the chunks of a
    document tile [0, n) exactly — chunk c starts at c*stride, the
    last chunk ends at n, every chunk is non-empty and <= max_len,
    and consecutive chunks overlap by exactly max_len - stride
    (except the final chunk, which may overlap more)."""
    from pagerank_using_mapreduce_spark.operators.packing import chunk_windows

    stride = max(1, min(max_len, stride_frac))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = {}
    for r in chunk_windows(df, max_len=max_len, stride=stride).collect():
        out.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_len"]))
    for i, t in enumerate(texts):
        n = len([w for w in t.strip().lower().split(" ") if w])
        chunks = sorted(out.get(i, []))
        if n == 0:
            assert chunks == []
            continue
        # contiguous ids 0..k-1; every chunk non-empty and bounded
        assert [c for c, _ in chunks] == list(range(len(chunks)))
        assert all(1 <= ln <= max_len for _, ln in chunks)
        # full coverage: last chunk reaches n; every start is covered
        last_id, last_len = chunks[-1]
        assert last_id * stride + last_len == n
        # all but the last chunk are full-length (start+max_len <= n
        # implies another stride fits or the next chunk covers the rest)
        for c, ln in chunks[:-1]:
            assert ln == max_len


def _ref_bpe(texts, n_merges):
    """Pure-python BPE reference: same tokenization, greedy fusion,
    count-then-lex-min tiebreak."""
    import collections
    import re

    vocab = collections.Counter()
    for t in texts:
        for w in re.sub(r"[^a-zA-Z]+", " ", t).strip().lower().split(" "):
            if w:
                vocab[w] += 1
    syms = {w: list(w) for w in vocab}
    out = []
    for i in range(n_merges):
        counts = collections.Counter()
        for w, f in vocab.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        out.append((i, l, r, c))
        for w in vocab:
            s, ns = syms[w], []
            for x in s:
                if ns and ns[-1] == l and x == r:
                    ns[-1] = l + r
                else:
                    ns.append(x)
            syms[w] = ns
    return out


@given(
    texts=st.lists(
        st.text(alphabet="abc d", min_size=0, max_size=60),
        min_size=1,
        max_size=5,
    ),
    n_merges=st.integers(min_value=1, max_value=4),
)
@_SETTINGS
def test_bpe_matches_python_reference(spark, texts, n_merges):
    """For ANY corpus, the distributed trainer reproduces the exact
    merge trajectory of a sequential reference implementation —
    pair counts, tiebreaks, greedy fusion and early stop included."""
    from pagerank_using_mapreduce_spark.operators.bpe import bpe_merges

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = [
        (r["merge_idx"], r["left"], r["right"], r["pair_count"])
        for r in bpe_merges(df, n_merges=n_merges).orderBy("merge_idx").collect()
    ]
    assert got == _ref_bpe(texts, n_merges)


@given(
    n_heavy=st.integers(min_value=4, max_value=40),
    n_light=st.integers(min_value=4, max_value=40),
    w_heavy=st.integers(min_value=2, max_value=5),
)
@_SETTINGS
def test_curriculum_prefix_proportionality(spark, n_heavy, n_light, w_heavy):
    """For ANY two-source corpus with weights (w, 1): in every prefix
    of the schedule that still has both sources unexhausted, the
    heavy source's count stays within one interleave period of
    w x the light source's count — the defining property of the
    rational r/w schedule."""
    from pyspark.sql import functions as F

    from pagerank_using_mapreduce_spark.operators.sampling import (
        curriculum_order,
    )

    rows = [(f"h{i}", "heavy") for i in range(n_heavy)] + [
        (f"l{i}", "light") for i in range(n_light)
    ]
    df = spark.createDataFrame(rows, ["id", "source"])
    w = F.when(F.col("source") == "heavy", w_heavy).otherwise(1)
    ordered = [
        r["source"]
        for r in sorted(
            curriculum_order(df, "source", "id", weight=w).collect(),
            key=lambda r: r["pos"],
        )
    ]
    assert sorted(ordered) == sorted(r[1] for r in rows)  # permutation
    h = l = 0
    for s in ordered:
        if s == "heavy":
            h += 1
        else:
            l += 1
        if h < n_heavy and l < n_light:
            # heavy rank r appears at key ~r/w, light rank q at ~q:
            # within any prefix, h/w and l differ by at most 1 period
            assert abs(h / w_heavy - l) <= w_heavy + 1, (h, l, ordered)


_para_texts = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=25
    ).map(" ".join),
    min_size=1,
    max_size=6,
)


@given(texts=_para_texts)
@_SETTINGS
def test_paragraph_dedup_accounting_property(spark, texts):
    """For ANY corpus: kept + dropped == paragraphs per doc, and the
    total kept count equals the number of DISTINCT paragraphs (each
    survives exactly once, somewhere)."""
    from pagerank_using_mapreduce_spark.operators.dedup import (
        PARA_WORDS,
        paragraph_dedup,
        paragraphs,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = paragraph_dedup(docs).collect()
    assert all(r["n_kept"] + r["n_dropped"] == r["n_paras"] for r in rows)
    total_kept = sum(r["n_kept"] for r in rows)
    n_distinct = (
        paragraphs(docs, PARA_WORDS).select("para_hash").distinct().count()
    )
    assert total_kept == n_distinct


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=40), min_size=2, max_size=4),
    seed=st.sampled_from(["t0", "t1"]),
)
@_SETTINGS
def test_temperature_mix_property(spark, sizes, seed):
    """For ANY group-size profile: admitted <= before per group, the
    smallest group keeps everything, and membership is layout-stable."""
    from pagerank_using_mapreduce_spark.operators.sampling import (
        temperature_mix,
        temperature_mix_summary,
    )

    rows = [
        (g * 1000 + i, f"g{g}") for g, n in enumerate(sizes) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "key long, lang string")
    summ = {r["grp"]: r for r in temperature_mix_summary(df, "lang", "key", seed).collect()}
    mn = min(sizes)
    for g, n in enumerate(sizes):
        r = summ[f"g{g}"]
        assert r["n_after"] <= r["n_before"] == n
        if n == mn:
            assert r["thr"] == 65536 and r["n_after"] == n
    a = sorted(r["key"] for r in temperature_mix(df, "lang", "key", seed).collect())
    b = sorted(
        r["key"]
        for r in temperature_mix(df.repartition(5), "lang", "key", seed).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# Round-6 operator invariants
# ---------------------------------------------------------------------------

_pair_lists = st.lists(
    st.tuples(
        st.text(alphabet="abcde", min_size=1, max_size=2),
        st.text(alphabet="abcde", min_size=1, max_size=2),
        st.integers(min_value=1, max_value=100),
    ),
    max_size=12,
)


@given(top=_pair_lists)
@settings(max_examples=200, deadline=None)
def test_keep_disjoint_invariants(top):
    """Pure-Python greedy batch rule: survivors pairwise symbol-
    disjoint, first pair always kept, greedy-maximal (every dropped
    pair conflicts with some KEPT pair)."""
    from pagerank_using_mapreduce_spark.operators.bpe import _keep_disjoint

    kept = _keep_disjoint(top)
    # symbols disjoint ACROSS pairs (l == r within one pair is legal —
    # the classic (a, a) run merge); rights therefore unique
    sets = [{l, r} for l, r, _ in kept]
    for i, a in enumerate(sets):
        for b in sets[i + 1 :]:
            assert not (a & b), (a, b)
    if top:
        assert kept[0] == top[0]
    kept_syms = {s for ps in sets for s in ps}
    for p in top:
        if p not in kept:
            assert p[0] in kept_syms or p[1] in kept_syms


_event_times = st.lists(
    st.integers(min_value=0, max_value=3 * 3600 * 1_000_000),
    min_size=1,
    max_size=12,
)


@given(times=_event_times)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_w9_conservation_and_w7_consistency(spark, times):
    """For ANY event layout: splice pieces conserve each session's
    half-open span, every piece fits inside one hour, and w7's
    timeline covers exactly the spine from first to last marker
    hour."""
    import datetime as dt

    from pagerank_using_mapreduce_spark.plans.relational import (
        _HOUR_US,
        _session_intervals,
        concurrency_timeline,
        session_splice,
    )
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 3, 1)
    rows = [
        (i, base + dt.timedelta(microseconds=t), 1, "click", 1.0, "{}")
        for i, t in enumerate(sorted(set(times)))
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    pieces = session_splice(ev).collect()
    spans = {
        (r["user_id"], r["sess_id"]): r["e"] + 1 - r["s"]
        for r in _session_intervals(ev).collect()
    }
    got = {}
    for p in pieces:
        assert 0 <= p["piece_us"] <= _HOUR_US
        k = (p["user_id"], p["sess_id"])
        got[k] = got.get(k, 0) + p["piece_us"]
    assert got == spans
    tl = concurrency_timeline(ev).collect()
    hours = [r["hour"] for r in tl]
    assert hours == list(range(min(hours), max(hours) + 1))  # dense spine
    assert all(r["max_active"] >= 0 for r in tl)


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=50), min_size=1, max_size=40
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_x96_nearest_rank_property(spark, vals):
    """Grouped percentile = sorted()[ceil(p/100*n)-1] for any value
    multiset (single synthetic source)."""
    import math

    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        length_percentiles,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * v) if v else "", "en", "s0", 1)
         for i, v in enumerate(vals)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    row = length_percentiles(docs).collect()[0]
    svals = sorted(vals)
    for p, col in ((50, "p50"), (90, "p90"), (99, "p99")):
        want = svals[math.ceil(p / 100 * len(svals)) - 1]
        assert row[col] == want, (p, row[col], want, svals)
