"""BPE merge training: hand-computed golden trajectory, greedy-overlap
fold semantics, early stop, and Spark/DuckDB twin agreement."""

from __future__ import annotations

from pagerank_using_mapreduce_spark.operators.bpe import bpe_merges


def _run(spark, texts, n_merges=8):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    return [
        (r["merge_idx"], r["left"], r["right"], r["pair_count"])
        for r in bpe_merges(df, n_merges=n_merges)
        .orderBy("merge_idx")
        .collect()
    ]


def test_bpe_golden_low_lower_lowest(spark):
    """The textbook corpus: ties break on the lexicographically
    smallest pair, and training stops when no pairs remain."""
    got = _run(spark, ["low low low lower lowest"])
    assert got == [
        (0, "l", "o", 5),   # (l,o) and (o,w) tie at 5 -> lex min
        (1, "lo", "w", 5),
        (2, "low", "e", 2),
        (3, "lowe", "r", 1),  # three 1-ties -> min (left, right)
        (4, "lowe", "s", 1),
        (5, "lowes", "t", 1),
    ]  # vocabulary fully fused after 6 merges -> early stop


def test_bpe_greedy_overlap(spark):
    """'aaaa' under merge (a,a) fuses left-to-right into aa|aa — the
    fused symbol cannot re-pair with the next raw 'a'."""
    got = _run(spark, ["aaaa aaaa b"], n_merges=2)
    assert got[0] == (0, "a", "a", 6)  # 3 adjacent pairs per word x2
    assert got[1] == (1, "aa", "aa", 2)


def test_bpe_sql_twin_agrees(spark):
    import duckdb

    from pagerank_using_mapreduce_spark.operators.bpe import bpe_merges_sql

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = [
        (int(r.merge_idx), r.left, r.right, int(r.pair_count))
        for _, r in con.execute(bpe_merges_sql(4)).df().iterrows()
    ]
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = [
        (r["merge_idx"], r["left"], r["right"], r["pair_count"])
        for r in bpe_merges(docs, n_merges=4).orderBy("merge_idx").collect()
    ]
    assert got == sorted(want) and len(got) == 4


def test_bpe_encode_counts_golden(spark):
    """Encoding with the just-trained table: the textbook corpus fully
    fuses every word after 6 merges (1 subword each); truncating to 2
    merges leaves only the 'low' prefix fused."""
    from pagerank_using_mapreduce_spark.operators.bpe import bpe_encode_counts

    df = spark.createDataFrame(
        [(0, "low low low lower lowest")], ["doc_id", "text"]
    )
    full = bpe_encode_counts(df, n_merges=8).collect()[0]
    assert (full["n_tokens"], full["n_subwords"]) == (5, 5)
    two = bpe_encode_counts(df, n_merges=2).collect()[0]
    # low -> [low] x3; lower -> [low,e,r]; lowest -> [low,e,s,t]
    assert (two["n_tokens"], two["n_subwords"]) == (5, 10)
    zero = bpe_encode_counts(df, n_merges=0).collect()[0]
    # no merges: one subword per character (3*3 + 5 + 6 = 20)
    assert (zero["n_tokens"], zero["n_subwords"]) == (5, 20)


def test_fertility_bounds_and_conservation(spark):
    """Fertility >= 1e6 for every language (a word is at least one
    subword) and the per-lang token/subword totals must sum to the
    corpus-wide x62 totals."""
    from pyspark.sql import functions as F

    from pagerank_using_mapreduce_spark.operators.bpe import bpe_encode_counts
    from pagerank_using_mapreduce_spark.plans.extensions import (
        q_x87_tokenizer_fertility,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = q_x87_tokenizer_fertility(spark, sf).collect()
    assert rows
    for r in rows:
        assert r["fertility_e6"] >= 1_000_000, r
        assert r["n_subwords"] >= r["n_tokens"], r
    tot = bpe_encode_counts(load_table(spark, sf, "documents")).agg(
        F.sum("n_tokens"), F.sum("n_subwords")
    ).collect()[0]
    assert sum(r["n_tokens"] for r in rows) == tot[0]
    assert sum(r["n_subwords"] for r in rows) == tot[1]


def test_keep_disjoint_rule():
    """The greedy-maximal batch rule: keep every ranked pair whose
    symbols are unused by already-KEPT pairs (a dropped pair does not
    block later ones)."""
    from pagerank_using_mapreduce_spark.operators.bpe import _keep_disjoint

    top = [("a", "b", 10), ("b", "c", 9), ("c", "d", 8), ("e", "f", 7)]
    # (b,c) blocked by kept (a,b); (c,d) NOT blocked — (b,c) was
    # dropped, its symbols stay free; (e,f) clean
    assert _keep_disjoint(top) == [
        ("a", "b", 10), ("c", "d", 8), ("e", "f", 7)
    ]
    # survivors are pairwise symbol-disjoint, rights unique
    kept = _keep_disjoint(top)
    syms = [s for l, r, _ in kept for s in (l, r)]
    assert len(syms) == len(set(syms))


def test_batched_batch1_equals_sequential(spark):
    """batch=1 must replay EXACTLY the sequential trajectory."""
    from pagerank_using_mapreduce_spark.operators.bpe import (
        bpe_merges,
        bpe_merges_batched,
    )

    docs = spark.createDataFrame(
        [(0, "low lower lowest"), (1, "new newer newest lower")],
        ["doc_id", "text"],
    )
    seq = [
        (r["merge_idx"], r["left"], r["right"], r["pair_count"])
        for r in bpe_merges(docs, n_merges=6).orderBy("merge_idx").collect()
    ]
    bat = [
        (r["merge_idx"], r["left"], r["right"], r["pair_count"])
        for r in bpe_merges_batched(docs, rounds=6, batch=1)
        .orderBy("merge_idx")
        .collect()
    ]
    assert bat == seq


def test_batched_fewer_roundtrips(spark):
    """The point of batching: many merges per driver round-trip.  On
    real corpus data 2 rounds x batch 8 must land MORE merges than
    2 sequential rounds would (i.e. >2), with all within-round
    survivors symbol-disjoint."""
    from pagerank_using_mapreduce_spark.operators.bpe import bpe_merges_batched

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = bpe_merges_batched(docs, rounds=2, batch=8).collect()
    assert len(rows) > 2 * 1, len(rows)
    for k in (0, 1):
        batch = [(r["left"], r["right"]) for r in rows if r["round"] == k]
        syms = [s for p in batch for s in p]
        assert len(syms) == len(set(syms)), f"round {k} not disjoint"


def test_batched_sql_twin_agrees(spark):
    import duckdb

    from pagerank_using_mapreduce_spark.operators.bpe import (
        bpe_merges_batched,
        bpe_merges_batched_sql,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = [
        (int(r["merge_idx"]), int(r["round"]), r["left"], r["right"],
         int(r["pair_count"]))
        for _, r in con.execute(bpe_merges_batched_sql(2, 6)).df().iterrows()
    ]
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = [
        (r["merge_idx"], r["round"], r["left"], r["right"], r["pair_count"])
        for r in bpe_merges_batched(docs, rounds=2, batch=6)
        .orderBy("merge_idx")
        .collect()
    ]
    assert got == want and len(got) > 2


def test_batched_sql_twin_agrees_with_lookahead(spark):
    """ADVICE r07: the candidate lookahead (deeper ranked scan before
    the disjoint cap) changes the training trajectory, so the SQL twin
    must replay it — trajectory parity at lookahead > batch, and the
    lookahead must land MORE merges per round than the default (the
    reason the knob exists)."""
    import duckdb

    from pagerank_using_mapreduce_spark.operators.bpe import (
        bpe_merges_batched,
        bpe_merges_batched_sql,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = [
        (int(r["merge_idx"]), int(r["round"]), r["left"], r["right"],
         int(r["pair_count"]))
        for _, r in con.execute(
            bpe_merges_batched_sql(2, 6, lookahead=48)
        ).df().iterrows()
    ]
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = [
        (r["merge_idx"], r["round"], r["left"], r["right"], r["pair_count"])
        for r in bpe_merges_batched(docs, rounds=2, batch=6, lookahead=48)
        .orderBy("merge_idx")
        .collect()
    ]
    assert got == want
    # deeper scan fills the batch fuller than the default cap=lookahead
    default_rows = con.execute(bpe_merges_batched_sql(2, 6)).df()
    assert len(got) >= len(default_rows)
