"""Sequence packing: conservation, chunk semantics, and the
distributed-prefix-sum == single-node reference property."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.operators.packing import (
    pack_sequences,
    pack_sequences_sql,
)

SF = "/root/testdata/sf0.001"


def _reference_pack(rows, budget):
    """Single-process reference: same (md5, doc_id) order, same
    start-offset chunk assignment."""
    def ntok(text):
        return len([t for t in text.strip().lower().split(" ") if t])

    ordered = sorted(
        rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0])
    )
    out, cum = {}, 0
    for doc_id, text in ordered:
        n = ntok(text)
        seq = cum // budget
        d, t = out.get(seq, (0, 0))
        out[seq] = (d + 1, t + n)
        cum += n
    return out


def test_pack_sequences_matches_reference_and_conserves(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    budget = 512
    got = {
        r["seq_id"]: (r["n_docs"], r["n_tokens"])
        for r in pack_sequences(docs, budget=budget).collect()
    }
    want = _reference_pack(rows, budget)
    assert got == want
    # conservation: every doc and every token lands in exactly one seq
    assert sum(d for d, _ in got.values()) == len(rows)
    total_tok = sum(t for _, t in want.values())
    assert sum(t for _, t in got.values()) == total_tok
    # seq ids are the contiguous chunk range
    assert sorted(got) == list(range((total_tok - 1) // budget + 1))


def test_pack_sequences_partitioning_invariant(spark):
    """The distributed prefix sum gives identical results whatever the
    partition count — offsets glue the per-partition windows into one
    global order."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {tuple(r) for r in pack_sequences(docs, budget=777, num_partitions=1).collect()}
    b = {tuple(r) for r in pack_sequences(docs, budget=777, num_partitions=13).collect()}
    assert a == b


def test_pack_sequences_sql_twin_agrees(spark):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = {
        (int(r.seq_id), int(r.n_docs), int(r.n_tokens))
        for _, r in con.execute(pack_sequences_sql()).df().iterrows()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        (r["seq_id"], r["n_docs"], r["n_tokens"])
        for r in pack_sequences(docs).collect()
    }
    assert got == want


def _reference_chunks(text, max_len, stride):
    tk = [t for t in text.strip().lower().split(" ") if t]
    n = len(tk)
    if n == 0:
        return []
    n_chunks = 1 + max(0, -(-(n - max_len) // stride))
    out = []
    for c in range(n_chunks):
        start = c * stride
        clen = min(max_len, n - start)
        out.append((c, clen, tk[start], tk[start + clen - 1]))
    return out


def test_chunk_windows_matches_reference(spark):
    """Multi-chunk, boundary, and single-chunk docs against a pure
    python reference; every token covered by >= 1 chunk."""
    from pagerank_using_mapreduce_spark.operators.packing import chunk_windows

    docs = [
        ("long", " ".join(f"w{i}" for i in range(300))),   # 3 chunks
        ("exact", " ".join(f"v{i}" for i in range(128))),  # 1 chunk exactly
        ("plusone", " ".join(f"u{i}" for i in range(129))),  # straddles
        ("short", "a b c"),
        ("empty", "   "),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {}
    for r in chunk_windows(df, max_len=128, stride=96).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_len"], r["first_tok"], r["last_tok"])
        )
    for doc_id, text in docs:
        want = _reference_chunks(text, 128, 96)
        assert sorted(got.get(doc_id, [])) == want, doc_id
    # coverage: last chunk of 'long' reaches token 300
    lc = max(got["long"])
    assert lc[0] * 96 + lc[1] == 300
    # 'plusone': second chunk holds tokens 97..129 (33 tokens)
    assert got["plusone"][1][1] == 33


def test_chunk_windows_sql_twin_agrees(spark):
    import duckdb

    from pagerank_using_mapreduce_spark.operators.packing import (
        chunk_windows,
        chunk_windows_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    # small max_len so real testdata docs produce multi-chunk fanouts
    want = sorted(
        (int(r.doc_id), int(r.chunk_id), int(r.chunk_len), r.first_tok, r.last_tok)
        for _, r in con.execute(chunk_windows_sql(16, 10)).df().iterrows()
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_len"], r["first_tok"], r["last_tok"])
        for r in chunk_windows(docs, max_len=16, stride=10).collect()
    )
    assert got == want and len(got) > 200  # genuinely multi-chunk


def test_shard_manifest_balance_and_conservation(spark):
    """Serpentine token-balancing: every doc in exactly one shard,
    token totals conserved, and the shard spread is bounded by one
    max-document (the serpentine pairing guarantee) — a count-hash
    assignment has no such bound under heavy-tailed lengths."""
    from pagerank_using_mapreduce_spark.functions.textops import tokens as toks
    from pagerank_using_mapreduce_spark.operators.packing import (
        MANIFEST_SHARDS,
        shard_manifest,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = shard_manifest(docs).collect()
    assert sorted(r["shard"] for r in out) == list(range(MANIFEST_SHARDS))
    per_doc = docs.select(F.size(toks("text")).cast("long").alias("n")).agg(
        F.count("*").alias("docs"), F.sum("n").alias("tok"), F.max("n").alias("mx")
    ).collect()[0]
    assert sum(r["n_docs"] for r in out) == per_doc["docs"]
    assert sum(r["total_tokens"] for r in out) == per_doc["tok"]
    totals = [r["total_tokens"] for r in out]
    assert max(totals) - min(totals) <= per_doc["mx"], (totals, per_doc["mx"])


def test_c4_manifest_accounting(spark):
    """c4's shard totals must conserve the packed-sequence totals of
    the curated corpus, and balance within one max-sequence (<= the
    pack budget by construction, since no sequence exceeds ~budget
    tokens... the tail chunks are smaller, long docs can overflow a
    single sequence's count — bound by the true max)."""
    from pagerank_using_mapreduce_spark.plans.extensions import (
        C4_PACK_BUDGET,
        C4_SHARDS,
        q_c4_training_manifest,
    )

    sf = "/root/testdata/sf0.001"
    out = q_c4_training_manifest(spark, sf).collect()
    assert sorted(r["shard"] for r in out) == list(range(C4_SHARDS))
    # conservation against an independent recomputation of the packing
    from pyspark.sql import functions as FF

    from pagerank_using_mapreduce_spark.operators.packing import pack_sequences
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        fingerprint,
        quality_score,
    )
    from pagerank_using_mapreduce_spark.plans.extensions import (
        QUALITY_THR_E6,
        _docs,
    )

    docs = _docs(spark, sf)
    kept = quality_score(docs).where(
        FF.col("quality_e6") >= QUALITY_THR_E6
    ).select("doc_id")
    canon = (
        kept.join(fingerprint(docs), "doc_id")
        .groupBy("fp")
        .agg(FF.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    packed = pack_sequences(
        docs.join(canon, "doc_id").select("doc_id", "text"),
        budget=C4_PACK_BUDGET,
    ).agg(
        FF.count("*").alias("n"),
        FF.sum("n_tokens").alias("tok"),
        FF.max("n_tokens").alias("mx"),
    ).collect()[0]
    assert sum(r["n_seqs"] for r in out) == packed["n"]
    assert sum(r["total_tokens"] for r in out) == packed["tok"]
    totals = [r["total_tokens"] for r in out]
    assert max(totals) - min(totals) <= packed["mx"]
