"""Sequence packing: conservation, chunk semantics, and the
distributed-prefix-sum == single-node reference property."""

from __future__ import annotations

import hashlib

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
