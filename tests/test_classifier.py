"""x129/x130 hashed linear quality classifier: semantics goldens
(hand-recomputed md5 hashing + integer milli-weight dot product),
the every-doc-survives guarantee, DuckDB twin agreement on real
testdata, and the plan shape that makes it 100-TB-safe (the model
relation broadcasts; the exploded corpus stream never does)."""

from __future__ import annotations

import hashlib
import math

import duckdb
from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.operators.text_analysis import (
    CLASSIFIER_BUCKETS,
    classifier_calibration,
    classifier_calibration_sql,
    classifier_score,
    classifier_score_sql,
    classifier_weights,
)
from tests.conftest import SF_SMOKE


def _h40(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:10], 16)


def _weight(bucket: int) -> int:
    return _h40(f"w#{bucket}") % 2001 - 1000


def _expected(text: str) -> tuple[int, int, int]:
    toks = [
        t
        for t in "".join(c if c.isalpha() else " " for c in text)
        .lower()
        .strip()
        .split()
        if t
    ]
    if not toks:
        return (0, 0, 0)
    sw = sum(_weight(_h40(t) % CLASSIFIER_BUCKETS) for t in toks)
    score = math.floor(sw / (len(toks) * 1000.0) * 1e6 + 0.5000001)
    return (len(toks), sw, score)


def test_classifier_score_semantics(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "spark spark spark"),
        (3, "1234 ... !!"),  # no alpha tokens -> survives with score 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.sum_w, r.score_e6)
        for r in classifier_score(docs, classifier_weights(spark)).collect()
    }
    assert got == {d: _expected(t) for d, t in rows}


def test_classifier_score_sql_twin_agrees(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS"
        f" SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    want = {
        (int(r.doc_id), int(r.n_tokens), int(r.sum_w), int(r.score_e6))
        for _, r in con.execute(classifier_score_sql()).df().iterrows()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = {
        tuple(r)
        for r in classifier_score(docs, classifier_weights(spark)).collect()
    }
    assert got == want
    assert len(got) == docs.count()  # every doc survives


def test_classifier_calibration_sql_twin_agrees(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS"
        f" SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    want = {
        tuple(int(v) if not isinstance(v, str) else v for v in r)
        for r in con.execute(classifier_calibration_sql()).fetchall()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = {
        tuple(r)
        for r in classifier_calibration(
            docs, classifier_weights(spark)
        ).collect()
    }
    assert got == want
    # threshold 0 must actually discriminate on this corpus (a keep
    # fraction of 0 or 1 everywhere would make x130 a vacuous gate)
    fracs = {r[-1] for r in got}
    assert any(0 < f < 1_000_000 for f in fracs)


def test_classifier_plan_broadcasts_model_not_corpus(spark):
    """The 4096-row model is the build side of a broadcast hash join;
    the exploded token stream must never sit under a
    BroadcastExchange (at 100 TB that's an OOM, not a plan choice)."""
    from tests.test_plans import _broadcast_subtrees, _plan, _scan_ids

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = _plan(classifier_score(docs, classifier_weights(spark)))
    assert "BroadcastHashJoin" in plan
    subs = _broadcast_subtrees(plan)
    assert subs, "expected a BroadcastExchange (the model build side)"
    doc_ids = _scan_ids(plan, "documents")
    assert doc_ids, "expected a documents scan"
    for sub in subs:
        assert "Generate" not in sub, "exploded stream inside a broadcast"
        for did in doc_ids:
            assert f"({did})" not in sub, "corpus scan inside a broadcast"


# ---------------------------------------------------------------------------
# x131 perceptron training
# ---------------------------------------------------------------------------


def test_perceptron_separable_golden(spark):
    """On a linearly separable toy (positive docs say 'good', negative
    docs say 'bad'; no shared tokens), round 1's all-errors update
    already separates: w[bucket(good)] > 0 > w[bucket(bad)], and the
    learned model scores every doc on the correct side."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        classifier_score,
        perceptron_train,
    )

    rows = [
        (1, "good clean prose", 1),
        (2, "good solid text", 1),
        (3, "bad noisy junk", -1),
        (4, "bad broken spam", -1),
    ]
    docs = spark.createDataFrame(
        [(d, t) for d, t, _ in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(d, y) for d, _, y in rows], "doc_id long, y long"
    )
    w = perceptron_train(docs, rounds=3, labels=labels)
    wmap = {r.bucket: r.w for r in w.collect()}
    gb = _h40("good") % CLASSIFIER_BUCKETS
    bb = _h40("bad") % CLASSIFIER_BUCKETS
    assert wmap[gb] > 0 > wmap[bb]
    # the learned model separates perfectly through the x129 scorer
    scored = {
        r.doc_id: r.score_e6 for r in classifier_score(docs, w).collect()
    }
    for d, _, y in rows:
        assert (scored[d] > 0) == (y > 0)


def test_perceptron_sql_twin_agrees(spark):
    """Exact integer replay: 3 unrolled rounds in DuckDB == the Spark
    driver loop, bucket for bucket, on real testdata."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        perceptron_train,
        perceptron_train_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS"
        f" SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    want = {
        (int(b), int(w))
        for b, w in con.execute(perceptron_train_sql()).fetchall()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = {tuple(r) for r in perceptron_train(docs).collect()}
    assert got == want
    assert got  # the distillation target is learnable enough to move weights


# ---------------------------------------------------------------------------
# x132 budgeted quality mix
# ---------------------------------------------------------------------------


def test_quality_mix_golden_with_cutoff_ties(spark):
    """Source A (n=4, scores 9/5/5/1) at min_n=1 keeps
    floor(sqrt(1/4)*4) = 2: the 9 plus the MIN-ID 5 (deterministic
    boundary tiebreak); source B (the smallest) survives whole."""
    from pagerank_using_mapreduce_spark.operators.sampling import (
        quality_budget_mix,
    )

    rows = [
        (1, "A", 9),
        (2, "A", 5),
        (3, "A", 5),
        (4, "A", 1),
        (5, "B", 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, score long")
    kept = {
        r.doc_id for r in quality_budget_mix(df, "src", "score", "doc_id").collect()
    }
    assert kept == {1, 2, 5}


def test_quality_mix_sql_twin_agrees(spark):
    """Twin parity on real testdata with n_chars as the score (the
    allocation/cutoff/tiebreak machinery is score-agnostic)."""
    from pagerank_using_mapreduce_spark.operators.sampling import (
        quality_budget_mix,
        quality_budget_mix_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS"
        f" SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    # sources are equal-sized on testdata (temperature keeps all), so
    # derive a SKEWED grouping: 'small' (125 docs) vs 'big' (375) ->
    # big keeps floor(sqrt(125/375)*375) = 216
    grp = "CASE WHEN doc_id % 4 = 0 THEN 'small' ELSE 'big' END"
    sql = quality_budget_mix_sql(
        f"SELECT doc_id, {grp} AS grp, n_chars FROM documents",
        "grp",
        "n_chars",
        "doc_id",
        out_cols="doc_id, grp, n_chars",
    )
    want = {
        (int(d), s, int(n)) for d, s, n in con.execute(sql).fetchall()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").selectExpr(
        "doc_id", f"{grp} AS grp", "n_chars"
    )
    got = {
        tuple(r)
        for r in quality_budget_mix(docs, "grp", "n_chars", "doc_id").collect()
    }
    assert got == want
    # the skewed group is downsampled to its temperature share; the
    # small group survives whole
    by_grp = {}
    for _, s, _ in got:
        by_grp[s] = by_grp.get(s, 0) + 1
    assert by_grp == {"small": 125, "big": 216}


# ---------------------------------------------------------------------------
# z20 streaming classifier scoring
# ---------------------------------------------------------------------------


def test_stream_classifier_drains_to_batch(spark):
    """The foreachBatch-scored document stream must drain to EXACTLY
    the batch x129 relation: per-doc scores are independent, so
    micro-batch partitioning cannot change a single row."""
    from pagerank_using_mapreduce_spark.plans.registry import QUERIES

    drained = {
        tuple(r)
        for r in QUERIES["z20_stream_classifier"](spark, SF_SMOKE).collect()
    }
    batch = {
        tuple(r)
        for r in QUERIES["x129_classifier_scores"](spark, SF_SMOKE).collect()
    }
    assert drained == batch and drained


# ---------------------------------------------------------------------------
# c6 trained-filter curation capstone
# ---------------------------------------------------------------------------


def test_c6_trained_gate_differs_from_x8_golden(spark):
    """The c6 loop's POINT is that the trained filter generalizes
    beyond its own teacher: on this fixture the x131-trained model +
    per-source mean-score gate keeps doc 2 — a clean-prose doc whose
    x8 composite (348088) falls just below the distillation cutoff
    (355000) but whose VOCABULARY matches the high-quality docs the
    perceptron learned from — while the x8-composite gate drops it.
    Golden: trained keep {1,2,5,6} vs x8 keep {1,5,6}, difference
    exactly {2}."""
    from pagerank_using_mapreduce_spark.operators.text_analysis import (
        PERCEPTRON_LABEL_CUTOFF_E6,
        perceptron_train,
        quality_score,
    )

    rows = [
        (1, "alpha", "the gentle river flows through the quiet valley carrying stories of distant mountains and patient stones"),
        (2, "alpha", "morning light settles over the orchard while workers gather baskets of ripe apples under a clear sky"),
        (3, "alpha", "river valley mountains!!!"),
        (4, "alpha", "zz qq xx !!"),
        (5, "beta", "scholars of the old library preserved careful records of harvests voyages and the slow growth of cities"),
        (6, "beta", "the careful records of the library describe the growth of the river valley and the orchard harvests in detail"),
        (7, "beta", "qq zz !!"),
        (8, "beta", "library records growth"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    x8_keep = {
        r.doc_id
        for r in quality_score(docs)
        .where(F.col("quality_e6") >= PERCEPTRON_LABEL_CUTOFF_E6)
        .collect()
    }
    model = perceptron_train(docs)
    scored = docs.select("doc_id", "source").join(
        classifier_score(docs, model).select("doc_id", "score_e6"), "doc_id"
    )
    calib = scored.groupBy("source").agg(
        F.count("*").alias("n"), F.sum("score_e6").alias("sm")
    )
    trained_keep = {
        r.doc_id
        for r in scored.join(F.broadcast(calib), "source")
        .where(F.col("score_e6") * F.col("n") >= F.col("sm"))
        .collect()
    }
    assert x8_keep == {1, 5, 6}
    assert trained_keep == {1, 2, 5, 6}
    assert trained_keep ^ x8_keep == {2}


def test_c6_manifest_shape_and_oracle(spark):
    """c6 end-to-end on real testdata: the composed manifest has
    C4_SHARDS rows, positive token totals, and hash-matches its DuckDB
    twin (the same check the driver runs)."""
    import duckdb as _dd
    import pandas as pd

    from pagerank_using_mapreduce_spark.plans.registry import ORACLE_SQL, QUERIES

    got = QUERIES["c6_trained_curation"](spark, SF_SMOKE).toPandas()
    con = _dd.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    want = con.execute(ORACLE_SQL["c6_trained_curation"]).df()
    got = got[sorted(got.columns)].sort_values(by=sorted(got.columns), ignore_index=True)
    want = want[sorted(want.columns)].sort_values(by=sorted(want.columns), ignore_index=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    assert (got["total_tokens"] > 0).all()
