"""PCA power iteration: golden direction on a constructed collection."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.operators.pca import (
    covariance_matrix,
    top_principal_component,
)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_covariance_diagonal_of_axis_spread(spark):
    """Points spread only along dim 0: cov is ~zero everywhere except
    c[0][0]."""
    emb = _emb_df(spark, [[-2.0, 0.0], [0.0, 0.0], [2.0, 0.0]])
    cov = {(r["i"], r["j"]): r["c"] for r in covariance_matrix(emb).collect()}
    assert cov[(0, 0)] > 0
    for key in [(0, 1), (1, 0), (1, 1)]:
        assert abs(cov[key]) < 1e-12


def test_top_pc_recovers_dominant_axis(spark):
    """Collection stretched 10x along the (1, 1) diagonal: the top PC
    must be the normalized diagonal (equal loadings, both positive
    after the sign fix)."""
    import random

    rng = random.Random(7)
    vecs = []
    for _ in range(60):
        t = rng.gauss(0, 10.0)   # dominant direction (1,1)/sqrt(2)
        s = rng.gauss(0, 0.5)    # minor direction (1,-1)/sqrt(2)
        vecs.append([t + s, t - s])
    out = {r["i"]: r["loading_e6"] for r in
           top_principal_component(_emb_df(spark, vecs)).collect()}
    assert out[0] == 1_000_000 or out[1] == 1_000_000  # max-abs scaled
    ratio = min(out[0], out[1]) / max(out[0], out[1])
    assert 0.9 < ratio <= 1.0, out  # near-equal positive loadings


def test_top_pc_sign_fixed_deterministic(spark):
    """Same collection with every vector negated gives the SAME
    loadings (eigenvectors are sign-ambiguous; the fix pins them)."""
    vecs = [[1.0, 2.0], [2.0, 4.5], [-1.0, -2.2], [0.5, 0.9]]
    neg = [[-a, -b] for a, b in vecs]
    a = sorted(map(tuple, top_principal_component(_emb_df(spark, vecs)).collect()))
    b = sorted(map(tuple, top_principal_component(_emb_df(spark, neg)).collect()))
    assert a == b
