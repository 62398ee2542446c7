"""Generator v4 semantics (tools/make_scaled_sf.py) — the decade
evidence is only as honest as the data generator, so its two load-
bearing properties are pinned here: (1) vocab="growing" makes the
distinct spelling domain scale with the corpus while vocab="replica"
keeps it position-bounded, and (2) embedding replicas are ORTHOGONAL
rotations of the base (within-replica cosines exact, cross-replica
scrambled).  Pure pandas/numpy — no SparkSession."""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from make_scaled_sf import make_scaled, marker_name  # noqa: E402

TOKEN = re.compile(r"[a-z]+")


def _write_src(path: str, n_docs: int = 40, n_vec: int = 24, dim: int = 8) -> None:
    os.makedirs(path, exist_ok=True)
    docs = pd.DataFrame(
        {
            "doc_id": range(n_docs),
            # 12 tokens/doc over a tiny fixed base vocabulary
            # (letters-only, like the repo's strip-non-alpha tokens)
            "text": [
                " ".join(f"w{chr(ord('a') + (i + j) % 5)}" for j in range(12))
                for i in range(n_docs)
            ],
            "lang": ["en"] * n_docs,
            "source": [f"s{i % 2}" for i in range(n_docs)],
            "n_chars": [36] * n_docs,
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(path, "documents.parquet"))
    rs = np.random.RandomState(7)
    vecs = rs.standard_normal((n_vec, dim)).astype(np.float32)
    emb = pd.DataFrame(
        {
            "vec_id": range(n_vec),
            "embedding": [v for v in vecs],
            "label": np.arange(n_vec, dtype=np.int32) % 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(emb, preserve_index=False),
                   os.path.join(path, "embeddings.parquet"))


def _vocab(doc_dir: str) -> set[str]:
    df = pq.read_table(doc_dir).to_pandas()
    words: set[str] = set()
    for t in df["text"]:
        words.update(TOKEN.findall(t.lower()))
    return words


@pytest.fixture(scope="module")
def src(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("decade_src"))
    _write_src(d)
    return d


def test_growing_vocab_scales_with_factor_replica_does_not(src, tmp_path):
    out = {}
    for mode in ("replica", "growing"):
        for factor in (3, 6):
            d = str(tmp_path / f"{mode}{factor}")
            make_scaled(src, d, factor, vocab=mode)
            out[(mode, factor)] = _vocab(os.path.join(d, "documents.parquet"))
            assert os.path.exists(os.path.join(d, marker_name(mode)))
    # replica mode: vocabulary is (replica, position)-bounded — doubling
    # the factor roughly doubles it (new replicas only), but the growing
    # mode must dominate it at every factor AND grow by ~the factor
    # ratio (each (k, position) spelling fans out by doc_id % 251)
    for factor in (3, 6):
        assert len(out[("growing", factor)]) > 2 * len(out[("replica", factor)])
    g3, g6 = len(out[("growing", 3)]), len(out[("growing", 6)])
    assert g6 > 1.7 * g3, (g3, g6)
    # replica 0 is byte-identical in both modes: base vocab present
    assert {"wa", "wb", "wc", "wd", "we"} <= out[("growing", 3)]


def test_docs_replica0_identical_and_ids_dense(src, tmp_path):
    d = str(tmp_path / "g4")
    make_scaled(src, d, 4, vocab="growing")
    base = pq.read_table(os.path.join(src, "documents.parquet")).to_pandas()
    scaled = (
        pq.read_table(os.path.join(d, "documents.parquet"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = len(base)
    assert list(scaled["doc_id"]) == list(range(4 * n))
    rep0 = scaled.iloc[:n].reset_index(drop=True)
    pd.testing.assert_series_equal(rep0["text"], base.sort_values("doc_id")["text"])


def test_embeddings_rotated_orthogonally(src, tmp_path):
    d = str(tmp_path / "e3")
    make_scaled(src, d, 3, vocab="replica")
    emb = (
        pq.read_table(os.path.join(d, "embeddings.parquet"))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    n = 24
    assert list(emb["vec_id"]) == list(range(3 * n))
    base = np.array(emb["embedding"][:n].tolist(), dtype=np.float64)
    rep1 = np.array(emb["embedding"][n : 2 * n].tolist(), dtype=np.float64)
    rep2 = np.array(emb["embedding"][2 * n :].tolist(), dtype=np.float64)

    def cosines(m):
        norm = m / np.linalg.norm(m, axis=1, keepdims=True)
        return norm @ norm.T

    # replica 0 byte-identical; labels preserved across replicas
    assert np.array_equal(base.astype(np.float32),
                          np.array(emb["embedding"][:n].tolist()))
    assert list(emb["label"][:n]) == list(emb["label"][n : 2 * n])
    # within-replica cosine structure preserved to float32 precision
    assert np.max(np.abs(cosines(rep1) - cosines(base))) < 1e-5
    assert np.max(np.abs(cosines(rep2) - cosines(base))) < 1e-5
    # cross-replica cosines scrambled: nothing near the 0.95 near-dup
    # threshold (dim 8 here, so sigma ~ 0.35 — bound loosely)
    b = base / np.linalg.norm(base, axis=1, keepdims=True)
    r1 = rep1 / np.linalg.norm(rep1, axis=1, keepdims=True)
    cross = b @ r1.T
    assert np.max(np.abs(cross)) < 0.95
    # and the rotations differ between replicas
    assert np.max(np.abs(rep1 - rep2)) > 0.1


def test_boiler_mode_plants_shared_paragraph(tmp_path):
    """vocab="boiler": every k >= 1 replica doc carries the FIXED
    boilerplate run over tokens [10, 20) — exactly one x60 paragraph
    window — while replica 0 stays byte-identical.  This is the
    key-skew decade regime: one para_hash covers (factor-1)/factor of
    the corpus and each boilerplate shingle has df ~ corpus size."""
    from make_scaled_sf import BOILERPLATE, BOILER_TOKENS, make_scaled

    src = str(tmp_path / "src")
    os.makedirs(src)
    docs = pd.DataFrame(
        {
            "doc_id": range(30),
            "text": [
                " ".join(f"w{chr(ord('a') + (i + j) % 7)}" for j in range(24))
                for i in range(30)
            ],
            "lang": ["en"] * 30,
            "source": ["s0"] * 30,
            "n_chars": [72] * 30,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        os.path.join(src, "documents.parquet"),
    )
    d = str(tmp_path / "b4")
    make_scaled(src, d, 4, vocab="boiler")
    scaled = (
        pq.read_table(os.path.join(d, "documents.parquet"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert os.path.exists(os.path.join(d, marker_name("boiler")))
    rep0 = scaled.iloc[:30].reset_index(drop=True)
    pd.testing.assert_series_equal(
        rep0["text"], docs["text"], check_names=False
    )
    reps = scaled.iloc[30:]
    for t in reps["text"]:
        toks = t.split(" ")
        assert toks[BOILER_TOKENS : 2 * BOILER_TOKENS] == BOILERPLATE
    # the mutation pass still runs (replica texts differ pairwise
    # outside the boilerplate window)
    t1 = reps.iloc[0]["text"].split(" ")[:BOILER_TOKENS]
    t2 = reps.iloc[30]["text"].split(" ")[:BOILER_TOKENS]
    assert t1 != t2
