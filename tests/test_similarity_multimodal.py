from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_using_mapreduce_spark.operators.multimodal import (
    binarize_docs,
    decode_images,
    frame_sample,
)
from pagerank_using_mapreduce_spark.operators.similarity import cosine, cosine_topk


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [1.0, 0.0, 0.0], 0),  # identical to 0
        (2, [0.9, 0.1, 0.0], 0),  # close to 0
        (3, [0.0, 1.0, 0.0], 1),  # orthogonal to 0
        (4, [-1.0, 0.0, 0.0], 1),  # opposite of 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_expression(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<float>, b array<float>"
    )
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).head()["c"]
    import math

    want = 32 / (math.sqrt(14) * math.sqrt(77))
    assert got == pytest.approx(want, rel=1e-12)


def test_cosine_topk_order(vecs):
    out = cosine_topk(vecs, queries=vecs.where(F.col("vec_id") == 0), k=4)
    rows = sorted((r["rank"], r["vec_id"], r["cosine_e6"]) for r in out.collect())
    assert [v for _, v, _ in rows] == [1, 2, 3, 4]
    assert rows[0][2] == 1_000_000  # identical vector -> cosine 1.0
    assert rows[2][2] == 0  # orthogonal
    assert rows[3][2] == -1_000_000  # opposite


def test_multimodal_decode_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "hello"), (2, "a longer document body here"), (7, "x")],
        "doc_id long, text string",
    )
    binaries = binarize_docs(docs)
    assert dict(binaries.dtypes)["payload"] == "binary"
    decoded = decode_images(binaries)
    got = {r["doc_id"]: r for r in decoded.collect()}
    # doc 1 -> GIF (1%3): 13-byte header + 5-byte body
    assert got[1]["n_bytes"] == 5 + 13 and got[1]["format"] == "image/gif"
    assert got[1]["width"] == 5 % 640 + 1 and got[1]["height"] == (5 * 7) % 480 + 1
    # doc 2 -> BMP (2%3): 54-byte header + 27-byte body
    assert got[2]["n_bytes"] == 27 + 54 and got[2]["format"] == "image/bmp"
    sampled = {r["doc_id"] for r in frame_sample(decoded, every_n=7).collect()}
    assert sampled == {7}


def test_multimodal_headers_are_real(spark):
    """The constructed payloads carry genuine file headers: correct
    magic bytes, struct-unpackable dims at the real offsets, and a
    correct PNG IHDR CRC32 — verified against Python's zlib, not the
    repo's own parser."""
    import struct
    import zlib

    from pagerank_using_mapreduce_spark.operators.multimodal import (
        PNG_SIG,
        parse_image_header,
    )

    docs = spark.createDataFrame(
        [(0, "png body"), (1, "gif body!"), (2, "bmp body!!")],
        "doc_id long, text string",
    )
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in binarize_docs(docs).collect()
    }
    png, gif, bmp = payloads[0], payloads[1], payloads[2]

    assert png[:8] == PNG_SIG and png[12:16] == b"IHDR"
    w, h = struct.unpack(">II", png[16:24])
    assert (w, h) == (8 % 640 + 1, (8 * 7) % 480 + 1)
    assert png[24:29] == b"\x08\x02\x00\x00\x00"  # 8-bit truecolor
    crc = struct.unpack(">I", png[29:33])[0]
    assert crc == zlib.crc32(png[12:29])  # CRC over chunk type+data
    assert png[33:] == b"png body"

    assert gif[:6] == b"GIF89a"
    assert struct.unpack("<HH", gif[6:10]) == (9 % 640 + 1, (9 * 7) % 480 + 1)
    assert gif[13:] == b"gif body!"

    assert bmp[:2] == b"BM"
    assert struct.unpack("<I", bmp[2:6])[0] == len(bmp)  # file size field
    assert struct.unpack("<I", bmp[10:14])[0] == 54  # pixel data offset
    assert struct.unpack("<I", bmp[14:18])[0] == 40  # BITMAPINFOHEADER
    assert struct.unpack("<ii", bmp[18:26]) == (10 % 640 + 1, (10 * 7) % 480 + 1)
    assert struct.unpack("<HH", bmp[26:30]) == (1, 24)  # planes, bpp
    assert bmp[54:] == b"bmp body!!"

    # the parser reads back exactly what the builder embedded
    assert parse_image_header(png) == ("image/png", 9, 57, 33)
    assert parse_image_header(gif) == ("image/gif", 10, 64, 13)
    assert parse_image_header(bmp) == ("image/bmp", 11, 71, 54)
    with pytest.raises(ValueError, match="unrecognized"):
        parse_image_header(b"\x00\x01\x02\x03 not an image")


def test_embedding_near_dups_planted_pairs(spark):
    from pagerank_using_mapreduce_spark.operators.similarity import (
        EMB_DUP_OFFSET,
        embedding_near_dups,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = embedding_near_dups(emb).collect()
    assert rows, "planted perturbed copies must be found"
    for r in rows:
        assert r["vec_b"] == r["vec_a"] + EMB_DUP_OFFSET
        assert r["cosine_e6"] >= 950_000


def test_embedding_near_dups_matches_jvm_fold_exactly(spark):
    """The Arrow/numpy cell scorer must be BIT-identical to the JVM
    interpreted zip_with+aggregate fold it replaced (r10, 12.7x at
    sf10): the numpy accumulation is dim-sequential, so per pair the
    IEEE operation sequence — round each product to double, then add
    left-to-right — is the same.  Compared at a LOW threshold so
    thousands of non-planted pairs (dense in quantization boundaries)
    participate, on both the fast path and the SRP-refined path."""
    from pyspark.sql import functions as F

    from pagerank_using_mapreduce_spark.operators.similarity import (
        _dot,
        _norm,
        augment_embeddings,
        embedding_near_dups,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def jvm_pairs(threshold_e6):
        e = augment_embeddings(emb).select("vec_id", "label", "emb")
        e = e.withColumn("nrm", _norm(F.col("emb")))
        j = e.alias("a").join(
            e.alias("b"),
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        cos = F.floor(
            _dot(F.col("a.emb"), F.col("b.emb"))
            / (F.col("a.nrm") * F.col("b.nrm"))
            * 1e6
            + F.lit(0.5000001)
        ).cast("long")
        return j.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine_e6"),
        ).where(F.col("cosine_e6") >= threshold_e6)

    for thr in (950_000, 100_000):
        want = {
            (r["vec_a"], r["vec_b"]): r["cosine_e6"]
            for r in jvm_pairs(thr).collect()
        }
        got = {
            (r["vec_a"], r["vec_b"]): r["cosine_e6"]
            for r in embedding_near_dups(emb, threshold_e6=thr).collect()
        }
        assert got == want and len(want) > 0


def test_embedding_near_dups_cell_cap(spark):
    """With a cap smaller than every label cell, the SRP refinement
    path activates: the result must stay a subset of the uncapped
    pairs (same scoring, narrower blocking) and still keep planted
    pairs whose two vectors agree on the refinement bits — i.e. the
    cap trades bounded cell size for recall, never correctness."""
    from pagerank_using_mapreduce_spark.operators.similarity import (
        embedding_near_dups,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    full = {
        (r["vec_a"], r["vec_b"]) for r in embedding_near_dups(emb).collect()
    }
    capped = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dups(emb, max_cell_rows=8).collect()
    }
    assert capped <= full
    assert full, "uncapped run must find the planted pairs"
    # determinism: the refined blocking is a pure row-value function
    again = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dups(emb, max_cell_rows=8).collect()
    }
    assert capped == again


def test_embedding_near_dups_default_cap_inactive_on_testdata(spark):
    """On the shipped testdata no label cell exceeds MAX_CELL_ROWS, so
    the default call must equal plain label blocking — the invariant
    that keeps the DuckDB oracle exact."""
    from pagerank_using_mapreduce_spark.operators.similarity import (
        MAX_CELL_ROWS,
        augment_embeddings,
        embedding_near_dups,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sizes = [
        r["cnt"]
        for r in augment_embeddings(emb)
        .groupBy("label")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    ]
    assert max(sizes) <= MAX_CELL_ROWS
    huge_cap = embedding_near_dups(emb, max_cell_rows=1_000_000_000)
    assert sorted(map(tuple, embedding_near_dups(emb).collect())) == sorted(
        map(tuple, huge_cap.collect())
    )


def test_global_position_matches_single_partition_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pagerank_using_mapreduce_spark.operators.ranking import (
        with_global_position,
    )

    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    got = (
        with_global_position(df, [F.desc("k"), F.asc("v")], num_partitions=8)
        .select("pos", "k", "v")
        .collect()
    )
    w = Window.orderBy(F.desc("k"), F.asc("v"))
    want = (
        df.select(F.row_number().over(w).cast("long").alias("pos"), "k", "v")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_resize_preserves_aspect_and_bounds(spark):
    from pagerank_using_mapreduce_spark.operators.multimodal import (
        MAX_DIM,
        binarize_docs,
        decode_images,
        resize_meta,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = resize_meta(decode_images(binarize_docs(docs))).collect()
    assert out
    for r in out:
        assert 1 <= r["out_w"] <= MAX_DIM or r["width"] <= MAX_DIM
        assert 1 <= r["out_h"] <= MAX_DIM or r["height"] <= MAX_DIM
        if max(r["width"], r["height"]) > MAX_DIM:
            # long side maps exactly to MAX_DIM (integer floor on short)
            assert max(r["out_w"], r["out_h"]) == MAX_DIM


def test_feature_extraction_counts(spark):
    from pagerank_using_mapreduce_spark.operators.multimodal import (
        binarize_docs,
        extract_features,
    )

    docs = spark.createDataFrame(
        [(1, "a e i 42"), (2, "xyz")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in extract_features(binarize_docs(docs)).collect()}
    assert got[1]["f_vowels"] == 3 and got[1]["f_digits"] == 2 and got[1]["f_spaces"] == 3
    assert got[2]["f_vowels"] == 0 and got[2]["f_bytes"] == 3


def test_srp_lsh_subset_of_exhaustive(spark):
    """LSH-found pairs are a subset of the label-blocked exhaustive
    pairs, with usable recall at 8 planes."""
    from pagerank_using_mapreduce_spark.operators.similarity import (
        embedding_near_dups,
        srp_lsh_near_dups,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lsh = {(r["vec_a"], r["vec_b"]) for r in srp_lsh_near_dups(emb).collect()}
    # exhaustive blocked by label; LSH has no label constraint, so
    # compare against all-pairs ground truth: relax by rebuilding it
    exhaustive = {
        (r["vec_a"], r["vec_b"]) for r in embedding_near_dups(emb).collect()
    }
    assert lsh, "LSH must find at least some planted pairs"
    # planted pairs share the label, so exhaustive ⊇ all true pairs here
    assert lsh <= exhaustive
    assert len(lsh) / len(exhaustive) >= 0.3  # recall floor at 8 planes


def test_ivf_kmeans_recall_and_determinism(spark):
    """The learned-quantizer IVF must (a) be bit-deterministic across
    runs (seeded md5 init + e6-quantized Lloyd rounds), (b) reach a
    usable recall of the brute-force top-k at nprobe=2/8 cells, and
    (c) return exact brute-force results when probing every cell."""
    from pagerank_using_mapreduce_spark.operators.similarity import (
        TOP_K,
        cosine_topk,
        ivf_kmeans_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {(r["query_id"], r["vec_id"]) for r in ivf_kmeans_topk(emb).collect()}
    b = {(r["query_id"], r["vec_id"]) for r in ivf_kmeans_topk(emb).collect()}
    assert a == b
    brute = {(r["query_id"], r["vec_id"]) for r in cosine_topk(emb).collect()}
    assert len(a & brute) / len(brute) >= 0.3  # recall floor at nprobe=2
    # probing all cells makes IVF exhaustive -> exact brute-force match
    full = {
        (r["query_id"], r["vec_id"])
        for r in ivf_kmeans_topk(emb, nprobe=8).collect()
    }
    assert full == brute
    assert all(len({q for q, _ in s}) == 5 and len(s) == 5 * TOP_K for s in (a, full))


def test_srp_multiprobe_recall_at_least_single_probe(spark):
    """1-bit multi-probe candidates strictly contain the single-bucket
    candidates, so its near-dup recall can only be >= x20's."""
    from pagerank_using_mapreduce_spark.operators.similarity import (
        embedding_near_dups,
        srp_lsh_near_dups,
        srp_lsh_near_dups_multiprobe,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    single = {(r["vec_a"], r["vec_b"]) for r in srp_lsh_near_dups(emb).collect()}
    multi = {
        (r["vec_a"], r["vec_b"])
        for r in srp_lsh_near_dups_multiprobe(emb).collect()
    }
    exhaustive = {
        (r["vec_a"], r["vec_b"]) for r in embedding_near_dups(emb).collect()
    }
    assert single <= multi <= exhaustive
    assert len(multi) / len(exhaustive) >= len(single) / len(exhaustive)
    assert len(multi) / len(exhaustive) >= 0.5  # recall floor with probing


def test_semantic_clusters_consistent_with_pairs(spark):
    """Every embedding near-dup pair lands in the same cluster, the
    canonical is the cluster min, and non-pair members are singletons."""
    from pyspark.sql import functions as F

    from pagerank_using_mapreduce_spark.operators.dedup import cluster_pairs
    from pagerank_using_mapreduce_spark.operators.similarity import (
        augment_embeddings,
        embedding_near_dups,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = embedding_near_dups(emb).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    out = cluster_pairs(
        augment_embeddings(emb).select(F.col("vec_id").alias("doc_id")), pairs
    )
    canon = {r["doc_id"]: r["canonical_id"] for r in out.collect()}
    pr = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert pr, "expected planted near-dup pairs in testdata"
    for a, b in pr:
        assert canon[a] == canon[b]
        assert canon[a] <= min(a, b)
    members = {a for p in pr for a in p}
    for d, c in canon.items():
        if d not in members:
            assert c == d  # singleton


def test_raster_bmps_are_real_files(spark):
    """binarize_raster emits byte-valid BMPs: the header's file-size
    field equals the actual byte count, the raster length matches
    h x padded-rowsize, and a hand-computed pixel sits at its exact
    offset (bottom-row-first storage, BGR order, row padding)."""
    import struct

    from pagerank_using_mapreduce_spark.operators.multimodal import (
        binarize_raster,
        decode_pixels,
    )

    docs = spark.createDataFrame([(5, "abcdefghij")], "doc_id long, text string")
    b = bytes(binarize_raster(docs).collect()[0]["payload"])
    # blen=10 -> w = 10%8+1 = 3, h = 70%6+1 = 5, rowsize = ceil(9/4)*4 = 12
    assert b[:2] == b"BM"
    assert struct.unpack("<I", b[2:6])[0] == len(b) == 54 + 5 * 12
    w, h = struct.unpack("<ii", b[18:26])
    assert (w, h) == (3, 5)
    # stored row r=1, x=2: B=(2*31+1*17+5)%256=84, G=(2*13+1*29+35)%256=90,
    # R=(2*7+1*11+15)%256=40 at offset 54 + 1*12 + 2*3
    off = 54 + 12 + 6
    assert b[off:off + 3] == bytes([84, 90, 40])
    row = decode_pixels(binarize_raster(docs)).collect()[0]
    assert (row["width"], row["height"], row["n_px"]) == (3, 5, 15)
    # exact channel sums against the generator
    sr = sum((x * 7 + r * 11 + 15) % 256 for x in range(3) for r in range(5))
    assert row["sum_r"] == sr


def test_pixel_resize_identity_and_subsample(spark):
    """Small images pass through unresized (sums equal the full
    decode); larger-than-max images subsample exactly the nearest-
    neighbor index set."""
    from pagerank_using_mapreduce_spark.operators.multimodal import (
        binarize_raster,
        decode_pixels,
        resize_pixels,
    )

    # blen=2 -> w=3, h=3 (<= max_dim 4): identity
    # blen=12 -> w=5, h=1 -> fit to 4x1: cols j*5//4 = 0,1,2,3
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "abcdefghijkl")], "doc_id long, text string"
    )
    full = {r["doc_id"]: r for r in decode_pixels(binarize_raster(docs)).collect()}
    rs = {r["doc_id"]: r for r in resize_pixels(binarize_raster(docs)).collect()}
    assert (rs[1]["out_w"], rs[1]["out_h"]) == (3, 3)
    assert all(rs[1][c] == full[1][c] for c in ("sum_r", "sum_g", "sum_b"))
    assert (rs[2]["out_w"], rs[2]["out_h"]) == (4, 1)
    # hand-replay: sampled x in {0,1,2,3}, r=0, doc_id=2
    want_r = sum((x * 7 + 0 + 6) % 256 for x in (0, 1, 2, 3))
    assert rs[2]["sum_r"] == want_r


def test_wav_files_are_real_and_decode_exact(spark):
    """binarize_audio emits byte-valid WAVs: Python's wave module (the
    stdlib reference parser) opens them and agrees on rate/frames, and
    the decoded |sample| sums match a hand replay of the generator."""
    import io
    import wave

    from pagerank_using_mapreduce_spark.operators.multimodal import (
        binarize_audio,
        decode_audio,
    )

    docs = spark.createDataFrame([(3, "abcde")], "doc_id long, text string")
    b = bytes(binarize_audio(docs).collect()[0]["payload"])
    with wave.open(io.BytesIO(b)) as wf:
        assert wf.getframerate() == 8000
        assert wf.getnchannels() == 1 and wf.getsampwidth() == 2
        assert wf.getnframes() == 6  # blen=5 -> 5 % 32 + 1
    row = decode_audio(binarize_audio(docs)).collect()[0]
    vals = [((i * 37 + 33) % 65536) for i in range(6)]
    vals = [v - 65536 if v >= 32768 else v for v in vals]
    assert row["n_samples"] == 6
    assert row["sum_abs"] == sum(abs(v) for v in vals)
    assert row["max_abs"] == max(abs(v) for v in vals)


def test_ann_recall_audit_full_probe_is_perfect(spark):
    """x78's audit is trustworthy only if it reports recall 1.0 when
    the index provably misses nothing: IVF probing EVERY label cell is
    exhaustive search, so the per-query recall_e6 must be 1e6; the
    registry x78 (nprobe=2) must never exceed it."""
    from pagerank_using_mapreduce_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )
    from pagerank_using_mapreduce_spark.plans.extensions import q_x78_ann_recall
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    n_cells = emb.select("label").distinct().count()
    exact = cosine_topk(emb).select("query_id", "vec_id")
    full = ivf_topk(emb, nprobe=n_cells).select("query_id", "vec_id")
    missed = exact.exceptAll(full)
    assert missed.count() == 0, missed.collect()
    audited = q_x78_ann_recall(spark, sf).collect()
    assert audited and all(0 <= r["recall_e6"] <= 1_000_000 for r in audited)
    assert all(r["n_hit"] >= 0 for r in audited)


def test_audio_features_match_independent_decode(spark):
    """x85's energy/ZCR must equal an independent stdlib wave + numpy
    computation on the same payload bytes."""
    import io
    import wave

    import numpy as np

    from pagerank_using_mapreduce_spark.operators.multimodal import (
        audio_features,
        binarize_audio,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(25)
    bins = {r["doc_id"]: bytes(r["payload"]) for r in binarize_audio(docs).collect()}
    got = {
        r["doc_id"]: (r["n_samples"], r["energy"], r["zero_crossings"])
        for r in audio_features(binarize_audio(docs)).collect()
    }
    for doc_id, payload in bins.items():
        with wave.open(io.BytesIO(payload)) as w:
            frames = w.readframes(w.getnframes())
        s = np.frombuffer(frames, dtype="<i2").astype(np.int64)
        neg = s < 0
        expect = (
            len(s),
            int((s * s).sum()),
            int((neg[1:] != neg[:-1]).sum()) if len(s) > 1 else 0,
        )
        assert got[doc_id] == expect, (doc_id, got[doc_id], expect)


def test_global_position_releases_internal_cache(spark):
    """VERDICT r05 #5: the internal `ranged` persist must be released
    before returning (the result is eagerly checkpointed), so repeated
    positioned queries in one session don't accumulate cached blocks."""
    from pyspark.sql import functions as F

    from pagerank_using_mapreduce_spark.operators.ranking import (
        with_global_position,
    )

    spark.catalog.clearCache()
    df = spark.range(0, 500).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    out = with_global_position(df, [F.desc("k"), F.asc("v")], num_partitions=4)
    assert out.count() == 500
    # at most ONE new persistent RDD survives the call — the eagerly
    # checkpointed result itself, which dies with the returned frame.
    # The internal `ranged` persist must NOT linger (it used to).
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after - before <= 1, (before, after)


def test_embedding_near_dups_null_labels_emit_no_pairs(spark):
    """NULL-label rows must produce ZERO pairs — the blocking contract
    is an a.label == b.label equi-join (SQL twin: JOIN ON), which
    never matches NULL; the Arrow-cell groupBy would otherwise collect
    all NULL labels into one scoring cell (r10 review find)."""
    from pagerank_using_mapreduce_spark.operators.similarity import (
        embedding_near_dups,
    )

    vec = [1.0] + [0.0] * 63
    rows = [(1, None, vec), (2, None, vec), (3, "a", vec), (4, "a", vec)]
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    pairs = {
        (r.vec_a, r.vec_b) for r in embedding_near_dups(emb).collect()
    }
    assert all(a not in (1, 2) and b not in (1, 2) for a, b in pairs)
    assert (3, 4) in pairs  # identical same-label vectors still pair


def test_png_idat_decode_matches_bmp_path(spark):
    """x134: the PNG builder emits byte-valid compressed PNGs (stdlib
    zlib round-trips them; every chunk CRC verifies), the decoder's
    channel sums equal the BMP byte-walk path's EXACTLY (same
    generative raster through two independent codecs), and the
    Sub/Up filters are genuinely exercised (some image has >= 3
    scanlines, so filters 0, 1 AND 2 all appear)."""
    import zlib

    from pagerank_using_mapreduce_spark.operators.multimodal import (
        PNG_SIG,
        binarize_png,
        binarize_raster,
        decode_pixels,
        decode_png_pixels,
    )

    rows = [(i, "x" * (3 + i * 5)) for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    png = {
        r["doc_id"]: tuple(r)
        for r in decode_png_pixels(binarize_png(docs)).collect()
    }
    bmp = {
        r["doc_id"]: tuple(r)
        for r in decode_pixels(binarize_raster(docs)).collect()
    }
    assert png == bmp and len(png) == 12
    heights = {d: t[2] for d, t in png.items()}
    assert max(heights.values()) >= 3  # Sub AND Up filters exercised

    # the payload is a real PNG: signature + inflatable IDAT
    b = bytes(
        binarize_png(docs).where("doc_id = 3").collect()[0]["payload"]
    )
    assert b[:8] == PNG_SIG
    # IDAT begins after the 33-byte IHDR block: len(4)+type(4)
    import struct

    (idat_len,) = struct.unpack(">I", b[33:37])
    assert b[37:41] == b"IDAT"
    raw = zlib.decompress(b[41 : 41 + idat_len])
    w, h = png[3][1], png[3][2]
    assert len(raw) == h * (3 * w + 1)


def test_png_decode_rejects_corrupt_crc(spark):
    """Flipping one raster byte inside IDAT must be DETECTED (the
    decoder verifies every chunk CRC against the actual bytes), not
    silently decoded into wrong sums."""
    import pytest

    from pagerank_using_mapreduce_spark.operators.multimodal import (
        binarize_png,
        decode_png_pixels,
    )

    docs = spark.createDataFrame([(7, "hello png")], "doc_id long, text string")
    b = bytearray(bytes(binarize_png(docs).collect()[0]["payload"]))
    b[45] ^= 0xFF  # a byte inside the IDAT payload
    bad = spark.createDataFrame([(7, bytes(b))], "doc_id long, payload binary")
    with pytest.raises(Exception, match="bad CRC|PythonException"):
        decode_png_pixels(bad).collect()


def test_png_average_paeth_reference_path():
    """The decoder's filter-3/4 reconstruction is correct even though
    the corpus generator never emits them: hand-encode a known raster
    with Average and Paeth rows and check the recon round-trips."""
    import struct
    import zlib

    import numpy as np

    from pagerank_using_mapreduce_spark.operators.multimodal import (
        PNG_SIG,
    )

    w, h = 4, 2
    rng = np.arange(w * 3 * h, dtype=np.int64).reshape(h, w * 3) * 37 % 256
    # encode row 0 with Average (f=3, prev row = zeros), row 1 with Paeth
    enc_rows = []
    prev = np.zeros(w * 3, dtype=np.int64)
    for r, f in ((0, 3), (1, 4)):
        cur = rng[r]
        out = np.zeros(w * 3, dtype=np.int64)
        for i in range(w * 3):
            a = cur[i - 3] if i >= 3 else 0
            b_ = prev[i]
            if f == 3:
                pred = (a + b_) // 2
            else:
                c = prev[i - 3] if i >= 3 else 0
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b_ if pb <= pc else c)
            out[i] = (cur[i] - pred) % 256
        enc_rows.append(bytes([f]) + out.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    payload = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(enc_rows)))
        + chunk(b"IEND", b"")
    )
    # decode through the same mapInPandas body, exercised directly on
    # a pandas frame (no Spark needed for the reference-path check)
    import pandas as pd

    from pagerank_using_mapreduce_spark.operators import multimodal as mm

    class _Fake:
        def mapInPandas(self, fn, schema):
            self.fn = fn
            return self

    fake = _Fake()
    mm.decode_png_pixels(fake)
    got = next(fake.fn(iter([pd.DataFrame({"doc_id": [1], "payload": [payload]})])))
    assert int(got["sum_r"][0]) == int(rng.reshape(h, w, 3)[:, :, 0].sum())
    assert int(got["sum_g"][0]) == int(rng.reshape(h, w, 3)[:, :, 1].sum())
    assert int(got["sum_b"][0]) == int(rng.reshape(h, w, 3)[:, :, 2].sum())


def test_stream_png_decode_drains_to_batch(spark):
    """z21: the foreachBatch-decoded PNG ingest stream must drain to
    EXACTLY the batch x134 relation — per-doc independence means
    micro-batch partitioning cannot change a single channel sum."""
    from pagerank_using_mapreduce_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    drained = {
        tuple(r) for r in QUERIES["z21_stream_png_decode"](spark, sf).collect()
    }
    batch = {
        tuple(r) for r in QUERIES["x134_png_decode"](spark, sf).collect()
    }
    assert drained == batch and drained


def test_x137_embedding_contamination_planted_pairs(spark):
    """The flagged set is exactly the planted-paraphrase sources
    (vec_id % 20 == 0 — their perturbed copies form the eval slice,
    cosine ~ 0.968 > the 0.95 threshold), each matched to its own
    copy; every other training vector scores far below threshold
    (max same-label cosine ~ 0.47 on the shipped table)."""
    from pagerank_using_mapreduce_spark.operators.similarity import (
        EMB_DUP_OFFSET,
        embedding_contamination,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = {r["vec_id"]: r for r in embedding_contamination(emb).collect()}
    n = emb.count()
    assert len(out) == n  # one row per training vector
    flagged = {v for v, r in out.items() if r["contaminated"] == 1}
    assert flagged == {v for v in out if v % 20 == 0} and flagged
    for v in flagged:
        assert out[v]["best_eval_id"] == v + EMB_DUP_OFFSET
        assert out[v]["best_cos_e6"] >= 950_000


def test_x137_embedding_contamination_partition_invariance(spark):
    from pagerank_using_mapreduce_spark.operators.similarity import (
        embedding_contamination,
    )
    from pagerank_using_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = sorted(map(tuple, embedding_contamination(emb).collect()))
    b = sorted(
        map(tuple, embedding_contamination(emb.repartition(7)).collect())
    )
    assert a == b and a


def test_z23_stream_contamination_drains_to_batch(spark):
    """The foreachBatch-screened embedding stream must drain to
    EXACTLY the batch x137 relation: per-vector screening is
    independent, so micro-batch partitioning cannot change a row."""
    from pagerank_using_mapreduce_spark.operators.similarity import (
        embedding_contamination,
    )
    from pagerank_using_mapreduce_spark.plans.registry import QUERIES

    drained = {
        tuple(r)
        for r in QUERIES["z23_stream_contamination"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    batch = {tuple(r) for r in embedding_contamination(emb).collect()}
    assert drained == batch and drained
