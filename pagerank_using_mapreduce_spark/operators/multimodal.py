"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
transforms (``mapInPandas``).

The container has no image/audio codecs, so the actual decode is
STUBBED: ``decode_mode="fake"`` produces a deterministic metadata
record from the bytes (stable across engines, so it is oracle-
checkable); ``decode_mode="real"`` raises NotImplementedError at the
point where PIL/ffmpeg would be called.  Everything around the stub —
binary schema, Arrow batch transfer, UDF signature, partition-parallel
execution — is real and tested.

At 100 TB the pattern holds: binaries stay in columnar storage,
``mapInPandas`` streams Arrow batches through the Python worker pool
(one pass, no shuffle), and metadata-only queries never touch the
binary column at all thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, format string, width long, height long"
)


def binarize_docs(documents: DataFrame) -> DataFrame:
    """Derive an (id, payload binary, format) table from ``documents`` —
    the stand-in for an image/audio blob column."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("fake/raw").alias("format"),
    )


def fake_decode_meta(n_bytes: int) -> tuple[int, int]:
    """Deterministic stand-in for image header parsing: pretend the
    byte length encodes the dimensions."""
    return (n_bytes % 640 + 1, (n_bytes * 7) % 480 + 1)


def decode_images(binaries: DataFrame, decode_mode: str = "fake") -> DataFrame:
    """mapInPandas decode: (doc_id, payload, format) → per-item
    metadata.  Arrow-batched; each batch is decoded in pandas without
    per-row Python dispatch."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode != "fake":
                raise NotImplementedError(
                    "real decode requires an image codec (PIL/libvips); "
                    "not available in this container"
                )
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "format": pdf["format"],
                    "width": n % 640 + 1,
                    "height": (n * 7) % 480 + 1,
                }
            )

    return binaries.mapInPandas(decode, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width long, height long, out_w long, out_h long"
MAX_DIM = 64


def resize_meta(decoded: DataFrame, max_dim: int = MAX_DIM) -> DataFrame:
    """mapInPandas resize: fit each item into ``max_dim``×``max_dim``
    preserving aspect ratio.  The pixel resample is where PIL would run
    per Arrow batch; the dimension math is integer-exact (floor of
    w*max_dim/long_side, min 1) so both engines agree bit-for-bit."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h = pdf["width"], pdf["height"]
            long_side = w.combine(h, max)
            scale_needed = long_side > max_dim
            out_w = (w * max_dim // long_side).clip(lower=1).where(scale_needed, w)
            out_h = (h * max_dim // long_side).clip(lower=1).where(scale_needed, h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "out_w": out_w,
                    "out_h": out_h,
                }
            )

    return decoded.select("doc_id", "width", "height").mapInPandas(
        resize, schema=RESIZE_SCHEMA
    )


FEATURES_SCHEMA = (
    "doc_id long, f_bytes long, f_spaces long, f_vowels long, f_digits long"
)


def extract_features(binaries: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary payload: byte
    length + whitespace/vowel/digit counts — the stand-in for an
    embedding/visual-feature model invoked per Arrow batch (vectorized
    pandas string ops, no per-row Python dispatch)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            text = pdf["payload"].map(lambda b: b.decode("utf-8"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "f_bytes": pdf["payload"].map(len),
                    "f_spaces": text.str.count(" "),
                    "f_vowels": text.str.count("[aeiou]"),
                    "f_digits": text.str.count("[0-9]"),
                }
            )

    return binaries.select("doc_id", "payload").mapInPandas(
        feats, schema=FEATURES_SCHEMA
    )


def frame_sample(decoded: DataFrame, every_n: int = 7) -> DataFrame:
    """Deterministic 1-in-N sampling of decoded items (the video
    frame-sampling shape: cheap predicate, no shuffle)."""
    return decoded.where(F.col("doc_id") % every_n == 0)


RESIZE_META_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
         CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS height
  FROM documents
)
SELECT doc_id, width, height,
       CASE WHEN GREATEST(width, height) > {MAX_DIM}
            THEN GREATEST(width * {MAX_DIM} // GREATEST(width, height), 1)
            ELSE width END AS out_w,
       CASE WHEN GREATEST(width, height) > {MAX_DIM}
            THEN GREATEST(height * {MAX_DIM} // GREATEST(width, height), 1)
            ELSE height END AS out_h
FROM d"""

FEATURES_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS f_bytes,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS f_spaces,
       CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS BIGINT) AS f_vowels,
       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS f_digits
FROM documents"""


# Oracle twin of binarize→fake-decode (UTF-8 byte length via DuckDB's
# encode(); the fake header math is plain arithmetic).
DECODE_META_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       'fake/raw' AS format,
       CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
       CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS height
FROM documents"""
