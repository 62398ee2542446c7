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


def frame_sample(decoded: DataFrame, every_n: int = 7) -> DataFrame:
    """Deterministic 1-in-N sampling of decoded items (the video
    frame-sampling shape: cheap predicate, no shuffle)."""
    return decoded.where(F.col("doc_id") % every_n == 0)


# Oracle twin of binarize→fake-decode (UTF-8 byte length via DuckDB's
# encode(); the fake header math is plain arithmetic).
DECODE_META_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       'fake/raw' AS format,
       CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
       CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS height
FROM documents"""
