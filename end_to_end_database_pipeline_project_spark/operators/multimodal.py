"""Multimodal (binary) column plumbing.

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct; decode/feature-extraction runs as Arrow-batched pandas
iterators over ``mapInPandas``. The decode kernels themselves are
STUBBED (no image/audio libs in this container — each stub documents the
real library call and raises ``NotImplementedError`` for formats it
can't fake), but the Spark-side plumbing — schema, batch iteration,
partitioning, UDF signature — is real and tested.

At scale: binary payloads ride the columnar format untouched (parquet
keeps them page-compressed); feature extraction is embarrassingly
parallel per Arrow batch, so the only knob that matters is
``spark.sql.files.maxPartitionBytes`` vs payload size — big blobs want
smaller row-group targets so a task's batch fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, byte_len long, content_md5 string, modality string"
)


def to_binary_column(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Model a multimodal asset table: utf-8 payload bytes + metadata.

    Stands in for reading image/audio blobs; the binary column is a true
    ``BinaryType`` so everything downstream exercises the real byte
    path."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("text/plain").alias("mime_type"),
    )


def decode_stub(content: bytes, mime_type: str) -> dict:
    """STUB decode kernel. Real implementation would be e.g.
    ``PIL.Image.open(io.BytesIO(content))`` for images or
    ``soundfile.read`` for audio; neither library ships in this
    container. Deterministic fake for text payloads; anything else is
    explicitly unimplemented."""
    if mime_type == "text/plain":
        return {
            "byte_len": len(content),
            "content_md5": hashlib.md5(content).hexdigest(),
            "modality": "text",
        }
    raise NotImplementedError(
        f"decode for {mime_type!r} requires the real media libraries "
        "(PIL/soundfile/av) — not available in this environment"
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas: each partition arrives as an iterator of pandas
    batches; the kernel is pure per-batch Python with no driver
    round-trip."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(c, m)
                for c, m in zip(pdf["content"], pdf["mime_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return assets.mapInPandas(kernel, schema=FEATURE_SCHEMA)
