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


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_md5 string"
RESIZE_SCHEMA = "doc_id long, resized_len long, resized_md5 string"


def frame_sample(
    assets: DataFrame, frame_chars: int = 64, stride_chars: int = 128
) -> DataFrame:
    """Frame sampling over a media payload: one input row fans out to
    every stride-th frame (video keyframe extraction shape). The real
    kernel would be ``av.open(...).decode(video=0)`` taking every Nth
    frame; the deterministic fake treats the decoded text as the media
    stream and each ``frame_chars``-char slice at ``stride_chars``
    offsets as a frame.

    Plumbing is the real thing: mapInPandas with a row-multiplying
    kernel (1 asset row -> n frame rows per Arrow batch, no explode of
    pre-materialized arrays, so frames never exist all-at-once in
    memory for a long video)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, content, mime in zip(
                pdf["doc_id"], pdf["content"], pdf["mime_type"]
            ):
                if mime != "text/plain":
                    raise NotImplementedError(
                        f"frame decode for {mime!r} requires av/ffmpeg"
                    )
                stream = bytes(content).decode("utf-8")
                n_frames = math.ceil(len(stream) / stride_chars)
                for i in range(n_frames):
                    frame = stream[i * stride_chars : i * stride_chars + frame_chars]
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": hashes}
            )

    return assets.mapInPandas(kernel, schema=FRAME_SCHEMA)


def resize(assets: DataFrame, target_chars: int = 256) -> DataFrame:
    """Resize/normalize kernel shape: every payload mapped to a
    fixed-size representation (image thumbnailing analog — the real
    kernel is ``PIL.Image.resize`` + re-encode). Deterministic fake:
    right-pad/truncate the decoded text to ``target_chars`` and hash.

    Same mapInPandas batch shape as decode — 1:1 rows, bounded output
    size regardless of input payload size."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_len, out_md5 = [], []
            for content, mime in zip(pdf["content"], pdf["mime_type"]):
                if mime != "text/plain":
                    raise NotImplementedError(
                        f"resize for {mime!r} requires PIL/soundfile"
                    )
                s = bytes(content).decode("utf-8")
                s = s[:target_chars].ljust(target_chars, " ")
                out_len.append(len(s))
                out_md5.append(hashlib.md5(s.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "resized_len": out_len,
                    "resized_md5": out_md5,
                }
            )

    return assets.mapInPandas(kernel, schema=RESIZE_SCHEMA)
