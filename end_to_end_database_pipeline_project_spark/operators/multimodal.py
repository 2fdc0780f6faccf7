"""Multimodal (binary) column plumbing.

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct; decode/feature-extraction runs as Arrow-batched pandas
iterators over ``mapInPandas``.

Three real binary modalities are fully implemented pure-Python:
**BMP images** (24-bit uncompressed: magic, DIB header, 4-byte row
stride), **PNG images** (8-bit RGB truecolor on stdlib zlib: CRC'd
chunks, DEFLATE'd IDAT, all five scanline filters — the compressed
real-world format), and **WAV audio** (PCM16 mono RIFF) — so the
binary path is exercised with genuine non-text bytes end-to-end,
including a real compression round-trip. Codecs that DO need native
libraries (JPEG via PIL, lossy audio via soundfile, video via av)
remain stubs that document the real call and raise
``NotImplementedError``.

At scale: binary payloads ride the columnar format untouched (parquet
keeps them page-compressed); feature extraction is embarrassingly
parallel per Arrow batch, so the only knob that matters is
``spark.sql.files.maxPartitionBytes`` vs payload size — big blobs want
smaller row-group targets so a task's batch fits executor memory.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    """Decode kernel dispatch. text, image/bmp, image/png and audio/wav
    are real decoders; formats needing native media libraries (JPEG via
    ``PIL.Image.open``, lossy audio via ``soundfile.read``, video via
    ``av``) are explicitly unimplemented — none of those libraries
    ships in this container."""
    if mime_type == "text/plain":
        return {
            "byte_len": len(content),
            "content_md5": hashlib.md5(content).hexdigest(),
            "modality": "text",
        }
    if mime_type == "image/bmp":
        decode_bmp(content)  # validates magic/header/stride
        return {
            "byte_len": len(content),
            "content_md5": hashlib.md5(content).hexdigest(),
            "modality": "image",
        }
    if mime_type == "image/png":
        decode_png(content)  # validates signature/CRCs/inflate
        return {
            "byte_len": len(content),
            "content_md5": hashlib.md5(content).hexdigest(),
            "modality": "image",
        }
    if mime_type == "audio/wav":
        decode_wav(content)  # validates RIFF chunks
        return {
            "byte_len": len(content),
            "content_md5": hashlib.md5(content).hexdigest(),
            "modality": "audio",
        }
    raise NotImplementedError(
        f"decode for {mime_type!r} requires the real media libraries "
        "(PIL/soundfile/av) — not available in this environment"
    )


# ------------------------------------------------------------ BMP codec
#
# A complete 24-bit uncompressed BMP (BITMAPINFOHEADER) implementation:
# 14-byte file header, 40-byte DIB header, bottom-up pixel rows padded
# to a 4-byte stride. Pure Python by design — it proves the binary
# column path on real image bytes without native dependencies.

_BMP_HEADER_LEN = 14 + 40


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Pack raw BGR pixel bytes (len == 3*width*height, row-major) into
    a well-formed 24-bit BMP file."""
    row_bytes = width * 3
    if len(pixels) != row_bytes * height:
        raise ValueError("pixels must be exactly 3*width*height bytes")
    pad = (-row_bytes) % 4
    rows = b"".join(
        pixels[r * row_bytes : (r + 1) * row_bytes] + b"\x00" * pad
        for r in range(height)
    )
    header = struct.pack(
        "<2sIHHI", b"BM", _BMP_HEADER_LEN + len(rows), 0, 0, _BMP_HEADER_LEN
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    return header + dib + rows


def decode_bmp(content: bytes) -> dict:
    """Parse a 24-bit BMP: validate magic + header, walk the padded
    rows, and return width/height/bpp plus the pixel-byte sum (a
    deterministic whole-image statistic — the mean-brightness analog)."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    pixel_offset = struct.unpack_from("<I", content, 10)[0]
    _dib_size, width, height, _planes, bpp = struct.unpack_from("<IiiHH", content, 14)
    if bpp != 24:
        raise NotImplementedError(f"only 24-bit BMP supported, got bpp={bpp}")
    row_bytes = width * 3
    stride = (row_bytes + 3) // 4 * 4
    n_rows = abs(height)
    total = 0
    for r in range(n_rows):
        row = content[pixel_offset + r * stride : pixel_offset + r * stride + row_bytes]
        if len(row) != row_bytes:
            raise ValueError(f"truncated pixel row {r}")
        total += sum(row)
    return {"width": width, "height": n_rows, "bpp": bpp, "pixel_sum": total}


def text_to_bmp_column(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a real BMP image column deterministically from text:
    dimensions derive from the char length, pixel bytes cycle the md5
    digest of the content. Every byte downstream is a genuine BMP file
    (magic, DIB header, row padding), so the decode kernel exercises
    actual image parsing — and the construction is reproducible in ANSI
    SQL, keeping the oracle exact."""

    @F.pandas_udf(T.BinaryType())
    def make_bmp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            w = 4 + len(t) % 13
            h = 3 + len(t) % 7
            n = 3 * w * h
            digest = hashlib.md5(t.encode("utf-8")).digest()
            pixels = (digest * (n // 16 + 1))[:n]
            out.append(encode_bmp(w, h, pixels))
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("doc_id"),
        make_bmp(F.col(text_col)).alias("content"),
        F.lit("image/bmp").alias("mime_type"),
    )


# ------------------------------------------------------------ PNG codec
#
# A complete 8-bit RGB (truecolor) PNG implementation on stdlib zlib —
# the first COMPRESSED real-world format in the modality suite (BMP and
# WAV are uncompressed layouts). Encoder: signature, IHDR, one
# zlib-deflated IDAT of filter-0 scanlines, IEND, each chunk CRC32'd.
# Decoder: chunk walk with CRC verification, IDAT concatenation +
# inflate, and full scanline UN-filtering (all five PNG filter types —
# None/Sub/Up/Average/Paeth — so real-world encoder output parses, not
# just our own).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Pack raw RGB pixel bytes (len == 3*width*height, row-major) into
    a well-formed 8-bit truecolor PNG (filter 0 scanlines, one IDAT)."""
    import zlib

    row_bytes = width * 3
    if len(pixels) != row_bytes * height:
        raise ValueError("pixels must be exactly 3*width*height bytes")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[r * row_bytes : (r + 1) * row_bytes]
        for r in range(height)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(content: bytes) -> dict:
    """Parse an 8-bit RGB PNG: validate signature + per-chunk CRCs,
    inflate the IDAT stream, un-filter every scanline (filters 0-4),
    and return width/height/bit depth plus the pixel-byte sum — the
    same whole-image statistic as the BMP decoder, now through a real
    DEFLATE round-trip."""
    import zlib

    if content[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width = len(_PNG_SIG), None
    idat = b""
    while pos + 8 <= len(content):
        (clen,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", content, pos + 8 + clen)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, depth, ctype_id, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype_id, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit non-interlaced truecolor PNG supported"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    bpp, row_bytes = 3, width * 3
    if len(raw) != (row_bytes + 1) * height:
        raise ValueError("inflated scanline data has wrong length")
    prev = bytearray(row_bytes)
    total = 0
    for r in range(height):
        ftype = raw[r * (row_bytes + 1)]
        line = bytearray(raw[r * (row_bytes + 1) + 1 : (r + 1) * (row_bytes + 1)])
        if ftype == 1:  # Sub
            for i in range(bpp, row_bytes):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(row_bytes):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(row_bytes):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(row_bytes):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        total += sum(line)
        prev = line
    return {"width": width, "height": height, "bit_depth": 8, "pixel_sum": total}


def text_to_png_column(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a real PNG image column deterministically from text:
    dimensions derive from the char length (distinct moduli from the
    BMP twin), pixel bytes cycle the md5 digest. Every payload is a
    genuine deflate-compressed PNG, and the construction is
    reproducible in ANSI SQL, keeping the oracle exact."""

    @F.pandas_udf(T.BinaryType())
    def make_png(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            w = 5 + len(t) % 11
            h = 2 + len(t) % 6
            n = 3 * w * h
            digest = hashlib.md5(t.encode("utf-8")).digest()
            pixels = (digest * (n // 16 + 1))[:n]
            out.append(encode_png(w, h, pixels))
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("doc_id"),
        make_png(F.col(text_col)).alias("content"),
        F.lit("image/png").alias("mime_type"),
    )


PNG_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, bit_depth int, pixel_sum long"
)


def extract_png_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched PNG feature extraction (CRC-checked chunk walk +
    inflate + un-filter + pixel-sum), same mapInPandas shape as the BMP
    path but through a compressed codec."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_png(bytes(c)) for c in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out[["doc_id", "width", "height", "bit_depth", "pixel_sum"]]

    return assets.mapInPandas(kernel, schema=PNG_FEATURE_SCHEMA)


# ------------------------------------------------------------ WAV codec
#
# A complete PCM16 mono WAV (RIFF) implementation — the audio twin of
# the BMP codec: RIFF/WAVE header, fmt chunk, data chunk, little-endian
# signed 16-bit samples. Pure Python, chunk-walking decode (tolerates
# extra chunks between fmt and data, as real encoders emit).


def encode_wav(sample_rate: int, samples: bytes) -> bytes:
    """Pack raw little-endian PCM16 mono sample bytes into a WAV file."""
    if len(samples) % 2:
        raise ValueError("PCM16 samples must be an even number of bytes")
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(samples)) + samples
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(content: bytes) -> dict:
    """Parse a PCM16 mono WAV by walking RIFF chunks: validate magic,
    read the fmt chunk, then sum |sample| over the data chunk — the
    whole-clip energy statistic (loudness analog)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE magic")
    pos, sample_rate, bits, energy, n_samples = 12, None, None, 0, 0
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        clen = struct.unpack_from("<I", content, pos + 4)[0]
        data = content[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            _fmt, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, 0
            )
            if _fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError("only PCM16 mono supported")
        elif cid == b"data":
            if sample_rate is None:
                raise ValueError("data chunk before fmt chunk")
            if len(data) != clen:
                raise ValueError("truncated data chunk")
            n_samples = clen // 2
            for i in range(n_samples):
                (v,) = struct.unpack_from("<h", data, 2 * i)
                energy += abs(v)
        pos += 8 + clen + (clen % 2)  # RIFF chunks pad to even
    return {
        "sample_rate": sample_rate,
        "n_samples": n_samples,
        "abs_amplitude_sum": energy,
    }


def text_to_wav_column(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a real WAV audio column deterministically from text:
    sample count and rate derive from the char length, PCM16 samples
    cycle the md5 digest bytes. Genuine RIFF bytes downstream, and the
    construction is reproducible in ANSI SQL for the oracle."""

    @F.pandas_udf(T.BinaryType())
    def make_wav(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            n = 64 + len(t) % 57
            rate = 8000 + 1000 * (len(t) % 5)
            digest = hashlib.md5(t.encode("utf-8")).digest()
            samples = (digest * (2 * n // 16 + 1))[: 2 * n]
            out.append(encode_wav(rate, samples))
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("doc_id"),
        make_wav(F.col(text_col)).alias("content"),
        F.lit("audio/wav").alias("mime_type"),
    )


WAV_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, abs_amplitude_sum long"
)


def extract_wav_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched WAV feature extraction (format metadata + energy),
    same mapInPandas shape as the BMP path but over audio bytes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_wav(bytes(c)) for c in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out[
                ["doc_id", "sample_rate", "n_samples", "abs_amplitude_sum"]
            ]

    return assets.mapInPandas(kernel, schema=WAV_FEATURE_SCHEMA)


BMP_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, bpp int, pixel_sum long"
)


def extract_bmp_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched BMP feature extraction (image metadata + pixel-sum
    statistic) — same mapInPandas shape as ``extract_features`` but over
    real image bytes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_bmp(bytes(c)) for c in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out[["doc_id", "width", "height", "bpp", "pixel_sum"]]

    return assets.mapInPandas(kernel, schema=BMP_FEATURE_SCHEMA)


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
