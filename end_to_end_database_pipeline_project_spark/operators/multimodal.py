"""Multimodal (binary) column plumbing.

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct; decode/feature-extraction runs as Arrow-batched pandas
iterators over ``mapInPandas``.

Four real binary modalities are fully implemented pure-Python:
**BMP images** (24-bit uncompressed: magic, DIB header, 4-byte row
stride), **PNG images** (8-bit RGB truecolor on stdlib zlib: CRC'd
chunks, DEFLATE'd IDAT, all five scanline filters), **JPEG images**
(baseline SOF0 grayscale: forward/inverse DCT, canonical Huffman
entropy coding, byte stuffing — a complete transform codec), and
**WAV audio** (PCM16 mono RIFF) — so the binary path is exercised
with genuine non-text bytes end-to-end, including real DEFLATE and
Huffman/DCT round-trips. Codecs that DO need native libraries (lossy
audio via soundfile, video via av) remain stubs that document the
real call and raise ``NotImplementedError``.

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
    """Decode kernel dispatch. text, image/bmp, image/png, image/jpeg,
    audio/wav (PCM16 and mu-law format-7) and video/x-msvideo
    (Motion-JPEG AVI) are real decoders; formats needing native media
    libraries (MP3/AAC via ``soundfile``, inter-frame codecs like
    H.264 via ``av``) are explicitly unimplemented — neither library
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
    if mime_type == "image/jpeg":
        decode_jpeg_gray(content)  # validates markers/Huffman/scan
        return {
            "byte_len": len(content),
            "content_md5": hashlib.md5(content).hexdigest(),
            "modality": "image",
        }
    if mime_type == "audio/wav":
        try:
            decode_wav(content)  # validates RIFF chunks (PCM16)
        except NotImplementedError:
            try:
                decode_wav_mulaw(content)  # mu-law format-7 variant
            except NotImplementedError:
                decode_wav_adpcm(content)  # IMA ADPCM format-0x11 variant
        return {
            "byte_len": len(content),
            "content_md5": hashlib.md5(content).hexdigest(),
            "modality": "audio",
        }
    if mime_type == "video/x-msvideo":
        decode_avi_mjpeg(content)  # validates container + every frame
        return {
            "byte_len": len(content),
            "content_md5": hashlib.md5(content).hexdigest(),
            "modality": "video",
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
    if len(content) < _BMP_HEADER_LEN:
        raise ValueError("truncated BMP: header cut short")
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
        if pos + 12 + clen > len(content):
            raise ValueError("truncated PNG: chunk cut short")
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
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
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
            if len(data) < 16:
                raise ValueError("truncated WAV: fmt chunk cut short")
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
            # accumulate across data chunks (multi-chunk RIFF is legal)
            n_samples += clen // 2
            for i in range(clen // 2):
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


# ------------------------------------------------- mu-law WAV codec
#
# G.711 mu-law: the LOSSY audio modality (8-bit log-companded PCM —
# a real telephony codec, 2:1 compression of PCM16). Unlike the PCM16
# path, encode genuinely loses information (16-bit samples quantize to
# 256 log-spaced reconstruction levels); decode is an EXACT integer
# function of the code byte, which is what makes the whole-clip energy
# statistic reproducible in ANSI SQL for the oracle (the audio twin of
# the JPEG flat-block trick: synthesize streams whose samples sit on
# reconstruction levels, so the lossy transform is exactly invertible
# by construction while arbitrary input still exercises real
# quantization — covered by the bounded-error tests).

MULAW_BIAS = 0x84  # 132
MULAW_CLIP = 32635


def mulaw_expand(code: int) -> int:
    """Exact G.711 mu-law decode of one code byte to a linear PCM16
    sample: t = ((mantissa<<3) + bias) << exponent; sample = +-(t-bias)."""
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + MULAW_BIAS) << ((u >> 4) & 0x07)
    return MULAW_BIAS - t if u & 0x80 else t - MULAW_BIAS


def mulaw_compress(sample: int) -> int:
    """G.711 mu-law encode of a linear PCM16 sample (lossy): bias, find
    the segment (MSB position), keep a 4-bit mantissa, complement."""
    sign = 0x80 if sample < 0 else 0x00
    mag = min(-sample if sample < 0 else sample, MULAW_CLIP) + MULAW_BIAS
    exponent = max(0, mag.bit_length() - 8)
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def encode_wav_mulaw(sample_rate: int, codes: bytes) -> bytes:
    """Pack mu-law code bytes into a WAV file (format tag 7, mono,
    8 bits/sample, blockAlign 1)."""
    fmt = struct.pack("<HHIIHH", 7, 1, sample_rate, sample_rate, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(codes)) + codes
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_mulaw(content: bytes) -> dict:
    """Parse a mu-law WAV by walking RIFF chunks, expand every code
    byte to its exact linear PCM16 level, and sum |sample| — the same
    whole-clip energy statistic as the PCM16 path, now through a lossy
    companding codec."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE magic")
    pos, sample_rate, energy, n_samples = 12, None, 0, 0
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        clen = struct.unpack_from("<I", content, pos + 4)[0]
        data = content[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(data) < 16:
                raise ValueError("truncated WAV: fmt chunk cut short")
            _fmt, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, 0
            )
            if _fmt != 7 or channels != 1 or bits != 8:
                raise NotImplementedError("only mu-law (format 7) mono supported")
        elif cid == b"data":
            if sample_rate is None:
                raise ValueError("data chunk before fmt chunk")
            if len(data) != clen:
                raise ValueError("truncated data chunk")
            # accumulate across data chunks (multi-chunk RIFF is
            # legal), matching the ADPCM decoder's semantics
            n_samples += clen
            for b in data:
                energy += abs(mulaw_expand(b))
        pos += 8 + clen + (clen % 2)  # RIFF chunks pad to even
    return {
        "sample_rate": sample_rate,
        "n_samples": n_samples,
        "abs_amplitude_sum": energy,
    }


def _mulaw_bytes_for_text(t: str) -> bytes:
    """Deterministic mu-law WAV bytes for one text (the
    ``text_to_mulaw_wav_column`` synthesis, factored out so the fused
    synth+decode kernel encodes the identical bytes)."""
    n = 64 + len(t) % 57
    rate = 8000 + 1000 * (len(t) % 5)
    digest = hashlib.md5(t.encode("utf-8")).digest()
    codes = (digest * (n // 16 + 1))[:n]
    return encode_wav_mulaw(rate, codes)


def text_to_mulaw_wav_column(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a real mu-law WAV column deterministically from text:
    the md5 digest bytes ARE the mu-law codes (every byte is a valid
    code, and codes sit exactly on reconstruction levels, so
    compress(expand(b)) round-trips — asserted in tests) cycled to the
    length-derived sample count. Genuine format-7 RIFF bytes, and the
    expansion formula is pure integer arithmetic the SQL oracle
    replicates."""

    @F.pandas_udf(T.BinaryType())
    def make_mulaw(texts: pd.Series) -> pd.Series:
        return pd.Series([_mulaw_bytes_for_text(t) for t in texts])

    return df.select(
        F.col(id_col).alias("doc_id"),
        make_mulaw(F.col(text_col)).alias("content"),
        F.lit("audio/wav").alias("mime_type"),
    )


def extract_mulaw_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched mu-law WAV feature extraction (chunk walk + exact
    integer expansion + energy) — same mapInPandas shape as the PCM16
    path but through the lossy companding codec."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_wav_mulaw(bytes(c)) for c in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out[
                ["doc_id", "sample_rate", "n_samples", "abs_amplitude_sum"]
            ]

    return assets.mapInPandas(kernel, schema=WAV_FEATURE_SCHEMA)


# ------------------------------------------------- IMA ADPCM WAV codec
#
# IMA/DVI ADPCM (WAV format tag 0x11): the PREDICTIVE lossy audio
# modality — 4 bits/sample (4:1 compression of PCM16) where each nibble
# encodes a delta against an adaptive predictor with an 89-entry step
# table. Unlike mu-law (memoryless companding), decode carries state
# sample-to-sample, which is exactly the structure real media codecs
# have. Decode of ANY nibble stream is a well-defined pure-integer
# recurrence, so no invertibility trick is needed: the SQL oracle
# replays the identical recurrence with a recursive CTE.

ADPCM_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
ADPCM_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def adpcm_step(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    """One exact IMA ADPCM decode step: (predictor, step-index) x nibble
    -> next (predictor, step-index). Pure integer arithmetic — the SQL
    oracle replays this recurrence verbatim."""
    step = ADPCM_STEPS[idx]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + ADPCM_INDEX[nibble]))
    return pred, idx


def adpcm_compress(samples: list[int]) -> tuple[int, int, bytes]:
    """True IMA ADPCM encode (lossy): greedy per-sample nibble choice by
    running the decoder in the loop, as real encoders do. Returns
    (initial predictor, initial index, nibble bytes — low nibble first);
    the first sample becomes the block-header predictor verbatim."""
    if not samples:
        return 0, 0, b""
    pred, idx = samples[0], 0
    nibbles = []
    for s in samples[1:]:
        step = ADPCM_STEPS[idx]
        delta = s - pred
        nib = 8 if delta < 0 else 0
        delta = abs(delta)
        for bit, frac in ((4, step), (2, step >> 1), (1, step >> 2)):
            if delta >= frac:
                nib |= bit
                delta -= frac
        pred, idx = adpcm_step(pred, idx, nib)
        nibbles.append(nib)
    if len(nibbles) % 2:
        nibbles.append(0)
    packed = bytes(
        nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
    )
    return samples[0], 0, packed


def encode_wav_adpcm(
    sample_rate: int, pred0: int, idx0: int, nibble_data: bytes
) -> bytes:
    """Pack one IMA ADPCM block into a WAV file (format tag 0x11, mono,
    4 bits/sample): fmt chunk carries cbSize=2 + samplesPerBlock, the
    data chunk is the 4-byte block header (int16 predictor, uint8 step
    index, uint8 reserved) followed by the nibble bytes."""
    n_samples = 1 + 2 * len(nibble_data)
    block_align = 4 + len(nibble_data)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, sample_rate, sample_rate * block_align, block_align, 4,
        2, n_samples,
    )
    block = struct.pack("<hBB", pred0, idx0, 0) + nibble_data
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(block)) + block
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_adpcm(content: bytes) -> dict:
    """Parse an IMA ADPCM WAV by walking RIFF chunks, replay the exact
    predictor/step-index recurrence over every nibble (low nibble
    first), and sum |sample| over all decoded samples including the
    block-header seed — the same whole-clip energy statistic as the
    PCM16 and mu-law paths, now through a predictive codec."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE magic")
    pos, sample_rate, energy, n_samples = 12, None, 0, 0
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        clen = struct.unpack_from("<I", content, pos + 4)[0]
        data = content[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(data) < 16:
                raise ValueError("truncated WAV: fmt chunk cut short")
            _fmt, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, 0
            )
            if _fmt != 0x11 or channels != 1 or bits != 4:
                raise NotImplementedError(
                    "only IMA ADPCM (format 0x11) mono supported"
                )
        elif cid == b"data":
            if sample_rate is None:
                raise ValueError("data chunk before fmt chunk")
            if len(data) != clen:
                raise ValueError("truncated data chunk")
            if clen < 4:
                raise ValueError("ADPCM block shorter than its header")
            pred, idx = struct.unpack_from("<hB", data, 0)[0], data[2]
            if idx > 88:
                raise ValueError(f"ADPCM step index {idx} out of range")
            energy += abs(pred)
            n_samples += 1
            for b in data[4:]:
                for nib in (b & 0x0F, b >> 4):
                    pred, idx = adpcm_step(pred, idx, nib)
                    energy += abs(pred)
                    n_samples += 1
        pos += 8 + clen + (clen % 2)  # RIFF chunks pad to even
    return {
        "sample_rate": sample_rate,
        "n_samples": n_samples,
        "abs_amplitude_sum": energy,
    }


def _adpcm_bytes_for_text(t: str) -> bytes:
    """Deterministic IMA ADPCM WAV bytes for one text (the
    ``text_to_adpcm_wav_column`` synthesis, factored out so the fused
    synth+decode kernel encodes the identical bytes)."""
    n = 64 + len(t) % 57
    rate = 8000 + 1000 * (len(t) % 5)
    digest = hashlib.md5(t.encode("utf-8")).digest()
    pred0 = struct.unpack_from("<h", digest, 0)[0]
    idx0 = digest[2] % 89
    nibble_data = (digest * (n // 16 + 1))[:n]
    return encode_wav_adpcm(rate, pred0, idx0, nibble_data)


def text_to_adpcm_wav_column(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a real IMA ADPCM WAV column deterministically from
    text: the block header seeds from the first md5 digest bytes
    (int16 LE predictor, index byte % 89) and the digest bytes cycled
    to the length-derived count ARE the nibble data — every nibble
    stream is valid ADPCM, so decode is exact and the oracle replays
    the recurrence from the same digest."""

    @F.pandas_udf(T.BinaryType())
    def make_adpcm(texts: pd.Series) -> pd.Series:
        return pd.Series([_adpcm_bytes_for_text(t) for t in texts])

    return df.select(
        F.col(id_col).alias("doc_id"),
        make_adpcm(F.col(text_col)).alias("content"),
        F.lit("audio/wav").alias("mime_type"),
    )


def extract_adpcm_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched IMA ADPCM feature extraction (chunk walk + exact
    stateful nibble recurrence + energy) — same mapInPandas shape as
    the PCM16/mu-law paths but through the predictive codec."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_wav_adpcm(bytes(c)) for c in pdf["content"]]
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


SAFE_BMP_SCHEMA = (
    "doc_id long, status string, error string,"
    " width int, height int, pixel_sum long"
)


def extract_bmp_features_safe(assets: DataFrame) -> DataFrame:
    """BMP feature extraction with PER-ROW error isolation — the
    quarantine discipline a 100 TB decode pass needs: one corrupt
    payload must cost one quarantined row, never the task (a single
    bad blob failing a 10k-row Arrow batch, four times through retry,
    kills the stage). Decode errors are caught per row and surfaced as
    ``status='corrupt'`` with the diagnosed message; good rows carry
    ``status='ok'`` and their features. The codecs' clean-truncation
    contract (every malformed input raises ValueError /
    NotImplementedError, pinned by the every-prefix sweep test) is
    what makes this catch block safe — nothing escapes as an opaque
    crash."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    f = decode_bmp(bytes(content))
                    rows.append(
                        (doc_id, "ok", None, f["width"], f["height"],
                         f["pixel_sum"])
                    )
                except (ValueError, NotImplementedError) as e:
                    rows.append((doc_id, "corrupt", str(e)[:120], None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "status", "error", "width", "height",
                         "pixel_sum"],
            )

    return assets.mapInPandas(kernel, schema=SAFE_BMP_SCHEMA)


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


# ------------------------------------------------------------ JPEG codec
#
# A complete baseline JPEG (ITU-T.81 SOF0) grayscale implementation —
# the first ENTROPY-CODED format in the modality suite (PNG exercises
# DEFLATE; JPEG adds Huffman coding + DCT transform coding). Encoder:
# JFIF markers (SOI/APP0/DQT/SOF0/DHT/SOS/EOI), per-block forward DCT,
# quantization, zigzag, differential-DC + run-length-AC Huffman coding
# with 0xFF byte stuffing. Decoder: full marker parse, canonical
# Huffman table reconstruction from DHT, bit-unstuffing scan reader,
# dequantize + de-zigzag + IDCT + level shift/clamp. The decoder
# handles arbitrary baseline grayscale streams (any coefficients, any
# quant table); the deterministic synthesizer below emits flat 8x8
# blocks under a unit quant table, for which the lossy transform is
# exactly invertible — so the whole Huffman/DCT round-trip is
# value-checkable by a closed-form ANSI-SQL oracle.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical Huffman tables (luminance DC / AC):
# (BITS counts for code lengths 1..16, then HUFFVAL symbols).
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits: list, vals: list) -> dict:
    """Canonical Huffman: symbol -> (code, length), per ITU-T.81 C.2."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_ENC_TABLE_CACHE: dict = {}


def _enc_dc_codes() -> dict:
    """Encoder DC table, built once per process (the table is a pure
    function of the fixed `_DC_BITS`/`_DC_VALS`)."""
    if "dc" not in _ENC_TABLE_CACHE:
        _ENC_TABLE_CACHE["dc"] = _huff_codes(_DC_BITS, _DC_VALS)
    return _ENC_TABLE_CACHE["dc"]


def _enc_ac_codes() -> dict:
    if "ac" not in _ENC_TABLE_CACHE:
        _ENC_TABLE_CACHE["ac"] = _huff_codes(_AC_BITS, _AC_VALS)
    return _ENC_TABLE_CACHE["ac"]


_DCT_CACHE: list = []


def _dct_matrix():
    import numpy as np

    if _DCT_CACHE:
        return _DCT_CACHE[0]
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    c[0, :] /= np.sqrt(2.0)
    _DCT_CACHE.append(c)
    return c


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple:
    """JPEG (category, bits) encoding of a signed coefficient."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, len == width*height,
    dims multiples of 8) as a baseline JFIF JPEG with a UNIT quant
    table: real forward DCT, zigzag, differential-DC / run-length-AC
    Huffman entropy coding, 0xFF stuffing."""
    import numpy as np

    if width % 8 or height % 8:
        raise ValueError("dims must be multiples of 8")
    if len(pixels) != width * height:
        raise ValueError("pixels must be exactly width*height bytes")
    C = _dct_matrix()
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    dc_codes = _enc_dc_codes()
    ac_codes = _enc_ac_codes()
    # r11 (guide §4.2): forward-DCT every block of the image in ONE
    # batched matmul pair (same per-block C @ (B-128) @ C.T operand
    # order, broadcast over the block axis) instead of a Python loop of
    # 8x8 matmuls; the entropy coder then walks precomputed int rows.
    hb, wb = height // 8, width // 8
    blocks = (
        img.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(hb * wb, 8, 8)
    ).astype(float)
    coef = np.matmul(np.matmul(C, blocks - 128.0), C.T)
    qzz = (
        np.rint(coef).astype(int).reshape(hb * wb, 64)[:, _ZIGZAG]
    )  # unit quant table; rows already in zigzag order
    last_nzs = [
        int(nz[-1]) + 1 if len(nz := np.flatnonzero(row[1:])) else 0
        for row in qzz
    ]
    w = _BitWriter()
    prev_dc = 0
    for b in range(hb * wb):
        zz = qzz[b].tolist()
        size, bits = _magnitude(zz[0] - prev_dc)
        prev_dc = zz[0]
        code, length = dc_codes[size]
        w.put(code, length)
        if size:
            w.put(bits, size)
        run = 0
        last_nz = last_nzs[b]
        for i in range(1, last_nz + 1):
            if zz[i] == 0:
                run += 1
                if run == 16:
                    code, length = ac_codes[0xF0]  # ZRL
                    w.put(code, length)
                    run = 0
                continue
            size, bits = _magnitude(zz[i])
            code, length = ac_codes[(run << 4) | size]
            w.put(code, length)
            w.put(bits, size)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[0x00]  # EOB
            w.put(code, length)
    scan = w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes([1] * 64))  # DQT id 0, unit
    out += seg(
        0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    )  # SOF0: 8-bit, 1 component, 1x1 sampling, qtable 0
    out += seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    return out + scan + b"\xff\xd9"  # EOI


class _BitReader:
    """Entropy-scan bit reader with 0xFF00 un-stuffing."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if not self.nbits:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG: entropy scan exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG: entropy scan exhausted")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:
                    raise ValueError(f"unexpected marker 0xFF{marker:02x} in scan")
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _decode_huff(reader: "_BitReader", table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


_DHT_LUT_CACHE: dict = {}


def _dht_lut(bits_bytes: bytes, vals_bytes: bytes):
    """(decode dict, 16-bit lookup tables) for one DHT definition,
    cached per process — a pure function of the table bytes, and the
    synthesized corpora reuse the two standard tables for every image
    (guide §4.5: heavyweight init once, not per row).

    The LUT maps every 16-bit window of the scan to (symbol, code
    length) of the unique prefix code it starts with (-1 length = no
    code of <= 16 bits prefixes it)."""
    import numpy as np

    key = (bits_bytes, vals_bytes)
    hit = _DHT_LUT_CACHE.get(key)
    if hit is not None:
        return hit
    codes = _huff_codes(list(bits_bytes), list(vals_bytes))
    table = {(c, l): s for s, (c, l) in codes.items()}
    lut_sym = np.full(1 << 16, -1, dtype=np.int16)
    lut_len = np.zeros(1 << 16, dtype=np.uint8)
    for sym, (code, length) in codes.items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        lut_sym[lo:hi] = sym
        lut_len[lo:hi] = length
    if len(_DHT_LUT_CACHE) > 64:  # bound the per-process cache
        _DHT_LUT_CACHE.clear()
    _DHT_LUT_CACHE[key] = (table, lut_sym, lut_len)
    return _DHT_LUT_CACHE[key]


def _unstuff_scan(scan: bytes):
    """Un-stuff the entropy scan in bulk: returns (ascii 0/1 bit string
    padded with 16 trailing zeros, number of REAL bits, end reason).

    ``end`` is None while the scan ran to the end of ``scan``, the
    marker byte value when a 0xFF<marker> terminated it, or "truncated"
    for a trailing bare 0xFF — the same three outcomes the bit-at-a-
    time reader distinguishes, deferred to the moment the decoder
    actually needs bits past the end (identical observable errors)."""
    import numpy as np

    arr = np.frombuffer(scan, dtype=np.uint8)
    end = len(arr)
    end_reason = None
    stuffed = []
    for i in np.flatnonzero(arr == 0xFF):
        if i + 1 >= len(arr):
            end, end_reason = int(i), "truncated"
            break
        nxt = int(arr[i + 1])
        if nxt != 0x00:
            end, end_reason = int(i), nxt
            break
        stuffed.append(i + 1)
    data = np.delete(arr[:end], stuffed) if stuffed else arr[:end]
    bits = (np.unpackbits(data) + ord("0")).astype(np.uint8).tobytes()
    return bits + b"0" * 16, 8 * len(data), end_reason


def _raise_scan_end(end_reason) -> None:
    if isinstance(end_reason, int):
        raise ValueError(f"unexpected marker 0xff{end_reason:02x} in scan")
    raise ValueError("truncated JPEG: entropy scan exhausted")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg_gray(content: bytes) -> dict:
    """Decode a baseline grayscale JPEG: walk markers, rebuild the
    canonical Huffman tables from DHT, read the entropy scan
    (differential DC, run-length AC, EOB/ZRL), dequantize, de-zigzag,
    IDCT each block, level-shift/clamp, and return dims + pixel sum —
    the same whole-image statistic as the other image codecs, now
    through transform coding."""
    import numpy as np

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtables: dict = {}
    htables: dict = {}
    width = height = None
    scan_start = None
    while pos < len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        if pos + 2 > len(content):
            raise ValueError("truncated JPEG: marker cut short")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0xFF:  # fill byte padding before a marker
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are standalone (no length word) — legal between
            # SOI and SOS; advance past them instead of misreading the
            # following bytes as a segment length
            pos += 2
            continue
        if pos + 4 > len(content):
            raise ValueError("truncated JPEG: marker segment cut short")
        (seglen,) = struct.unpack_from(">H", content, pos + 2)
        if pos + 2 + seglen > len(content):
            raise ValueError("truncated JPEG: segment length exceeds stream")
        payload = content[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                if p + 65 > len(payload):
                    raise ValueError("truncated DQT payload")
                qtables[tq] = list(payload[p + 1 : p + 65])
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            if len(payload) < 9:
                raise ValueError("corrupt JPEG: SOF0 payload too short")
            _prec, height, width, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if ncomp != 1:
                raise NotImplementedError("only grayscale (1 component) supported")
            comp_q = payload[8]
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline SOF0 supported")
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                if len(bits) < 16:
                    raise ValueError("truncated DHT payload")
                nvals = sum(bits)
                if p + 17 + nvals > len(payload):
                    raise ValueError("truncated DHT payload")
                vals = list(payload[p + 17 : p + 17 + nvals])
                htables[(tc, th)] = _dht_lut(bytes(bits), bytes(vals))
                p += 17 + nvals
        elif marker == 0xDA:  # SOS
            if len(payload) < 3:
                raise ValueError("corrupt JPEG: SOS payload too short")
            dc_id, ac_id = payload[2] >> 4, payload[2] & 0xF
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if width is None or scan_start is None:
        raise ValueError("missing SOF0 or SOS")
    if comp_q not in qtables:
        raise ValueError(f"corrupt JPEG: quant table {comp_q} never defined")
    if (0, dc_id) not in htables or (1, ac_id) not in htables:
        raise ValueError(
            f"corrupt JPEG: Huffman table dc={dc_id}/ac={ac_id} never defined"
        )
    quant = np.array(qtables[comp_q], dtype=float)
    _, dc_sym, dc_len = htables[(0, dc_id)]
    _, ac_sym, ac_len = htables[(1, ac_id)]
    C = _dct_matrix()
    # r11 (guide §4.2): bulk un-stuffing + 16-bit LUT Huffman decode
    # (one table lookup per symbol instead of a per-bit Python loop),
    # then ONE batched dequantize/IDCT over every block of the image.
    bits, navail, end_reason = _unstuff_scan(content[scan_start:])
    bw, bh = (width + 7) // 8, (height + 7) // 8
    nb = bw * bh
    zz_rows = np.zeros((nb, 64))
    prev_dc = 0
    p = 0
    for b in range(nb):
        row = zz_rows[b]
        i = 0
        while i < 64:
            word = int(bits[p : p + 16], 2)
            table_sym, table_len = (dc_sym, dc_len) if i == 0 else (ac_sym, ac_len)
            length = int(table_len[word])
            if length == 0:
                if navail - p < 16:
                    _raise_scan_end(end_reason)
                raise ValueError("invalid Huffman code in scan")
            if p + length > navail:
                _raise_scan_end(end_reason)
            p += length
            sym = int(table_sym[word])
            if i == 0:
                size = sym
                if p + size > navail:
                    _raise_scan_end(end_reason)
                prev_dc += _extend(int(bits[p : p + size], 2) if size else 0, size)
                p += size
                row[0] = prev_dc
                i = 1
                continue
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                i += 16
                continue
            run, size = sym >> 4, sym & 0xF
            i += run
            if i > 63:
                raise ValueError("corrupt JPEG scan: AC run past end of block")
            if p + size > navail:
                _raise_scan_end(end_reason)
            row[i] = _extend(int(bits[p : p + size], 2) if size else 0, size)
            p += size
            i += 1
    coefs = np.zeros((nb, 64))
    coefs[:, _ZIGZAG] = zz_rows * quant[None, :]
    blocks = np.matmul(np.matmul(C.T, coefs.reshape(nb, 8, 8)), C) + 128.0
    tiles = np.clip(np.rint(blocks), 0, 255).astype(np.uint8)
    img = tiles.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    total = int(img[:height, :width].sum())
    return {"width": width, "height": height, "n_blocks": bw * bh, "pixel_sum": total}


def _jpeg_bytes_for_text(t: str) -> bytes:
    """Deterministic baseline-JPEG bytes for one text (the
    ``text_to_jpeg_column`` synthesis, factored out so the fused
    synth+decode kernel encodes the identical bytes)."""
    import numpy as np

    wb = 2 + len(t) % 5
    hb = 2 + len(t) % 4
    digest = hashlib.md5(t.encode("utf-8")).digest()
    img = np.zeros((hb * 8, wb * 8), dtype=np.uint8)
    for k in range(wb * hb):
        by, bx = divmod(k, wb)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = digest[k % 16]
    return encode_jpeg_gray(wb * 8, hb * 8, img.tobytes())


def text_to_jpeg_column(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a real baseline JPEG column deterministically from
    text: block-grid dims from the char length, each 8x8 block a flat
    gray level cycling the md5 digest bytes. Flat blocks under the unit
    quant table make the DCT round-trip EXACT (the only nonzero
    coefficient is DC = 8*(v-128), an integer preserved by rounding),
    so the construction stays reproducible in ANSI SQL while the bytes
    exercise genuine Huffman entropy coding."""

    @F.pandas_udf(T.BinaryType())
    def make_jpeg(texts: pd.Series) -> pd.Series:
        return pd.Series([_jpeg_bytes_for_text(t) for t in texts])

    return df.select(
        F.col(id_col).alias("doc_id"),
        make_jpeg(F.col(text_col)).alias("content"),
        F.lit("image/jpeg").alias("mime_type"),
    )


JPEG_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, n_blocks int, pixel_sum long"
)


def extract_jpeg_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched JPEG feature extraction (marker walk, Huffman
    scan decode, dequantize + IDCT, pixel-sum) — same mapInPandas shape
    as the BMP/PNG paths but through an entropy-coded transform codec."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_jpeg_gray(bytes(c)) for c in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out[["doc_id", "width", "height", "n_blocks", "pixel_sum"]]

    return assets.mapInPandas(kernel, schema=JPEG_FEATURE_SCHEMA)


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


# ------------------------------------------------- MJPEG/AVI video codec
#
# The VIDEO modality on real bytes: Motion-JPEG in a genuine RIFF/AVI
# container — 'hdrl' header list (avih + vids stream header + MJPG
# BITMAPINFOHEADER) and a 'movi' list of '00dc' chunks, each a complete
# entropy-coded baseline JPEG frame decoded by the transform codec
# above. Frame extraction walks the container; no synthetic text fake.


def _riff_chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _riff_list(list_type: bytes, data: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + data)


def encode_avi_mjpeg(
    width: int, height: int, frames: list, fps: int = 10
) -> bytes:
    """Pack JPEG frame streams into a Motion-JPEG AVI container."""
    n = len(frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        0, 0, 0,           # max bytes/sec, padding, flags
        n, 0, 1, 0,        # total frames, initial, streams, sugg buffer
        width, height,
        0, 0, 0, 0,        # reserved
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(
        b"movi", b"".join(_riff_chunk(b"00dc", f) for f in frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_riff(content: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) inside [pos, end)."""
    while pos + 8 <= end:
        cid = content[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", content, pos + 4)
        if pos + 8 + clen > end:
            raise ValueError("truncated AVI: chunk length exceeds stream")
        yield cid, pos + 8, clen
        pos += 8 + clen + (clen % 2)  # RIFF chunks pad to even


def decode_avi_mjpeg(content: bytes) -> dict:
    """Walk a Motion-JPEG AVI: validate RIFF/AVI magic, read frame
    count + dims from avih, decode every '00dc'/'00db' frame with the
    baseline-JPEG codec, cross-check counts and per-frame dims, and
    return clip metadata plus the whole-clip pixel-sum statistic."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI: missing RIFF/'AVI ' magic")
    if len(content) < 12:
        raise ValueError("truncated AVI: header cut short")
    n_declared = width = height = None
    frame_sums: list[int] = []
    for cid, p, ln in _iter_riff(content, 12, len(content)):
        if cid != b"LIST":
            continue
        if ln < 4:
            raise ValueError("truncated AVI: LIST type cut short")
        ltype = content[p : p + 4]
        if ltype == b"hdrl":
            for cid2, p2, ln2 in _iter_riff(content, p + 4, p + ln):
                if cid2 == b"avih":
                    if ln2 < 56:
                        raise ValueError("truncated AVI: avih cut short")
                    vals = struct.unpack_from("<14I", content, p2)
                    n_declared, width, height = vals[4], vals[8], vals[9]
        elif ltype == b"movi":
            for cid2, p2, ln2 in _iter_riff(content, p + 4, p + ln):
                if cid2 in (b"00dc", b"00db"):
                    feat = decode_jpeg_gray(content[p2 : p2 + ln2])
                    if width is not None and (
                        feat["width"] != width or feat["height"] != height
                    ):
                        raise ValueError(
                            "corrupt AVI: frame dims disagree with avih"
                        )
                    frame_sums.append(feat["pixel_sum"])
    if n_declared is None:
        raise ValueError("missing avih header")
    if n_declared != len(frame_sums):
        raise ValueError(
            f"corrupt AVI: avih declares {n_declared} frames, "
            f"movi holds {len(frame_sums)}"
        )
    return {
        "width": width,
        "height": height,
        "n_frames": len(frame_sums),
        "frame_sums": frame_sums,
        "pixel_sum_total": sum(frame_sums),
    }


def _avi_bytes_for_text(t: str) -> bytes:
    """Deterministic MJPEG-AVI bytes for one text (the
    ``text_to_mjpeg_avi_column`` synthesis, factored out so the fused
    synth+decode kernel encodes the identical bytes)."""
    import numpy as np

    nf = 1 + len(t) % 4
    wb = 2 + len(t) % 3
    hb = 2 + len(t) % 2
    digest = hashlib.md5(t.encode("utf-8")).digest()
    frames = []
    for f in range(nf):
        img = np.zeros((hb * 8, wb * 8), dtype=np.uint8)
        for k in range(wb * hb):
            by, bx = divmod(k, wb)
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = digest[(k + f) % 16]
        frames.append(encode_jpeg_gray(wb * 8, hb * 8, img.tobytes()))
    return encode_avi_mjpeg(wb * 8, hb * 8, frames)


def text_to_mjpeg_avi_column(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a real Motion-JPEG AVI column deterministically from
    text: frame count and block-grid dims from the char length, frame f
    built from the md5 digest ROTATED by f (each 8x8 block flat at
    digest[(k+f) % 16]), so every frame is a genuine entropy-coded
    baseline JPEG and the whole lossy pipeline stays exactly invertible
    for the SQL oracle (the flat-block/unit-quant construction)."""

    @F.pandas_udf(T.BinaryType())
    def make_avi(texts: pd.Series) -> pd.Series:
        return pd.Series([_avi_bytes_for_text(t) for t in texts])

    return df.select(
        F.col(id_col).alias("doc_id"),
        make_avi(F.col(text_col)).alias("content"),
        F.lit("video/x-msvideo").alias("mime_type"),
    )


MJPEG_FEATURE_SCHEMA = (
    "doc_id long, n_frames int, width int, height int, pixel_sum_total long"
)
VIDEO_FRAME_SCHEMA = "doc_id long, frame_idx int, frame_pixel_sum long"


def extract_mjpeg_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched clip-grain video feature extraction: container
    walk + per-frame Huffman/IDCT decode + whole-clip pixel sum."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_avi_mjpeg(bytes(c)) for c in pdf["content"]]
            out = pd.DataFrame(
                [
                    {k: f[k] for k in
                     ("n_frames", "width", "height", "pixel_sum_total")}
                    for f in feats
                ]
            )
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return assets.mapInPandas(kernel, schema=MJPEG_FEATURE_SCHEMA)


def extract_video_frames(assets: DataFrame) -> DataFrame:
    """Frame-grain extraction over REAL video bytes: one asset row fans
    out to one row per decoded frame (the keyframe-sampling shape) via
    a row-multiplying mapInPandas kernel — frames stream out per Arrow
    batch, never materialized all-at-once for a long clip."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                feat = decode_avi_mjpeg(bytes(content))
                for i, s in enumerate(feat["frame_sums"]):
                    ids.append(doc_id)
                    idxs.append(i)
                    sums.append(s)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_pixel_sum": sums}
            )

    return assets.mapInPandas(kernel, schema=VIDEO_FRAME_SCHEMA)


# ----------------------------------------- fused synth+decode kernels
#
# The bench/oracle queries that synthesize a media column from text and
# immediately decode it back paid TWO JVM<->Python Arrow crossings, with
# the media binary column — by far the heaviest column — serialized out
# of Python and straight back in between the synth pandas_udf node and
# the decode mapInPandas node. Fusing both steps into one mapInPandas
# kernel (guide §4.1: you control how many columns cross, and how many
# times) ships only the text in and the small feature ints out; the
# encoded bytes live and die inside one Python worker. The per-text
# synthesis and the decoder are the SAME functions the two-step
# operators use (`_*_bytes_for_text`, `decode_*`), so the features are
# byte-for-byte identical — only the plan shape changes
# (2 Python-eval nodes -> 1).


def _fused_text_features(
    df: DataFrame,
    make_bytes,
    decode,
    cols: list,
    schema: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [decode(make_bytes(t)) for t in pdf[text_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].to_numpy())
            yield out[["doc_id", *cols]]

    return df.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
    ).mapInPandas(kernel, schema=schema)


def text_to_jpeg_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fused `text_to_jpeg_column` + `extract_jpeg_features`: one
    Arrow crossing, identical features."""
    return _fused_text_features(
        df,
        _jpeg_bytes_for_text,
        decode_jpeg_gray,
        ["width", "height", "n_blocks", "pixel_sum"],
        JPEG_FEATURE_SCHEMA,
        text_col,
        id_col,
    )


def text_to_mjpeg_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fused `text_to_mjpeg_avi_column` + `extract_mjpeg_features`:
    one Arrow crossing, identical features."""
    return _fused_text_features(
        df,
        _avi_bytes_for_text,
        decode_avi_mjpeg,
        ["n_frames", "width", "height", "pixel_sum_total"],
        MJPEG_FEATURE_SCHEMA,
        text_col,
        id_col,
    )


def text_to_mulaw_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fused `text_to_mulaw_wav_column` + `extract_mulaw_features`:
    one Arrow crossing, identical features."""
    return _fused_text_features(
        df,
        _mulaw_bytes_for_text,
        decode_wav_mulaw,
        ["sample_rate", "n_samples", "abs_amplitude_sum"],
        WAV_FEATURE_SCHEMA,
        text_col,
        id_col,
    )


def text_to_adpcm_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fused `text_to_adpcm_wav_column` + `extract_adpcm_features`:
    one Arrow crossing, identical features."""
    return _fused_text_features(
        df,
        _adpcm_bytes_for_text,
        decode_wav_adpcm,
        ["sample_rate", "n_samples", "abs_amplitude_sum"],
        WAV_FEATURE_SCHEMA,
        text_col,
        id_col,
    )
