"""Pure-Python BMP codec: the real binary modality behind
multimodal_bmp_decode (no Spark needed — the Spark plumbing is covered
by the oracle-parity gate)."""

import struct

import pytest

from end_to_end_database_pipeline_project_spark.operators.multimodal import (
    decode_bmp,
    decode_stub,
    encode_bmp,
)


def test_roundtrip_unpadded_width():
    # width 4 -> row_bytes 12, stride 12 (no padding)
    pixels = bytes(range(4 * 3 * 2))
    bmp = encode_bmp(4, 2, pixels)
    out = decode_bmp(bmp)
    assert out == {
        "width": 4,
        "height": 2,
        "bpp": 24,
        "pixel_sum": sum(pixels),
    }


def test_roundtrip_padded_width():
    # width 5 -> row_bytes 15, stride 16: padding must NOT enter the sum
    pixels = bytes([255] * (5 * 3 * 3))
    bmp = encode_bmp(5, 3, pixels)
    out = decode_bmp(bmp)
    assert out["pixel_sum"] == 255 * 5 * 3 * 3
    # stride really is 16: file is header + 3 rows of 16
    assert len(bmp) == 54 + 3 * 16


def test_header_fields_are_spec_conformant():
    bmp = encode_bmp(3, 1, bytes(9))
    assert bmp[:2] == b"BM"
    assert struct.unpack_from("<I", bmp, 2)[0] == len(bmp)  # file size
    assert struct.unpack_from("<I", bmp, 10)[0] == 54  # pixel offset
    assert struct.unpack_from("<I", bmp, 14)[0] == 40  # DIB header size


def test_rejects_non_bmp_and_truncation():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"PNG....")
    bmp = encode_bmp(4, 2, bytes(24))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bmp[:-5])


def test_decode_stub_dispatches_bmp():
    bmp = encode_bmp(4, 1, bytes(12))
    feats = decode_stub(bmp, "image/bmp")
    assert feats["modality"] == "image"
    assert feats["byte_len"] == len(bmp)
    # JPEG is now a real decoder: valid streams dispatch, garbage raises
    from end_to_end_database_pipeline_project_spark.operators.multimodal import (
        encode_jpeg_gray,
    )

    jpg = encode_jpeg_gray(8, 8, bytes(64))
    assert decode_stub(jpg, "image/jpeg")["modality"] == "image"
    with pytest.raises(ValueError, match="truncated"):
        decode_stub(b"\xff\xd8\xff", "image/jpeg")
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x00", "video/mp4")


# ------------------------------------------------------------ WAV codec

from end_to_end_database_pipeline_project_spark.operators.multimodal import (  # noqa: E402
    decode_wav,
    encode_wav,
)


def test_wav_roundtrip():
    # samples: +1, -1, +32767, -32768 -> energy 65537
    samples = struct.pack("<4h", 1, -1, 32767, -32768)
    wav = encode_wav(16000, samples)
    assert decode_wav(wav) == {
        "sample_rate": 16000,
        "n_samples": 4,
        "abs_amplitude_sum": 1 + 1 + 32767 + 32768,
    }


def test_wav_tolerates_extra_chunks():
    # a LIST chunk with odd length between fmt and data: the chunk walk
    # must skip it (honoring RIFF even-padding) and still find data
    samples = struct.pack("<2h", 5, -7)
    wav = encode_wav(8000, samples)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    patched = wav[:fmt_end] + extra + wav[fmt_end:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert decode_wav(patched)["abs_amplitude_sum"] == 12


def test_wav_rejects_bad_magic_and_odd_samples():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS....")
    with pytest.raises(ValueError, match="even"):
        encode_wav(8000, b"\x01\x02\x03")


def test_decode_stub_dispatches_wav():
    wav = encode_wav(8000, struct.pack("<h", 42))
    assert decode_stub(wav, "audio/wav")["modality"] == "audio"


# ---------------------------------------------- property-based round-trips

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=25),
    data=st.data(),
)
def test_bmp_roundtrip_property(w, h, data):
    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=3 * w * h, max_size=3 * w * h
            )
        )
    )
    out = decode_bmp(encode_bmp(w, h, pixels))
    assert (out["width"], out["height"], out["pixel_sum"]) == (
        w,
        h,
        sum(pixels),
    )


@settings(max_examples=50, deadline=None)
@given(
    rate=st.integers(min_value=1, max_value=192000),
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=300),
)
def test_wav_roundtrip_property(rate, samples):
    raw = b"".join(struct.pack("<h", s) for s in samples)
    out = decode_wav(encode_wav(rate, raw))
    assert out == {
        "sample_rate": rate,
        "n_samples": len(samples),
        "abs_amplitude_sum": sum(abs(s) for s in samples),
    }

# ------------------------------------------------------------ PNG codec

import zlib  # noqa: E402

from end_to_end_database_pipeline_project_spark.operators.multimodal import (  # noqa: E402
    decode_png,
    encode_png,
)


def test_png_roundtrip():
    pixels = bytes(range(6 * 3 * 2))
    png = encode_png(6, 2, pixels)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert decode_png(png) == {
        "width": 6,
        "height": 2,
        "bit_depth": 8,
        "pixel_sum": sum(pixels),
    }


def test_png_crc_corruption_detected():
    png = bytearray(encode_png(4, 1, bytes(12)))
    # flip a byte inside the IDAT payload: CRC check must fire
    idat_at = bytes(png).index(b"IDAT")
    png[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))


def test_png_rejects_bad_signature():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"BM......")


def _png_from_raw(w, h, raw):
    """Build a PNG around arbitrary pre-filtered scanline bytes."""
    from end_to_end_database_pipeline_project_spark.operators.multimodal import (
        _png_chunk,
    )
    import struct as _s

    ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def test_png_unfilters_sub_up_avg_paeth():
    # 2x4 RGB image where every row uses a different filter type; the
    # expected pixel bytes are reconstructed per the PNG spec by hand.
    w = 2
    row0 = bytes([10, 20, 30, 40, 50, 60])          # filter 0: as-is
    # filter 1 (Sub): stored deltas vs pixel to the left
    row1_stored = bytes([1, 2, 3, 4, 5, 6])
    row1 = bytes([1, 2, 3, 5, 7, 9])
    # filter 2 (Up): stored deltas vs row1 actual
    row2_stored = bytes([10, 10, 10, 10, 10, 10])
    row2 = bytes([(a + 10) & 0xFF for a in row1])
    # filter 4 (Paeth) with all-zero stored bytes: predicts prev row
    row3_stored = bytes(6)
    row3 = row2
    raw = (
        b"\x00" + row0 + b"\x01" + row1_stored
        + b"\x02" + row2_stored + b"\x04" + row3_stored
    )
    out = decode_png(_png_from_raw(w, 4, raw))
    assert out["pixel_sum"] == sum(row0) + sum(row1) + sum(row2) + sum(row3)


def test_decode_stub_dispatches_png():
    png = encode_png(3, 1, bytes(9))
    assert decode_stub(png, "image/png")["modality"] == "image"


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=30),
    h=st.integers(min_value=1, max_value=20),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, data):
    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=3 * w * h, max_size=3 * w * h
            )
        )
    )
    out = decode_png(encode_png(w, h, pixels))
    assert (out["width"], out["height"], out["pixel_sum"]) == (
        w,
        h,
        sum(pixels),
    )


def test_every_prefix_of_every_codec_fails_cleanly():
    # exhaustive truncation sweep across all four codecs: any prefix of
    # a valid stream must either decode (cut past the needed bytes) or
    # raise a diagnosed ValueError/NotImplementedError — never a raw
    # IndexError/struct.error/zlib.error escaping to the caller. This
    # is the contract the Arrow-batch kernels rely on for quarantine
    # handling of corrupt payloads.
    from end_to_end_database_pipeline_project_spark.operators.multimodal import (
        decode_jpeg_gray,
        decode_png,
        encode_jpeg_gray,
        encode_png,
    )

    cases = [
        (encode_png(6, 4, bytes(range(72))), decode_png),
        (encode_wav(8000, bytes(range(128))), decode_wav),
        (encode_bmp(5, 3, bytes(45)), decode_bmp),
        (encode_jpeg_gray(8, 8, bytes(range(64))), decode_jpeg_gray),
    ]
    for enc, dec in cases:
        for cut in range(len(enc)):
            try:
                dec(enc[:cut])
            except (ValueError, NotImplementedError):
                pass


def test_safe_extraction_quarantines_per_row(spark):
    # one corrupt payload costs one quarantined row, never the batch
    from pyspark.sql import functions as F

    from end_to_end_database_pipeline_project_spark.operators.multimodal import (
        extract_bmp_features_safe,
    )

    good = encode_bmp(4, 2, bytes(24))
    rows = [(1, good), (2, good[:7]), (3, b"JUNK"), (4, good)]
    assets = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in extract_bmp_features_safe(assets).collect()}
    assert out[1]["status"] == "ok" and out[1]["pixel_sum"] == sum(bytes(24))
    assert out[4]["status"] == "ok"
    assert out[2]["status"] == "corrupt" and "truncated" in out[2]["error"]
    assert out[3]["status"] == "corrupt" and "magic" in out[3]["error"]
    assert out[2]["pixel_sum"] is None
