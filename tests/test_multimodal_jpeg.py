"""Pure-Python baseline JPEG codec: the entropy-coded image modality
behind multimodal_jpeg_decode (no Spark needed — the Spark plumbing is
covered by the oracle-parity gate).

The decoder is a general baseline-grayscale implementation (any
coefficients, any 8-bit quant table); the flat-block synthesizer is
merely the construction that makes the lossy transform exactly
invertible for the SQL oracle. Tests cover both: exact flat-block
round-trips AND near-exact arbitrary-content round-trips that exercise
the AC run-length path, ZRL, byte stuffing and Huffman decode of real
non-trivial scans.
"""

import struct

import numpy as np
import pytest

from end_to_end_database_pipeline_project_spark.operators.multimodal import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def _flat_image(block_vals, wb, hb):
    img = np.zeros((hb * 8, wb * 8), dtype=np.uint8)
    for k, v in enumerate(block_vals):
        by, bx = divmod(k, wb)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    return img


def test_flat_blocks_roundtrip_exactly():
    # flat 8x8 blocks + unit quant: DC = 8*(v-128) is an integer, the
    # only nonzero coefficient — the lossy pipeline is exactly invertible
    rng = np.random.RandomState(11)
    for _ in range(25):
        wb, hb = int(rng.randint(1, 7)), int(rng.randint(1, 6))
        img = _flat_image(rng.randint(0, 256, wb * hb), wb, hb)
        out = decode_jpeg_gray(encode_jpeg_gray(wb * 8, hb * 8, img.tobytes()))
        assert out == {
            "width": wb * 8,
            "height": hb * 8,
            "n_blocks": wb * hb,
            "pixel_sum": int(img.sum()),
        }


def test_extreme_levels_exercise_byte_stuffing():
    # values 0 and 255 produce large DC diffs whose entropy bytes are
    # overwhelmingly likely to hit 0xFF runs; a long alternating strip
    # makes stuffing certain to occur and must still decode exactly
    vals = [0, 255] * 12
    img = _flat_image(vals, 6, 4)
    enc = encode_jpeg_gray(48, 32, img.tobytes())
    scan = enc[enc.index(b"\xff\xda") + 14 : -2]
    assert b"\xff\x00" in scan  # stuffed byte really present
    assert decode_jpeg_gray(enc)["pixel_sum"] == int(img.sum())


def test_arbitrary_content_near_exact_under_unit_quant():
    # random pixels: every AC coefficient path (runs, ZRL, all size
    # categories) is live; with quant=1 the only loss is coefficient
    # rounding, so per-image |pixel_sum error| stays tiny
    rng = np.random.RandomState(3)
    for _ in range(8):
        wb, hb = int(rng.randint(1, 5)), int(rng.randint(1, 5))
        img = rng.randint(0, 256, (hb * 8, wb * 8)).astype(np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray(wb * 8, hb * 8, img.tobytes()))
        n_px = img.size
        # coefficient rounding drifts the sum by O(sqrt(n_px)), far
        # below one gray level per ten pixels
        assert abs(out["pixel_sum"] - int(img.sum())) <= max(8, n_px // 10)


def test_gradient_exercises_ac_coefficients():
    # a horizontal ramp has large low-frequency AC terms; mean error
    # per pixel must stay under 1 gray level
    img = np.tile(np.arange(256, dtype=np.uint8).reshape(1, -1)[:, :32], (16, 1))
    out = decode_jpeg_gray(encode_jpeg_gray(32, 16, img.tobytes()))
    assert abs(out["pixel_sum"] - int(img.sum())) <= img.size


def test_marker_structure_is_spec_conformant():
    enc = encode_jpeg_gray(8, 8, bytes(64))
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    # APP0 JFIF identifier
    assert enc[2:4] == b"\xff\xe0" and enc[6:11] == b"JFIF\x00"
    # SOF0 present with 8-bit precision, 1 component
    i = enc.index(b"\xff\xc0")
    prec, h, w, ncomp = struct.unpack_from(">BHHB", enc, i + 4)
    assert (prec, h, w, ncomp) == (8, 8, 8, 1)
    # two DHT segments (DC class 0, AC class 1)
    assert enc.count(b"\xff\xc4") >= 2


def test_decoder_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"not a jpeg")
    enc = bytearray(encode_jpeg_gray(8, 8, bytes(64)))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg_gray(bytes(enc))


def test_decoder_honours_quant_table():
    # hand-build a stream with quant table of 2s: decoded DC doubles.
    # Encode a flat image, then patch the DQT payload from 1s to 2s —
    # the decoder must dequantize with the table it parsed, shifting
    # gray level v-128 -> 2(v-128) (clamped).
    img = _flat_image([128 + 10] * 1, 1, 1)  # v=138 -> DC=80
    enc = bytearray(encode_jpeg_gray(8, 8, img.tobytes()))
    i = enc.index(b"\xff\xdb")
    for j in range(i + 5, i + 5 + 64):
        assert enc[j] == 1
        enc[j] = 2
    out = decode_jpeg_gray(bytes(enc))
    # 128 + 2*10 = 148 per pixel
    assert out["pixel_sum"] == 148 * 64


# ---------------------------------------------- property-based round-trips

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    wb=st.integers(min_value=1, max_value=6),
    hb=st.integers(min_value=1, max_value=5),
    data=st.data(),
)
def test_flat_block_roundtrip_property(wb, hb, data):
    # ANY flat-block image round-trips exactly under the unit quant
    # table — the invariant the SQL oracle construction relies on
    vals = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=255),
            min_size=wb * hb,
            max_size=wb * hb,
        )
    )
    img = _flat_image(vals, wb, hb)
    out = decode_jpeg_gray(encode_jpeg_gray(wb * 8, hb * 8, img.tobytes()))
    assert out["pixel_sum"] == int(img.sum())
    assert (out["width"], out["height"]) == (wb * 8, hb * 8)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_random_content_roundtrip_error_bounded_property(seed):
    # arbitrary pixel content: the only loss is coefficient rounding,
    # so the mean reconstruction error stays under 0.1 gray levels
    rng = np.random.RandomState(seed)
    wb, hb = int(rng.randint(1, 4)), int(rng.randint(1, 4))
    img = rng.randint(0, 256, (hb * 8, wb * 8)).astype(np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(wb * 8, hb * 8, img.tobytes()))
    assert abs(out["pixel_sum"] - int(img.sum())) <= max(8, img.size // 10)


@settings(max_examples=25, deadline=None)
@given(
    cut=st.integers(min_value=3, max_value=60),
)
def test_truncated_stream_never_crashes_undiagnosed(cut):
    # every truncation of a valid stream must raise a clean
    # ValueError/NotImplementedError (or decode, if the cut landed
    # after the last needed byte) — never IndexError/struct.error
    enc = encode_jpeg_gray(8, 8, bytes(range(64)) * 1)
    prefix = enc[: max(2, len(enc) * cut // 64)]
    try:
        decode_jpeg_gray(prefix)
    except (ValueError, NotImplementedError):
        pass


def test_byte_flip_corruption_never_crashes_undiagnosed():
    # exhaustive single-byte corruption (not just truncation): every
    # position XORed with three patterns must either decode or raise the
    # clean ValueError/NotImplementedError the quarantine kernel catches
    # — never IndexError (AC run past 63), KeyError (missing DQT/DHT id)
    # or struct.error (short SOF/SOS payloads)
    enc = encode_jpeg_gray(16, 16, bytes(range(256)))
    for pos in range(2, len(enc)):
        for xor in (0x01, 0x80, 0xFF):
            corrupt = bytearray(enc)
            corrupt[pos] ^= xor
            try:
                decode_jpeg_gray(bytes(corrupt))
            except (ValueError, NotImplementedError):
                pass


def test_standalone_markers_and_fill_bytes_accepted():
    # TEM (0xFF01) and RSTn (0xFFD0-D7) carry no length word, and fill
    # 0xFF bytes may pad before any marker — all legal between SOI and
    # SOS and must not be misparsed as sized segments
    img = _flat_image([100, 200], 2, 1)
    enc = encode_jpeg_gray(16, 8, img.tobytes())
    want = decode_jpeg_gray(enc)
    patched = enc[:2] + b"\xff\x01\xff\xd3\xff\xff\xd7\xff" + enc[2:]
    assert decode_jpeg_gray(patched) == want
