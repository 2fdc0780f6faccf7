"""Motion-JPEG/AVI codec: the video modality behind
multimodal_mjpeg_decode / multimodal_video_frames (no Spark needed —
the Spark plumbing is covered by the oracle-parity gate).

Covers container structure, exact flat-block frame round-trips, the
avih/movi cross-checks, and the clean-failure contract under
truncation and byte-flip corruption (like the JPEG and mu-law suites).
"""

import struct

import numpy as np
import pytest

from end_to_end_database_pipeline_project_spark.operators.multimodal import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    encode_jpeg_gray,
)


def _flat_frames(digest, nf, wb, hb):
    frames, sums = [], []
    for f in range(nf):
        img = np.zeros((hb * 8, wb * 8), dtype=np.uint8)
        for k in range(wb * hb):
            by, bx = divmod(k, wb)
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = digest[(k + f) % 16]
        frames.append(encode_jpeg_gray(wb * 8, hb * 8, img.tobytes()))
        sums.append(int(img.sum()))
    return frames, sums


def test_container_structure():
    frames, _ = _flat_frames(bytes(range(16)), 2, 2, 2)
    avi = encode_avi_mjpeg(16, 16, frames)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    (riff_len,) = struct.unpack_from("<I", avi, 4)
    assert riff_len == len(avi) - 8
    assert b"LIST" in avi and b"hdrl" in avi and b"movi" in avi
    assert avi.count(b"00dc") == 2
    assert b"MJPG" in avi  # stream handler + strf compression


def test_roundtrip_exact_flat_blocks():
    rng = np.random.RandomState(5)
    for _ in range(10):
        nf = int(rng.randint(1, 5))
        wb, hb = int(rng.randint(2, 5)), int(rng.randint(2, 4))
        digest = bytes(rng.randint(0, 256, 16).tolist())
        frames, sums = _flat_frames(digest, nf, wb, hb)
        out = decode_avi_mjpeg(encode_avi_mjpeg(wb * 8, hb * 8, frames))
        assert out["n_frames"] == nf
        assert (out["width"], out["height"]) == (wb * 8, hb * 8)
        assert out["frame_sums"] == sums
        assert out["pixel_sum_total"] == sum(sums)


def test_frame_count_mismatch_rejected():
    frames, _ = _flat_frames(bytes(range(16)), 3, 2, 2)
    avi = bytearray(encode_avi_mjpeg(16, 16, frames))
    i = avi.index(b"avih")
    # avih total_frames is the 5th uint32 of the payload
    struct.pack_into("<I", avi, i + 8 + 16, 7)
    with pytest.raises(ValueError, match="declares 7 frames"):
        decode_avi_mjpeg(bytes(avi))


def test_frame_dims_mismatch_rejected():
    frames, _ = _flat_frames(bytes(range(16)), 1, 2, 2)
    other = encode_jpeg_gray(8, 8, bytes(64))
    avi = encode_avi_mjpeg(16, 16, frames + [other])
    with pytest.raises(ValueError, match="frame dims disagree"):
        decode_avi_mjpeg(avi)


def test_garbage_rejected():
    with pytest.raises(ValueError, match="RIFF"):
        decode_avi_mjpeg(b"not a container at all")


def test_truncation_and_byte_flip_never_crash_undiagnosed():
    frames, _ = _flat_frames(bytes(range(16)), 2, 2, 2)
    enc = encode_avi_mjpeg(16, 16, frames)
    for cut in range(0, len(enc), 3):
        try:
            decode_avi_mjpeg(enc[:cut])
        except (ValueError, NotImplementedError):
            pass
    for pos in range(len(enc)):
        for xor in (0x01, 0xFF):
            corrupt = bytearray(enc)
            corrupt[pos] ^= xor
            try:
                decode_avi_mjpeg(bytes(corrupt))
            except (ValueError, NotImplementedError):
                pass
