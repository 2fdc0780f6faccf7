"""IMA/DVI ADPCM codec: the PREDICTIVE lossy audio modality behind
multimodal_adpcm_decode (no Spark needed — the Spark plumbing is
covered by the oracle-parity gate).

The codec is a faithful IMA ADPCM implementation (89-entry step table,
4-bit nibbles, adaptive predictor). Tests pin the exact decode
recurrence the SQL oracle replays with a recursive CTE, the genuine
lossiness + adaptive tracking of the encoder, the digest-seeded
synthetic construction, and the clean-failure contract of the RIFF
walk (truncation + byte-flip sweeps, like the mu-law and JPEG codecs).
"""

import hashlib
import math
import struct

import pytest

from end_to_end_database_pipeline_project_spark.operators.multimodal import (
    ADPCM_INDEX,
    ADPCM_STEPS,
    adpcm_compress,
    adpcm_step,
    decode_wav_adpcm,
    encode_wav_adpcm,
)


def test_step_tables_are_canonical():
    # the standard IMA tables: 89 steps, ~1.1 growth ratio, symmetric
    # index adjustments over the sign bit
    assert len(ADPCM_STEPS) == 89
    assert ADPCM_STEPS[0] == 7 and ADPCM_STEPS[88] == 32767
    assert all(a < b for a, b in zip(ADPCM_STEPS, ADPCM_STEPS[1:]))
    assert ADPCM_INDEX == [-1, -1, -1, -1, 2, 4, 6, 8] * 2


def test_decode_step_reference_values():
    # nibble 0 from (0, idx 0): diff = 7 >> 3 = 0, idx drops clamped
    assert adpcm_step(0, 0, 0) == (0, 0)
    # nibble 7 from (0, idx 0): diff = 0 + 1 + 3 + 7 = 11, idx 0 -> 8
    assert adpcm_step(0, 0, 7) == (11, 8)
    # sign nibble mirrors exactly
    assert adpcm_step(0, 0, 0x8 | 7) == (-11, 8)
    # predictor clamps to int16
    assert adpcm_step(32767, 88, 7)[0] == 32767
    assert adpcm_step(-32768, 88, 0xF)[0] == -32768
    # index clamps to [0, 88]
    assert adpcm_step(0, 88, 4)[1] == 88
    assert adpcm_step(0, 0, 0)[1] == 0


def test_encoder_tracks_and_is_lossy():
    # a slow sine the adaptive step can follow: error stays bounded by
    # the largest step the encoder reaches, and 16 codes < 65536 levels
    samples = [int(8000 * math.sin(i / 40)) for i in range(600)]
    pred0, idx0, nib = adpcm_compress(samples)
    assert pred0 == samples[0] and idx0 == 0
    pred, idx = pred0, idx0
    decoded = [pred]
    max_step_seen = ADPCM_STEPS[0]
    for b in nib:
        for n in (b & 0x0F, b >> 4):
            max_step_seen = max(max_step_seen, ADPCM_STEPS[idx])
            pred, idx = adpcm_step(pred, idx, n)
            decoded.append(pred)
    errs = [abs(a - b) for a, b in zip(samples, decoded)]
    # after the warm-up ramp, tracking error is within ~2 steps
    assert max(errs[50:]) <= 2 * max_step_seen
    # genuinely lossy: decode differs from source somewhere
    assert any(e > 0 for e in errs)


def test_wav_roundtrip_matches_manual_recurrence():
    data = bytes(range(100))
    enc = encode_wav_adpcm(9000, -1234, 17, data)
    assert enc[:4] == b"RIFF" and enc[8:12] == b"WAVE"
    (fmt_tag,) = struct.unpack_from("<H", enc, 20)
    assert fmt_tag == 0x11
    out = decode_wav_adpcm(enc)
    pred, idx, energy, n = -1234, 17, abs(-1234), 1
    for b in data:
        for nibble in (b & 0x0F, b >> 4):
            pred, idx = adpcm_step(pred, idx, nibble)
            energy += abs(pred)
            n += 1
    assert out == {
        "sample_rate": 9000,
        "n_samples": n,
        "abs_amplitude_sum": energy,
    }


def test_digest_construction_matches_query_contract():
    # the synthetic construction multimodal_adpcm_decode relies on:
    # header seeded from digest bytes 0-2, nibbles = digest cycled
    t = "the quick brown fox jumps over the lazy dog"
    n = 64 + len(t) % 57
    digest = hashlib.md5(t.encode("utf-8")).digest()
    pred0 = struct.unpack_from("<h", digest, 0)[0]
    idx0 = digest[2] % 89
    data = (digest * (n // 16 + 1))[:n]
    enc = encode_wav_adpcm(8000 + 1000 * (len(t) % 5), pred0, idx0, data)
    out = decode_wav_adpcm(enc)
    assert out["n_samples"] == 1 + 2 * n
    pred, idx, energy = pred0, idx0, abs(pred0)
    for b in data:
        for nibble in (b & 0x0F, b >> 4):
            pred, idx = adpcm_step(pred, idx, nibble)
            energy += abs(pred)
    assert out["abs_amplitude_sum"] == energy


def test_pcm16_and_mulaw_wavs_rejected_cleanly():
    from end_to_end_database_pipeline_project_spark.operators.multimodal import (
        encode_wav,
        encode_wav_mulaw,
    )

    with pytest.raises(NotImplementedError, match="IMA ADPCM"):
        decode_wav_adpcm(encode_wav(8000, bytes(32)))
    with pytest.raises(NotImplementedError, match="IMA ADPCM"):
        decode_wav_adpcm(encode_wav_mulaw(8000, bytes(32)))


def test_truncation_and_byte_flip_never_crash_undiagnosed():
    enc = encode_wav_adpcm(8000, 500, 30, bytes(range(48)))
    for cut in range(len(enc)):
        try:
            decode_wav_adpcm(enc[:cut])
        except (ValueError, NotImplementedError):
            pass
    for pos in range(len(enc)):
        for xor in (0x01, 0x80, 0xFF):
            corrupt = bytearray(enc)
            corrupt[pos] ^= xor
            try:
                decode_wav_adpcm(bytes(corrupt))
            except (ValueError, NotImplementedError):
                pass
