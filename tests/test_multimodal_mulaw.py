"""G.711 mu-law codec: the LOSSY audio modality behind
multimodal_mulaw_decode (no Spark needed — the Spark plumbing is
covered by the oracle-parity gate).

The codec is a faithful mu-law implementation (bias 0x84, clip 32635,
8 log segments x 16 mantissa levels). Tests pin the exact expansion
integers the SQL oracle replicates, the code<->level bijection the
synthetic construction relies on, the bounded quantization error that
makes it genuinely lossy, and the clean-failure contract of the RIFF
walk (truncation + byte-flip sweeps, like the JPEG codec).
"""

import struct

import numpy as np
import pytest

from end_to_end_database_pipeline_project_spark.operators.multimodal import (
    decode_wav_mulaw,
    encode_wav_mulaw,
    mulaw_compress,
    mulaw_expand,
)


def test_expansion_reference_values():
    # spot values from the G.711 tables: 0xFF is +0, 0x7F is -0,
    # 0x80 is the negative clip level, 0x00 the most negative
    assert mulaw_expand(0xFF) == 0
    assert mulaw_expand(0x7F) == 0
    assert mulaw_expand(0x00) == -8031 * 4  # -32124
    assert mulaw_expand(0x80) == 8031 * 4  # +32124
    # oracle formula equivalence on every code byte
    for b in range(256):
        u = 255 - b
        want = (8 * (u % 16) + 132) * (1 << ((u // 16) % 8)) - 132
        if u >= 128:
            want = -((8 * ((u - 128) % 16) + 132) * (1 << (((u - 128) // 16) % 8)) - 132)
        assert mulaw_expand(b) == want


def test_codes_sit_on_reconstruction_levels():
    # compress(expand(code)) == code for every code except negative
    # zero (0x7F), which canonicalizes to positive zero 0xFF — the
    # invariant the synthetic digest-bytes-as-codes construction needs
    for code in range(256):
        back = mulaw_compress(mulaw_expand(code))
        assert back == (0xFF if code == 0x7F else code)


def test_compression_is_lossy_with_bounded_error():
    # arbitrary PCM16 samples: the reconstruction error is bounded by
    # half the segment step (4 << exponent), and information is
    # genuinely lost (many inputs map to one code)
    rng = np.random.RandomState(7)
    distinct_codes = set()
    for s in rng.randint(-32768, 32768, 4000):
        s = int(s)
        code = mulaw_compress(s)
        distinct_codes.add(code)
        rec = mulaw_expand(code)
        mag = min(abs(s), 32635)
        exponent = max(0, (mag + 0x84).bit_length() - 8)
        assert abs(rec - (s if abs(s) <= 32635 else np.sign(s) * 32635)) <= (
            4 << exponent
        )
    assert len(distinct_codes) <= 256 < 4000


def test_monotonic_per_sign():
    # expansion must be strictly decreasing over positive codes
    # 0x80..0xFF reversed (larger biased code = smaller magnitude)
    pos = [mulaw_expand(c) for c in range(0xFF, 0x7F, -1)]
    assert all(a < b for a, b in zip(pos, pos[1:]))


def test_wav_roundtrip_and_energy():
    codes = bytes(range(256))
    enc = encode_wav_mulaw(8000, codes)
    assert enc[:4] == b"RIFF" and enc[8:12] == b"WAVE"
    (fmt_tag,) = struct.unpack_from("<H", enc, 20)
    assert fmt_tag == 7
    out = decode_wav_mulaw(enc)
    assert out == {
        "sample_rate": 8000,
        "n_samples": 256,
        "abs_amplitude_sum": sum(abs(mulaw_expand(b)) for b in codes),
    }


def test_pcm16_wav_rejected_cleanly():
    from end_to_end_database_pipeline_project_spark.operators.multimodal import (
        encode_wav,
    )

    pcm = encode_wav(8000, bytes(32))
    with pytest.raises(NotImplementedError, match="mu-law"):
        decode_wav_mulaw(pcm)


def test_truncation_and_byte_flip_never_crash_undiagnosed():
    enc = encode_wav_mulaw(8000, bytes(range(64)))
    for cut in range(len(enc)):
        try:
            decode_wav_mulaw(enc[:cut])
        except (ValueError, NotImplementedError):
            pass
    for pos in range(len(enc)):
        for xor in (0x01, 0x80, 0xFF):
            corrupt = bytearray(enc)
            corrupt[pos] ^= xor
            try:
                decode_wav_mulaw(bytes(corrupt))
            except (ValueError, NotImplementedError):
                pass


def test_multi_data_chunk_accumulates_consistently():
    # multi-chunk RIFF is legal: n_samples and energy must both
    # accumulate (previously n_samples kept only the last chunk)
    c1, c2 = bytes(range(64)), bytes(range(64, 128))
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    for codes in (c1, c2):
        body += b"data" + struct.pack("<I", len(codes)) + codes
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    out = decode_wav_mulaw(wav)
    assert out["n_samples"] == 128
    assert out["abs_amplitude_sum"] == sum(
        abs(mulaw_expand(b)) for b in c1 + c2
    )
