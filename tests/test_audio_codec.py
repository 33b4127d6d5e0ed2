"""Sample-exact tests for the stdlib WAV/PCM codec and the
exact-integer audio feature extractor (multimodal.decode_wav /
encode_wav / extract_audio_features) — the audio mirror of
test_png_codec.py's pixel-exact contract."""

from __future__ import annotations

import struct

import pytest

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark import (
    multimodal as MM,
)


def test_wav_round_trip_16bit_mono_sample_exact():
    samples = [0, 1000, -1000, 32767, -32768, 7, -7]
    payload = MM.encode_wav(8000, samples, bits=16)
    rate, bits, nch, got = MM.decode_wav(payload)
    assert (rate, bits, nch) == (8000, 16, 1)
    assert got == samples


def test_wav_round_trip_8bit_unsigned_shift():
    """8-bit WAV stores UNSIGNED bytes: centered -128..127 must shift
    +128 in the container and come back centered."""
    samples = [-128, -1, 0, 1, 127]
    payload = MM.encode_wav(44100, samples, bits=8)
    # raw data bytes in the container are shifted
    data_off = payload.index(b"data") + 8
    assert list(payload[data_off : data_off + 5]) == [0, 127, 128, 129, 255]
    rate, bits, nch, got = MM.decode_wav(payload)
    assert (rate, bits, nch) == (44100, 8, 1)
    assert got == samples


def test_wav_round_trip_stereo_interleaved():
    samples = [10, -10, 20, -20, 30, -30]  # L,R interleaved, 3 frames
    payload = MM.encode_wav(16000, samples, bits=16, n_channels=2)
    rate, bits, nch, got = MM.decode_wav(payload)
    assert (rate, bits, nch) == (16000, 16, 2)
    assert got == samples


def test_wav_odd_8bit_data_gets_pad_byte_and_still_decodes():
    """RIFF chunks are word-aligned: odd-length 8-bit data carries a
    pad byte that must not leak into the samples."""
    samples = [1, 2, 3]
    payload = MM.encode_wav(8000, samples, bits=8)
    assert len(payload) % 2 == 0
    assert MM.decode_wav(payload)[3] == samples


def test_wav_skips_unknown_chunks():
    """Real-world WAVs carry LIST/INFO metadata between fmt and data —
    the chunk walker must skip them by declared+padded length."""
    base = MM.encode_wav(8000, [5, -5, 9], bits=16)
    # splice a LIST chunk (odd body length -> padded) after 'WAVE'
    info = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = base[:12] + info + base[12:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    assert MM.decode_wav(spliced)[3] == [5, -5, 9]


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda p: b"OggS" + p[4:], "RIFF"),
        # tag 85 (MP3-in-WAV) stays honestly unsupported; tags 2/3/6/
        # 7/17 gained real decoders across round 9
        (lambda p: p[: p.index(b"fmt ") + 8] + struct.pack("<H", 85) + p[p.index(b"fmt ") + 10 :], "format tag 85"),
        # tag 3 with 16-bit samples is malformed (floats are 32/64)
        (lambda p: p[: p.index(b"fmt ") + 8] + struct.pack("<H", 3) + p[p.index(b"fmt ") + 10 :], "bits=16"),
        (lambda p: p[:-3], "truncated"),
    ],
)
def test_wav_rejects_non_pcm_and_truncated(mutate, msg):
    payload = mutate(MM.encode_wav(8000, [1, 2, 3, 4], bits=16))
    with pytest.raises(NotImplementedError) as exc:
        MM.decode_wav(payload)
    assert msg.split()[0].lower() in str(exc.value).lower()


def test_encode_wav_validates_args():
    with pytest.raises(ValueError):
        MM.encode_wav(8000, [300], bits=8)  # out of 8-bit range
    with pytest.raises(ValueError):
        MM.encode_wav(8000, [1], bits=24)
    with pytest.raises(ValueError):
        MM.encode_wav(0, [1], bits=16)
    with pytest.raises(ValueError):
        MM.encode_wav(8000, [1, 2, 3], bits=16, n_channels=2)


def test_extract_audio_features_exact_integers(spark):
    """Features must equal hand-computed exact integers; undecodable
    and NULL payloads yield NULL rows (batch never dies)."""
    samples = [3, -4, 0, 5, -1]  # signs: + - + + -
    wav = MM.encode_wav(1000, samples, bits=16)
    rows = [
        (1, bytearray(wav)),
        (2, None),
        (3, bytearray(b"not audio at all")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r.asDict()
        for r in MM.extract_audio_features(df).collect()
    }
    f = got[1]
    assert f["sample_rate"] == 1000 and f["bits"] == 16
    assert f["n_samples"] == 5
    assert f["duration_ms"] == 5 * 1000 // 1000
    assert f["peak"] == 5
    assert f["sum_sq"] == 9 + 16 + 0 + 25 + 1
    # sign(>=0) sequence: + - + + -  -> flips at 4 boundaries: +/-,
    # -/+, +/+ (no), +/- => 3
    assert f["zero_crossings"] == 3
    assert got[2]["n_samples"] is None
    assert got[3]["n_samples"] is None


def test_extract_audio_features_stereo_zero_crossings_per_channel(spark):
    """Zero crossings count per channel then sum — interleaving must
    not create phantom crossings between channels."""
    # L: 1, 1, 1 (0 crossings); R: -1, 1, -1 (2 crossings)
    samples = [1, -1, 1, 1, 1, -1]
    wav = MM.encode_wav(8000, samples, bits=16, n_channels=2)
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "media_id long, payload binary"
    )
    f = MM.extract_audio_features(df).collect()[0]
    assert f["n_channels"] == 2
    assert f["n_samples"] == 3  # frames, not raw samples
    assert f["zero_crossings"] == 2


# ---------------------------------------------------------------------------
# round 9: IMA/DVI ADPCM (WAV tag 17)
# ---------------------------------------------------------------------------

import math  # noqa: E402

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.multimodal import (  # noqa: E402
    _ima_step,
    encode_wav_adpcm,
)


def test_ima_step_hand_computed():
    """Independent hand arithmetic of the public IMA step (T.81-style
    verification discipline): pred=0,idx=0,nib=5 -> step 7, diff =
    0 + (7>>2) + 7 = 8, index += 4; pred=100,idx=4,nib=8 -> step 11,
    diff = -(11>>3) = -1, index -= 1."""
    assert _ima_step(0, 0, 5) == (8, 4)
    assert _ima_step(100, 4, 8) == (99, 3)


def test_adpcm_mono_round_trip_tracks_signal():
    sr = 8000
    src = [int(8000 * math.sin(2 * math.pi * 440 * t / sr)) for t in range(2000)]
    payload = encode_wav_adpcm(sr, src)
    rate, bits, nch, out = MM.decode_wav(payload)
    assert (rate, bits, nch) == (sr, 4, 1)
    assert len(out) == len(src)
    # block headers carry EXACT source samples (505-sample blocks)
    for k in (0, 505, 1010, 1515):
        assert out[k] == src[k]
    # after the initial step-size adaptation ramp the 4-bit coder
    # tracks a full-scale 440 Hz sine within quantization error
    errs = [abs(a - b) for a, b in zip(src[100:], out[100:])]
    assert max(errs) < 1500 and sum(errs) / len(errs) < 500


def test_adpcm_stereo_interleave():
    sr = 8000
    left = [int(5000 * math.sin(2 * math.pi * 300 * t / sr)) for t in range(1013)]
    right = [int(3000 * math.sin(2 * math.pi * 700 * t / sr)) for t in range(1013)]
    inter = [v for pair in zip(left, right) for v in pair]
    rate, bits, nch, out = MM.decode_wav(
        encode_wav_adpcm(sr, inter, n_channels=2)
    )
    assert (nch, len(out)) == (2, len(inter))
    # channel de-interleave is exact at block headers and bounded after
    assert out[0] == left[0] and out[1] == right[0]
    e_l = [abs(a - b) for a, b in zip(left[100:], out[200::2])]
    e_r = [abs(a - b) for a, b in zip(right[100:], out[201::2])]
    assert max(e_l) < 1500 and max(e_r) < 1500


def test_adpcm_deterministic_and_flat_exact():
    sr = 8000
    # constant signal: every diff is 0 -> nibble 0 path; decode returns
    # a near-constant line whose drift stays within the minimum step
    src = [1000] * 600
    p1 = encode_wav_adpcm(sr, src)
    p2 = encode_wav_adpcm(sr, src)
    assert p1 == p2
    _, _, _, out = MM.decode_wav(p1)
    assert out[0] == 1000 and max(abs(v - 1000) for v in out) <= 8


def test_adpcm_rejections():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        encode_wav_adpcm(0, [0])
    with _pytest.raises(ValueError):
        encode_wav_adpcm(8000, [0], samples_per_block=100)  # not 1 mod 8
    with _pytest.raises(ValueError):
        encode_wav_adpcm(8000, [40000])
    # float WAV still honestly rejected
    payload = bytearray(MM.encode_wav(8000, [0, 1, 2], bits=16))
    i = payload.index(b"fmt ")
    payload[i + 8 : i + 10] = (3).to_bytes(2, "little")  # tag 3 = float
    with _pytest.raises(NotImplementedError):
        MM.decode_wav(bytes(payload))
