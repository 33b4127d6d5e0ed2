"""Audio spectral analysis — the FFT math the SQL oracle cannot
restate (round 9 continuation).

The registry entry ``multimodal_audio_spectrum`` proves the
distributed pipeline (synthesize → WAV → decode → FFT/STFT) against a
closed-form oracle (fundamental bin = N/P, frame count formula, zero
DC sum); the numeric substance — rfft agreement with an independently
coded naive DFT, sine/argmax behavior, framing edges, stereo channel
selection — is pinned here.
"""

from __future__ import annotations

import numpy as np
import pytest

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.multimodal import (
    dominant_bin,
    encode_wav,
    extract_spectral_features,
    stft_power,
)


def _naive_power(x: np.ndarray) -> np.ndarray:
    """O(n^2) DFT power spectrum — independent of numpy's FFT path."""
    n = len(x)
    k = np.arange(n // 2 + 1).reshape(-1, 1)
    t = np.arange(n).reshape(1, -1)
    re = (x * np.cos(-2 * np.pi * k * t / n)).sum(axis=1)
    im = (x * np.sin(-2 * np.pi * k * t / n)).sum(axis=1)
    return re**2 + im**2


def test_stft_power_matches_naive_dft_per_frame():
    rng = np.random.default_rng(5)
    x = rng.integers(-1000, 1000, size=300).astype(np.float64)
    got = stft_power(x, frame=64, hop=50)
    assert got.shape == ((300 - 64) // 50 + 1, 33)
    for f in range(got.shape[0]):
        ref = _naive_power(x[f * 50 : f * 50 + 64])
        assert np.allclose(got[f], ref, rtol=1e-9, atol=1e-6)


def test_stft_short_signal_yields_zero_frames():
    assert stft_power(np.arange(63), frame=64, hop=32).shape == (0, 33)


def test_stft_rejects_bad_params():
    with pytest.raises(ValueError):
        stft_power(np.arange(100), frame=0)
    with pytest.raises(ValueError):
        stft_power(np.arange(100), hop=-1)


def test_dominant_bin_exact_sine():
    n = 512
    for k in (3, 17, 100):
        x = 1000 * np.sin(2 * np.pi * k * np.arange(n) / n)
        assert dominant_bin(x) == k


def test_dominant_bin_square_wave_fundamental():
    n = 1920
    i = np.arange(n)
    for p in (8, 12, 16, 20):
        wave = np.where(i % p < p // 2, 8192, -8192)
        assert dominant_bin(wave) == n // p


def test_dominant_bin_ignores_dc():
    # constant offset + weak tone: DC dwarfs the tone but must not win
    n = 256
    x = 5000 + 10 * np.sin(2 * np.pi * 9 * np.arange(n) / n)
    assert dominant_bin(x) == 9


def test_dominant_bin_degenerate():
    assert dominant_bin(np.array([1.0])) is None


def test_extract_spectral_features_end_to_end(spark):
    n = 1920
    i = np.arange(n)
    sq16 = np.where(i % 16 < 8, 8192, -8192)
    # stereo: channel 0 carries the 16-period square, channel 1 noise —
    # the operator must analyze channel 0 only
    rng = np.random.default_rng(2)
    noise = rng.integers(-100, 100, size=n)
    stereo = np.empty(2 * n, dtype=np.int64)
    stereo[0::2] = sq16
    stereo[1::2] = noise
    rows = [
        (1, bytearray(encode_wav(16000, sq16.tolist(), bits=16))),
        (2, bytearray(encode_wav(8000, stereo.tolist(), bits=16, n_channels=2))),
        (3, None),
        (4, bytearray(b"RIFFxxxxWAVEjunk")),  # truncated -> quarantined
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {
        r["media_id"]: r.asDict()
        for r in extract_spectral_features(df, frame=256, hop=128).collect()
    }
    assert out[1]["dominant_bin"] == 1920 // 16
    assert out[1]["n_frames"] == (1920 - 256) // 128 + 1
    assert out[1]["dc_sum"] == 0
    assert out[2]["sample_rate"] == 8000
    assert out[2]["n_samples"] == 1920  # per-channel frames
    assert out[2]["dominant_bin"] == 1920 // 16  # channel 0, not noise
    assert out[3]["dominant_bin"] is None
    assert out[4]["n_samples"] is None

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
pytestmark = pytest.mark.slow
