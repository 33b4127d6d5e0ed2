"""Perceptual image hash (pHash) — the math the SQL oracle cannot
restate (round 9 continuation).

The registry entry ``multimodal_phash_near_dup`` proves the
distributed pipeline (synthesize → PPM → decode → hash → banded
hamming join) against an id-arithmetic oracle; its exactness rests on
two content facts pinned HERE: same-family rasters hash identically
(trivial — determinism) and the 29 distinct family rasters are
pairwise hamming > 3, so no cross-family pair can leak into the
max_hamming=3 join at any SF. The perceptual properties themselves
(agreement with an independently-coded naive DCT, brightness
robustness, random-image discrimination) are also pinned here.
"""

from __future__ import annotations

import numpy as np
import pytest

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.multimodal import (
    box_mean_gray,
    dct2_f64,
    encode_ppm,
    image_near_pairs,
    luma_u8,
    phash64,
    phash_images,
)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _rand_rgb(w: int, h: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()


def _family_rgb(fam: int, w: int = 48, h: int = 40) -> bytes:
    # the exact synthesis formula of the registry entry
    idx = np.arange(w * h * 3, dtype=np.uint64)
    x = idx * np.uint64(2654435761) + np.uint64(fam * 1000003 + 12345)
    x ^= x >> np.uint64(13)
    x = x * np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(7)
    return (x & np.uint64(255)).astype(np.uint8).tobytes()


# ---------------------------------------------------------------- unit math


def test_luma_is_exact_for_gray_pixels():
    # R=G=B=v must map to exactly v (the 77+150+29=256 identity)
    rgb = bytes(v for v in range(256) for _ in range(3))
    g = luma_u8(rgb, 256, 1)
    assert g.tolist() == [list(range(256))]


def test_box_mean_identity_at_target_size():
    g = np.arange(32 * 32, dtype=np.int64).reshape(32, 32)
    assert (box_mean_gray(g, 32, 32) == g).all()


def test_box_mean_exact_on_uniform_blocks():
    # 64x64 of 2x2 constant blocks -> 32x32 means reproduce the blocks
    base = np.arange(32 * 32, dtype=np.int64).reshape(32, 32) % 251
    big = np.kron(base, np.ones((2, 2), dtype=np.int64))
    assert (box_mean_gray(big, 32, 32) == base).all()


def test_box_mean_upsamples_small_images():
    g = np.array([[10, 20], [30, 40]], dtype=np.int64)
    out = box_mean_gray(g, 32, 32)
    assert out.shape == (32, 32)
    assert sorted(np.unique(out).tolist()) == [10, 20, 30, 40]


def test_dct_matches_naive_formula():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 256, size=(32, 32)).astype(np.float64)
    d = dct2_f64(x)
    n = 32
    for u in range(8):
        for v in range(8):
            au = np.sqrt((1.0 if u == 0 else 2.0) / n)
            av = np.sqrt((1.0 if v == 0 else 2.0) / n)
            cu = np.cos(np.pi * (2 * np.arange(n) + 1) * u / (2 * n))
            cv = np.cos(np.pi * (2 * np.arange(n) + 1) * v / (2 * n))
            ref = au * av * float(cu @ x @ cv)
            assert abs(d[u, v] - ref) < 1e-9


def test_dct_dc_term_is_scaled_mean():
    x = np.full((32, 32), 100.0)
    d = dct2_f64(x)
    assert abs(d[0, 0] - 100.0 * 32) < 1e-9
    assert np.abs(d).sum() - abs(d[0, 0]) < 1e-9


# ------------------------------------------------------------- hash behavior


def test_phash_deterministic_and_signed_long_range():
    p = encode_ppm(48, 40, _family_rgb(5))
    h1, h2 = phash64(p), phash64(p)
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)


def test_phash_null_and_undecodable_route_to_none():
    assert phash64(None) is None
    assert phash64(b"\x89PNG\r\n\x1a\nnot really") is None
    assert phash64(b"GIF89a junk") is None


def test_phash_half_bits_set():
    # median thresholding: exactly 32 of 64 coefficients exceed the
    # median when all 64 values are distinct (generic for noise images)
    h = phash64(encode_ppm(48, 40, _rand_rgb(48, 40, 3)))
    assert bin(h & ((1 << 64) - 1)).count("1") == 32


def test_phash_brightness_robust():
    # +6 on every channel moves mostly the DC term: small hamming
    base = np.frombuffer(_rand_rgb(64, 48, 11), dtype=np.uint8)
    shifted = np.clip(base.astype(np.int16) + 6, 0, 255).astype(np.uint8)
    h1 = phash64(encode_ppm(64, 48, base.tobytes()))
    h2 = phash64(encode_ppm(64, 48, shifted.tobytes()))
    assert _hamming(h1, h2) <= 10


def test_phash_resize_robust():
    # same underlying structure at 2x resolution: the 32x32 box means
    # agree except for boundary rounding -> near-identical hash
    base = np.frombuffer(_rand_rgb(32, 32, 13), dtype=np.uint8).reshape(32, 32, 3)
    big = np.kron(base, np.ones((2, 2, 1), dtype=np.uint8))
    h1 = phash64(encode_ppm(32, 32, base.tobytes()))
    h2 = phash64(encode_ppm(64, 64, big.tobytes()))
    assert _hamming(h1, h2) <= 2


def test_phash_discriminates_random_images():
    hs = [phash64(encode_ppm(48, 40, _rand_rgb(48, 40, s))) for s in range(20)]
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            assert _hamming(hs[i], hs[j]) >= 12


def test_family_rasters_pairwise_hamming_exceeds_band_threshold():
    """THE oracle pin: the 29 registry family images never collide
    within the max_hamming=3 join, at any SF (content is data-
    independent)."""
    hs = [phash64(encode_ppm(48, 40, _family_rgb(f))) for f in range(29)]
    worst = min(
        _hamming(hs[i], hs[j])
        for i in range(29)
        for j in range(i + 1, 29)
    )
    assert worst > 3, f"closest family pair at hamming {worst}"


# -------------------------------------------------------------- distributed


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, bytearray(encode_ppm(48, 40, _family_rgb(0)))),
        (2, bytearray(encode_ppm(48, 40, _family_rgb(0)))),  # dup of 1
        (3, bytearray(encode_ppm(48, 40, _family_rgb(1)))),
        (4, bytearray(encode_ppm(48, 40, _family_rgb(1)))),  # dup of 3
        (5, bytearray(encode_ppm(48, 40, _family_rgb(2)))),  # singleton
        (6, None),  # dead blob routes onward
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_phash_images_schema_and_nulls(media_df):
    out = {r["media_id"]: r["phash"] for r in phash_images(media_df).collect()}
    assert len(out) == 6
    assert out[6] is None
    assert out[1] == out[2] and out[3] == out[4]
    assert out[1] != out[3] != out[5]


def test_image_near_pairs_finds_exactly_the_dup_groups(media_df):
    pairs = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_near_pairs(media_df, max_hamming=3).collect()
    )
    assert pairs == [(1, 2, 0), (3, 4, 0)]


def test_hamming_near_pairs_rejects_bad_band_config(spark):
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators.dedup import (
        hamming_near_pairs,
    )

    fp = spark.createDataFrame([(1, 0)], "id long, h long")
    with pytest.raises(ValueError):
        hamming_near_pairs(fp, max_hamming=4, n_chunks=4)


def test_hamming_near_pairs_wider_banding(spark):
    """8x8-bit chunks admit hamming up to 7; verify an exact distance
    is reported and the threshold filter holds."""
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators.dedup import (
        hamming_near_pairs,
    )

    fp = spark.createDataFrame(
        [(1, 0b1111), (2, 0b0111), (3, -1)], "id long, h long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_pairs(fp, max_hamming=7, n_chunks=8).collect()
    }
    assert got == {(1, 2): 1}  # 3 is 60+ bits from both


def test_chunk_entries_reject_degenerate_chunk_count(spark):
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators.dedup import (
        hash_chunk_entries,
    )

    fp = spark.createDataFrame([(1, 0)], "id long, h long")
    with pytest.raises(ValueError):
        hash_chunk_entries(fp, n_chunks=65)  # zero-width chunks
    with pytest.raises(ValueError):
        hash_chunk_entries(fp, n_chunks=0)


def test_chunk_entries_full_width_single_chunk(spark):
    """n_chunks=1 is the documented lower boundary: the chunk IS the
    whole long (a (1<<64)-1 mask literal would overflow Spark's long —
    ADVICE r9). Values, including negative longs, pass through
    unchanged, and hamming_near_pairs(max_hamming=0, n_chunks=1)
    degenerates to exact-hash pairing."""
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators.dedup import (
        hamming_near_pairs,
        hash_chunk_entries,
    )

    fp = spark.createDataFrame(
        [(1, -1), (2, -1), (3, 7), (4, 7), (5, 8)], "id long, h long"
    )
    rows = hash_chunk_entries(fp, n_chunks=1).collect()
    assert {r["chunk"] for r in rows} == {0}
    assert {(r["id"], r["val"]) for r in rows} == {
        (1, -1), (2, -1), (3, 7), (4, 7), (5, 8)
    }
    pairs = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_pairs(fp, max_hamming=0, n_chunks=1).collect()
    )
    assert pairs == [(1, 2, 0), (3, 4, 0)]

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
pytestmark = pytest.mark.slow
