"""Multimodal column plumbing (BASELINE.json north star).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct alongside. The Spark-side machinery — schema,
partition-friendly layout, Arrow-batched UDF signatures — is real and
tested; the actual codec calls are stubbed (image/audio libraries are
not in this container) behind deterministic fakes so the pipeline
shape can be verified end-to-end.

At 100 TB: binaries live in the lake as parquet binary columns (or
pointers to object-store blobs for >row-group-size payloads — the
``uri`` field); decode/feature-extract runs in ``mapInPandas`` so each
task streams Arrow batches without materializing a partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("uri", T.StringType()),  # pointer when payload is external
        T.StructField("payload", T.BinaryType()),  # inline bytes when small
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),  # image|audio|video
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha1 string, md5 string, "
    "feature array<double>"
)


def _fake_decode_features(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a codec+model feature extractor.

    Real decode (PIL/librosa/ffmpeg) is unavailable in this container —
    this derives a stable pseudo-feature from the payload bytes so the
    distributed plumbing (batching, schema, partitioning) is fully
    exercised. Swap the body for the real codec in production.
    """
    if payload is None:
        raise NotImplementedError(
            "external-uri payloads need an object-store fetch + codec; "
            "not available in this environment"
        )
    acc = []
    h = 2166136261
    for i in range(dim):
        for b in payload[i::dim] or b"\x00":
            h = (h ^ b) * 16777619 % (1 << 32)
        acc.append((h % 100003) / 100003.0)
    return acc


def extract_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    ``mapInPandas`` streams record batches through the extractor —
    constant memory per task regardless of partition size, no
    driver-side collection. Columns are pruned to exactly what the
    extractor needs before the Python boundary.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "sha1": pdf["payload"].map(
                        lambda p: "" if p is None else hashlib.sha1(p).hexdigest()
                    ),
                    "md5": pdf["payload"].map(
                        lambda p: "" if p is None else hashlib.md5(p).hexdigest()
                    ),
                    "feature": pdf["payload"].map(
                        lambda p: _fake_decode_features(p, feature_dim)
                    ),
                }
            )
            yield out

    pruned = media.select("media_id", F.col("meta.kind").alias("kind"), "payload")
    return pruned.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp
    (media_id, frame_ts_ms) — pure Spark (sequence + explode), the
    decode of each frame being the stubbed step above. Demonstrates
    fan-out shape: a 2-hour video → 7200 rows distributed across the
    cluster before any codec work."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)
        ).alias("frame_ts_ms"),
    )


RESIZE_SCHEMA = (
    "media_id long, src_width int, src_height int, dst_width int, "
    "dst_height int, payload binary"
)


def resize_images(
    media: DataFrame, max_side: int = 256, batch_rows_hint: int = 1024
) -> DataFrame:
    """Image resize over binary payloads — the standard normalize step
    before vision-model feature extraction.

    Spark-side contract (real, tested): prune to image rows, compute
    the aspect-preserving target box from metadata IN the plan (JVM
    expressions — the Python boundary only sees rows that need work),
    then stream Arrow batches through the resizer. The pixel work is
    the documented stub (`_fake_resize`): payload passes through
    unchanged, dimensions are the exact values a real PIL/opencv
    ``thumbnail(max_side)`` would produce, so downstream schema/layout
    logic is fully exercised without codecs.

    At 100 TB: resize is compute-bound per row with no shuffle at all
    — a pure map stage; parallelism = input partitions, so repartition
    upstream by payload-size histogram when batches skew.
    """

    def _fake_resize(payload, w, h, tw, th):
        if payload is None:
            raise NotImplementedError(
                "external-uri payloads need an object-store fetch + codec"
            )
        return payload  # stub: real impl returns re-encoded bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "src_width": pdf["width"],
                    "src_height": pdf["height"],
                    "dst_width": pdf["dst_width"],
                    "dst_height": pdf["dst_height"],
                    "payload": [
                        _fake_resize(p, w, h, tw, th)
                        for p, w, h, tw, th in zip(
                            pdf["payload"], pdf["width"], pdf["height"],
                            pdf["dst_width"], pdf["dst_height"],
                        )
                    ],
                }
            )

    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.lit(max_side) / F.greatest(w, h)
    needs = F.greatest(w, h) > max_side
    pruned = media.filter(
        (F.col("meta.kind") == "image") & w.isNotNull() & h.isNotNull()
    ).select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        F.when(needs, F.floor(w * scale)).otherwise(w).cast("int").alias("dst_width"),
        F.when(needs, F.floor(h * scale)).otherwise(h).cast("int").alias("dst_height"),
        "payload",
    )
    return pruned.mapInPandas(run, schema=RESIZE_SCHEMA)
