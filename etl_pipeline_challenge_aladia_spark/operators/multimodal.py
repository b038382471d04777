"""Multimodal column plumbing (north-star scope).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched pandas iterators (``mapInPandas``) —
the Spark-idiomatic shape for per-item Python work: data moves in columnar
Arrow batches, never row-at-a-time, and each task streams batches so a
partition never has to fit in pandas memory at once.

The actual decoders (PIL/ffmpeg/librosa) are NOT available in this
environment, so the decode kernel is stubbed: ``decode_stub=True`` (default)
derives deterministic fake features from the bytes themselves, keeping the
Spark-side plumbing — schema, batch iteration, partitioning, UDF signature —
real and testable. Wire a real decoder by passing ``kernel=``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: A media row: opaque payload + typed metadata (SURVEY.md §2.10 mapping).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8


def _stub_kernel(content: bytes) -> list[float]:
    """Deterministic fake feature: bytes -> sha256 -> 8 floats in [0, 1).

    Placeholder for a real decode+embed kernel (PIL/ffmpeg not installed
    here); replace via the ``kernel`` argument of ``extract_features``.
    """
    digest = hashlib.sha256(content or b"").digest()
    return [
        int.from_bytes(digest[i * 4 : i * 4 + 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    media: DataFrame,
    kernel: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """binary content -> fixed-width feature vectors via mapInPandas.

    One Arrow round-trip per batch; output schema is fixed so downstream
    similarity search (operators/similarity.py) composes directly on the
    ``feature`` column.
    """
    k = kernel or _stub_kernel

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_sha": content.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": content.map(lambda b: k(b or b"")),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _stub_resize_kernel(
    content: bytes, w: int, h: int, out_w: int, out_h: int
) -> bytes:
    """Deterministic fake resample: tags the payload hash with the target
    geometry. Placeholder for a real PIL/ffmpeg scaler (not installed
    here); replace via the ``kernel`` argument of ``resize_images``."""
    tag = f"{out_w}x{out_h}".encode()
    return hashlib.sha256((content or b"") + tag).digest()


def resize_images(
    media: DataFrame,
    out_w: int = 224,
    out_h: int = 224,
    kernel: Callable[[bytes, int, int, int, int], bytes] | None = None,
) -> DataFrame:
    """Image rows -> resized payloads via mapInPandas (the standard
    pre-embedding normalization pass, e.g. 224x224 for a ViT encoder).

    Same Arrow-batched shape as ``extract_features``: binary payloads move
    in columnar batches, the kernel runs per item inside a streamed pandas
    iterator, and the aspect-preserving target geometry (fit within
    out_w x out_h) is computed from typed metadata in Python ints — no
    decode needed to size the work. Swap the stub for a real scaler with
    ``kernel=``.
    """
    k = kernel or _stub_resize_kernel

    def fit(w: int | None, h: int | None) -> tuple[int, int]:
        if not w or not h or w <= 0 or h <= 0:
            return out_w, out_h
        scale = min(out_w / w, out_h / h)
        return max(1, int(w * scale)), max(1, int(h * scale))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [
                fit(w, h)
                for w, h in zip(pdf["meta"].map(lambda m: m["width"]),
                                pdf["meta"].map(lambda m: m["height"]))
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": [d[0] for d in dims],
                    "out_height": [d[1] for d in dims],
                    "content": [
                        k(c or b"", 0, 0, d[0], d[1])
                        for c, d in zip(pdf["content"], dims)
                    ],
                }
            )

    return media.filter(F.col("modality") == "image").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video -> frame-sampling work plan: one row per (media_id, frame_ts).

    Pure column math (sequence over duration) — the expensive decode is
    deferred to ``extract_features`` on the exploded plan, so frame tasks
    parallelize across the cluster instead of per-video.
    """
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        media.filter(F.col("modality") == "video")
        .select("media_id", F.explode(frames).alias("frame_ts_ms"), "content")
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic in-memory media fixture (no media libs needed).

    Partition count is bounded by the row count: a tiny fixture spread
    across every core would spawn one Arrow/Python worker per near-empty
    partition, and worker spawn — not the kernel — would dominate. Real
    media tables arrive from storage with data-sized partitions.
    """
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = bytes(hashlib.sha256(str(i).encode()).digest() * (1 + i % 4))
        rows.append(
            (
                i,
                modality,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[
                    modality
                ],
                payload,
                (64 + i, 48 + i, 1000 * (1 + i % 5)),
            )
        )
    n_parts = max(1, min(8, n // 8))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA).coalesce(n_parts)
