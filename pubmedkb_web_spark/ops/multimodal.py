"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract is real and tested — schema, partitioning, Arrow
batch shape, UDF signatures — while the actual media decode is STUBBED
(image/audio libraries are not in this container): ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder (shape + checksum derived from the bytes) stands in so the
distributed plumbing is exercised end-to-end.

Design for 100 TB of media:
- media rows are (id, media_type, payload binary, meta struct); payloads
  partition by size-bucketed id so no partition holds only huge blobs
- decode/feature-extract run via mapInPandas (Arrow binary batches),
  NOT collect-to-driver; batch size bounded by
  spark.sql.execution.arrow.maxRecordsPerBatch
- frame sampling / resize parameters travel as plain columns so Catalyst
  can prune non-media columns before Python sees bytes
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURES_SCHEMA = (
    "media_id string, media_type string, n_bytes long, checksum string, "
    "feat array<double>"
)


def synthetic_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (1 + i % 7)
                rows.append(
                    (
                        f"m{i:08d}",
                        ["image", "audio", "video"][i % 3],
                        payload,
                        64 + i % 512 if i % 3 == 0 else None,
                        64 + (i * 7) % 512 if i % 3 == 0 else None,
                        (1000 + i * 13 % 60000) if i % 3 != 0 else None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "payload", "width", "height", "duration_ms"]
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """STUB: real decode requires PIL/ffmpeg (not in this container).

    fake=True returns a deterministic stand-in so the distributed plumbing
    (batching, schema, partitioning) is testable.
    """
    if not fake:
        raise NotImplementedError(
            "media decode needs PIL/ffmpeg — not available in this image; "
            "pass fake=True for the deterministic stand-in"
        )
    digest = hashlib.sha256(payload).hexdigest()
    return {"checksum": digest, "n_bytes": len(payload)}


def extract_features(media: DataFrame, fake: bool = True, feat_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over Arrow binary batches.

    The 'feature' is a deterministic byte-statistic vector when fake=True;
    swap the body for a real model without touching the Spark plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                d = decode_image(bytes(payload), fake=fake)
                b = bytes(payload)
                feat = [
                    round(sum(b[j::feat_dim]) % 997 / 997.0, 6) for j in range(feat_dim)
                ]
                out.append((mid, mtype, d["n_bytes"], d["checksum"], feat))
            yield pd.DataFrame(
                out, columns=["media_id", "media_type", "n_bytes", "checksum", "feat"]
            )

    pruned = media.select("media_id", "media_type", "payload")
    return pruned.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (JVM-side sequence explode; the actual frame grab would live
    in a mapInPandas decode like extract_features)."""
    vids = media.filter(F.col("media_type") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
