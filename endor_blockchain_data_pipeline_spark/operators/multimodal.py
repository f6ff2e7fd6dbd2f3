"""Multimodal column handling: opaque binary media + typed metadata.

Training-data pipelines carry images/audio/video alongside text. The Spark
shape: media as ``binary`` columns with a typed metadata struct, transforms
as Arrow-batched ``mapInPandas`` (one Python worker pass per partition, no
per-row overhead), sized so each Arrow batch holds a bounded number of
media blobs (``spark.sql.execution.arrow.maxRecordsPerBatch``).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are deterministic fakes behind ``_decode_image_stub`` etc. —
clearly marked; the Spark-side plumbing (schemas, batching, partitioning,
UDF signatures) is real and tested. Swap the stub body for a real codec and
nothing else changes.

Scale notes: media rows are large — repartition by size (``target_rows_per
_partition``) before a decode pass so one straggler blob doesn't serialize
a whole partition; never collect; metadata-only predicates (width, dur)
push down to parquet because metadata lives in plain columns, not inside
the blob.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("phash", T.StringType()),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (blob = seeded bytes) for tests.

    Pure column expressions: blob bytes derived from xxhash64 — identical at
    any parallelism, like the WAL generator.
    """
    df = spark.range(0, n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), 3) + 1).cast("int"),
    )
    # blob: concat of 64 hash-derived 8-byte words -> 512 bytes, opaque
    words = [
        F.unhex(F.lpad(F.hex(F.abs(F.xxhash64("id", F.lit(seed), F.lit(i)))), 16, "0"))
        for i in range(64)
    ]
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.when(kind == "image", "image/png")
        .when(kind == "audio", "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.concat(*words).alias("data"),
        F.when(kind == "image", (F.pmod(F.xxhash64("id", F.lit("w")), 1920) + 16).cast("int")).alias("width"),
        F.when(kind == "image", (F.pmod(F.xxhash64("id", F.lit("h")), 1080) + 16).cast("int")).alias("height"),
        F.when(kind != "image", (F.pmod(F.xxhash64("id", F.lit("d")), 60000) + 100).cast("int")).alias(
            "duration_ms"
        ),
    )


def _decode_image_stub(data: bytes) -> dict:
    """STUB decode kernel — deterministic byte statistics instead of pixels.

    Replace with ``PIL.Image.open(io.BytesIO(data))`` + real features when
    the codec libraries are available; the surrounding plumbing is final.
    """
    import math

    b = bytes(data)
    n = len(b)
    counts: dict[int, int] = {}
    for x in b:
        counts[x] = counts.get(x, 0) + 1
    ent = -sum((c / n) * math.log2(c / n) for c in counts.values()) if n else 0.0
    mean = sum(b) / n if n else 0.0
    phash = "".join(f"{x:02x}" for x in b[:8])
    return {"n_bytes": n, "byte_mean": mean, "byte_entropy": ent, "phash": phash}


def extract_image_features(media: DataFrame) -> DataFrame:
    """image rows -> feature rows, Arrow-batched via mapInPandas."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_image_stub(d) for d in pdf["data"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out["n_bytes"] = out["n_bytes"].astype("int32")
            yield out

    imgs = media.where(F.col("kind") == "image").select("media_id", "data")
    return imgs.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 10_000, max_frames: int = 8) -> DataFrame:
    """video rows -> sampled frame rows (row expansion inside mapInPandas).

    The stub 'frame' is a deterministic slice of the blob; a real impl calls
    the demuxer per row and yields the same shape.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data, dur in zip(pdf["media_id"], pdf["data"], pdf["duration_ms"]):
                n = min(max_frames, max(int(dur // every_ms), 1))
                blob = bytes(data)
                for i in range(n):
                    off = (i * 37) % max(len(blob) - 16, 1)
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_ms": i * every_ms,
                            "frame": blob[off : off + 16],
                        }
                    )
            out = pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ms", "frame"])
            out["frame_idx"] = out["frame_idx"].astype("int32")
            out["frame_ms"] = out["frame_ms"].astype("int32")
            yield out

    vids = media.where(F.col("kind") == "video").select("media_id", "data", "duration_ms")
    return vids.mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize pass: stub keeps the blob, rewrites metadata (a real kernel
    re-encodes pixels). Shape: binary in -> binary out, same row count."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("data", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "data": pdf["data"],  # stub: real kernel re-encodes
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                }
            )

    imgs = media.where(F.col("kind") == "image").select("media_id", "data")
    return imgs.mapInPandas(kernel, out_schema)
