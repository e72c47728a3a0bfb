"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Engine extension (north-star requirement): treat image/audio/video as
``binary`` columns with a typed metadata struct, and run decode /
feature-extraction as Arrow-batched Pandas functions over
``mapInPandas``. The Spark-side plumbing — schema, partitioning, UDF
signature, batch shape — is real and tested; the actual codec calls
are STUBBED (``decode_stub``) because image/audio libraries are not in
this environment. A deployment swaps ``decode_stub`` for a PIL/ffmpeg
kernel without touching any plan.

Scale notes: binary payloads ride the scan; metadata-only queries must
never deserialize them — keep metadata in separate top-level columns
(not inside the blob) so column pruning skips the bytes entirely.
``mapInPandas`` processes Arrow record batches, so per-row Python
overhead is amortized; ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds peak memory for fat blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_stub(content: bytes, kind: str, dim: int = 8) -> list[float]:
    """Deterministic fake decoder: sha256-seeded pseudo-features.

    REAL DEPLOYMENT: replace with PIL.Image.open / torchaudio.load /
    pyav frame sampling. Raises on None to mirror decoder behavior.
    """
    if content is None:
        raise NotImplementedError("no content to decode")
    digest = hashlib.sha256(content).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Decode + featurize media blobs via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "content_sha256": pdf["content"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                        if b is not None
                        else None
                    ),
                    "feature": pdf.apply(
                        lambda r: decode_stub(r["content"], r["kind"], dim)
                        if r["content"] is not None
                        else None,
                        axis=1,
                    ),
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.IntegerType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame.

    STUB decode: frames are deterministic slices of the payload hashed
    per index (a real deployment decodes with pyav and yields actual
    frames; the fan-out shape — mapInPandas expanding one video row to
    N frame rows, batch-bounded by Arrow — is exactly this). Videos
    without a duration yield a single frame at t=0.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for _, r in pdf.iterrows():
                if r["content"] is None:
                    continue
                dur = r["duration_ms"] if pd.notna(r["duration_ms"]) else 0
                n_frames = max(1, int(dur) // every_ms)
                for i in range(n_frames):
                    frame_bytes = bytes(r["content"]) + i.to_bytes(4, "big")
                    out_rows.append(
                        (
                            r["media_id"],
                            i,
                            i * every_ms,
                            hashlib.sha256(frame_bytes).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                out_rows,
                columns=["media_id", "frame_idx", "frame_ms", "frame_sha256"],
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_plan(media: DataFrame, max_px: int = 256, n_shards: int = 16) -> DataFrame:
    """Image-resize layout step: spreads fat blobs across shards so
    they don't skew executors (the kernel itself is ``resize_images``).

    Partitioning on size_class alone would do the opposite — two hash
    values concentrate every large blob in ONE partition; the id-hash
    shard inside each class is what actually spreads them."""
    sized = media.withColumn(
        "size_class",
        F.when(F.length("content") > 1_000_000, F.lit("large")).otherwise(
            F.lit("small")
        ),
    ).withColumn("shard", F.pmod(F.hash("media_id"), F.lit(n_shards)))
    return sized.repartition("size_class", "shard").drop("shard")


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def bounded_box(w: int, h: int, max_px: int) -> tuple[int, int]:
    """Integer-exact bounded-box target dims: identity inside the box;
    otherwise scale the long side to max_px by floor division, aspect
    preserved, floors clamped to 1, never upscaled. Property-tested
    directly (pure function); the oracle SQL mirrors it term-for-term."""
    m = max(w, h)
    if m <= max_px:
        return w, h
    return max(1, w * max_px // m), max(1, h * max_px // m)


def resize_images(
    media: DataFrame, max_px: int = 256, n_shards: int = 16
) -> DataFrame:
    """Bounded-box image resize over ``resize_plan``'s skew-spread
    layout, as an Arrow-batched mapInPandas kernel.

    The DIMENSION arithmetic is real and integer-exact (no float
    scale), so an ANSI-SQL oracle can replicate it digit-for-digit:
    with m = max(w, h), an image already within the box keeps (w, h);
    otherwise new_w = max(1, w·max_px // m) and likewise for h —
    aspect ratio preserved under floor division, never upscaled. The
    PIXEL transform is the documented stub (sha256 of payload + target
    dims standing in for the resized bytes); a deployment swaps in a
    PIL kernel without touching the plan, schema, or shard layout.
    Rows with no payload or no dimensions are dropped (decoder
    behavior: nothing to resize).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["content"] is None or pd.isna(r["width"]) or pd.isna(
                    r["height"]
                ):
                    continue
                w, h = int(r["width"]), int(r["height"])
                nw, nh = bounded_box(w, h, max_px)
                stub = hashlib.sha256(
                    bytes(r["content"])
                    + nw.to_bytes(4, "big")
                    + nh.to_bytes(4, "big")
                ).digest()
                rows.append((r["media_id"], r["kind"], w, h, nw, nh, stub))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height",
                    "new_width", "new_height", "content",
                ],
            )

    return resize_plan(media, max_px, n_shards).mapInPandas(
        run, schema=RESIZED_SCHEMA
    )
