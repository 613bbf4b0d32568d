"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payload columns plus a typed metadata
struct; per-item decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so payload bytes stream through Python in columnar
batches without JVM round-trips per row.  At cluster scale the payload
column lives in its own parquet column chunk — projections that don't
touch it never read it (column pruning), and ``spark.sql.files.
maxPartitionBytes`` bounds per-task memory for fat rows.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT available in this
container, so the decode kernels are STUBBED: ``decode_stub=True``
produces deterministic pseudo-metadata derived from the payload bytes
(md5-based), keeping every Spark-side contract — schema, batching,
partitioning, UDF signature — real and testable.  Swap ``_decode_one``
for a real codec in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

MEDIA_META = StructType([
    StructField("media_type", StringType()),   # image|audio|video
    StructField("n_bytes", LongType()),
    StructField("sig", StringType()),          # content digest
])

DECODED_IMAGE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("sig", StringType()),
])


def attach_payload(df: DataFrame, text_col: str = "text",
                   media_type: str = "image") -> DataFrame:
    """Wrap a column's bytes as a media payload + typed metadata (test
    stand-in for reading real blobs; production would `spark.read.format
    ("binaryFile")` or read a payload column from parquet)."""
    payload = F.encode(F.col(text_col), "UTF-8").cast(BinaryType())
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(F.lit(media_type).alias("media_type"),
                 F.octet_length(F.col("payload")).cast("long").alias("n_bytes"),
                 F.md5(F.col("payload")).alias("sig")))


def _decode_one(payload: bytes,
                digest: bytes | None = None) -> tuple[int, int]:
    """STUB decode: deterministic pseudo width/height from the content
    digest.  Replace with PIL/ffmpeg in production (not in container) —
    this is the ONE place the stub formula lives; callers that already
    hold the payload's md5 pass it via ``digest`` to avoid re-hashing."""
    d = digest if digest is not None else hashlib.md5(payload).digest()
    return 64 + d[0] % 192, 64 + d[1] % 192


def decode_images(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "payload",
                  batch_hint: int = 1024) -> DataFrame:
    """Decode a payload column into image metadata via mapInPandas.
    The iterator-of-batches signature is the real production shape:
    codecs initialize once per task, batches stay Arrow-columnar."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-task init of a real codec would happen here
        for pdf in batches:
            dims = [_decode_one(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "width": [w for w, _ in dims],
                "height": [h for _, h in dims],
                "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                "sig": [hashlib.md5(bytes(p)).hexdigest() for p in pdf[payload_col]],
            })

    return df.select(id_col, payload_col).mapInPandas(decode, DECODED_IMAGE_SCHEMA)


RESIZED_IMAGE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("out_w", IntegerType()),
    StructField("out_h", IntegerType()),
    StructField("resized_sig", StringType()),
])


def resize_images(df: DataFrame, max_side: int = 128,
                  id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """Decode + aspect-preserving resize fused in ONE mapInPandas pass
    (the production shape: the codec holds the pixel buffer, so resizing
    in a second pass would re-decode or ship pixels between stages).
    Target dims use integer arithmetic (w*max_side // max(w,h)) so the
    plan is engine-deterministic; the pixel kernel itself is STUBBED
    like ``decode_images`` (resized_sig stands in for the output
    bytes)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "out_w",
                                   "out_h", "resized_sig")}
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p)
                # ONE md5 per payload: dims and signature both derive
                # from the same digest (hashing the buffer twice doubled
                # per-row CPU for what this operator exists to batch);
                # the decode formula stays in _decode_one (the codec
                # swap point) — only the digest is shared
                d = hashlib.md5(b)
                w, h = _decode_one(b, d.digest())
                m = max(w, h)
                sig = d.hexdigest()
                out["doc_id"].append(i)
                out["width"].append(w)
                out["height"].append(h)
                out["out_w"].append(w * max_side // m)
                out["out_h"].append(h * max_side // m)
                out["resized_sig"].append(
                    hashlib.md5(f"{sig}#{max_side}".encode()).hexdigest())
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        kernel, RESIZED_IMAGE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("duration_ms", LongType()),
    StructField("frame_idx", LongType()),
    StructField("energy", DoubleType()),
])


def audio_features(df: DataFrame, frame_ms: int = 1000,
                   id_col: str = "doc_id",
                   payload_col: str = "payload") -> DataFrame:
    """Audio feature-extraction STUB: each payload expands one-to-many
    into per-frame feature rows (frame energy here; MFCC vectors in
    production) via the same iterator-of-batches mapInPandas shape —
    per-task codec init, Arrow-columnar batches, output rows ≫ input
    rows.  Pseudo sample-rate/duration/energy derive deterministically
    from the content digest so the pipeline is oracle-checkable without
    torchaudio/ffmpeg in the container."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "sample_rate", "duration_ms",
                                   "frame_idx", "energy")}
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p)
                d = hashlib.md5(b)
                sig, dig = d.hexdigest(), d.digest()
                sr = 8000 + dig[2] % 4 * 8000
                dur = len(b) * 10 % 60000 + 1000
                for f in range(dur // frame_ms + 1):
                    h = hashlib.md5(f"{sig}:{f}".encode()).hexdigest()
                    out["doc_id"].append(i)
                    out["sample_rate"].append(sr)
                    out["duration_ms"].append(dur)
                    out["frame_idx"].append(f)
                    out["energy"].append(int(h[:4], 16) % 1000 / 1000.0)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        kernel, AUDIO_FEATURES_SCHEMA)


def frame_sample(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload", every_n: int = 10) -> DataFrame:
    """Video frame sampling STUB: emits one row per sampled frame index
    with a per-frame digest.  Real implementation would demux with
    ffmpeg inside the same mapInPandas shape (one-to-many rows)."""
    n_frames = (F.octet_length(payload_col) % 90 + 10).alias("n_frames")
    base = df.select(id_col, payload_col, n_frames)
    return (base.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1,
                             F.lit(every_n))).alias("frame_idx"),
        F.md5(F.concat(F.col(payload_col).cast("string"),
                       F.lit("#"))).alias("stream_sig"))
    )
