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
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
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


def _decode_one(payload: bytes) -> tuple[int, int]:
    """STUB decode: deterministic pseudo width/height from the content
    digest.  Replace with PIL/ffmpeg in production (not in container)."""
    d = hashlib.md5(payload).digest()
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
