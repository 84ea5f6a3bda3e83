"""Multimodal (binary) column plumbing (SURVEY §7.8 extension).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct beside them. The Spark-side plumbing — schema, partition-friendly
batch iteration, Arrow-batched ``mapInPandas`` UDF signatures — is real
and tested; the actual codec step is STUBBED (image/audio libraries are
not installed in this container): ``decode_binary`` computes deterministic
fake features (byte stats) and ``decode_image``/``resample_audio``/
``sample_frames`` raise NotImplementedError at the exact point a codec
would be called.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_META_SCHEMA = (
    "media_type string, width int, height int, n_channels int, duration_ms bigint"
)


def attach_binary_column(
    df: DataFrame, text_col: str = "text", media_type: str = "image/fake"
) -> DataFrame:
    """Make an opaque binary payload + metadata struct from a text column
    (stand-in for reading real media; at scale this is a
    ``spark.read.format('binaryFile')`` scan or a parquet BYTE_ARRAY
    column)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        (F.octet_length(payload) % 640).cast("int").alias("width"),
        (F.octet_length(payload) % 480).cast("int").alias("height"),
        F.lit(3).cast("int").alias("n_channels"),
        F.lit(None).cast("bigint").alias("duration_ms"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


def binary_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Deterministic byte-level features, pure built-ins: size, 256-byte
    chunk count, md5 checksum. This is the JVM-side fast path; anything
    needing a real decoder goes through :func:`decode_binary`."""
    p = F.col(payload_col)
    return df.withColumns(
        {
            "n_bytes": F.octet_length(p).cast("bigint"),
            "n_chunks": F.ceil(F.octet_length(p) / F.lit(256.0)).cast("bigint"),
            "checksum": F.md5(p),
        }
    )


def decode_binary(
    df: DataFrame, payload_col: str = "payload", batch_schema: str | None = None
) -> DataFrame:
    """Arrow-batched mapInPandas decode: the distributed plumbing a real
    image/audio decode would ride on. The per-batch function receives
    pandas DataFrames with raw bytes; the codec call is replaced by a
    deterministic fake (first/last byte, simple checksum) so the batch
    shape, schema, and partition behavior are testable in this container.
    """
    out_schema = batch_schema or (
        "doc_id bigint, n_bytes bigint, first_byte int, last_byte int, byte_sum bigint"
    )

    def decode_batches(batches: "Iterator") -> "Iterator":
        import pandas as pd

        for pdf in batches:
            payload = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payload.map(len),
                    "first_byte": payload.map(lambda b: b[0] if len(b) else -1),
                    "last_byte": payload.map(lambda b: b[-1] if len(b) else -1),
                    "byte_sum": payload.map(lambda b: int(sum(b[:64]))),
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(decode_batches, out_schema)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode (resize / pixel stats) — requires a codec library
    (PIL/opencv), not installed here. The mapInPandas plumbing is the same
    as :func:`decode_binary`."""
    raise NotImplementedError(
        "Image decoding requires PIL/opencv which are not installed; "
        "use decode_binary() for the tested plumbing with fake features."
    )


def resample_audio(df: DataFrame, payload_col: str = "payload", rate: int = 16000):
    """Audio resample stub — requires an audio library (librosa/soundfile)."""
    raise NotImplementedError(
        "Audio resampling requires librosa/soundfile which are not installed."
    )


def sample_frames(df: DataFrame, payload_col: str = "payload", every_ms: int = 1000):
    """Video frame sampling stub — requires a video decoder (ffmpeg/av)."""
    raise NotImplementedError(
        "Video frame sampling requires ffmpeg/av which are not installed."
    )
