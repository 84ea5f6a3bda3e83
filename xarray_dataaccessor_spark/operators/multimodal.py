"""Multimodal (binary) column plumbing (SURVEY §7.8 extension).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct beside them. The Spark-side plumbing — schema, partition-friendly
batch iteration, Arrow-batched ``mapInPandas`` UDF signatures — is real
and tested; the actual codec step is STUBBED (image/audio libraries are
not installed in this container): every operator runs a deterministic
fake codec by default — the decode is fake, but the array math around it
(block-mean resize, linear-interpolation resample, frame sampling) and
the Spark-side batch shapes are real. Passing ``codec="pil"`` /
``"soundfile"`` / ``"ffmpeg"`` raises NotImplementedError at the exact
point the real library would be called.
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


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    out_size: tuple[int, int] = (8, 8),
    codec: str = "fake",
) -> DataFrame:
    """Image decode + resize over mapInPandas. ``codec="fake"`` (this
    container) interprets the payload bytes as a deterministic grayscale
    raster (tiled to 32x32); the RESIZE is real array math — block-mean
    pooling to ``out_size`` — so batch shape, schema, and the
    downsampling numerics are all testable. ``codec="pil"`` marks where
    a real decoder plugs in."""
    if codec != "fake":
        raise NotImplementedError(
            f"image codec {codec!r} requires PIL/opencv, not installed; "
            "codec='fake' exercises the full plumbing"
        )
    oh, ow = out_size

    def batches_fn(batches: "Iterator") -> "Iterator":
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                img = np.resize(raw, (32, 32)).astype("float64")  # fake decode
                bh, bw = 32 // oh, 32 // ow
                resized = img.reshape(oh, bh, ow, bw).mean(axis=(1, 3))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "height": oh,
                        "width": ow,
                        "mean_pixel": float(img.mean()),
                        "pixels": [float(v) for v in resized.reshape(-1)],
                    }
                )
            yield pd.DataFrame(rows)

    schema = "doc_id bigint, height int, width int, mean_pixel double, pixels array<double>"
    return df.select("doc_id", payload_col).mapInPandas(batches_fn, schema)


def resample_audio(
    df: DataFrame,
    payload_col: str = "payload",
    rate: int = 16000,
    source_rate: int = 44100,
    codec: str = "fake",
) -> DataFrame:
    """Audio resample over mapInPandas. ``codec="fake"`` interprets the
    payload as an int16 waveform; the RESAMPLE is real linear
    interpolation onto the target rate's time grid. ``codec="soundfile"``
    marks the real-decoder entry point."""
    if codec != "fake":
        raise NotImplementedError(
            f"audio codec {codec!r} requires librosa/soundfile, not installed"
        )

    def batches_fn(batches: "Iterator") -> "Iterator":
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                raw = bytes(payload)
                wave = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2").astype(
                    "float64"
                )
                if wave.size < 2:
                    wave = np.zeros(2)
                n_out = max(2, int(round(wave.size * rate / source_rate)))
                t_in = np.arange(wave.size) / source_rate
                t_out = np.arange(n_out) / rate
                out = np.interp(t_out, t_in, wave)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples_in": int(wave.size),
                        "n_samples_out": int(out.size),
                        "rms": float(np.sqrt((out**2).mean())),
                    }
                )
            yield pd.DataFrame(rows)

    schema = "doc_id bigint, n_samples_in bigint, n_samples_out bigint, rms double"
    return df.select("doc_id", payload_col).mapInPandas(batches_fn, schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    every_ms: int = 1000,
    fps: int = 25,
    codec: str = "fake",
) -> DataFrame:
    """Video frame sampling over mapInPandas — a one-to-MANY decode (one
    output row per sampled frame), the batch shape a real ffmpeg probe
    produces. ``codec="fake"`` treats each 64-byte slice of the payload
    as one frame at ``fps``; frames on the ``every_ms`` grid are emitted
    with a content digest."""
    if codec != "fake":
        raise NotImplementedError(
            f"video codec {codec!r} requires ffmpeg/av, not installed"
        )
    step = max(1, int(round(fps * every_ms / 1000.0)))

    def batches_fn(batches: "Iterator") -> "Iterator":
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                raw = bytes(payload)
                n_frames = max(1, len(raw) // 64)
                for fi in range(0, n_frames, step):
                    frame = raw[fi * 64 : (fi + 1) * 64]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": fi,
                            "ts_ms": int(fi * 1000 / fps),
                            "frame_md5": hashlib.md5(frame).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows)

    schema = "doc_id bigint, frame_idx int, ts_ms bigint, frame_md5 string"
    return df.select("doc_id", payload_col).mapInPandas(batches_fn, schema)
