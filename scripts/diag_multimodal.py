"""Per-branch timing for multimodal_binary_features: each attach/decode
branch is timed separately against the noop sink (guide §1.4), then the
full slot, so the dominant branch and the join overhead are both visible.

Usage: python scripts/diag_multimodal.py [repeats]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    from pyspark.sql import functions as F

    import xarray_dataaccessor_spark.queries_ext as QE  # noqa: F401
    from xarray_dataaccessor_spark.queries import QUERIES
    from xarray_dataaccessor_spark.session import get_spark
    from xarray_dataaccessor_spark.sources.tables import load
    from xarray_dataaccessor_spark.operators.dedup import spread_small_input
    from xarray_dataaccessor_spark.operators import multimodal as M

    spark = get_spark(app_name="xda-diag-mm", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/documents.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(0, int(cpus), 1, int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    docs = spread_small_input(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    )

    def branches():
        yield "feats(binary_features)", M.binary_features(
            M.attach_binary_column(docs)
        )
        media = M.attach_media_column(docs)
        yield "attach_media only", media
        for codec in ("netpbm", "png", "jpeg"):
            yield f"decode_image[{codec}]", M.decode_image(
                media.filter(F.col("img_codec") == codec), codec=codec
            )
        yield "audio(flac resample)", M.resample_audio(
            M.attach_audio_column(docs), rate=4000, codec="flac"
        )
        yield "attach_audio only", M.attach_audio_column(docs)
        yield "mp3 probe", M.audio_probe(M.attach_mp3_column(docs))
        yield "webp stats", M.image_channel_stats(
            M.attach_webp_lossy_column(docs), codec="webp"
        )
        yield "attach_webp only", M.attach_webp_lossy_column(docs)
        yield "aud2 probe", M.audio_probe(M.attach_container_audio_column(docs))
        yield "video probe", M.probe_videos(M.attach_video_column(docs))
        yield "attach_video only", M.attach_video_column(docs)
        yield "spectrogram", M.audio_spectrogram(
            M.attach_tone_audio_column(docs), codec="wav"
        )
        yield "attach_tone only", M.attach_tone_audio_column(docs)
        yield "FULL SLOT", QUERIES["multimodal_binary_features"](spark, sf_dir)

    for _ in range(repeats):
        for label, df in branches():
            spark.sparkContext.setJobDescription(f"mm:{label}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            print(f"{label:28s} {dt:7.3f}s", file=sys.stderr)
            spark.sparkContext.setJobDescription(None)
        print("---", file=sys.stderr)


if __name__ == "__main__":
    main()
