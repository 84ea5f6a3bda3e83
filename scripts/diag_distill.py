"""Phase breakdown for quality_classifier_distill (guide §1.1): with the
bench's landed wc/bc fixtures, time (a) wc+bc cache materialization,
(b) the teacher gopher signals, (c) the trained classifier scores,
(d) the full slot. Cumulative phases share caches exactly as the slot
does, so deltas attribute cost to each stage.

Usage: python scripts/diag_distill.py [repeats]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    import xarray_dataaccessor_spark.queries as Q
    import xarray_dataaccessor_spark.queries_ext  # noqa: F401
    from xarray_dataaccessor_spark.queries import QUERIES
    from xarray_dataaccessor_spark.session import get_spark

    spark = get_spark(app_name="xda-diag-distill", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/documents.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    tok_dir = tempfile.mkdtemp(prefix="xda_diag_tok_")
    Q._corpus_word_counts(spark, sf_dir).write.mode("overwrite").parquet(
        os.path.join(tok_dir, "wc.parquet")
    )
    Q._corpus_bigram_counts(spark, sf_dir).write.mode("overwrite").parquet(
        os.path.join(tok_dir, "bc.parquet")
    )
    Q.WC_PARQUET = os.path.join(tok_dir, "wc.parquet")
    Q.BC_PARQUET = os.path.join(tok_dir, "bc.parquet")
    for p in (Q.WC_PARQUET, Q.BC_PARQUET):
        spark.read.parquet(p).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    from pyspark.sql import functions as F

    from xarray_dataaccessor_spark.operators.classifier import (
        distill_quality_classifier,
    )
    from xarray_dataaccessor_spark.operators.sampling import hash_bucket
    from xarray_dataaccessor_spark.operators.similarity import training_sample
    from xarray_dataaccessor_spark.operators.text import gopher_from_counts

    for it in range(repeats):
        t0 = time.perf_counter()
        wc = Q._corpus_word_counts(spark, sf_dir).cache()
        bc = Q._corpus_bigram_counts(spark, sf_dir).cache()
        wc.write.format("noop").mode("overwrite").save()
        bc.write.format("noop").mode("overwrite").save()
        t1 = time.perf_counter()
        base = gopher_from_counts(wc, bc).cache()
        base.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        eb = hash_bucket(F.concat(F.lit("ev:"), F.col("doc_id").cast("string")))
        labels = training_sample(
            base.select(
                "doc_id", F.col("keep").cast("double").alias("y"),
                eb.alias("__eb"),
            ).filter(F.col("__eb") >= 13107).drop("__eb"),
            "doc_id", 2048,
        )
        sig = base.select(
            "doc_id",
            F.explode(
                F.array(
                    F.struct(F.lit(-2).cast("int").alias("bucket"),
                             F.col("top_word_frac").alias("x")),
                    F.struct(F.lit(-3).cast("int").alias("bucket"),
                             F.col("unique_word_frac").alias("x")),
                    F.struct(F.lit(-4).cast("int").alias("bucket"),
                             (F.col("mean_word_len") / F.lit(12.0)).alias("x")),
                    F.struct(F.lit(-5).cast("int").alias("bucket"),
                             (F.least(F.col("n_words"), F.lit(500)).cast("double")
                              / F.lit(500.0)).alias("x")),
                )
            ).alias("b"),
        ).select("doc_id", "b.bucket", "b.x")
        clf = distill_quality_classifier(
            None, labels, n_buckets=32, epochs=2, lr=4.0, extra_features=sig,
            word_counts=wc,
        )
        clf.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        df = QUERIES["quality_classifier_distill"](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        print(
            f"run{it}: wc+bc={t1-t0:6.2f}s  gopher-base={t2-t1:6.2f}s"
            f"  clf-train+score={t3-t2:6.2f}s  full-slot={t4-t3:6.2f}s",
            flush=True,
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
