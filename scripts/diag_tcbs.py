"""Diagnose the token_count_by_source per-repeat degradation (VERDICT r9 #1).

Runs the slot N times in one session (bench-style: noop write, clearCache
between repeats), then bisects the three variants (counts / report / kn)
per repeat, printing wall time and executor memory after each run.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from xarray_dataaccessor_spark.session import configure_session
from xarray_dataaccessor_spark.queries import load


def jvm_mem(spark):
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    return (rt.totalMemory() - rt.freeMemory()) / 1e6


def timed(spark, label, build):
    t0 = time.perf_counter()
    df = build()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    print(f"{label}: {dt:7.2f} s   jvm_used={jvm_mem(spark):8.0f} MB", flush=True)
    return dt


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .appName("diag-tcbs")
        .getOrCreate()
    )
    configure_session(spark)
    from xarray_dataaccessor_spark.queries_ext import token_count_by_source
    from xarray_dataaccessor_spark.operators.sketch import hll_ndv
    from xarray_dataaccessor_spark.operators.text import (
        bigram_counts,
        corpus_report,
        kneser_ney_from_counts,
        token_counts,
        word_counts,
    )

    n = int(os.environ.get("SPARK_GRAFT_REPEATS", "6"))
    print("== full slot ==", flush=True)
    for i in range(n):
        timed(spark, f"full[{i}]", lambda: token_count_by_source(spark, sf_dir))

    docs = load(spark, sf_dir, "documents").select("source", "text")
    docs_kn = load(spark, sf_dir, "documents").select("doc_id", "source", "text")

    print("== variant bisect ==", flush=True)
    for i in range(n):
        timed(
            spark,
            f"counts[{i}]",
            lambda: token_counts(docs)
            .groupBy("source")
            .agg(F.sum("bpe_tokens").alias("t")),
        )
    for i in range(n):
        timed(
            spark,
            f"report[{i}]",
            lambda: corpus_report(docs, group_col="source").join(
                hll_ndv(docs, "text", p=6, group_cols=("source",)), "source"
            ),
        )
    for i in range(n):
        timed(
            spark,
            f"kn[{i}]",
            lambda: kneser_ney_from_counts(word_counts(docs_kn), bigram_counts(docs_kn))
            .join(docs_kn.select("doc_id", "source"), "doc_id")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n")),
        )


if __name__ == "__main__":
    main()
