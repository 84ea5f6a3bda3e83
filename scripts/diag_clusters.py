"""Phase breakdown for dedup_duplicate_clusters: times (a) the MinHash
pair pipeline + edge cache materialization, (b) the eager
connected-components rounds, (c) the final unioned sink, so the slot's
~10 s splits into named costs (guide §1.1 empirical loop).

Usage: python scripts/diag_clusters.py [repeats]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    from pyspark.sql import functions as F

    import xarray_dataaccessor_spark.queries_ext as QE
    from xarray_dataaccessor_spark.queries import QUERIES
    from xarray_dataaccessor_spark.session import configure_session, get_spark

    spark = get_spark(app_name="xda-diag-clusters", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/documents.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    for it in range(repeats):
        configure_session(spark)
        t0 = time.perf_counter()
        pairs = QE.minhash_near_duplicates(
            QE._corpus(spark, sf_dir), num_perm=16, rows_per_band=2
        )
        edges = (
            pairs.filter(F.col("est_jaccard") >= 0.5)
            .select("id_a", "id_b")
            .cache()
        )
        n_edges = edges.count()
        t1 = time.perf_counter()
        from xarray_dataaccessor_spark.operators.graph import (
            connected_components,
            pagerank,
        )

        comp = connected_components(edges)
        t2 = time.perf_counter()
        comp.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        # full slot for the total
        df = QUERIES["dedup_duplicate_clusters"](spark, sf_dir)
        t4 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t5 = time.perf_counter()
        print(
            f"run{it}: pairs+edge-cache={t1-t0:6.2f}s  cc-eager={t2-t1:6.2f}s"
            f"  cc-sink={t3-t2:6.2f}s  slot-construct={t4-t3:6.2f}s"
            f"  slot-sink={t5-t4:6.2f}s  n_edges={n_edges}",
            flush=True,
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
