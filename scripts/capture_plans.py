"""Capture .explain("formatted") for every declared query into a
directory (one <slot>.txt per query) under the bench's measured
configuration: the derived grid and the shared-token count tables are
landed as parquet fixtures exactly as bench.py's prologue does, so the
captured plans are the plans the bench times.

Usage:
    python scripts/capture_plans.py OUT_DIR [slot1,slot2,...]
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_dir = sys.argv[1]
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    os.makedirs(out_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    import xarray_dataaccessor_spark.queries_ext  # noqa: F401
    import xarray_dataaccessor_spark.queries as Q
    from xarray_dataaccessor_spark.queries import QUERIES
    from xarray_dataaccessor_spark.session import get_spark

    spark = get_spark(app_name="xda-capture-plans", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # land the bench fixtures (grid + token counts) like bench.py 1d/1f
    base = tempfile.mkdtemp(prefix="xda_plans_fix_")
    grid_path = os.path.join(base, "grid.parquet")
    Q._grid(spark, sf_dir).write.mode("overwrite").parquet(grid_path)
    Q.GRID_PARQUET = grid_path
    Q._corpus_word_counts(spark, sf_dir).write.mode("overwrite").parquet(
        os.path.join(base, "wc.parquet")
    )
    Q._corpus_bigram_counts(spark, sf_dir).write.mode("overwrite").parquet(
        os.path.join(base, "bc.parquet")
    )
    Q.WC_PARQUET = os.path.join(base, "wc.parquet")
    Q.BC_PARQUET = os.path.join(base, "bc.parquet")

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in sorted(QUERIES):
        if only is not None and name not in only:
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # keep going; note the failure
            txt = f"PLAN CAPTURE FAILED: {exc}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(txt)
        print(f"# captured {name}", file=sys.stderr)
        try:
            spark.catalog.clearCache()
        except Exception:
            pass


if __name__ == "__main__":
    main()
