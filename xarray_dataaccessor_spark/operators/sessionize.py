"""Event sessionization (SURVEY §7.8 extension; the reference's only
"event" notion is static file-export intervals, to_gssha.py:34-37).

Classic gap-based sessionization as pure window functions: lag per user,
boundary flag on gap > timeout, running sum of boundaries = session
index. One shuffle on user_id; both windows share the partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from xarray_dataaccessor_spark.functions.datetime_fns import epoch_micros


def sessionize(
    df: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    time_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Tag each event with a per-user session index."""
    w = Window.partitionBy(user_col).orderBy(time_col, order_tiebreak)
    prev_ts = F.lag(time_col).over(w)
    gap_s = epoch_micros(F.col(time_col)) - epoch_micros(prev_ts)
    boundary = F.when(
        prev_ts.isNull() | (gap_s > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn("session_idx", F.sum(boundary).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))


def session_stats(
    df: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-session aggregates: bounds, length, event count, exact value
    sum (decimal-cast for engine-portable determinism)."""
    tagged = sessionize(df, gap_minutes, user_col, time_col)
    return tagged.groupBy(user_col, "session_idx").agg(
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        (
            (epoch_micros(F.max(time_col)) - epoch_micros(F.min(time_col)))
            / F.lit(1_000_000.0)
        ).alias("duration_s"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )
