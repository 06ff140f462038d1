"""Interval rollup (SURVEY.md W4): fixed-grain time-bucket aggregation.

The reference maintains a 15-minute-grain ``availability`` table where
``available_bikes`` is the min over the 3-minute samples in each interval
(reference README.md:196-224). Batch form here; the streaming form with
watermarks lives in ``citibike_analysis_spark.streaming.rollup``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    aggs: list[Column],
    interval: str = "15 minutes",
) -> DataFrame:
    """Tumbling-window aggregation at a fixed grain.

    Output carries ``bucket_ts`` = window start. Map-side partial
    aggregation applies (hash agg on (window, keys)), so the shuffle moves
    one row per (bucket, key) per input partition — at 100 TB this is the
    difference between shuffling samples and shuffling intervals.
    """
    return (
        df.groupBy(F.window(F.col(ts_col), interval).alias("_w"), *keys)
        .agg(*aggs)
        .withColumn("bucket_ts", F.col("_w.start"))
        .drop("_w")
    )


def bucket_epoch_secs(ts_ns: Column, interval_secs: int) -> Column:
    """Bucket start as epoch seconds (LONG) from an int64-nanosecond
    column.

    Integer-exact alternative to ``window()`` when the source keeps raw
    nanoseconds (events ingest): shuffles an 8-byte long instead of a
    window struct and avoids timestamp semantics entirely. All-integer
    math (r04 review): the old ``truncated_ns / 1e9`` form produced a
    DOUBLE whose ~1e18 numerator exceeds 2^53, so the "integer-exact"
    claim was false by up to 256 ns of rounding — and ``%`` (remainder)
    rounded pre-1970 timestamps toward zero into the wrong bucket;
    ``pmod`` gives floor semantics for negatives.
    """
    ns_per = F.lit(int(interval_secs) * 1_000_000_000)
    truncated = (ts_ns - F.pmod(ts_ns, ns_per)).cast("long")
    # exact long division: `truncated` is an exact multiple of 1e9, and
    # decimal division keeps it integer-precise where double cannot
    return (
        truncated.cast("decimal(38,0)") / F.lit(1_000_000_000)
    ).cast("long")
